"""XLA TPU compiler-option sweep over the headline train step (VERDICT r2
item #4).

PERF.md r2 listed "XLA conv autotuning flags" as the one untried lever
class. This driver runs ``bench.py`` end-to-end (unchanged methodology:
jitted donated step, 3 warmup + 20 timed) once per candidate setting on the
real chip.

Delivery mechanism: per-jit ``compiler_options`` (``BENCH_COMPILER_OPTIONS``
env consumed by bench.py), NOT ``XLA_FLAGS`` — on a tunneled backend the
LOCAL client's flag parser aborts on names only the REMOTE TPU compiler
defines (verified: ``--xla_tpu_rwb_fusion`` crashes the client;
``lowered.compile(compiler_options={"xla_tpu_rwb_fusion": "false"})``
compiles and runs). Each run gets an isolated compilation-cache dir so a
cached baseline executable can never masquerade as a flag result.

Candidates were enumerated from this libtpu's flag table (``strings
libtpu.so``), filtered to single-chip fusion/scheduling/layout levers
relevant to a bandwidth-bound conv graph (no collectives on one chip).

Usage: python scripts/bench_xla_flags.py [--out docs/xla_flag_sweep_r3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each entry: (label, {compiler_option: value}). Baseline first.
CANDIDATES = [
    ("baseline", {}),
    # reduce+broadcast fusion toggle — known production lever (set false in
    # several public TPU training configs); BN stat/backward reduces are rwb
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    # let reduces fuse their producers (BN stats read the conv output;
    # fusing the producer could remove a full HBM pass)
    ("input_fusion_into_reduce",
     {"xla_tpu_allow_input_fusion_in_certain_reduce_ops": "true"}),
    # conv input fusion through the bf16 downcast (our casts sit between
    # augment/elementwise and convs)
    ("conv_input_fusion_downcast",
     {"xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"}),
    ("multi_dim_reduce_rwb", {"xla_tpu_allow_multi_dim_reduce_rwb": "true"}),
    # fusion cost models
    ("experimental_fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("bundle_aware_fusion_cost",
     {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    # bigger multi-output fusions (could merge stat-reduce + normalize pass)
    ("multi_output_fusion_64", {"xla_tpu_multi_output_fusion_limit": "64"}),
    ("multioutput_max_operands_16",
     {"xla_tpu_multioutput_fusion_max_operands": "16"}),
    # loop fusion / layout
    ("aggressive_loop_fusion_layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("multi_level_nested_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("fusion_layout_update", {"xla_tpu_enable_fusion_layout_update": "true"}),
    # schedulers
    ("aggressive_scheduling", {"xla_tpu_use_aggressive_scheduling": "true"}),
    ("latency_hiding_layer_scheduler",
     {"xla_tpu_enable_latency_hiding_layer_scheduler": "true"}),
    ("all_experimental_scheduler",
     {"xla_tpu_enable_all_experimental_scheduler_features": "true"}),
    # vmem scavenging for fusions
    ("scavenge_vmem_for_fusions",
     {"xla_tpu_scavenge_vmem_for_fusions": "true"}),
    # dot autotuning (fusion MLPs + 1x1 convs lowered as dots)
    ("autotune_dots", {"xla_tpu_autotune_dots": "true"}),
    # short-fusion emitter
    ("pincer_short_fusion_emitter",
     {"xla_tpu_enable_pincer_short_fusion_emitter": "true"}),
    # pipelined loop unrolling
    ("pipelined_loop_unrolling",
     {"xla_tpu_enable_pipelined_loop_unrolling": "true"}),
    ("vector_load_fusion_8", {"xla_tpu_vector_load_fusion_window": "8"}),
    ("vector_store_fusion_8", {"xla_tpu_vector_store_fusion_window": "8"}),
]


def run_one(label: str, options: dict, timeout: int = 1500):
    env = dict(os.environ)
    if options:
        env["BENCH_COMPILER_OPTIONS"] = json.dumps(options)
    else:
        env.pop("BENCH_COMPILER_OPTIONS", None)
    # isolated compile cache per config (see module docstring)
    cache = tempfile.mkdtemp(prefix=f"xla_sweep_{label}_")
    env["JAX_CACHE_DIR"] = cache
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"label": label, "options": options, "error": "timeout"}
    finally:
        # the isolation only needs the cache during the child process;
        # leaking one compiled-flagship-executable cache per candidate
        # per sweep would fill /tmp over repeated sweeps
        shutil.rmtree(cache, ignore_errors=True)
    wall = time.time() - t0
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        return {
            "label": label, "options": options, "error": "failed",
            "rc": out.returncode, "stderr_tail": out.stderr[-1500:],
        }
    rec = json.loads(lines[-1])
    return {
        "label": label, "options": options,
        "imgs_per_sec_chip": rec["value"],
        "vs_baseline_a100": rec["vs_baseline"],
        "wall_s": round(wall, 1),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/xla_flag_sweep_r3.json")
    p.add_argument("--only", default=None,
                   help="comma-separated labels to run (default: all)")
    p.add_argument("--custom", default=None,
                   help="JSON dict {label: {option: value}} of extra "
                        "candidates (e.g. combinations of sweep winners); "
                        "runs INSTEAD of the built-in list unless --only "
                        "also selects built-ins")
    args = p.parse_args()

    # Merge built-ins with --custom entries, then apply --only UNIFORMLY to
    # the merged list: `--only lbl --custom {...}` runs exactly the selected
    # labels whether they are built-in or custom (previously custom entries
    # bypassed the filter and all ran).
    candidates = list(CANDIDATES)
    if args.custom:
        extra = json.loads(args.custom)
        candidates = ([] if args.only is None else candidates)
        candidates += [(label, opts) for label, opts in extra.items()]

    only = set(args.only.split(",")) if args.only else None
    results = []
    for label, options in candidates:
        if only is not None and label not in only:
            continue
        r = run_one(label, options)
        results.append(r)
        print(json.dumps(r), flush=True)
        # checkpoint partial results so an interrupted sweep keeps its data
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    ok = [r for r in results if "imgs_per_sec_chip" in r]
    if ok:
        best = max(ok, key=lambda r: r["imgs_per_sec_chip"])
        print(f"best: {best['label']} at {best['imgs_per_sec_chip']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
