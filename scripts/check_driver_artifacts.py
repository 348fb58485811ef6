#!/usr/bin/env python
"""Wall-clock guard for the driver-facing artifacts.

The round driver records exactly three things from this repo:

1. ``bench.py``            — one JSON line, run on the real chip.
2. ``__graft_entry__.entry()``            — single-chip compile check.
3. ``__graft_entry__.dryrun_multichip(8)`` — 8-virtual-device CPU run.

Round 3 shipped a red ``MULTICHIP_r03.json`` (rc=124, empty tail) because
the dryrun default had been silently upgraded past the driver's timeout —
no test bounded the wall clock of the exact driver invocation, so the
regression was invisible until the judge saw the artifact. This script runs
each driver entry EXACTLY as the driver does (same env, same args, fresh
subprocess) under an explicit budget and fails loudly when one exceeds it.

Budgets are ~2-3x the wall clocks measured on the round-4 driver host
(1 CPU, 8 virtual devices, cold cache): dryrun ~100-145 s (4 steps),
bench-smoke 67-76 s, entry-compile 11 s. Machine noise on this host was
measured at <=1.2x; the headroom absorbs that without masking a real
regression such as r3's 6-45 min configs (the r50-small config measured
370-442 s here and the flagship ~45 min — both would fail the dryrun
budget, correctly).

Run directly (``python scripts/check_driver_artifacts.py``) or via the
routine suite (``tests/test_driver_artifacts.py``).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _validate_dryrun(out: str) -> "str | None":
    if "dryrun_multichip(8) OK" not in out:
        return "missing 'dryrun_multichip(8) OK' line"
    return None


def _validate_bench(out: str) -> "str | None":
    """The driver records bench.py's LAST stdout line as the round metric —
    it must be one JSON object with the documented keys."""
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    if not lines:
        return "no JSON line in bench output"
    try:
        rec = json.loads(lines[-1])
    except json.JSONDecodeError as e:
        return f"bench JSON unparsable: {e}"
    missing = {"metric", "value", "unit", "vs_baseline"} - set(rec)
    if missing:
        return f"bench JSON missing keys: {sorted(missing)}"
    if not (isinstance(rec["value"], (int, float)) and rec["value"] > 0):
        return f"bench value not a positive number: {rec['value']!r}"
    return None


def _validate_entry(out: str) -> "str | None":
    if "entry OK" not in out:
        return "missing 'entry OK' line"
    return None


#: (name, budget seconds, extra env, argv, output validator).
#: Budgets: see module docstring.
CHECKS = [
    (
        "dryrun_multichip(8) [driver invocation]",
        300.0,
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(8)",
        ],
        _validate_dryrun,
    ),
    (
        "bench.py [CPU smoke config]",
        240.0,
        {
            "JAX_PLATFORMS": "cpu",
            "BENCH_BATCH": "2",
            "BENCH_SIZE": "64",
            "BENCH_DEPTH": "18",
        },
        [sys.executable, "bench.py"],
        _validate_bench,
    ),
    (
        "entry() [single-device compile+run]",
        240.0,
        {"JAX_PLATFORMS": "cpu"},
        [
            sys.executable,
            "-c",
            "import jax\n"
            "from __graft_entry__ import entry\n"
            "fn, args = entry()\n"
            "out = jax.jit(fn)(*args)\n"
            "jax.block_until_ready(out)\n"
            "print('entry OK', out.shape, out.dtype)",
        ],
        _validate_entry,
    ),
]


def run_check(name, budget, extra_env, argv, validate=None, grace=60.0):
    """Run one driver entry; return (ok, elapsed, tail). The subprocess is
    given ``budget + grace`` before a hard kill so an over-budget-but-alive
    run still reports its elapsed time instead of an empty tail.
    ``validate`` inspects the combined output and returns an error string
    when the OUTPUT CONTRACT is broken (rc=0 with garbage output would
    otherwise ship a useless artifact)."""
    env = {
        k: v
        for k, v in os.environ.items()
        # Strip harness vars so the subprocess sees what the driver sends.
        if not k.startswith(("XLA_", "JAX_", "BENCH_"))
    }
    env.update(extra_env)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            argv,
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            timeout=budget + grace,
            text=True,
        )
        out, rc = proc.stdout, proc.returncode
    except subprocess.TimeoutExpired as e:
        raw = e.stdout or b""
        out = raw.decode("utf-8", "replace") if isinstance(raw, bytes) else raw
        rc = -9
    elapsed = time.monotonic() - t0
    tail = "\n".join((out or "").strip().splitlines()[-6:])
    contract_error = None
    if rc == 0 and validate is not None:
        contract_error = validate(out or "")
    ok = rc == 0 and elapsed <= budget and contract_error is None
    status = "OK" if ok else "FAIL"
    print(
        f"[{status}] {name}: rc={rc} elapsed={elapsed:.1f}s "
        f"budget={budget:.0f}s"
        + (f" contract={contract_error}" if contract_error else "")
    )
    if not ok:
        print(f"--- tail ---\n{tail}\n------------")
    return ok, elapsed, tail


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--only",
        default=None,
        help="substring filter on check names (e.g. 'dryrun', 'bench', 'entry')",
    )
    args = parser.parse_args()
    checks = [
        c for c in CHECKS if args.only is None or args.only.lower() in c[0].lower()
    ]
    if not checks:
        print(f"no checks match --only {args.only!r}", file=sys.stderr)
        return 2
    results = [run_check(*c) for c in checks]
    summary = {
        "ok": all(r[0] for r in results),
        "checks": [
            {"name": c[0], "budget_s": c[1], "ok": r[0], "elapsed_s": round(r[1], 1)}
            for c, r in zip(checks, results)
        ],
    }
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
