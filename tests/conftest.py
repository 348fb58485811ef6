"""Test configuration.

Tests run on CPU with 8 virtual devices so the data-parallel / shard_map
paths (rot_mvgaze_tpu.parallel) are exercised without TPU hardware — the
standard JAX trick replacing what the reference never had (no distributed
tests, no tests at all: /root/reference has no tests/ directory).
"""

import os
import sys

# Tests run on a virtual 8-device CPU mesh. The session sitecustomize may
# have already imported jax and force-selected the TPU platform via
# jax.config.update("jax_platforms", ...), so overriding the env var alone is
# not enough — update the live jax config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    # XLA:CPU's concurrency-optimized thunk scheduler lets each virtual
    # device's thread reach INDEPENDENT collectives in a different order —
    # with the 2-D (data, spatial) mesh's mix of subgroup psums and global
    # halo permutes this deadlocks the 40 s rendezvous nondeterministically
    # (observed: device 6 parked at op_id=1 while device 7 waited at
    # op_id=114). The default scheduler executes thunks in program order,
    # giving the total collective order real TPUs get from their static
    # schedule. CPU-mesh tests only; never set on real chips.
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache across test runs: the jitted train/eval steps
# dominate suite wall-time; cache hits make re-runs fast.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE", "/tmp/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
