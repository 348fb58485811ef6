"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile on a tunneled TPU; caching
compiled executables on disk makes every subsequent process start instantly.
Call once before the first jit execution.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # config names can move across jax versions
        # Never silent: without the cache every process restart re-pays the
        # multi-minute flagship compile on a tunneled TPU — exactly the
        # cost this module exists to eliminate.
        import sys

        print(
            f"WARNING: persistent compile cache NOT enabled ({e!r}); "
            f"compiles will not be reused across processes",
            file=sys.stderr,
        )
