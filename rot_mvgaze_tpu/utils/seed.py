"""Global determinism (parity: /root/reference/utils/util.py:7-16).

JAX computations are deterministic given PRNG keys; this seeds the host-side
randomness (python/numpy used by pairing fallbacks and any host shuffles) and
returns the root JAX key that the trainer threads through augmentations.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 0) -> "jax.Array":  # noqa: F821
    import jax

    random.seed(seed)
    np.random.seed(seed)
    # NOTE: affects SUBPROCESSES only — the running interpreter's str-hash
    # salt is fixed at startup (same limitation as the reference's
    # /root/reference/utils/util.py:15; kept for worker determinism).
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
