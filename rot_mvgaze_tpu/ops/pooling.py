"""Max pooling as an explicit shifted-candidate max tree.

``lax.reduce_window`` differentiates through ``select_and_scatter``, a
windowed scatter XLA lowers to a slow serialized kernel on TPU (2.4 ms of
the 102 ms R50 train step — docs/PERF.md trace). Writing the same 3x3/s2/p1
pool as a max over 9 strided slices gives an IDENTICAL forward, and its
backward differentiates through the ``maximum`` tree into plain selects +
strided pad-adds — elementwise passes XLA fuses, no scatter.

MEASURED NEGATIVE RESULT (docs/PERF.md r2b): wired into the R50 backbone,
the train step dropped 2438 -> 1873 imgs/s/chip (-23%). The backward's
9 strided pad-adds + select tree over [B,112,112,64] tensors cost far more
HBM traffic than the 2.4 ms select_and_scatter they replace. Kept as a
tested utility + documentation of the dead end; the backbone uses
``nn.max_pool``.

Tie semantics in the backward differ from select_and_scatter only within
exactly-tied windows (JAX's ``maximum`` splits the cotangent between tied
operands; select_and_scatter routes it to the first max). Implementations
already disagree here (PyTorch CUDA routes to the first argmax; CPU/cuDNN
vary); ties at 0 after conv1+BN+ReLU are killed by the upstream ReLU
gradient anyway, and positive bf16 ties are vanishingly rare. Forward
outputs are bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_3x3s2p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``MaxPool2d(3, stride=2, padding=1)`` over NHWC (-inf padding),
    as a 9-candidate maximum (differentiable, scatter-free backward)."""
    n, h, w, c = x.shape
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    xp = jnp.pad(
        x,
        ((0, 0), (1, 1), (1, 1), (0, 0)),
        constant_values=-jnp.inf,
    )
    out = None
    for dy in range(3):
        for dx in range(3):
            s = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (n, dy + 2 * (oh - 1) + 1, dx + 2 * (ow - 1) + 1, c),
                (1, 2, 2, 1),
            )
            out = s if out is None else jnp.maximum(out, s)
    return out
