"""Parameter-count summaries (replaces torchsummary at
/root/reference/trainer.py:21,51)."""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np


def count_parameters(params: Mapping[str, Any]) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def parameter_table(params: Mapping[str, Any], max_depth: int = 1) -> str:
    """Human-readable per-module parameter counts, expanded ``max_depth``
    levels into the module tree."""

    def rows(tree: Mapping[str, Any], prefix: str, depth: int):
        for name, sub in sorted(tree.items()):
            label = f"{prefix}{name}"
            if depth < max_depth and isinstance(sub, Mapping) and any(
                isinstance(v, Mapping) for v in sub.values()
            ):
                yield from rows(sub, label + "/", depth + 1)
            else:
                yield label, count_parameters({name: sub})

    lines = ["=" * 52, f"{'Module':<36}{'Params':>16}", "-" * 52]
    total = 0
    for label, n in rows(params, "", 1):
        total += n
        lines.append(f"{label:<36}{n:>16,}")
    lines += ["-" * 52, f"{'Total':<36}{total:>16,}", "=" * 52]
    return "\n".join(lines)
