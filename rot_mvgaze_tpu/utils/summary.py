"""Parameter-count summaries (replaces torchsummary at
/root/reference/trainer.py:21,51)."""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np


def count_parameters(params: Mapping[str, Any]) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def parameter_table(params: Mapping[str, Any], max_depth: int = 1) -> str:
    """Human-readable per-top-level-module parameter counts."""
    lines = ["=" * 52, f"{'Module':<36}{'Params':>16}", "-" * 52]
    total = 0
    for name, sub in sorted(params.items()):
        n = count_parameters({name: sub})
        total += n
        lines.append(f"{name:<36}{n:>16,}")
    lines += ["-" * 52, f"{'Total':<36}{total:>16,}", "=" * 52]
    return "\n".join(lines)
