"""Parameter summary table (Lightning ModelSummary(max_depth=-1) parity,
reference ``scripts/train.py:171``)."""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def parameter_table(params: Any, max_rows: int = 200) -> str:
    """Human-readable table: parameter path, shape, count, plus totals."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    total = 0
    for path, leaf in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        count = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += count
        rows.append((name, tuple(leaf.shape), count))

    width = min(max((len(r[0]) for r in rows), default=10) + 2, 70)
    lines = [f"{'name':<{width}}{'shape':<24}{'params':>12}"]
    lines.append("-" * (width + 36))
    for name, shape, count in rows[:max_rows]:
        lines.append(f"{name[:width-1]:<{width}}{str(shape):<24}{count:>12,}")
    if len(rows) > max_rows:
        lines.append(f"... ({len(rows) - max_rows} more)")
    lines.append("-" * (width + 36))
    lines.append(f"{'total':<{width}}{'':<24}{total:>12,}")
    return "\n".join(lines)


def count_parameters(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
