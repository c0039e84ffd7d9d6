"""Hierarchical diverse sampling (SURVEY.md §2.6 O4, reference base.py:229-295).

The reference dedups on a growing admin-prefix ([a1] → [a1,a2] → …) until it
has ≥ n rows, then truncates.  The reference's ``unique(keep='first')`` +
``head`` are order-dependent; this version is made deterministic with explicit
ordering (first row per group = min of ``order_col``), so a SQL oracle can
reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import keep_best_per_key


def diverse_sample(df: DataFrame, prefix_cols: list[str], *, n: int,
                   order_col: str) -> DataFrame:
    """Smallest prefix level whose distinct-group count reaches ``n`` wins;
    returns the first row (min order_col) per group at that level, the first
    ``n`` groups in group-key order.  Driver-side loop over tiny counts."""
    level = 1
    chosen = None
    for level in range(1, len(prefix_cols) + 1):
        groups = df.select(*prefix_cols[:level]).distinct().count()
        chosen = prefix_cols[:level]
        if groups >= n:
            break
    picked = keep_best_per_key(df, chosen, [F.col(order_col).asc()])
    return picked.orderBy(*chosen).limit(n)
