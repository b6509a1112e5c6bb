"""Skew-safe aggregation patterns.

What Spark already handles (don't re-implement):
  * ALGEBRAIC aggregates (sum/count/min/max/avg) — map-side partial
    aggregation merges associatively; key skew never concentrates rows.
  * ``count(DISTINCT v)`` — Catalyst's RewriteDistinctAggregates shuffles
    stage 1 on ``(keys, v)`` (verified in the physical plan), so a heavy
    group's distinct set is already spread across reducers; manual salting
    is redundant.

What still concentrates state on one task at 100 TB: HOLISTIC aggregates
with per-group sorted state — exact ``percentile``/``median`` buffers the
whole group per key, so 3 heavy keys = 3 giant tasks.

``skewsafe_median`` is the counting rewrite of exact median (selection by
rank, not by sort):

    stage 1: groupBy(keys, v) → count(*)        (shuffles by (keys, v) —
             heavy groups spread over all reducers, like count_distinct)
    stage 2: cumulative row-count window per key over the DISTINCT values
             → pick the smallest v whose cumulative count reaches the
             lower-median rank ``(n + 1) // 2``

Per-task state shrinks from the group's ROW count to its DISTINCT-VALUE
count — the usual skew shape (few hot keys, heavily repeated values)
collapses by orders of magnitude. For high-cardinality continuous values
prefer ``percentile_approx`` (sketch, bounded state) — see
``q_sketch_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skewsafe_median(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    out_col: str = "median",
) -> DataFrame:
    """Exact per-key lower median (the ``(n+1)//2``-th smallest row value —
    SQL ``quantile_disc(0.5)`` semantics) without per-group sort state.

    NULL values are ignored, matching SQL aggregate semantics.
    """
    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(v.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*keys)
    ranked = counts.select(
        *keys,
        v.alias("_v"),
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(wall).alias("_n"),
    )
    need = F.expr("(_n + 1) div 2")  # lower-median rank, exact int arith
    return (
        ranked.where(F.col("_cum") >= need)
        .groupBy(*keys)
        .agg(F.min("_v").alias(out_col))
    )
