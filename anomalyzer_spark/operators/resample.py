"""Time-bucket resampling — raw events → regular series points.

The reference assumes regularly sampled input (positional windows,
README.md:11-13); real event streams are irregular, so the documented
pipeline shape is: downsample into fixed buckets, then detect over the
bucket series (EXAMPLES.md's use cases all describe '30 second samples',
'hourly seasons' etc.). This operator is that downsampling step.

Pure column expressions: bucket = floor-division of epoch time — a plain
``groupBy`` (one shuffle, map-side partial agg), deliberately NOT
``F.window`` session logic, so the bucket id is an engine-portable integer
any SQL oracle reproduces. Gaps (empty buckets) are NOT filled by default —
positional detection treats the bucket sequence as the series; the ``fill``
parameter opts into zero-fill or forward-fill (relational, co-partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# avg/sum run through DECIMAL(28,6): distributed partial-agg ORDER changes
# last-bit double sums, so exact decimal arithmetic keeps results
# deterministic and cross-engine reproducible (values with >6 fractional
# digits are half-up rounded at 1e-6 first — a documented tradeoff).
AGGS = {
    "avg": lambda v, n: F.sum(v.cast("decimal(28,6)")).cast("double") / F.count(v),
    "sum": lambda v, n: F.sum(v.cast("decimal(28,6)")).cast("double"),
    "min": lambda v, n: F.min(v),
    "max": lambda v, n: F.max(v),
    "count": lambda v, n: F.count(v).cast("double"),
}


def resample(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    *,
    every_seconds: int,
    agg: str = "avg",
    fill: str | None = None,
) -> DataFrame:
    """Aggregate values into fixed time buckets per key.

    Returns (keys..., bucket, bucket_ts, value, n_raw) where ``bucket`` is
    ``epoch_us div every_us`` (exact int64 floor-division, oracle-portable),
    ``bucket_ts`` its start in epoch seconds, and ``value`` the chosen
    aggregate. ``avg``/``sum`` aggregate through DECIMAL(28,6) (see AGGS)
    so distributed partial-agg order cannot perturb low bits and DuckDB
    reproduces the result exactly.

    ``fill`` controls empty buckets between a key's first and last bucket
    (positional detection treats the bucket sequence as the series, so a
    gap silently SHORTENS the series unless filled):

      * ``None``  — gaps are omitted (default; the round-2/3 behavior).
      * ``"zero"``  — emit gap buckets with value 0.0, n_raw 0.
      * ``"ffill"`` — emit gap buckets carrying the most recent non-NULL
        observed value forward, n_raw 0.

    Only TRUE gaps (no rows at all) are filled: an occupied bucket whose
    aggregate is NULL (all raw values NULL) keeps its observed NULL.

    Filling is relational: per key, ``sequence(min_bucket, max_bucket)``
    exploded (one row per expected bucket, generated map-side after the
    agg — no extra shuffle on the data, only the per-key min/max ride the
    existing groupBy partitioning), left-joined… expressed as a
    full-sequence explode + left join on the aggregated frame, which
    co-partitions on (keys, bucket). Gap count per key is bounded by the
    series span, not the raw event count.
    """
    if agg not in AGGS:
        raise ValueError(f"agg must be one of {sorted(AGGS)}")
    if fill not in (None, "zero", "ffill"):
        raise ValueError("fill must be None, 'zero', or 'ffill'")
    from ..timeutil import epoch_us_col

    epoch_us = epoch_us_col(df, ts_col)
    every_us = every_seconds * 1_000_000
    v = F.col(value_col).cast("double")
    agged = (
        # exact int64 floor division: `div` never round-trips through
        # double (Spark's `/` on longs is floating-point), so bucket ids
        # at large epoch magnitudes are bit-identical to the integer
        # division the DuckDB oracle performs.
        df.select(*keys, epoch_us.alias("_us"), v.alias("_v"))
        .select(
            *keys,
            F.expr(f"_us div {every_us}").cast("long").alias("bucket"),
            "_v",
        )
        .groupBy(*keys, "bucket")
        .agg(
            AGGS[agg](F.col("_v"), None).alias(value_col),
            F.count(F.lit(1)).alias("n_raw"),
        )
    )
    if fill is not None:
        from pyspark.sql.window import Window

        span = agged.groupBy(*keys).agg(
            F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        grid = span.select(
            *keys,
            F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("bucket"),
        )
        agged = grid.join(agged, [*keys, "bucket"], "left")
        # fill ONLY true gaps (no rows at all → n_raw NULL after the left
        # join). An OCCUPIED bucket whose aggregate is NULL (all raw values
        # NULL) keeps its observed NULL — rewriting it would be
        # indistinguishable from real data.
        is_gap = F.col("n_raw").isNull()
        if fill == "zero":
            agged = agged.withColumn(
                value_col,
                F.when(is_gap, F.lit(0.0)).otherwise(F.col(value_col)))
        else:  # ffill: gaps carry the most recent non-NULL observed value
            # (an occupied-but-NULL bucket neither gets filled nor poisons
            # the carry — gap rows are NULL pre-fill, so last+ignorenulls
            # over the raw column skips both)
            w = (Window.partitionBy(*keys).orderBy("bucket")
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            agged = agged.withColumn(
                value_col,
                F.when(is_gap,
                       F.last(value_col, ignorenulls=True).over(w))
                .otherwise(F.col(value_col)))
        agged = agged.withColumn(
            "n_raw", F.coalesce(F.col("n_raw"), F.lit(0).cast("long")))
    return agged.withColumn(
        "bucket_ts", (F.col("bucket") * every_seconds).cast("long"))
