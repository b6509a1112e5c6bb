"""Time-bucket resampling — raw events → regular series points.

The reference assumes regularly sampled input (positional windows,
README.md:11-13); real event streams are irregular, so the documented
pipeline shape is: downsample into fixed buckets, then detect over the
bucket series (EXAMPLES.md's use cases all describe '30 second samples',
'hourly seasons' etc.). This operator is that downsampling step.

Pure column expressions: bucket = floor-division of epoch time — a plain
``groupBy`` (one shuffle, map-side partial agg), deliberately NOT
``F.window`` session logic, so the bucket id is an engine-portable integer
any SQL oracle reproduces. Gaps (empty buckets) are NOT filled — positional
detection treats the bucket sequence as the series; fill policy (0, ffill)
is a caller decision via ``fill``.
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
) -> DataFrame:
    """Aggregate values into fixed time buckets per key.

    Returns (keys..., bucket, bucket_ts, value, n_raw) where ``bucket`` is
    ``epoch_us div every_us`` (exact int64 floor-division, oracle-portable),
    ``bucket_ts`` its start in epoch seconds, and ``value`` the chosen
    aggregate. ``avg``/``sum`` aggregate through DECIMAL(28,6) (see AGGS)
    so distributed partial-agg order cannot perturb low bits and DuckDB
    reproduces the result exactly.
    """
    if agg not in AGGS:
        raise ValueError(f"agg must be one of {sorted(AGGS)}")
    from ..timeutil import epoch_us_col

    epoch_us = epoch_us_col(df, ts_col)
    every_us = every_seconds * 1_000_000
    v = F.col(value_col).cast("double")
    return (
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
        .withColumn("bucket_ts", (F.col("bucket") * every_seconds).cast("long"))
    )
