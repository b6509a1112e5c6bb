"""Bucketed storage — co-locate series keys once, detect shuffle-free forever.

Detection's only exchange is the hash partitioning on the series keys
(operators/detect.py). For a table that is queried repeatedly (the common
monitoring shape: same keys, new points, every few minutes), pre-bucketing
the storage BY those keys removes even that: a bucketed scan reports
``HashPartitioning(keys, n)`` which satisfies the window/groupBy
distribution requirement, so the whole detect plan becomes scan → sort →
window → agg with NO Exchange at all (asserted in tests/test_plans.py).

At 100 TB: bucket count should be sized so each bucket holds a manageable
slice (buckets × target ≈ data size); combine with partition-by-date dirs
so the horizon pre-filter prunes partitions AND buckets co-locate keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed by ``keys`` (and optionally
    sorted within buckets — pre-sorting by (keys, ts) also removes the
    window Sort at read time when the plan's required ordering matches)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucketing metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would LOSE the bucket info
    and re-shuffle)."""
    return spark.table(table)
