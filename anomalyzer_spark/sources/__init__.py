"""Table loaders for the driver's parquet fixtures (TESTDATA.md).

The fixtures store timestamps as parquet INT64 TIMESTAMP(NANOS), which
vanilla ``spark.read.parquet`` rejects (PARQUET_TYPE_ILLEGAL). We read them
with ``spark.sql.legacy.parquet.nanosAsLong`` and expose BOTH:

  * ``<col>_ns``  — the exact int64 epoch-nanoseconds (lossless; equals
    DuckDB's ``epoch_ns(col)``). Use for deterministic ordering and for
    oracle-compared output.
  * ``<col>``     — a real TimestampType truncated to microseconds (Spark's
    native precision). Use for window/streaming/event-time semantics.

At 100 TB the same loader applies: it is a plain parquet scan — filters and
column pruning still push down (the _ns/timestamp projections are cheap
per-row arithmetic on top of the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: columns stored as TIMESTAMP(NANOS) per table
NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, repartition: int | None = None
) -> DataFrame:
    """Load a fixture table.

    ``repartition``: spread the scan across N partitions. The local fixture
    is one small parquet file → one input split → compute-heavy per-row
    operators (shingling, hashing) would run single-threaded without it. On
    a real multi-file dataset the scan parallelizes naturally and callers
    should pass None (no shuffle).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(f"{c}_ns", F.col(c)).withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    if repartition:
        df = df.repartition(repartition)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
