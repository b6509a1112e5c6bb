"""Table loaders for the driver's parquet fixtures (TESTDATA.md).

Fixture timestamp encodings have varied by round — INT64 TIMESTAMP(NANOS)
(pre-round-3; needs ``nanosAsLong``) and TIMESTAMP(MICROS) with
isAdjustedToUTC=false (current; Spark reads TIMESTAMP_NTZ). The loader
handles both and exposes, for each event-time column:

  * ``<col>_ns``  — exact int64 epoch-nanoseconds (lossless; equals
    DuckDB's ``epoch_ns(col)`` — NTZ wall clock taken as UTC, see
    timeutil). Use for deterministic ordering and oracle-compared output.
  * ``<col>``     — the native temporal column as stored (NTZ today);
    every engine operator normalizes it via ``timeutil`` for
    window/streaming/event-time semantics.

At 100 TB the same loader applies: it is a plain parquet scan — filters and
column pruning still push down (the _ns projection is cheap per-row
arithmetic on top of the scan).
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
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":  # legacy TIMESTAMP(NANOS) fixtures
            df = df.withColumn(f"{c}_ns", F.col(c)).withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
        elif dt in ("timestamp", "timestamp_ntz"):
            from ..timeutil import epoch_us_col

            # µs storage → ×1000 is lossless and equals DuckDB epoch_ns
            df = df.withColumn(f"{c}_ns", epoch_us_col(df, c) * F.lit(1000))
    if repartition:
        df = df.repartition(repartition)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
