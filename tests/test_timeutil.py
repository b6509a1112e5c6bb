"""Event-time normalization vs DuckDB — resilient to fixture re-encoding.

The driver regenerates /root/testdata per round and has already shipped two
different parquet timestamp encodings (TIMESTAMP(NANOS) → bigint via
nanosAsLong; TIMESTAMP(MICROS) isAdjustedToUTC=false → TIMESTAMP_NTZ).
These tests assert the cross-engine property the whole correctness gate
rests on — ``timeutil.epoch_us_col`` equals DuckDB's ``epoch_us`` on the
same parquet — for WHATEVER encoding the current fixtures use, so the next
re-encoding fails here with a clear message instead of deep in a query.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.sources import load_table
from anomalyzer_spark.timeutil import epoch_us_col, event_time_col

CASES = [("events", "ts"), ("orders", "o_orderdate"),
         ("lineitem", "l_shipdate")]


@pytest.mark.parametrize("table,col", CASES)
def test_epoch_us_matches_duckdb(spark, sf_dir, table, col):
    df = load_table(spark, sf_dir, table)
    got = [r["_us"] for r in df.select(
        epoch_us_col(df, col).alias("_us"))
        .orderBy("_us").limit(100).collect()]
    exp = [r[0] for r in duckdb.sql(
        f"SELECT epoch_us({col}) FROM '{sf_dir}/{table}.parquet' "
        "ORDER BY 1 LIMIT 100").fetchall()]
    assert got == exp, (
        f"{table}.{col}: epoch_us_col diverges from DuckDB epoch_us — "
        "the fixture timestamp encoding likely changed; extend "
        "anomalyzer_spark/timeutil.py for the new type")


def test_event_time_col_is_utc_instant(spark, sf_dir):
    """event_time_col must yield a TIMESTAMP whose unix_micros equals
    epoch_us_col regardless of the storage type (watermark-safe)."""
    df = load_table(spark, sf_dir, "events")
    bad = df.select(
        epoch_us_col(df, "ts").alias("a"),
        F.unix_micros(event_time_col(df, "ts")).alias("b"),
    ).where(F.col("a") != F.col("b")).limit(1).count()
    assert bad == 0


def test_epoch_us_rejects_unknown_types(spark):
    df = spark.createDataFrame([(1.5,)], "ts double")
    with pytest.raises(TypeError, match="unsupported event-time type"):
        epoch_us_col(df, "ts")


def test_epoch_us_handles_date_and_int_columns(spark):
    df = spark.createDataFrame(
        [("2024-03-01", 1_700_000_000_000_000)], "d string, us long")
    df = df.select(F.to_date("d").alias("d"), "us")
    row = df.select(
        epoch_us_col(df, "d").alias("du"),
        epoch_us_col(df, "us").alias("uu"),
    ).collect()[0]
    assert row["du"] == 1709251200000000  # 2024-03-01T00:00Z in µs
    assert row["uu"] == 1_700_000_000_000_000  # ints pass through


def test_epoch_us_case_insensitive_column_lookup(spark):
    """Spark resolves F.col case-insensitively by default; the dtypes
    lookup must match that (a 'TS' column found via ts_col='ts')."""
    df = spark.createDataFrame([(1_700_000_000_000_000,)], "TS long")
    assert df.select(
        epoch_us_col(df, "ts").alias("u")).collect()[0]["u"] \
        == 1_700_000_000_000_000
