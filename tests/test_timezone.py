"""Session-timezone independence — the driver runs the contract queries in
ITS OWN SparkSession, whose timezone we don't control. Every event-time
path routes through timeutil's tz-free arithmetic (NTZ wall-clock diffs,
epoch-rebuilt instants), so results must be identical under any session
timezone. These tests rerun representative time-sensitive queries in a
sibling session pinned to America/New_York and compare against the same
DuckDB oracle."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_correctness import TABLES, compare

#: queries whose plans touch event time, watermarks, or temporal literals
#: (plain `resample` retired round 5 and detect_resampled round 9 — the
#: bucket arithmetic both composed is covered here through
#: resample_stream, which runs the same bucketing under a watermark;
#: batch `sessions` retired round 9 for snapshot_diff — sessions_stream
#: probes the same islands arithmetic PLUS the watermark cutoff, the
#: most tz-sensitive path of the pair)
TZ_SENSITIVE = ("resample_stream", "sessions_stream", "detect_horizon",
                "pricing_summary", "kafka_parse")


@pytest.fixture(scope="module")
def ny_spark(spark):
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    return s2


@pytest.fixture(scope="module")
def duck_tz(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracles(sf_dir):
    # built once: oracle_sql refits the data-dependent quantizer literals
    # per call — no reason to pay that per parametrized case
    return entry_mod.oracle_sql(sf_dir=sf_dir)


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_tz_independent(ny_spark, sf_dir, duck_tz, oracles, name):
    spark_pdf = entry_mod.queries()[name](ny_spark, sf_dir).toPandas()
    duck_pdf = duck_tz.sql(oracles[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems
