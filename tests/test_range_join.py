"""Bucketized range joins (operators/range_join.py): value parity against
DuckDB's straightforward theta join, boundary semantics, the
one-row-per-pair dedup arithmetic, the fan-out guard, and the plan shape
(equi-join, never a cartesian/nested-loop)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.operators import range_join as rj
from anomalyzer_spark.plans import explain_str


def test_points_boundaries_halfopen(spark):
    pts = spark.createDataFrame(
        [(1, 10), (2, 19), (3, 20), (4, 9)], "pid long, ts long")
    iv = spark.createDataFrame([(100, 10, 20)], "iid long, s long, e long")
    got = {r["pid"] for r in rj.range_join_points(
        pts, iv, "ts", "s", "e", bucket_width=7).collect()}
    assert got == {1, 2}  # start inclusive, end exclusive


def test_interval_pair_emitted_once_despite_many_shared_buckets(spark):
    left = spark.createDataFrame([(1, 0, 100)], "lid long, ls long, le long")
    right = spark.createDataFrame([(2, 5, 95), (3, 200, 300)],
                                  "rid long, rs long, re long")
    out = rj.range_join_intervals(
        left, right, "ls", "le", "rs", "re", bucket_width=10).collect()
    assert len(out) == 1  # shares 10 buckets, emitted once
    assert (out[0]["lid"], out[0]["rid"]) == (1, 2)


def test_empty_and_touching_intervals(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(2, 10, 20),   # touches at 10: half-open → no overlap
         (3, 9, 9),     # empty interval → drops out
         (4, 9, 10)],   # genuine 1-wide overlap
        "rid long, rs long, re long")
    got = {r["rid"] for r in rj.range_join_intervals(
        left, right, "ls", "le", "rs", "re", bucket_width=4).collect()}
    assert got == {4}


def test_fanout_guard_raises(spark):
    iv = spark.createDataFrame([(1, 0, 10_000_000)],
                               "iid long, s long, e long")
    pts = spark.createDataFrame([(1, 5)], "pid long, ts long")
    with pytest.raises(Exception, match="refusing the fan-out"):
        rj.range_join_points(pts, iv, "ts", "s", "e", bucket_width=1,
                             max_buckets_per_interval=100).collect()


def test_points_parity_with_duckdb_theta_join(spark, sf_dir):
    """Same parquet, same derived intervals: the bucketized equi-join must
    return exactly what DuckDB's plain theta join returns."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pt"),
        "l_orderkey", "l_linenumber")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey"),
        (F.col("o_orderkey") * 9).alias("s"),
        (F.col("o_orderkey") * 9 + F.pmod(F.col("o_orderkey"), 40) + 5)
        .alias("e"))
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["o_orderkey"])
        for r in rj.range_join_points(li, od, "pt", "s", "e",
                                      bucket_width=16).collect())
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute("""
        WITH pts AS (SELECT l_orderkey*10 + l_linenumber AS pt,
                            l_orderkey, l_linenumber FROM lineitem),
             iv AS (SELECT o_orderkey, o_orderkey*9 AS s,
                           o_orderkey*9 + o_orderkey % 40 + 5 AS e
                    FROM orders)
        SELECT l_orderkey, l_linenumber, o_orderkey
        FROM pts JOIN iv ON pt >= s AND pt < e
        ORDER BY 1, 2, 3""").fetchall()
    assert len(got) > 0 and got == [tuple(w) for w in want]


def test_intervals_parity_with_duckdb(spark, sf_dir):
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    left = od.select(F.col("o_orderkey").alias("lid"),
                     (F.col("o_orderkey") * 7).alias("ls"),
                     (F.col("o_orderkey") * 7
                      + F.pmod(F.col("o_orderkey"), 30) + 3).alias("le"))
    right = od.select(F.col("o_orderkey").alias("rid"),
                      (F.col("o_orderkey") * 7 + 11).alias("rs"),
                      (F.col("o_orderkey") * 7 + 11
                       + F.pmod(F.col("o_orderkey"), 23) + 2).alias("re"))
    got = sorted((r["lid"], r["rid"]) for r in rj.range_join_intervals(
        left, right, "ls", "le", "rs", "re", bucket_width=16).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    want = con.execute("""
        WITH l AS (SELECT o_orderkey AS lid, o_orderkey*7 AS ls,
                          o_orderkey*7 + o_orderkey % 30 + 3 AS le
                   FROM orders),
             r AS (SELECT o_orderkey AS rid, o_orderkey*7 + 11 AS rs,
                          o_orderkey*7 + 11 + o_orderkey % 23 + 2 AS re
                   FROM orders)
        SELECT lid, rid FROM l JOIN r ON ls < re AND rs < le
        ORDER BY 1, 2""").fetchall()
    assert len(got) > 0 and got == [tuple(w) for w in want]


def test_plan_is_equi_join_not_cartesian(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 10).alias("pt"))
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        (F.col("o_orderkey") * 9).alias("s"),
        (F.col("o_orderkey") * 9 + 20).alias("e"))
    plan = explain_str(rj.range_join_points(li, od, "pt", "s", "e",
                                            bucket_width=16))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_rj_bucket" in plan  # the quantized key drives the join


def test_rejects_fractional_range_columns(spark):
    pts = spark.createDataFrame([(1, 5.5)], "pid long, ts double")
    iv = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    with pytest.raises(ValueError, match="must be integral"):
        rj.range_join_points(pts, iv, "ts", "s", "e", bucket_width=4)
    ivd = spark.createDataFrame([(1, 0.0, 9.5)], "iid long, s double, e double")
    ptl = spark.createDataFrame([(1, 5)], "pid long, ts long")
    with pytest.raises(ValueError, match="must be integral"):
        rj.range_join_points(ptl, ivd, "ts", "s", "e", bucket_width=4)


def test_hot_bucket_correct_with_and_without_aqe(spark):
    """Skew contract (module docstring): a hot bucket — most points
    piled into one popular window — relies on AQE skew-join splitting
    for BALANCE only; correctness must be identical with AQE disabled
    (where the hot bucket serializes into one oversized task)."""
    n = 20000
    # 95% of points land in [0, 16) → bucket 0 is hot at width 16
    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") % 20 < 19, F.col("id") % 16)
        .otherwise(F.col("id") % 1600).alias("ts"))
    iv = spark.createDataFrame(
        [(0, 0, 16), (1, 4, 12), (2, 100, 200), (3, 0, 1600)],
        "iid long, s long, e long")
    expected = (
        pts.crossJoin(iv.withColumnRenamed("s", "cs")
                      .withColumnRenamed("e", "ce")
                      .withColumnRenamed("iid", "cid"))
        .where((F.col("ts") >= F.col("cs")) & (F.col("ts") < F.col("ce")))
        .groupBy("cid").count().orderBy("cid").collect())
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        results = []
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            out = rj.range_join_points(pts, iv, "ts", "s", "e",
                                       bucket_width=16)
            results.append(out.groupBy("iid").count()
                           .orderBy("iid").collect())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe0)
    got_on = [(r["iid"], r["count"]) for r in results[0]]
    got_off = [(r["iid"], r["count"]) for r in results[1]]
    want = [(r["cid"], r["count"]) for r in expected]
    assert got_on == got_off == want and len(want) == 4


def test_rejects_clashing_column_names(spark):
    left = spark.createDataFrame([(1, 0, 10)], "id long, s long, e long")
    with pytest.raises(ValueError, match="disjoint"):
        rj.range_join_intervals(left, left, "s", "e", "s", "e",
                                bucket_width=4)
