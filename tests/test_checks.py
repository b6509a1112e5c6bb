"""Data-quality checks (functions/checks.py): DuckDB value parity over
the driver fixtures, semantic pins on hand-built edge frames, and the
one-pass plan-shape guarantee."""

import duckdb
import pytest

from anomalyzer_spark.functions import checks as C


def _orders_checks():
    return [
        C.completeness("o_custkey"),
        C.uniqueness("o_orderkey", exact=True),
        C.in_range("o_totalprice", lo=0, hi=1e6, min_ratio=0.99),
        C.in_set("o_orderstatus", ["O", "F", "P"]),
        C.matches("o_orderpriority", r"[1-5]-[A-Z]+"),
        C.mean_between("o_totalprice", 100.0, 500000.0),
        C.row_count(min_rows=1),
        C.satisfies("o_totalprice > 0", "price_positive"),
    ]


def test_verify_checks_duckdb_parity(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = [tuple(r) for r in
           C.verify_checks(df, _orders_checks()).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    want = con.execute("""
WITH m AS (SELECT
  count(o_custkey)::DOUBLE / count(*) AS m0,
  count(DISTINCT o_orderkey)::DOUBLE / count(o_orderkey) AS m1,
  count(CASE WHEN o_totalprice BETWEEN 0 AND 1e6 THEN 1 END)::DOUBLE
    / count(o_totalprice) AS m2,
  count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)::DOUBLE
    / count(o_orderstatus) AS m3,
  count(CASE WHEN regexp_full_match(o_orderpriority, '[1-5]-[A-Z]+')
        THEN 1 END)::DOUBLE / count(o_orderpriority) AS m4,
  avg(o_totalprice) AS m5,
  count(*)::DOUBLE AS m6,
  count(CASE WHEN o_totalprice > 0 THEN 1 END)::DOUBLE / count(*) AS m7
  FROM orders)
SELECT '0:completeness', 'o_custkey', 'non_null_ratio', m0, 1.0::DOUBLE,
       m0 >= 1.0 FROM m
UNION ALL SELECT '1:uniqueness', 'o_orderkey', 'distinct_ratio', m1,
       1.0::DOUBLE, m1 >= 1.0 FROM m
UNION ALL SELECT '2:in_range', 'o_totalprice', 'in_range_ratio', m2,
       0.99::DOUBLE, m2 >= 0.99 FROM m
UNION ALL SELECT '3:in_set', 'o_orderstatus', 'in_set_ratio', m3, 1.0::DOUBLE,
       m3 >= 1.0 FROM m
UNION ALL SELECT '4:matches', 'o_orderpriority', 'match_ratio', m4,
       1.0::DOUBLE, m4 >= 1.0 FROM m
UNION ALL SELECT '5:mean_between', 'o_totalprice', 'mean', m5, NULL::DOUBLE,
       m5 BETWEEN 100.0 AND 500000.0 FROM m
UNION ALL SELECT '6:row_count', NULL, 'rows', m6, NULL::DOUBLE, m6 >= 1 FROM m
UNION ALL SELECT '7:satisfies', 'price_positive', 'satisfied_ratio',
       m7, 1.0::DOUBLE, m7 >= 1.0 FROM m""").fetchall()
    assert len(got) == 8
    for g, w in zip(got, [tuple(w) for w in want]):
        assert g[:3] == w[:3] and g[4:] == w[4:]
        # value: float summation order differs between engines for avg
        assert g[3] == pytest.approx(w[3], rel=1e-9)


def test_single_pass_plan(spark, sf_dir):
    # the contract: N checks = ONE scan + ONE exchange (plus the extra
    # agg phase an exact-distinct adds — use the HLL default here).
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = C.verify_checks(df, [
        C.completeness("o_custkey"),
        C.uniqueness("o_orderkey"),          # approx (HLL) default
        C.in_range("o_totalprice", lo=0),
        C.row_count(min_rows=1),
    ])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1


def test_null_and_empty_semantics(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "b"), (None, "c")], "a long, s string")
    rep = {r["check"]: r for r in C.verify_checks(df, [
        C.completeness("a", 0.5),
        C.in_range("a", lo=1, hi=1),   # over NON-NULL a only: 1 of 2
        C.matches("s", "b", 0.5),      # over non-null s: 1 of 2
    ]).collect()}
    assert rep["0:completeness"]["value"] == pytest.approx(2 / 3)
    assert rep["0:completeness"]["passed"]
    assert rep["1:in_range"]["value"] == pytest.approx(0.5)
    assert rep["2:matches"]["value"] == pytest.approx(0.5)
    assert rep["2:matches"]["passed"]

    # empty frame: ratio checks FAIL loudly (0.0, not vacuous pass);
    # mean is NULL -> failed; row_count(min_rows=0) passes.
    empty = df.where("1=0")
    rep = {r["check"]: r for r in C.verify_checks(empty, [
        C.completeness("a"),
        C.mean_between("a", 0, 10),
        C.row_count(min_rows=0),
    ]).collect()}
    assert rep["0:completeness"]["value"] == 0.0
    assert not rep["0:completeness"]["passed"]
    assert rep["1:mean_between"]["value"] is None
    assert not rep["1:mean_between"]["passed"]
    assert rep["2:row_count"]["passed"]


def test_matches_is_full_match(spark):
    # 'matches' anchors the pattern (full-value conformance, not search)
    df = spark.createDataFrame([("ab",), ("zab",), ("abz",)], "s string")
    rep = C.verify_checks(df, [C.matches("s", "ab", 0.0)]).collect()[0]
    assert rep["value"] == pytest.approx(1 / 3)


def test_exact_vs_approx_uniqueness(spark):
    df = spark.range(0, 2000).selectExpr("id % 1000 AS k")
    exact = C.verify_checks(df, [C.uniqueness("k", exact=True)]) \
        .collect()[0]["value"]
    approx = C.verify_checks(df, [C.uniqueness("k")]).collect()[0]["value"]
    assert exact == pytest.approx(0.5)
    assert approx == pytest.approx(0.5, rel=0.1)  # HLL default rsd ~2.3%


def test_spec_validation():
    with pytest.raises(ValueError):
        C.in_range("x")
    with pytest.raises(ValueError):
        C.in_set("x", [])
    with pytest.raises(ValueError):
        C.verify_checks(None, [])


# ---------------------------------------------------------------------------
# per-group checks
# ---------------------------------------------------------------------------

def test_verify_checks_by_duckdb_parity(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = C.verify_checks_by(df, ["o_orderstatus"], [
        C.completeness("o_custkey"),
        C.in_range("o_totalprice", lo=0, hi=1e6, min_ratio=0.99),
        C.mean_between("o_totalprice", 100.0, 500000.0),
        C.row_count(min_rows=10),
    ])
    got = sorted(tuple(r) for r in rep.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    want = con.execute("""
WITH m AS (SELECT o_orderstatus,
  count(o_custkey)::DOUBLE / count(*) AS m0,
  count(CASE WHEN o_totalprice BETWEEN 0 AND 1e6 THEN 1 END)::DOUBLE
    / count(o_totalprice) AS m1,
  avg(o_totalprice) AS m2,
  count(*)::DOUBLE AS m3
  FROM orders GROUP BY 1)
SELECT o_orderstatus, '0:completeness', 'o_custkey', 'non_null_ratio',
       m0, 1.0::DOUBLE, m0 >= 1.0 FROM m
UNION ALL SELECT o_orderstatus, '1:in_range', 'o_totalprice',
       'in_range_ratio', m1, 0.99::DOUBLE, m1 >= 0.99 FROM m
UNION ALL SELECT o_orderstatus, '2:mean_between', 'o_totalprice',
       'mean', m2, NULL::DOUBLE,
       coalesce(m2 BETWEEN 100.0 AND 500000.0, false) FROM m
UNION ALL SELECT o_orderstatus, '3:row_count', NULL, 'rows', m3,
       NULL::DOUBLE, m3 >= 10 FROM m""").fetchall()
    want = sorted(tuple(w) for w in want)
    assert len(got) == len(want) and len(got) >= 12  # >=3 statuses x 4
    for g, w in zip(got, want):
        assert g[:4] == w[:4] and g[5:] == w[5:]
        assert g[4] == pytest.approx(w[4], rel=1e-9)


def test_verify_checks_by_single_shuffle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = C.verify_checks_by(df, ["o_orderstatus"], [
        C.completeness("o_custkey"), C.row_count(min_rows=1)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1


def test_verify_checks_by_requires_keys(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        C.verify_checks_by(df, [], [C.row_count()])


# ---------------------------------------------------------------------------
# bounded-metric checks (min/max/stddev/quantile)
# ---------------------------------------------------------------------------

def test_bounded_metrics_duckdb_parity(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = {r["check"]: r for r in C.verify_checks(df, [
        C.min_between("o_totalprice", 0, 1e4),
        C.max_between("o_totalprice", 1e5, 1e6),
        C.stddev_between("o_totalprice", 1.0, 1e6),
        C.quantile_between("o_totalprice", 0.5, 1e5, 4e5),
    ]).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    mn, mx, sd, med = con.execute(
        "SELECT min(o_totalprice), max(o_totalprice),"
        " stddev_samp(o_totalprice),"
        " quantile_cont(o_totalprice, 0.5) FROM orders").fetchone()
    assert rep["0:min_between"]["value"] == mn
    assert rep["1:max_between"]["value"] == mx
    assert rep["2:stddev_between"]["value"] == pytest.approx(sd, rel=1e-9)
    assert rep["3:quantile_between"]["value"] == pytest.approx(med, rel=1e-12)
    assert all(r["threshold"] is None for r in rep.values())


def test_stddev_collapse_and_quantile_semantics(spark):
    const = spark.range(50).selectExpr("7.0 AS x")
    rep = C.verify_checks(const, [
        C.stddev_between("x", 0.1, 10)]).collect()[0]
    assert rep["value"] == 0.0 and not rep["passed"]  # variance collapse

    df = spark.createDataFrame([(float(i),) for i in range(1, 5)], "x double")
    q = C.verify_checks(df, [C.quantile_between("x", 0.5, 0, 10)]) \
        .collect()[0]
    assert q["value"] == pytest.approx(2.5)  # linear interpolation

    approx = C.verify_checks(df, [
        C.quantile_between("x", 0.5, 0, 10, exact=False)]).collect()[0]
    assert 2.0 <= approx["value"] <= 3.0  # GK sketch, documented accuracy

    with pytest.raises(ValueError):
        C.quantile_between("x", 1.5, 0, 1)


def test_top_share_duckdb_parity(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    checks = [C.top_share("o_orderstatus", 0.9),
              C.top_share("o_orderpriority", 0.9, k=2),
              C.completeness("o_custkey")]
    got = {r["check"]: r for r in C.verify_checks(df, checks).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")

    def duck_share(col, k):
        return con.execute(f"""
WITH cnts AS (SELECT {col} AS v, count(*)::BIGINT AS c FROM orders
              WHERE {col} IS NOT NULL GROUP BY {col}),
rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, v ASC) AS rn
       FROM cnts)
SELECT sum(CASE WHEN rn <= {k} THEN c END)::DOUBLE / sum(c) FROM rk
""").fetchone()[0]

    r0 = got["0:top_share"]
    assert r0["metric"] == "top1_share" and r0["threshold"] is None
    assert r0["value"] == pytest.approx(duck_share("o_orderstatus", 1))
    assert r0["passed"] == (r0["value"] <= 0.9)
    r1 = got["1:top_share"]
    assert r1["metric"] == "top2_share"
    assert r1["value"] == pytest.approx(duck_share("o_orderpriority", 2))
    # the plain checks still ride along unchanged
    assert got["2:completeness"]["metric"] == "non_null_ratio"


def test_top_share_grouped_and_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
         ("b", "p"), ("b", "q"),
         ("c", None), ("c", None)],
        "grp string, v string")
    rep = {(r["grp"], r["check"]): r for r in C.verify_checks_by(
        df, ["grp"], [C.top_share("v", 0.6)]).collect()}
    assert rep[("a", "0:top_share")]["value"] == pytest.approx(0.75)
    assert rep[("a", "0:top_share")]["passed"] is False
    assert rep[("b", "0:top_share")]["value"] == pytest.approx(0.5)
    assert rep[("b", "0:top_share")]["passed"] is True
    # all-NULL group: no values, no skew -> 0.0 and passes
    assert rep[("c", "0:top_share")]["value"] == 0.0
    assert rep[("c", "0:top_share")]["passed"] is True


def test_top_share_tiebreak_and_k_exceeds_distinct(spark):
    # counts tie (x: 2, y: 2): value asc wins the cut -> top1 is 'x'
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("y",), ("z",)], "v string")
    rep = C.verify_checks(df, [C.top_share("v", 1.0),
                               C.top_share("v", 1.0, k=10)]).collect()
    assert rep[0]["value"] == pytest.approx(2 / 5)
    # k beyond the distinct count covers everything
    assert rep[1]["value"] == pytest.approx(1.0)


def test_top_share_only_checks_and_empty_frame(spark):
    df = spark.createDataFrame([], "v string")
    rep = C.verify_checks(df, [C.top_share("v", 0.5)]).collect()
    assert rep[0]["value"] == 0.0 and rep[0]["passed"] is True


def test_non_top_share_checks_keep_single_pass_plan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = C.verify_checks(df, [C.completeness("o_custkey"),
                               C.mean_between("o_totalprice", 0, 1e9),
                               C.top_share("o_orderstatus", 0.9)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # base pass + the per-value count pass: exactly two scans, and the
    # top-share frame joins in broadcast (1-row side), no sort-merge join
    assert plan.count("Scan parquet") == 2
    assert "SortMergeJoin" not in plan


def test_top_share_high_cardinality_no_single_partition_window(spark, sf_dir):
    # corpus-cardinality column (o_orderkey is unique): the ungrouped cut
    # must plan TakeOrderedAndProject, never an unpartitioned ranking
    # window that funnels the whole distinct-value frame through one task
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = C.verify_checks(df, [C.top_share("o_orderkey", 0.5, k=3)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    row = rep.collect()[0]
    n = df.count()
    # every value unique -> top-3 share is exactly 3/n
    assert row["value"] == pytest.approx(3 / n)
    assert row["passed"] is True


def test_top_share_grouped_null_key_group(spark):
    # a NULL group KEY is a real group: its skew must be measured, not
    # silently coalesced to 0.0 through a null-unsafe join
    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), (None, "x"), (None, "y"),
         ("a", "p"), ("a", "q")],
        "grp string, v string")
    rep = {(r["grp"], r["check"]): r for r in C.verify_checks_by(
        df, ["grp"], [C.top_share("v", 0.6)]).collect()}
    assert rep[(None, "0:top_share")]["value"] == pytest.approx(0.75)
    assert rep[(None, "0:top_share")]["passed"] is False
    assert rep[("a", "0:top_share")]["value"] == pytest.approx(0.5)
