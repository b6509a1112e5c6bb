"""Bottom-k (KMV) coordinated samples: DuckDB parity of the profile,
EXACT merge==whole (the canonical-merge property, any sharding),
Jaccard estimation against known overlaps (exact below k, bounded error
above), the KMV distinct estimate, and grouped profiles."""

import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from anomalyzer_spark.functions import sketch


def _rows(df):
    return sorted(map(tuple, df.collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


def test_profile_duckdb_parity(spark, sf_dir):
    k = 8
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rows(sketch.bottomk_profile(docs, ["lang", "source"], k=k))
    con = duckdb.connect()
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS col, {c}::VARCHAR AS key "
        f"FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE {c} IS NOT NULL" for c in ("lang", "source"))
    want = sorted(map(tuple, con.execute(f"""
WITH d AS (SELECT DISTINCT col, key FROM ({legs})),
h AS (SELECT col, ('0x' || substr(md5('bk|' || key), 1, 15))::BIGINT AS h,
             key FROM d),
r AS (SELECT *, row_number() OVER (PARTITION BY col ORDER BY h) AS rnk
      FROM h)
SELECT col, h, key FROM r WHERE rnk <= {k}""").fetchall()))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_merge_equals_whole_exactly(spark):
    random.seed(3)
    vals = [f"v{random.randint(0, 5000)}" for _ in range(8000)]
    df = spark.createDataFrame([(v,) for v in vals], "a string")
    whole = _rows(sketch.bottomk_profile(df, ["a"], k=64))
    for nshards in (2, 5):
        shards = [sketch.bottomk_profile(
            df.where(F.crc32(F.col("a")) % nshards == i), ["a"], k=64)
            for i in range(nshards)]
        assert _rows(sketch.merge_bottomk(shards, k=64)) == whole, nshards
    # re-merging a shard is a no-op (idempotent)
    assert _rows(sketch.merge_bottomk(
        [sketch.merge_bottomk(shards, k=64), shards[0]], k=64)) == whole


def test_jaccard_exact_below_k_and_estimates_above(spark):
    # exact regime: both sides < k distinct
    a = spark.createDataFrame([(f"x{i}",) for i in range(30)], "a string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(15, 45)],
                              "a string")
    pa = sketch.bottomk_profile(a, ["a"], k=256)
    pb = sketch.bottomk_profile(b, ["a"], k=256)
    r = sketch.bottomk_jaccard(pa, pb, k=256).collect()[0]
    assert r["j_est"] == pytest.approx(15 / 45, abs=1e-6)  # round(.,6)
    assert r["n_shared"] == 15 and r["k_used"] == 45
    # estimation regime: |A|=|B|=4000, |A∩B|=2000 -> J = 1/3
    big_a = spark.createDataFrame(
        [(f"s{i}",) for i in range(4000)], "a string")
    big_b = spark.createDataFrame(
        [(f"s{i}",) for i in range(2000, 6000)], "a string")
    ja = sketch.bottomk_jaccard(
        sketch.bottomk_profile(big_a, ["a"], k=512),
        sketch.bottomk_profile(big_b, ["a"], k=512), k=512).collect()[0]
    # stderr ~ sqrt(J(1-J)/k) ~ 0.021; allow 5 sigma
    assert abs(ja["j_est"] - 1 / 3) < 0.11, ja
    # KMV distinct estimate within ~5/sqrt(k) relative error
    est = {tuple(): None}
    for r in sketch.bottomk_estimate(
            sketch.bottomk_profile(big_a, ["a"], k=512), k=512).collect():
        assert abs(r["n_est"] - 4000) / 4000 < 0.25, r
    # exact below k
    small = sketch.bottomk_estimate(pa, k=256).collect()[0]
    assert small["n_est"] == 30.0


def test_jaccard_omits_one_sided_columns(spark):
    """ADVICE r13 regression: a column profiled on only ONE side must be
    OMITTED (docstring contract), not emitted as j_est=0.0 — that would
    be indistinguishable from a genuinely disjoint pair and read as a
    false 'no overlap' for a merely-unprofiled column."""
    a = spark.createDataFrame([(f"x{i}", f"y{i}") for i in range(20)],
                              "a string, b string")
    pa = sketch.bottomk_profile(a, ["a", "b"], k=64)
    pb = sketch.bottomk_profile(a, ["a"], k=64)  # b unprofiled on side B
    rows = sketch.bottomk_jaccard(pa, pb, k=64).collect()
    assert {r["column"] for r in rows} == {"a"}
    assert rows[0]["j_est"] == pytest.approx(1.0)
    # a genuinely disjoint shared column still reports j_est = 0.0
    c = spark.createDataFrame([(f"z{i}",) for i in range(20)], "a string")
    rd = sketch.bottomk_jaccard(
        pb, sketch.bottomk_profile(c, ["a"], k=64), k=64).collect()
    assert len(rd) == 1 and rd[0]["j_est"] == 0.0


@given(st.sets(st.integers(min_value=0, max_value=200),
               min_size=1, max_size=120))
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_canonical_merge_hypothesis(spark, xs):
    df = spark.createDataFrame([(str(x),) for x in xs], "a string")
    whole = _rows(sketch.bottomk_profile(df, ["a"], k=16))
    shards = [sketch.bottomk_profile(
        df.where(F.col("a").cast("int") % 3 == i), ["a"], k=16)
        for i in range(3)]
    assert _rows(sketch.merge_bottomk(
        [s for s in shards], k=16)) == whole
    # duplicates never change the sketch (set semantics)
    dup = df.unionByName(df)
    assert _rows(sketch.bottomk_profile(dup, ["a"], k=16)) == whole


def test_grouped_and_validation(spark):
    df = spark.createDataFrame(
        [(i % 2, f"v{i % 40}") for i in range(500)], "g long, a string")
    gp = sketch.bottomk_profile(df, ["a"], k=8, group_cols=["g"])
    assert set(gp.columns) == {"g", "column", "h", "key"}
    for g in (0, 1):
        sliced = sketch.bottomk_profile(
            df.where(F.col("g") == g).select("a"), ["a"], k=8)
        got = sorted((r["column"], r["h"], r["key"])
                     for r in gp.where(F.col("g") == g).collect())
        assert got == sorted(map(tuple, sliced.collect()))
    with pytest.raises(ValueError, match="at least one column"):
        sketch.bottomk_profile(df, [])
    with pytest.raises(ValueError, match="k must be"):
        sketch.bottomk_profile(df, ["a"], k=0)
    with pytest.raises(ValueError, match="clash"):
        sketch.bottomk_profile(df.withColumn("h", F.lit(1)), ["a"],
                               group_cols=["h"])
