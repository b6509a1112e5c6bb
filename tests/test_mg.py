"""Misra–Gries mergeable heavy hitters: single-shard profile replayed
exactly in DuckDB SQL, the MG containment/completeness guarantees pinned
against exact counts after merging (including a zipf-skewed synthetic
column and hypothesis-generated multisets), merge order-independence,
and the zero-survivor sentinel."""

from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from anomalyzer_spark.functions import sketch


def _rows(df):
    return sorted(map(tuple, df.collect()),
                  key=lambda t: (t[0], t[1] is None, t[1]))


def test_mg_profile_duckdb_parity(spark, sf_dir):
    """(column, key, cnt, off, n) recomputed in DuckDB: exact counts,
    (k+1)-th-largest threshold with the same tiebreak, subtract, keep
    positive, plus the NULL-key sentinel."""
    k = 3
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rows(sketch.mg_profile(docs, ["lang", "source"], k=k))
    con = duckdb.connect()
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS col, {c}::VARCHAR AS key "
        f"FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE {c} IS NOT NULL" for c in ("lang", "source"))
    want = sorted(map(tuple, con.execute(f"""
WITH raw AS ({legs}),
counts AS (SELECT col, key, count(*) AS cnt FROM raw GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY col ORDER BY cnt DESC, key ASC) AS rnk FROM counts),
thr AS (
  SELECT col, coalesce(max(CASE WHEN rnk = {k + 1} THEN cnt END), 0) AS t
  FROM ranked WHERE rnk <= {k + 1} GROUP BY 1),
n AS (SELECT col, sum(cnt)::BIGINT AS n FROM counts GROUP BY 1),
surv AS (
  SELECT c.col, c.key, c.cnt - t.t AS cnt, t.t AS off, n.n
  FROM counts c JOIN thr t USING (col) JOIN n USING (col)
  WHERE c.cnt - t.t > 0)
SELECT * FROM surv
UNION ALL
SELECT col, NULL, 0, t.t, n.n FROM thr t JOIN n USING (col)
""").fetchall()), key=lambda t: (t[0], t[1] is None, t[1]))
    assert got == want and len(got) > 0


def _exact_counts(df, col):
    return {r["k"]: r["c"] for r in
            df.where(F.col(col).isNotNull())
            .groupBy(F.col(col).cast("string").alias("k"))
            .agg(F.count(F.lit(1)).alias("c")).collect()}


def test_mg_merge_guarantees_on_zipf(spark):
    """Shard → merge over a zipf-skewed column: for every value,
    cnt <= f <= cnt + off; every value with f > off is reported;
    <= k survivors; off <= n/(k+1)."""
    k = 8
    # zipf-ish: value v appears ~ 3000/(v+1) times, 200 distinct values
    df = spark.range(200).select(
        F.col("id").alias("v"),
        F.sequence(F.lit(0), F.floor(F.lit(3000) / (F.col("id") + 1))
                   .cast("int")).alias("_reps")) \
        .select(F.col("v"), F.explode("_reps")).select("v")
    shards = [df.where(F.col("v") % 4 == i) for i in range(4)]
    merged = sketch.merge_mg(
        [sketch.mg_profile(s, ["v"], k=k) for s in shards], k=k)
    rows = merged.collect()
    surv = {r["key"]: r["cnt"] for r in rows if r["key"] is not None}
    off = rows[0]["off"]
    n = rows[0]["n"]
    assert all(r["off"] == off and r["n"] == n for r in rows)
    exact = _exact_counts(df, "v")
    assert n == sum(exact.values())
    assert len(surv) <= k
    # off = sum of 4 shard thresholds (each <= n_i/(k+1)) + the merge
    # threshold (<= n/(k+1)) -> off <= 2n/(k+1)
    assert off <= 2 * n / (k + 1)
    for key, cnt in surv.items():
        assert cnt <= exact[key] <= cnt + off, (key, cnt, exact[key], off)
    for key, f in exact.items():
        if f > off:
            assert key in surv, (key, f, off)


@given(
    data=st.lists(st.integers(min_value=0, max_value=30),
                  min_size=1, max_size=200),
    k=st.integers(min_value=1, max_value=6),
    nshards=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_mg_guarantees_hypothesis(spark, data, k, nshards):
    """For arbitrary multisets, shardings and k: containment
    cnt <= f <= cnt + off, completeness f > off => present, <= k
    survivors per input, exact n, constant off."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)],
                               "i long, v int")
    # shards may legitimately be EMPTY (no sentinel rows) — they merge
    # as zero-contribution inputs
    shards = [sketch.mg_profile(df.where(F.col("i") % nshards == s),
                                ["v"], k=k) for s in range(nshards)]
    rows = sketch.merge_mg(shards, k=k).collect()
    exact = Counter(str(v) for v in data)
    off = rows[0]["off"]
    surv = {r["key"]: r["cnt"] for r in rows if r["key"] is not None}
    assert all(r["off"] == off and r["n"] == len(data) for r in rows)
    assert len(surv) <= k
    for key, cnt in surv.items():
        assert cnt <= exact[key] <= cnt + off
    for key, f in exact.items():
        if f > off:
            assert key in surv


def test_mg_merge_order_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shards = [sketch.mg_profile(
        docs.where(F.col("doc_id") % 3 == i), ["lang", "source"], k=4)
        for i in range(3)]
    a = _rows(sketch.merge_mg(shards, k=4))
    b = _rows(sketch.merge_mg(list(reversed(shards)), k=4))
    assert a == b and len(a) > 0


def test_mg_grouped_profiles(spark, sf_dir):
    """group_cols: each group's rows equal the ungrouped profile of that
    group's slice; grouped merge keys on the group automatically and
    keeps the guarantees per group; clashes rejected."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = sketch.mg_profile(docs, ["source"], k=4, group_cols=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    for lang in langs[:2]:
        slice_prof = _rows(sketch.mg_profile(
            docs.where(F.col("lang") == lang), ["source"], k=4))
        grouped = _rows(prof.where(F.col("lang") == lang).drop("lang"))
        assert grouped == slice_prof
    merged = sketch.merge_mg(
        [sketch.mg_profile(docs.where(F.col("doc_id") % 2 == i),
                           ["source"], k=4, group_cols=["lang"])
         for i in range(2)], k=4)
    rows = merged.collect()
    assert set(merged.columns) == {"lang", "column", "key", "cnt",
                                   "off", "n"}
    for lang in langs:
        crows = [r for r in rows if r["lang"] == lang]
        exact = _exact_counts(docs.where(F.col("lang") == lang), "source")
        off = crows[0]["off"]
        assert crows[0]["n"] == sum(exact.values())
        surv = {r["key"]: r["cnt"] for r in crows if r["key"] is not None}
        assert len(surv) <= 4
        for key, cnt in surv.items():
            assert cnt <= exact[key] <= cnt + off
        for key, f in exact.items():
            if f > off:
                assert key in surv
    with pytest.raises(ValueError, match="clash"):
        sketch.mg_profile(docs, ["source"], group_cols=["cnt"])


def test_mg_zero_survivor_sentinel_and_validation(spark):
    # k+1 values with equal counts: threshold equals every count, all
    # survivors die — the sentinel must still carry (off, n)
    df = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c"] * 5], "s string")
    prof = sketch.mg_profile(df, ["s"], k=2)
    rows = prof.collect()
    assert [r["key"] for r in rows] == [None]
    assert rows[0]["off"] == 5 and rows[0]["n"] == 15
    # and the guarantee still holds through a merge with a skewed shard
    df2 = spark.createDataFrame([("a",)] * 40, "s string")
    merged = sketch.merge_mg(
        [prof, sketch.mg_profile(df2, ["s"], k=2)], k=2)
    surv = {r["key"]: (r["cnt"], r["off"])
            for r in merged.collect() if r["key"] is not None}
    assert "a" in surv
    cnt, off = surv["a"]
    assert cnt <= 45 <= cnt + off
    with pytest.raises(ValueError, match="at least one"):
        sketch.mg_profile(df, [])
    with pytest.raises(ValueError, match="k must be"):
        sketch.mg_profile(df, ["s"], k=0)
    with pytest.raises(ValueError, match="at least one"):
        sketch.merge_mg([])
