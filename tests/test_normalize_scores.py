"""quality.normalize_scores: grouped percent_rank replayed in DuckDB,
global histogram-CDF path replayed in DuckDB and bounded against exact
percent_rank, increment-normalized-against-merged-profile equivalence,
and NULL/degenerate-group semantics."""

import duckdb
import pytest

from pyspark.sql import functions as F

from anomalyzer_spark.functions import drift, quality


def test_grouped_percent_rank_duckdb_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(map(tuple, quality.normalize_scores(
        docs.select("doc_id", "lang",
                    F.col("n_chars").cast("double").alias("s")),
        "s", group_col="lang").collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(f"""
SELECT doc_id, lang, n_chars::DOUBLE AS s,
       percent_rank() OVER (PARTITION BY lang ORDER BY n_chars::DOUBLE)
       AS s_norm
FROM read_parquet('{sf_dir}/documents.parquet')
WHERE n_chars IS NOT NULL""").fetchall()))
    assert got == want and len(got) == 500


def test_global_cdf_duckdb_parity_and_rank_agreement(spark, sf_dir):
    n_bins = 50
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("s"))
    got = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        docs, "s", n_bins=n_bins).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT doc_id, n_chars::DOUBLE AS s "
                f"FROM read_parquet('{sf_dir}/documents.parquet')")
    # replay: derived bounds, equi-width bin counts, strictly-below
    # cumulative + within-bin linear fraction, edge clamps
    want = dict(con.execute(f"""
WITH b AS (SELECT min(s) AS lo, max(s) AS hi FROM d),
binned AS (
  SELECT doc_id, s,
         least({n_bins} - 1, greatest(0,
           floor((s - b.lo) / ((b.hi - b.lo) / {n_bins}))))::INT AS bk,
         b.lo, b.hi, (b.hi - b.lo) / {n_bins} AS w
  FROM d CROSS JOIN b),
cnts AS (SELECT bk, count(*) AS c FROM binned GROUP BY 1),
cume AS (SELECT bk, c,
           coalesce(sum(c) OVER (ORDER BY bk
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         FROM cnts),
tot AS (SELECT sum(c)::DOUBLE AS n FROM cnts)
SELECT doc_id,
  CASE WHEN s <= lo THEN 0.0 WHEN s >= hi THEN 1.0
  ELSE least(1.0, greatest(0.0,
    (below + least(1.0, greatest(0.0, (s - (lo + bk * w)) / w)) * c) / n))
  END AS s_norm
FROM binned JOIN cume USING (bk) CROSS JOIN tot""").fetchall())
    assert len(got) == 500
    for k, v in got.items():
        assert v == pytest.approx(want[k], abs=1e-12), k
    # CDF normalization tracks exact global percent_rank within a bin's
    # mass (the documented resolution) on the fixture distribution
    exact = dict(con.execute(
        "SELECT doc_id, percent_rank() OVER (ORDER BY s) FROM d"
    ).fetchall())
    worst = max(abs(got[k] - exact[k]) for k in got)
    assert worst < 0.08  # bins hold a few % of mass each here


def test_increment_against_merged_profile(spark, sf_dir):
    """The incremental recipe: shard profiles merged == corpus profile,
    so normalizing an increment with the merged profile equals
    normalizing it with a fresh whole-corpus profile."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("s"))
    bounds = {"s": (0.0, 4000.0)}
    shards = [drift.histogram_profile(
        docs.where(F.col("doc_id") % 2 == i), ["s"], n_bins=40,
        bounds=bounds) for i in range(2)]
    merged = drift.merge_profiles(shards)
    whole = drift.histogram_profile(docs, ["s"], n_bins=40, bounds=bounds)
    inc = docs.where(F.col("doc_id") < 100)
    a = sorted(map(tuple, quality.normalize_scores(
        inc, "s", profile=merged, n_bins=40).collect()))
    b = sorted(map(tuple, quality.normalize_scores(
        inc, "s", profile=whole, n_bins=40).collect()))
    assert a == b and len(a) == 100


def test_profile_with_empty_upper_range(spark):
    """A profile built over pinned bounds whose upper range holds no
    data must NOT have its bin count inferred from occupied buckets:
    scores have to map through the BUILD-TIME bin width. Regression for
    the max(bucket)+1 inference bug (a score at true CDF 0.5 came back
    ~0.25 because width doubled)."""
    docs = spark.createDataFrame(
        [(i, i / 200.0) for i in range(101)],  # scores 0.0 .. 0.5
        "doc_id long, s double")
    prof = drift.histogram_profile(
        docs, ["s"], n_bins=100, bounds={"s": (0.0, 1.0)})
    # only buckets 0..50 are occupied; n_bins carries the truth
    got = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        docs, "s", profile=prof, n_bins=100).collect()}
    fresh = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        docs, "s", bounds=(0.0, 1.0), n_bins=100).collect()}
    assert got == fresh
    # median score (0.25 = true CDF 0.5) normalizes near 0.5, not 0.25
    assert got[50] == pytest.approx(0.5, abs=0.02)
    # declared n_bins smaller than the profile's occupied range raises
    with pytest.raises(ValueError, match="n_bins"):
        quality.normalize_scores(docs, "s", profile=prof, n_bins=40)


def test_profile_built_with_fewer_bins_is_read_back(spark):
    """ADVICE r13: a profile built with FEWER bins than the passed (or
    old default 100) count used to pass the top >= nb guard and
    silently misalign every bucket width. The persisted n_bins column
    is now authoritative; a conflicting explicit n_bins= raises in
    BOTH directions."""
    docs = spark.createDataFrame(
        [(i, i / 100.0) for i in range(101)], "doc_id long, s double")
    prof = drift.histogram_profile(docs, ["s"], n_bins=50,
                                   bounds={"s": (0.0, 1.0)})
    got = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        docs, "s", profile=prof).collect()}
    fresh = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        docs, "s", bounds=(0.0, 1.0), n_bins=50).collect()}
    assert got == fresh
    assert got[50] == pytest.approx(0.5, abs=0.03)
    # larger-than-build count now raises instead of misaligning
    with pytest.raises(ValueError, match="n_bins"):
        quality.normalize_scores(docs, "s", profile=prof, n_bins=100)


def test_null_and_degenerate_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 7.0), (3, "a", None),
         (4, "b", 9.0)],
        "doc_id long, g string, s double")
    rows = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        df, "s", group_col="g").collect()}
    assert rows[1] == 0.0 and rows[2] == 1.0  # ranked among non-nulls
    assert rows[3] is None
    assert rows[4] == 0.0  # single-row group
    # global path: constant column -> lo == hi -> 0/1 edges only
    const = spark.createDataFrame(
        [(i, 3.0) for i in range(10)], "doc_id long, s double")
    out = {r["doc_id"]: r["s_norm"] for r in quality.normalize_scores(
        const, "s", n_bins=10).collect()}
    assert set(out.values()) == {0.0}
    with pytest.raises(ValueError, match="no buckets"):
        quality.normalize_scores(
            spark.createDataFrame([(1, None)], "doc_id long, s double"),
            "s")