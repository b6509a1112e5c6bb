"""Mergeable HLL sketches: register frame replayed exactly in DuckDB,
merge(shards) == profile(whole) pinned to frame equality, estimator
pinned against an independent Python reference and against exact
distinct counts (small range near-exact, large range within the
published error bound)."""

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from anomalyzer_spark.functions import sketch


def _est_py(regs, p):
    """Independent reference estimator from {reg: rho} (same documented
    formula: exact scaled-integer harmonic sum, then floats)."""
    m, w = 2 ** p, 60 - p
    occ = len(regs)
    ssum = sum(2 ** (w + 1 - r) for r in regs.values())
    scale = 2.0 ** (61 - p)
    inv = (float(ssum) + (m - occ) * scale) / scale
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / inv
    v = m - occ
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def test_registers_duckdb_parity(spark, sf_dir):
    """(column, p, reg, rho) recomputed digit-for-digit in DuckDB SQL
    over three fixture columns (string and bigint typed)."""
    p, w = 8, 52
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(map(tuple, sketch.hll_profile(
        docs, ["lang", "source", "doc_id"], p=p).collect()))
    con = duckdb.connect()
    legs = []
    for c in ("lang", "source", "doc_id"):
        legs.append(f"""
SELECT '{c}' AS "column",
       ('0x' || substr(md5('hll|' || {c}::VARCHAR), 1, 15))::BIGINT AS h
FROM read_parquet('{sf_dir}/documents.parquet') WHERE {c} IS NOT NULL""")
    # the leading-zero rank as chained smear CTEs (integer-exact, like
    # the Spark side — no float log2 anywhere)
    want = sorted(map(tuple, con.execute(f"""
WITH raw AS ({' UNION ALL '.join(legs)}),
bits AS (
  SELECT "column", h >> {w} AS reg, h & {(1 << w) - 1} AS s0 FROM raw),
s1 AS (SELECT "column", reg, s0 | (s0 >> 1) AS s FROM bits),
s2 AS (SELECT "column", reg, s | (s >> 2) AS s FROM s1),
s3 AS (SELECT "column", reg, s | (s >> 4) AS s FROM s2),
s4 AS (SELECT "column", reg, s | (s >> 8) AS s FROM s3),
s5 AS (SELECT "column", reg, s | (s >> 16) AS s FROM s4),
s6 AS (SELECT "column", reg, s | (s >> 32) AS s FROM s5)
SELECT "column", {p} AS p, reg, max({w} + 1 - bit_count(s)) AS rho
FROM s6 GROUP BY 1, 2, 3""").fetchall()))
    assert got == want and len(got) > 0


def test_merge_equals_whole_and_idempotent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    whole = sorted(map(tuple, sketch.hll_profile(
        docs, ["lang", "doc_id"], p=10).collect()))
    shards = [sketch.hll_profile(
        docs.where(F.col("doc_id") % 3 == i), ["lang", "doc_id"], p=10)
        for i in range(3)]
    merged = sorted(map(tuple, sketch.merge_hll(shards).collect()))
    assert merged == whole
    # re-merging a shard (at-least-once replay) changes nothing
    again = sorted(map(tuple, sketch.merge_hll(
        shards + [shards[1]]).collect()))
    assert again == whole


def test_estimate_reference_and_error_bound(spark):
    n = 100_000
    df = spark.range(n).select(F.col("id").alias("v"))
    prof = sketch.hll_profile(df, ["v"], p=12)
    regs = {r["reg"]: r["rho"] for r in prof.collect()}
    [row] = sketch.hll_estimate(prof).collect()
    assert row["n_est"] == pytest.approx(_est_py(regs, 12), rel=1e-12)
    # 3-sigma bound for p=12: 3 * 1.04 / sqrt(4096) ~ 4.9%
    assert abs(row["n_est"] - n) / n < 0.05


def test_estimate_small_range_near_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {r["c"]: r["n"] for r in docs.select(
        F.lit("lang").alias("c"),
        F.countDistinct("lang").alias("n")).unionByName(docs.select(
            F.lit("source").alias("c"),
            F.countDistinct("source").alias("n"))).collect()}
    est = {r["column"]: r["n_est"] for r in sketch.hll_estimate(
        sketch.hll_profile(docs, ["lang", "source"], p=12)).collect()}
    for c, n in exact.items():
        # linear-counting regime: tiny cardinalities resolve exactly
        assert round(est[c]) == n, (c, est[c], n)


def test_profile_parquet_round_trip(spark, sf_dir, tmp_path):
    """The persistence story is plain parquet: write shard profiles,
    read them back cold (schema from the files), merge + estimate —
    byte-identical frames, same estimate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i in range(2):
        sketch.hll_profile(
            docs.where(F.col("doc_id") % 2 == i), ["doc_id"], p=12) \
            .write.parquet(str(tmp_path / f"shard{i}"))
    back = [spark.read.parquet(str(tmp_path / f"shard{i}"))
            for i in range(2)]
    whole = sorted(map(tuple, sketch.hll_profile(
        docs, ["doc_id"], p=12).collect()))
    assert sorted(map(tuple, sketch.merge_hll(back).collect())) == whole
    [row] = sketch.hll_estimate(sketch.merge_hll(back)).collect()
    assert round(row["n_est"]) == pytest.approx(500, abs=25)


def test_grouped_profiles(spark, sf_dir):
    """group_cols: each group's register rows equal the ungrouped
    profile of that group's slice; grouped merge == grouped whole;
    estimate/overlap key per group; schema clashes rejected."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = sketch.hll_profile(docs, ["doc_id"], p=10,
                              group_cols=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert sorted(r["lang"] for r in
                  prof.select("lang").distinct().collect()) == sorted(langs)
    for lang in langs[:2]:
        slice_prof = sorted(map(tuple, sketch.hll_profile(
            docs.where(F.col("lang") == lang), ["doc_id"],
            p=10).collect()))
        grouped = sorted(map(tuple, prof.where(F.col("lang") == lang)
                             .drop("lang").collect()))
        assert grouped == slice_prof
    # grouped merge == grouped whole (frame equality)
    shards = [sketch.hll_profile(
        docs.where(F.col("doc_id") % 2 == i), ["doc_id"], p=10,
        group_cols=["lang"]) for i in range(2)]
    assert sorted(map(tuple, sketch.merge_hll(shards).collect())) \
        == sorted(map(tuple, prof.collect()))
    # per-group estimates sum to ~the corpus (doc_id unique per row)
    ests = sketch.hll_estimate(prof)
    assert set(ests.columns) == {"lang", "column", "p", "n_est"}
    assert abs(sum(r["n_est"] for r in ests.collect()) - 500) < 25
    # grouped overlap joins on the group key too
    ov = sketch.hll_overlap(shards[0], shards[1])
    assert "lang" in ov.columns and ov.count() == len(langs)
    with pytest.raises(ValueError, match="clash"):
        sketch.hll_profile(docs, ["doc_id"], group_cols=["reg"])


@pytest.mark.slow
def test_overlap_inclusion_exclusion(spark):
    """Two overlapping ranges: intersection estimate within the
    documented union-relative bound; disjoint case clamps near 0;
    small-range case resolves exactly."""
    a = sketch.hll_profile(
        spark.range(0, 60_000).select(F.col("id").alias("v")), ["v"])
    b = sketch.hll_profile(
        spark.range(40_000, 100_000).select(F.col("id").alias("v")), ["v"])
    [row] = sketch.hll_overlap(a, b).collect()
    # union = 100k, true intersection = 20k; 3 estimates compound, so
    # allow ~4 sigma of the union (4 * 1.04/sqrt(4096) * 100k ~ 6.5k)
    assert abs(row["n_intersection"] - 20_000) < 6_500
    assert abs(row["n_union"] - 100_000) / 100_000 < 0.05
    # disjoint: clamped to >= 0 and small relative to the union
    c = sketch.hll_profile(
        spark.range(200_000, 260_000).select(F.col("id").alias("v")), ["v"])
    [rd] = sketch.hll_overlap(a, c).collect()
    assert 0.0 <= rd["n_intersection"] < 6_500
    # linear-counting regime: tiny sets overlap near-exactly (three
    # linear-counting estimates compound, so the result can land one
    # off the true 10 — deterministic, but not integral)
    s1 = sketch.hll_profile(
        spark.range(0, 30).select(F.col("id").alias("v")), ["v"])
    s2 = sketch.hll_profile(
        spark.range(20, 50).select(F.col("id").alias("v")), ["v"])
    [rs] = sketch.hll_overlap(s1, s2).collect()
    assert abs(rs["n_intersection"] - 10) <= 1.5


def test_validation_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, s string")
    with pytest.raises(ValueError, match="at least one"):
        sketch.hll_profile(df, [])
    with pytest.raises(ValueError, match="4 <= p"):
        sketch.hll_profile(df, ["s"], p=2)
    with pytest.raises(ValueError, match="at least one"):
        sketch.merge_hll([])
    # NULLs contribute nothing: the profile equals the not-null profile
    a = sorted(map(tuple, sketch.hll_profile(df, ["s"], p=8).collect()))
    b = sorted(map(tuple, sketch.hll_profile(
        df.where(F.col("s").isNotNull()), ["s"], p=8).collect()))
    assert a == b
    # mixed p for one column is rejected
    with pytest.raises(ValueError, match="inconsistent p"):
        sketch.merge_hll([sketch.hll_profile(df, ["s"], p=8),
                          sketch.hll_profile(df, ["s"], p=10)])
