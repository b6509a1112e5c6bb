"""KLL-style mergeable quantile profiles (sketch.kll_profile): the
batch build replayed exactly in DuckDB SQL (stride selection with the
md5-coin offset), the deterministic rank-error guarantee pinned against
exact ranks on fixed and hypothesis-generated multisets (fresh and
merged), exactness below k, merge == whole in the uncompacted case,
quantile element bounds, grouped profiles, and the drift/checks wiring
(bound-free quantile profile + the mergeable quantile gate)."""

import bisect
import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from anomalyzer_spark.functions import checks, drift, sketch


def _key(t):
    return tuple((x is None, x) for x in t)


def _rows(df):
    return sorted(map(tuple, df.collect()), key=_key)


def _meta(profile_rows):
    return [(r["n"], r["err"]) for r in profile_rows if r["item"] is None]


def test_batch_build_duckdb_parity(spark, sf_dir):
    """The closed-form batch build — cumulative distinct-value ranks,
    j = ceil(log2(ceil(n/k))), md5-coin offset o, modular interval
    survivor counts — recomputed digit-for-digit in DuckDB."""
    k = 16
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rows(sketch.kll_profile(docs, ["n_chars"], k=k))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(f"""
WITH counts AS (
  SELECT 'n_chars' AS col, n_chars::DOUBLE AS item, count(*) AS cnt
  FROM read_parquet('{sf_dir}/documents.parquet')
  WHERE n_chars IS NOT NULL GROUP BY 2),
ranked AS (
  SELECT col, item, cnt,
    coalesce(sum(cnt) OVER (PARTITION BY col ORDER BY item
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start,
    sum(cnt) OVER (PARTITION BY col) AS n
  FROM counts),
par AS (
  SELECT *, CASE WHEN (n + {k} - 1) // {k} <= 1 THEN 0
    ELSE ceil(log2((n + {k} - 1) // {k}))::INT END AS j
  FROM ranked),
oc AS (
  SELECT *, (1::BIGINT << j) AS m,
    CASE WHEN j = 0 THEN 0 ELSE
      list_sum(list_transform(range(0, j), l ->
        (('0x' || substr(md5('kll|' || col || '|' || l
          || '|0'), 1, 15))::BIGINT % 2) * (1::BIGINT << l::INT)))
    END AS o
  FROM par),
surv AS (
  SELECT col, j AS level, item,
    ((start + cnt - o + m - 1) // m) - ((start - o + m - 1) // m) AS cnt,
    n, m - 1 AS err
  FROM oc)
SELECT col AS "column", level::INT AS level, item, cnt::BIGINT, n, err
FROM surv WHERE cnt > 0
UNION ALL
SELECT DISTINCT col, NULL, NULL, 0, n, m - 1 FROM oc""").fetchall()),
        key=_key)
    assert got == want and len(got) > 1


def test_rank_guarantee_and_exactness(spark):
    random.seed(13)
    vals = [random.randint(0, 500) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "a long")
    prof = sketch.kll_profile(df, ["a"], k=64)
    rows = prof.collect()
    (n, err), = _meta(rows)
    assert n == 3000 and 0 < err < 2 * 3000 / 64
    # survivor count bounded by k (and > k/2 for a real build)
    surv = sum(r["cnt"] for r in rows if r["item"] is not None)
    assert 32 < surv <= 64
    svals = sorted(vals)
    got = sketch.kll_ranks(prof, [0.0, 100.0, 250.0, 499.0, 500.0]).collect()
    for r in got:
        true = bisect.bisect_right(svals, r["value"])
        assert abs(r["est_rank"] - true) <= r["err"], r
    # n <= k: the profile IS the exact multiset
    tiny = spark.createDataFrame([(i % 5,) for i in range(20)], "a long")
    trows = sketch.kll_profile(tiny, ["a"], k=64).collect()
    assert _meta(trows) == [(20, 0)]
    assert sorted((r["level"], r["item"], r["cnt"]) for r in trows
                  if r["item"] is not None) \
        == [(0, float(v), 4) for v in range(5)]


@pytest.mark.slow
def test_merge_uncompacted_equals_whole_and_guarantee(spark):
    random.seed(29)
    vals = [random.randint(0, 2000) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "a long")
    # uncompacted: tiny shards, k large enough that nothing compacts
    small = spark.createDataFrame([(float(i),) for i in range(30)],
                                  "a double")
    p1 = sketch.kll_profile(small.where(F.col("a") < 15), ["a"], k=64)
    p2 = sketch.kll_profile(small.where(F.col("a") >= 15), ["a"], k=64)
    assert _rows(sketch.merge_kll([p1, p2], k=64)) \
        == _rows(sketch.kll_profile(small, ["a"], k=64))
    # compacted: guarantee composes; merge order never matters
    shards = [sketch.kll_profile(df.where(F.col("a") % 4 == i), ["a"], k=48)
              for i in range(4)]
    m1 = sketch.merge_kll(shards, k=48)
    m2 = sketch.merge_kll(list(reversed(shards)), k=48)
    assert _rows(m1) == _rows(m2)
    rows = m1.collect()
    (n, err), = _meta(rows)
    assert n == 4000
    svals = sorted(vals)
    for r in sketch.kll_ranks(m1, [100.0, 1000.0, 1999.0]).collect():
        true = bisect.bisect_right(svals, r["value"])
        assert abs(r["est_rank"] - true) <= r["err"], r
    # every level within capacity after merge
    per_level = {}
    for r in rows:
        if r["item"] is not None:
            per_level[r["level"]] = per_level.get(r["level"], 0) + r["cnt"]
    assert all(v <= 48 for v in per_level.values()), per_level


@given(st.lists(st.integers(min_value=-50, max_value=50),
                min_size=1, max_size=400))
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_rank_guarantee_hypothesis(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "a long")
    prof = sketch.kll_profile(df, ["a"], k=16)
    rows = prof.collect()
    (n, err), = _meta(rows)
    assert n == len(xs)
    sxs = sorted(xs)
    probes = sorted({xs[0], min(xs), max(xs), 0})
    for r in sketch.kll_ranks(prof, [float(p) for p in probes]).collect():
        true = bisect.bisect_right(sxs, r["value"])
        assert abs(r["est_rank"] - true) <= r["err"], (r, xs)
    # quantile element's rank INTERVAL covers q*n within err + top
    # weight — an element duplicated m times occupies ranks
    # [bisect_left+1, bisect_right], so distance is measured to the
    # interval, not to the strict bisect_right rank (which an
    # exactly-correct answer can "violate" by m; see [0,0,0] below)
    top_w = max((2 ** r["level"] for r in rows if r["item"] is not None),
                default=1)
    for r in sketch.kll_quantiles(prof, [0.5, 0.9]).collect():
        assert _interval_dist(sxs, r["value"], r["q"] * n) \
            <= err + top_w, (r, xs)


def _interval_dist(sorted_xs, value, target):
    """Distance from target to the element's rank interval
    [bisect_left(v), bisect_right(v)] (0 when inside)."""
    lo = bisect.bisect_left(sorted_xs, value)
    hi = bisect.bisect_right(sorted_xs, value)
    return max(lo - target, target - hi, 0.0)


@pytest.mark.slow
def test_quantile_guarantee_duplicates_regression(spark):
    """The r13 falsifier of the old strict-rank statement: on [0,0,0]
    the sketch's median 0.0 is EXACTLY correct, but bisect_right = 3 vs
    q*n = 1.5 — the interval contract is the standard KLL statement
    under duplicates. Pinned non-hypothesis so it always replays."""
    for xs in ([0, 0, 0], [0] * 400, [0] * 399 + [7], [5] * 50 + [9] * 50):
        df = spark.createDataFrame([(x,) for x in xs], "a long")
        prof = sketch.kll_profile(df, ["a"], k=16)
        rows = prof.collect()
        (n, err), = _meta(rows)
        top_w = max((2 ** r["level"] for r in rows
                     if r["item"] is not None), default=1)
        sxs = sorted(xs)
        got = sketch.kll_quantiles(prof, [0.5, 0.9, 1.0]).collect()
        # q=1.0 never dropped even when compaction survivors total < n
        assert {r["q"] for r in got} == {0.5, 0.9, 1.0}, xs
        for r in got:
            assert _interval_dist(sxs, r["value"], r["q"] * n) \
                <= err + top_w, (r, xs)


@pytest.mark.slow
def test_quantile_q1_capped_at_total_weight(spark):
    """ADVICE r13: a compacted profile's survivors total m*ceil((n-o)/m)
    which can undershoot n — q=1.0 (explicitly allowed) must still
    return a row (the max item), and verify_quantile_profile must not
    report value NULL for it."""
    df = spark.createDataFrame([(float(i),) for i in range(5000)],
                               "a double")
    prof = sketch.kll_profile(df, ["a"], k=16)  # heavy compaction
    got = {r["q"]: r["value"] for r in
           sketch.kll_quantiles(prof, [1.0]).collect()}
    assert 1.0 in got and got[1.0] is not None
    # the q=1.0 element is the sketch's max item
    mx = max(r["item"] for r in prof.collect() if r["item"] is not None)
    assert got[1.0] == mx
    # the same drop hits the gate for q < 1: ceil(0.999*5000) = 4995
    # can exceed the survivors' total (as low as n - m + 1) — capped,
    # the gate must report a real value, never NULL/failed
    rep = checks.verify_quantile_profile(
        prof, [checks.quantile_between("a", 0.999, 0.0, 10000.0)]).collect()
    assert rep[0]["value"] is not None and rep[0]["passed"] is True


@pytest.mark.slow
def test_grouped_profile_matches_sliced(spark):
    random.seed(5)
    rows = [(i % 3, random.randint(0, 300)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g long, a long")
    gp = sketch.kll_profile(df, ["a"], k=32, group_cols=["g"])
    for g in range(3):
        sliced = sketch.kll_profile(
            df.where(F.col("g") == g).select("a"), ["a"], k=32)
        got = sorted(
            ((r["column"], r["level"], r["item"], r["cnt"], r["n"], r["err"])
             for r in gp.where(F.col("g") == g).collect()), key=_key)
        assert got == _rows(sliced), g


@pytest.mark.slow
def test_drift_and_checks_wiring(spark):
    df = spark.createDataFrame([(float(i),) for i in range(5000)],
                               "len double")
    prof = drift.quantile_profile(df, ["len"], k=128)
    q = {r["q"]: r["value"] for r in
         drift.quantiles_from_profile(prof, [0.5, 0.99]).collect()}
    assert abs(q[0.5] - 2500) <= 2 * 5000 / 128 + 64
    assert abs(q[0.99] - 4950) <= 2 * 5000 / 128 + 64
    rep = {r["check"]: r for r in checks.verify_quantile_profile(prof, [
        checks.quantile_between("len", 0.5, 2300, 2700),
        checks.quantile_between("len", 0.99, 0, 1000),
    ]).collect()}
    assert rep["0:quantile_between"]["passed"] is True
    assert rep["1:quantile_between"]["passed"] is False
    with pytest.raises(ValueError, match="quantile_between"):
        checks.verify_quantile_profile(prof, [checks.row_count(1)])
    # "p99 this month from shard profiles": merged gate equals whole gate
    shards = [drift.quantile_profile(
        df.where(F.col("len") % 4 == i), ["len"], k=128) for i in range(4)]
    merged = sketch.merge_kll(shards, k=128)
    rep2 = checks.verify_quantile_profile(
        merged, [checks.quantile_between("len", 0.99, 4800, 5000)]).collect()
    assert rep2[0]["passed"] is True


def test_validation_errors(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="k must be"):
        sketch.kll_profile(df, ["a"], k=1)
    with pytest.raises(ValueError, match="at least one column"):
        sketch.kll_profile(df, [])
    with pytest.raises(ValueError, match="clash"):
        sketch.kll_profile(df.withColumn("level", F.lit(1)), ["a"],
                           group_cols=["level"])
    with pytest.raises(ValueError, match="quantiles must be"):
        sketch.kll_quantiles(sketch.kll_profile(df, ["a"]), [0.0])


@pytest.mark.slow
def test_ks_from_profiles(spark):
    """Sketch-level two-sample KS: exact when both profiles are err-0,
    within ks_bound of the true statistic when compacted, near-zero for
    identical corpora, and large for a clear shift."""
    random.seed(41)
    xs = [random.gauss(0, 1) for _ in range(2000)]
    ys = [random.gauss(1.0, 1) for _ in range(2000)]  # shifted by 1 sigma

    def true_ks(a, b):
        sa, sb = sorted(a), sorted(b)
        pts = sorted(set(sa) | set(sb))
        best = 0.0
        for p in pts:
            best = max(best, abs(bisect.bisect_right(sa, p) / len(sa)
                                 - bisect.bisect_right(sb, p) / len(sb)))
        return best

    fa = spark.createDataFrame([(v,) for v in xs], "x double")
    fb = spark.createDataFrame([(v,) for v in ys], "x double")
    # exact regime: k >= n
    pa = sketch.kll_profile(fa, ["x"], k=2048)
    pb = sketch.kll_profile(fb, ["x"], k=2048)
    r = drift.ks_from_profiles(pa, pb).collect()[0]
    assert r["ks_stat"] == pytest.approx(true_ks(xs, ys), abs=1e-6)
    assert r["n_a"] == r["n_b"] == 2000
    # compacted regime: the bound holds
    pa64 = sketch.kll_profile(fa, ["x"], k=64)
    pb64 = sketch.kll_profile(fb, ["x"], k=64)
    r64 = drift.ks_from_profiles(pa64, pb64).collect()[0]
    assert abs(r64["ks_stat"] - true_ks(xs, ys)) <= r64["ks_bound"]
    assert r64["ks_bound"] < 0.3  # k=64 on 2000 rows is still informative
    # identical corpora: statistic within the bound of zero
    rid = drift.ks_from_profiles(
        pa64, sketch.kll_profile(fa, ["x"], k=64)).collect()[0]
    assert rid["ks_stat"] <= rid["ks_bound"]
    # the shifted pair reads clearly above the identical pair
    assert r64["ks_stat"] > 3 * rid["ks_stat"] or rid["ks_stat"] == 0.0


@pytest.mark.slow
def test_ks_from_profiles_discrete_ties(spark):
    """ADVICE r13 regression: cross-side ties. The same item value
    appears as rows from BOTH profiles (and can survive at different
    levels); a partial cumulative at a tie row mixed ECDF_a(x) with
    ECDF_b(x-), overstating |d| — two IDENTICAL discrete corpora with
    mass 0.5 at one value read ks >= 0.5. Pre-aggregated per item, the
    exact regime is exactly 0 for identical corpora and exactly the
    true KS for shifted discrete ones."""
    xs = [0.0] * 500 + [1.0] * 500
    fa = spark.createDataFrame([(v,) for v in xs], "x double")
    pa = sketch.kll_profile(fa, ["x"], k=2048)
    pb = sketch.kll_profile(fa, ["x"], k=2048)
    r = drift.ks_from_profiles(pa, pb).collect()[0]
    # stat exactly 0; the bound keeps its support-resolution term
    # (err 0 + top weight 1)/n per side even in the exact regime
    assert r["ks_stat"] == 0.0
    assert r["ks_bound"] == pytest.approx(2 / 1000, abs=1e-9)
    # shifted discrete: A = {0:500, 1:500}, B = {0:200, 1:800};
    # true KS = |0.5 - 0.2| = 0.3 at x=0 — exact in the err-0 regime
    ys = [0.0] * 200 + [1.0] * 800
    fb = spark.createDataFrame([(v,) for v in ys], "x double")
    pb2 = sketch.kll_profile(fb, ["x"], k=2048)
    r2 = drift.ks_from_profiles(pa, pb2).collect()[0]
    assert r2["ks_stat"] == pytest.approx(0.3, abs=1e-6)
    # compacted regime with heavy ties: |stat - true| <= bound still
    random.seed(43)
    zs = [float(random.randint(0, 5)) for _ in range(2000)]
    ws = [float(random.randint(1, 6)) for _ in range(2000)]
    fz = spark.createDataFrame([(v,) for v in zs], "x double")
    fw = spark.createDataFrame([(v,) for v in ws], "x double")
    pz = sketch.kll_profile(fz, ["x"], k=16)
    pw = sketch.kll_profile(fw, ["x"], k=16)
    rz = drift.ks_from_profiles(pz, pw).collect()[0]
    sz, sw = sorted(zs), sorted(ws)
    true = max(abs(bisect.bisect_right(sz, p) / len(sz)
                   - bisect.bisect_right(sw, p) / len(sw))
               for p in sorted(set(sz) | set(sw)))
    assert abs(rz["ks_stat"] - true) <= rz["ks_bound"]
    # determinism under repartitioning (the old partial-row mix was
    # row-order-dependent)
    rz2 = drift.ks_from_profiles(
        pz.repartition(13), pw.repartition(7)).collect()[0]
    assert rz2["ks_stat"] == rz["ks_stat"]


@pytest.mark.slow
def test_sharded_build_guarantee_and_determinism(spark):
    """kll_profile_sharded: the continuous-column scale path keeps the
    rank guarantee (err carried exactly), is partitioning-independent,
    and its err stays within the same order as the plain build's."""
    random.seed(61)
    vals = [random.random() * 1000 for _ in range(6000)]  # continuous
    df = spark.createDataFrame([(v,) for v in vals], "a double")
    prof = sketch.kll_profile_sharded(df, ["a"], k=64, n_shards=8)
    rows = prof.collect()
    (n, err), = _meta(rows)
    assert n == 6000
    assert err <= 8 * 2 * 6000 / 64  # shard errs sum + merge terms
    svals = sorted(vals)
    for r in sketch.kll_ranks(prof, [100.0, 500.0, 900.0]).collect():
        true = bisect.bisect_right(svals, r["value"])
        assert abs(r["est_rank"] - true) <= r["err"], r
    # partitioning-independent (value-hash salt, not row placement)
    again = sketch.kll_profile_sharded(
        df.repartition(17), ["a"], k=64, n_shards=8)
    assert _rows(again) == _rows(prof)
    # grouped variant keys correctly
    g = spark.createDataFrame([(i % 2, v) for i, v in enumerate(vals)],
                              "g long, a double")
    gp = sketch.kll_profile_sharded(g, ["a"], k=32, n_shards=4,
                                    group_cols=["g"])
    metas = {r["g"]: r["n"] for r in gp.collect() if r["item"] is None}
    assert metas == {0: 3000, 1: 3000}
    with pytest.raises(ValueError, match="n_shards"):
        sketch.kll_profile_sharded(df, ["a"], n_shards=0)
