"""Property tests (SURVEY.md §5.2.3): invariances the spec guarantees."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark import AnomalyzerConf, detect
from anomalyzer_spark.operators.rolling import detect_rolling

DET = AnomalyzerConf(active_size=2, methods=("magnitude", "fence", "cdf"),
                     upper_bound=50.0, lower_bound=0.0)
MC = AnomalyzerConf(active_size=2, perm_count=100)


def _random_walk(spark, n_keys=6, n=40, seed=9):
    """Bounded Gaussian walks (mirrors reference randomWalk,
    anomalyze_test.go:14-26), long format."""
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        x = 0.5
        for t in range(n):
            x = min(max(x + rng.normal(0, 0.1), 0.0), 1.0)
            rows.append((f"w{k}", t, 20 * x))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("conf", [DET, MC], ids=["det", "mc"])
def test_partitioning_invariance(spark, conf):
    """Input partitioning must never change results."""
    df, _ = _random_walk(spark)
    a = {r["k"]: r["prob"] for r in
         detect(df.repartition(13), ["k"], "ts", "value", conf).collect()}
    b = {r["k"]: r["prob"] for r in
         detect(df.coalesce(1), ["k"], "ts", "value", conf).collect()}
    assert a == b


@pytest.mark.parametrize("conf", [DET, MC], ids=["det", "mc"])
def test_truncation_invariance(spark, conf):
    """detect(x) == detect(tail_{window}(x)) — §2.6.2 truncation spec: no
    retained point beyond act+ref can influence any test."""
    df, pdf = _random_walk(spark)
    tails = pdf.sort_values("ts").groupby("k").tail(conf.window_size)
    a = {r["k"]: r["prob"] for r in
         detect(df, ["k"], "ts", "value", conf).collect()}
    b = {r["k"]: r["prob"] for r in
         detect(spark.createDataFrame(tails), ["k"], "ts", "value",
                conf).collect()}
    assert a == b


def test_rolling_last_row_equals_detect(spark):
    df, pdf = _random_walk(spark)
    rolled = detect_rolling(df, ["k"], "ts", "value", DET)
    last = {r["k"]: r["prob"] for r in
            rolled.where(rolled.ts == pdf.ts.max()).collect()}
    batch = {r["k"]: r["prob"] for r in
             detect(df, ["k"], "ts", "value", DET).collect()}
    assert last == batch


def test_value_shift_monotone_fence(spark):
    """One-sided fence (LowerBound=NA): moving the active mean toward the
    upper bound must raise the prob (monotonicity sanity on the spec)."""
    base = [10.0] * 10
    rows = [("a", t, v) for t, v in enumerate(base)]
    rows += [("b", t, v) for t, v in
             enumerate(base[:-2] + [40.0, 40.0])]  # active near UpperBound
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    conf = AnomalyzerConf(active_size=2, methods=("fence",),
                          upper_bound=50.0, lower_bound=None)
    out = {r["k"]: r["prob"] for r in
           detect(df, ["k"], "ts", "value", conf).collect()}
    assert out["b"] > out["a"]


def test_constant_series_zero_prob(spark):
    """A perfectly flat series is never anomalous under magnitude/cdf."""
    rows = [("c", t, 7.0) for t in range(20)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = detect(df, ["k"], "ts", "value",
                 AnomalyzerConf(active_size=2, methods=("magnitude", "cdf"))
                 ).collect()[0]
    assert out["prob"] == 0.0


def test_sessionize_gap_invariants(spark):
    """Spec-level invariants: (a) consecutive events within a session are
    <= gap apart, (b) adjacent sessions are > gap apart, (c) every event
    is assigned, sessions are contiguous 0..n per key."""
    import numpy as np

    from anomalyzer_spark.operators.sessions import sessionize
    rng = np.random.default_rng(11)
    rows = []
    for k in range(5):
        t = 0
        for i in range(200):
            t += int(rng.choice([10, 100, 5_000_000, 60_000_000]))
            rows.append((k, t, i))
    df = spark.createDataFrame(rows, "k long, ts long, eid long")
    out = sessionize(df, ["k"], "ts", gap_seconds=1, tiebreak_cols=["eid"])
    got = sorted((r["k"], r["ts"], r["session_idx"]) for r in out.collect())
    assert len(got) == len(rows)
    gap_us = 1_000_000
    by_key = {}
    for k, ts, sidx in got:
        by_key.setdefault(k, []).append((ts, sidx))
    for k, events in by_key.items():
        sids = [s for _, s in events]
        assert sids == sorted(sids) and sids[0] == 0
        assert set(sids) == set(range(max(sids) + 1))  # contiguous
        for (t0, s0), (t1, s1) in zip(events, events[1:]):
            if s0 == s1:
                assert t1 - t0 <= gap_us
            else:
                assert s1 == s0 + 1 and t1 - t0 > gap_us


def test_cdc_chunks_tile_and_deterministic(spark):
    """CDC invariants: chunks tile each doc exactly (lengths sum to doc
    length, indexes contiguous) and re-running produces identical chunks."""
    from anomalyzer_spark.functions.dedup import cdc_chunks
    from anomalyzer_spark.sources import load_table
    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    a = cdc_chunks(d, "text", "doc_id").collect()
    b = cdc_chunks(d, "text", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    lens = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    per_doc = {}
    for r in a:
        per_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_len"]))
    for did, chunks in per_doc.items():
        chunks.sort()
        assert [i for i, _ in chunks] == list(range(len(chunks)))
        assert sum(l for _, l in chunks) == len(lens[did])


# ---------------------------------------------------------------------------
# round-9 governance operators: partitioning invariance (the local proxy
# for "results don't depend on executor layout at 1000 nodes")
# ---------------------------------------------------------------------------

def _gov_frame(spark, n=400, seed=11):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "grp": rng.choice(["a", "b", "c"], n),
        "x": rng.normal(100, 15, n).round(3),
    })
    pdf.loc[rng.choice(n, n // 10, replace=False), "x"] = np.nan
    return spark.createDataFrame(pdf)


def test_checks_partitioning_invariance(spark):
    from anomalyzer_spark.functions import checks as C
    df = _gov_frame(spark)
    spec = [C.completeness("x", 0.8), C.uniqueness("id"),
            C.in_range("x", lo=0, hi=200), C.mean_between("x", 50, 150),
            C.row_count(min_rows=1)]
    a = sorted(tuple(r) for r in
               C.verify_checks(df.repartition(13), spec).collect())
    b = sorted(tuple(r) for r in
               C.verify_checks(df.coalesce(1), spec).collect())
    assert a == b  # incl. the HLL sketch: register merge is layout-free


def test_checks_by_consistent_with_global_per_group(spark):
    from anomalyzer_spark.functions import checks as C
    df = _gov_frame(spark)
    spec = [C.completeness("x", 0.8), C.mean_between("x", 50, 150)]
    grouped = C.verify_checks_by(df, ["grp"], spec).collect()
    for g in ("a", "b", "c"):
        solo = {r["check"]: r for r in C.verify_checks(
            df.where(F.col("grp") == g), spec).collect()}
        for r in (x for x in grouped if x["grp"] == g):
            s = solo[r["check"]]
            # mean: summation order differs between the grouped agg and
            # the filtered global agg — ulp-level float tolerance
            assert r["value"] == pytest.approx(s["value"], rel=1e-12)
            assert r["passed"] == s["passed"]


def test_psi_partitioning_invariance_and_identity(spark):
    from anomalyzer_spark.functions.drift import psi_drift
    old = _gov_frame(spark)
    new = _gov_frame(spark, seed=12)
    a = {r["column"]: r["psi"] for r in psi_drift(
        old.repartition(13), new.repartition(7), ["x"]).collect()}
    b = {r["column"]: r["psi"] for r in psi_drift(
        old.coalesce(1), new.coalesce(1), ["x"]).collect()}
    assert a == b  # round-6 PSI absorbs sum-order float noise
    assert psi_drift(old, old, ["x"]).collect()[0]["psi"] == 0.0


@pytest.mark.slow
def test_semantic_pairs_partitioning_invariance(spark):
    from anomalyzer_spark.functions import similarity as S
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((120, 8))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    cents = S.train_ivf_centroids(vecs[::3], 4)
    a = sorted((r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df.repartition(13), threshold=0.5, centroids=cents).collect())
    b = sorted((r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df.coalesce(1), threshold=0.5, centroids=cents).collect())
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_bm25_partitioning_invariance(spark):
    from anomalyzer_spark.functions import retrieval
    rows = [(i, f"w{i % 7} w{i % 3} common term") for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame([(0, "common w2"), (1, "term w5")],
                               "query_id long, query string")
    a = sorted(tuple(r) for r in retrieval.bm25_topk(
        docs.repartition(13), qs.repartition(3), k=5).collect())
    b = sorted(tuple(r) for r in retrieval.bm25_topk(
        docs.coalesce(1), qs.coalesce(1), k=5).collect())
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_mixture_partitioning_invariance(spark):
    from anomalyzer_spark.functions import sampling
    df = spark.createDataFrame(
        [(i, "a" if i % 10 < 7 else "b") for i in range(200)],
        "doc_id long, dom string")
    plan = sampling.mixture_plan(df, "dom", alpha=0.0)
    pa = sorted(tuple(r) for r in sampling.mixture_plan(
        df.repartition(13), "dom", alpha=0.0).collect())
    pb = sorted(tuple(r) for r in plan.collect())
    assert pa == pb
    a = sorted((r["doc_id"], r["epoch"]) for r in
               sampling.apply_mixture_plan(
                   df.repartition(13), plan, "dom").collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in
               sampling.apply_mixture_plan(
                   df.coalesce(1), plan, "dom").collect())
    assert a == b and len(a) > 0


def test_shard_manifest_partitioning_invariance(spark):
    from anomalyzer_spark.sources.layout import shard_manifest
    df = spark.createDataFrame(
        [(i % 4, i, f"t{i}") for i in range(300)],
        "shard int, doc_id long, text string")
    a = sorted(tuple(r) for r in shard_manifest(
        df.repartition(13), token_col="doc_id").collect())
    b = sorted(tuple(r) for r in shard_manifest(
        df.coalesce(1), token_col="doc_id").collect())
    assert a == b  # exact decimal hash-sum: no float, no order effects
