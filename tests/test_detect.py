"""End-to-end detect() tests: Spark result == oracle result per key, on both
a synthetic frame and the driver's events table (sf0.001)."""

import numpy as np
import pandas as pd
import pytest

from anomalyzer_spark import AnomalyzerConf, detect, detect_by_test, oracle


def _expected_per_key(pdf, keys, conf, ts="ts", value="value", tiebreak=None):
    """NumPy oracle applied per key to the tail window (the spec)."""
    out = {}
    sort_cols = [ts] + ([tiebreak] if tiebreak else [])
    for key, g in pdf.groupby(keys if len(keys) > 1 else keys[0]):
        g = g.sort_values(sort_cols)
        v = g[value].to_numpy(dtype=np.float64)[-conf.window_size :]
        kstr = "|".join(str(k) for k in (key if isinstance(key, tuple) else (key,)))
        out[key] = oracle.eval_prob(v, conf, kstr)
    return out


def test_detect_deterministic_methods(spark):
    conf = AnomalyzerConf(
        active_size=2, methods=("fence", "magnitude", "cdf"),
        upper_bound=10.0, lower_bound=0.0,
    )
    rng = np.random.default_rng(1)
    rows = []
    for key in ["a", "b", "c"]:
        base = {"a": 1.0, "b": 5.0, "c": 2.0}[key]
        for t in range(25):
            val = base + rng.normal(0, 0.2) + (8.0 if (key == "a" and t >= 23) else 0.0)
            rows.append((key, t, float(val)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    df = spark.createDataFrame(pdf)

    got = {r["k"]: r["prob"] for r in detect(df, ["k"], "ts", "value", conf).collect()}
    exp = _expected_per_key(pdf, ["k"], conf)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12), k
    assert got["a"] > 0.5  # the spiked key is anomalous
    assert got["b"] < got["a"]


def test_detect_full_methods_seeded(spark):
    """All 7 tests: Spark kernel must equal the seeded oracle bit-for-bit."""
    conf = AnomalyzerConf(
        active_size=2,
        methods=("magnitude", "ks", "highrank", "lowrank", "diff", "cdf", "fence"),
        upper_bound=20.0, lower_bound=0.0, perm_count=200, seed=11,
    )
    rng = np.random.default_rng(2)
    rows = []
    for ki in range(8):
        vals = rng.normal(5, 1, 30)
        if ki % 3 == 0:
            vals[-2:] += 10  # spike the last two points
        rows.extend((f"key{ki}", t, float(v)) for t, v in enumerate(vals))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    df = spark.createDataFrame(pdf).repartition(4)

    got = {r["k"]: r["prob"] for r in detect(df, ["k"], "ts", "value", conf).collect()}
    exp = _expected_per_key(pdf, ["k"], conf)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12), k
    for ki in range(8):
        if ki % 3 == 0:
            assert got[f"key{ki}"] > 0.5, ki


def test_detect_by_test_surface(spark):
    conf = AnomalyzerConf(
        active_size=1, methods=("cdf", "fence", "highrank", "lowrank", "magnitude"),
        upper_bound=5.0, lower_bound=0.0, perm_count=100,
    )
    pdf = pd.DataFrame(
        {"k": ["x"] * 7, "ts": range(7), "value": [0.1, 2.05, 1.5, 2.5, 2.6, 2.55, 8.0]}
    )
    row = detect_by_test(spark.createDataFrame(pdf), ["k"], "ts", "value", conf).collect()[0]
    assert row["prob_fence"] == pytest.approx(1.0)
    assert row["weight_fence"] == 5.0  # upweighted: prob > 0.8
    assert row["weight_cdf"] == 0.5
    assert "prob_rank" in row.asDict()  # merged highrank/lowrank
    assert row["prob"] > 0.5  # the reference's own assertion


def test_detect_events_table(spark, sf_dir):
    """Smoke on driver data: runs, sane schema, probs in [0,1]."""
    from anomalyzer_spark.sources import load_table

    df = load_table(spark, sf_dir, "events")
    conf = AnomalyzerConf(active_size=2)  # default methods magnitude+ks
    out = detect(df, ["event_type"], "ts_ns", "value", conf,
                 tiebreak_cols=["event_id"]).collect()
    assert len(out) == 5
    for r in out:
        assert 0.0 <= r["prob"] <= 1.0
        assert r["n_points"] == conf.window_size


def test_detect_multi_key_and_horizon(spark, sf_dir):
    import pyspark.sql.functions as F

    from anomalyzer_spark.sources import load_table

    df = load_table(spark, sf_dir, "events")
    conf = AnomalyzerConf(active_size=2, methods=("magnitude", "cdf"))
    full = detect(df, ["event_type", "user_id"], "ts", "value", conf,
                  tiebreak_cols=["event_id"])
    # horizon pre-filter must not change results when generous
    horizoned = detect(df, ["event_type", "user_id"], "ts", "value", conf,
                       tiebreak_cols=["event_id"], horizon=F.expr("INTERVAL 365 DAYS"))
    a = {(r["event_type"], r["user_id"]): r["prob"] for r in full.collect()}
    b = {(r["event_type"], r["user_id"]): r["prob"] for r in horizoned.collect()}
    assert a == b
    assert len(a) > 50


def test_detect_insufficient_data_returns_zero(spark):
    """Regression: NULL (NA) test probs must stay NULL through the cap —
    Spark least/greatest skip NULLs, which once turned NA into prob 1.0.
    Reference behavior: all tests NA → empty probmap → weighted mean 0."""
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 1, 7.0)], "k string, ts long, value double"
    )
    out = {r["k"]: r["prob"] for r in
           detect(df, ["k"], "ts", "value", AnomalyzerConf(active_size=2)).collect()}
    assert out == {"a": 0.0, "b": 0.0}


def test_detect_skew_salts_splits_hot_key_same_result(spark):
    """Two-phase tail-N for hot-key skew: a deliberately skewed frame (one
    key with 20k in-horizon rows vs tiny siblings) run with skew_salts must
    (a) produce IDENTICAL results to the one-phase plan, and (b) actually
    split the hot key — the physical plan carries a phase-1 window
    partitioned by (key, _salt) before the per-key merge window."""
    conf = AnomalyzerConf(
        active_size=2, methods=("fence", "magnitude", "cdf"),
        upper_bound=10.0, lower_bound=0.0,
    )
    rng = np.random.default_rng(5)
    rows = [("hot", t, float(2.0 + rng.normal(0, 0.3))) for t in range(20_000)]
    for key in ("cold1", "cold2"):
        rows += [(key, t, float(1.0 + rng.normal(0, 0.1))) for t in range(30)]
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    df = spark.createDataFrame(pdf)

    plain = detect(df, ["k"], "ts", "value", conf)
    salted = detect(df, ["k"], "ts", "value", conf, skew_salts=8)

    got_plain = {r["k"]: r for r in plain.collect()}
    got_salted = {r["k"]: r for r in salted.collect()}
    assert set(got_plain) == set(got_salted) == {"hot", "cold1", "cold2"}
    for k in got_plain:
        assert got_salted[k]["prob"] == got_plain[k]["prob"], k
        assert got_salted[k]["n_points"] == got_plain[k]["n_points"], k
        assert got_salted[k]["last_ts"] == got_plain[k]["last_ts"], k

    import re

    salted_plan = salted._jdf.queryExecution().executedPlan().toString()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "_salt" not in plain_plan
    # phase 1 exchanges on (k, _salt) — the hot key's rows hash across up
    # to skew_salts tasks instead of one — and windows by (k, _salt)
    assert re.search(r"Exchange hashpartitioning\(k#\d+, _salt#", salted_plan)
    assert re.search(r"windowspecdefinition\(k#\d+, _salt#", salted_plan)
