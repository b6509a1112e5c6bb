"""Property tests (SURVEY.md §5.2.3): invariances the spec guarantees."""

import numpy as np
import pandas as pd
import pytest

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
