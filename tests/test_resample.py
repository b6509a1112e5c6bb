"""Batch resample gap-fill semantics (the contract queries cover the
no-fill path via the DuckDB oracle; these pin the fill policies)."""

from pyspark.sql import functions as F

from anomalyzer_spark.operators.resample import resample


def _mk(spark):
    # one key, µs epochs: buckets 0, 1, 4 occupied; 2-3 are gaps
    rows = [("a", b * 10_000_000 + off, float(v))
            for b, off, v in [(0, 0, 1.0), (0, 5_000_000, 3.0),
                              (1, 0, 5.0), (4, 0, 9.0)]]
    return spark.createDataFrame(rows, "k string, ts long, value double")


def test_resample_no_fill_omits_gaps(spark):
    out = resample(_mk(spark), ["k"], "ts", "value", every_seconds=10)
    got = {r["bucket"]: (r["value"], r["n_raw"]) for r in out.collect()}
    assert got == {0: (2.0, 2), 1: (5.0, 1), 4: (9.0, 1)}


def test_resample_zero_fill(spark):
    out = resample(_mk(spark), ["k"], "ts", "value", every_seconds=10,
                   fill="zero")
    got = {r["bucket"]: (r["value"], r["n_raw"]) for r in out.collect()}
    assert got == {0: (2.0, 2), 1: (5.0, 1), 2: (0.0, 0), 3: (0.0, 0),
                   4: (9.0, 1)}
    assert {r["bucket"]: r["bucket_ts"] for r in out.collect()}[3] == 30


def test_resample_ffill_carries_last_value(spark):
    out = resample(_mk(spark), ["k"], "ts", "value", every_seconds=10,
                   fill="ffill")
    got = {r["bucket"]: (r["value"], r["n_raw"]) for r in out.collect()}
    assert got == {0: (2.0, 2), 1: (5.0, 1), 2: (5.0, 0), 3: (5.0, 0),
                   4: (9.0, 1)}


def test_resample_fill_is_per_key(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 40_000_000, 2.0), ("b", 20_000_000, 7.0)],
        "k string, ts long, value double")
    out = resample(df, ["k"], "ts", "value", every_seconds=10, fill="zero")
    got = {(r["k"], r["bucket"]) for r in out.collect()}
    # key b spans a single bucket — no grid rows leak from key a's span
    assert got == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("a", 4),
                   ("b", 2)}


def test_resample_fill_preserves_observed_null_buckets(spark):
    """An OCCUPIED bucket whose aggregate is NULL (all raw values NULL)
    must keep its NULL — only true gaps (no rows at all) are filled."""
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 10_000_000, None), ("a", 40_000_000, 9.0)],
        "k string, ts long, value double")
    for mode, gapval in [("zero", 0.0), ("ffill", 1.0)]:
        out = {r["bucket"]: (r["value"], r["n_raw"]) for r in
               resample(df, ["k"], "ts", "value", every_seconds=10,
                        fill=mode).collect()}
        assert out[1] == (None, 1), mode   # observed NULL kept, row counted
        assert out[2] == (gapval, 0), mode  # real gap filled
        assert out[3] == (gapval, 0), mode
