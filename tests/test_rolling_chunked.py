"""Chunked (hot-key-parallel) detect_rolling ≡ the single-window pass.

The chunk path (rolling.py ``chunk_rows=``) replays the last L = a+r rows
of each C-row chunk as the next chunk's prelude, so every real row's
frames see exactly the rows the unchunked window would. These tests pin
bit-identical output across chunk sizes that force many boundaries,
including C below the enforced minimum, a single hot key, and histories
shorter than one chunk.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.config import AnomalyzerConf
from anomalyzer_spark.operators.rolling import detect_rolling

CONF = AnomalyzerConf(
    active_size=2, n_seasons=4, methods=("magnitude", "fence", "cdf"),
    upper_bound=500.0, lower_bound=0.0, sensitivity=0.1,
)


def _rows(df):
    out = df.select(
        *[F.col(c) for c in df.columns[:-2]],
        F.col("n_points"),
        F.round("prob", 9).alias("prob"),
    ).collect()
    return sorted(tuple(r) for r in out)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.mark.parametrize("chunk_rows", [16, 64, 4096])
def test_chunked_matches_plain_on_events(spark, sf_dir, chunk_rows):
    ev = _events(spark, sf_dir)
    plain = detect_rolling(ev, ["event_type"], "ts", "value", CONF,
                           tiebreak_cols=["event_id"])
    chunked = detect_rolling(ev, ["event_type"], "ts", "value", CONF,
                             tiebreak_cols=["event_id"],
                             chunk_rows=chunk_rows)
    assert _rows(chunked) == _rows(plain)


def test_single_hot_key_many_chunks(spark):
    # one key, 400 rows, C=32 -> 13 chunks: every row's frames must cross
    # chunk boundaries through the prelude
    df = spark.range(400).select(
        F.lit("k").alias("k"),
        F.col("id").alias("ts"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(101)).cast("double"))
        .alias("value"))
    plain = detect_rolling(df, ["k"], "ts", "value", CONF)
    chunked = detect_rolling(df, ["k"], "ts", "value", CONF, chunk_rows=32)
    assert _rows(chunked) == _rows(plain)


def test_history_shorter_than_chunk_and_tiny_chunk(spark):
    # 7 rows < L = a+r = 10: chunk_rows below L is clamped up to L, and the
    # shrink-to-fit clipping at the key start must survive chunking
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([5, 1, 9, 2, 2, 8, 3])]
        + [("b", i, float(i)) for i in range(25)],
        "k string, ts long, value double")
    plain = detect_rolling(df, ["k"], "ts", "value", CONF)
    chunked = detect_rolling(df, ["k"], "ts", "value", CONF, chunk_rows=4)
    assert _rows(chunked) == _rows(plain)


def test_default_conf_magnitude_only(spark):
    conf = AnomalyzerConf(active_size=3, n_seasons=2,
                          methods=("magnitude", "fence"), upper_bound=50.0)
    df = spark.range(200).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.col("id").alias("ts"),
        (F.col("id") % 17).cast("double").alias("value"))
    plain = detect_rolling(df, ["k"], "ts", "value", conf)
    chunked = detect_rolling(df, ["k"], "ts", "value", conf, chunk_rows=16)
    assert _rows(chunked) == _rows(plain)
