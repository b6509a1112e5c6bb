"""Sessionization — gap-based event grouping.

Batch: the SQL islands pattern — a session starts where the gap from the
previous event of the same key exceeds ``gap``; the session index is the
running count of such starts. One hash exchange + one sort per key (the
window), map-side nothing else; engine-portable (the DuckDB oracle runs
the identical lag + cumulative-sum formulation).

Streaming: Spark's native ``session_window`` aggregation (watermarked,
merging state management from Structured Streaming) — semantics match the
batch islands by construction (both merge events closer than ``gap``);
equivalence is pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sessionize_with_ts(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    *,
    gap_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """sessionize + the internal ``_ts_us`` epoch-µs helper column (kept so
    session_stats can aggregate without recomputing the cast)."""
    tiebreak_cols = tiebreak_cols or []
    from ..timeutil import epoch_us_col

    ts_us = epoch_us_col(df, ts_col)
    order = [ts_us.asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    new_sess = F.when(
        ts_us - F.lag(ts_us).over(w) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))  # first event: lag NULL → comparison NULL → 0
    return df.withColumn("_ts_us", ts_us).withColumn(
        "session_idx",
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .cast("long"),
    )


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    *,
    gap_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-event session assignment: adds ``session_idx`` (0-based per key,
    in time order). ``ts_col`` may be a TimestampType or epoch-µs long."""
    return _sessionize_with_ts(
        df, keys, ts_col, gap_seconds=gap_seconds,
        tiebreak_cols=tiebreak_cols,
    ).drop("_ts_us")


def session_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    *,
    gap_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session aggregates: (keys..., session_idx, start_us, end_us,
    duration_s, n_events). The session window's groupBy reuses the
    sessionize exchange partitioning (no second shuffle on keys)."""
    s = _sessionize_with_ts(df, keys, ts_col, gap_seconds=gap_seconds,
                            tiebreak_cols=tiebreak_cols)
    return s.groupBy(*keys, "session_idx").agg(
        F.min("_ts_us").alias("start_us"),
        F.max("_ts_us").alias("end_us"),
        ((F.max("_ts_us") - F.min("_ts_us")) / 1_000_000.0)
        .alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    )


def session_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    *,
    gap_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session aggregation via native ``session_window`` (append
    mode: a session emits once its window can no longer grow — watermark
    past end + gap). Output: (keys..., start_us, end_us, n_events).

    ``ts_col`` may be TIMESTAMP, TIMESTAMP_NTZ, or epoch-µs int64 — it is
    normalized to a UTC-aligned TIMESTAMP instant (timeutil.event_time_col)
    because watermarks/session windows require TimestampType."""
    from ..timeutil import event_time_col

    out = (
        df.withColumn("_evt", event_time_col(df, ts_col))
        .withWatermark("_evt", watermark)
        .groupBy(*keys,
                 F.session_window(F.col("_evt"), f"{gap_seconds} seconds")
                 .alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return out.select(
        *keys,
        F.unix_micros(F.col("_w.start")).alias("start_us"),
        # session_window.end = last event + gap; subtract it back so the
        # streamed end equals the batch max-event-time end
        (F.unix_micros(F.col("_w.end")) - gap_seconds * 1_000_000)
        .alias("end_us"),
        F.col("n_events"),
    )
