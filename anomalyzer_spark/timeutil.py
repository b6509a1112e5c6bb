"""Type-adaptive event-time normalization.

The reference has no time type at all — order is position
(anomalyze.go:28, README.md:11-13) — so every engine operator that DOES
take event time (resample, sessionize, streaming watermarks) must accept
whatever the source encodes. Parquet alone has three encodings in the
wild, and the driver fixtures have shipped all three across rounds:

- ``timestamp``      (isAdjustedToUTC=true → Spark TIMESTAMP/LTZ)
- ``timestamp_ntz``  (isAdjustedToUTC=false → Spark TIMESTAMP_NTZ; the
  current fixtures' ``events.ts``)
- int64 epoch-µs/ns  (legacy nanos via ``nanosAsLong``; pre-round-3
  fixtures)

Two canonical views, both deterministic and session-timezone-independent:

``epoch_us_col``  → int64 epoch microseconds. For NTZ the wall clock is
taken **as UTC** (a wall-clock diff from the NTZ epoch — no LTZ cast, so
the session timezone can never shift it), which is exactly DuckDB's
``epoch_us(ts)`` on the same parquet — the property the correctness
oracle depends on.

``event_time_col`` → a TIMESTAMP (LTZ instant) for watermarks/windows,
rebuilt with ``timestamp_micros`` from the normalized µs so window
boundaries are epoch-aligned UTC regardless of session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"

# dtypes that epoch_us_col treats as "already epoch-µs int"
_INT_TYPES = {"bigint", "int", "long", "smallint", "tinyint"}


def _quoted(name: str) -> str:
    """Backtick-quote ``name`` for SQL interpolation. Literal backticks are
    doubled (Spark's escape inside quoted identifiers) so a hostile/odd
    column name yields a correctly bound reference, not a malformed expr."""
    return "`" + name.replace("`", "``") + "`"


def epoch_us_col(df: DataFrame, ts_col: str) -> Column:
    """Epoch-µs int64 view of ``ts_col``, whatever its physical type.

    TIMESTAMP → ``unix_micros`` (the instant). TIMESTAMP_NTZ → wall-clock
    microsecond difference from the NTZ epoch (``timestampdiff`` stays in
    the NTZ domain: timezone-independent, equals DuckDB ``epoch_us``).
    DATE → µs at UTC midnight. Integer → passed through as epoch-µs.
    """
    dtypes = dict(df.dtypes)
    dt = dtypes.get(ts_col)
    if dt is None:
        # Spark resolves column names case-insensitively by default but
        # df.dtypes keys are exact — accept a unique case-insensitive match
        matches = [c for c in dtypes if c.lower() == ts_col.lower()]
        if len(matches) == 1:
            dt = dtypes[matches[0]]
    c = F.col(ts_col)
    if dt == "timestamp":
        return F.unix_micros(c)
    if dt == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {_quoted(ts_col)})")
    if dt == "date":
        return F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ},"
            f" cast({_quoted(ts_col)} as timestamp_ntz))")
    if dt in _INT_TYPES:
        # documented contract: integer event time IS epoch-µs. Epoch-ns
        # ints (legacy nanosAsLong fixtures) must be normalized by the
        # loader first (sources.load_table divides by 1000) — a raw ns
        # column here would be silently 1000× off, so loaders own that.
        return c.cast("long")
    raise TypeError(
        f"column {ts_col!r} has unsupported event-time type {dt!r}; "
        "expected timestamp, timestamp_ntz, date, or epoch-µs integer"
        + ("" if dt is not None else
           f" (no column named {ts_col!r} in the frame — dtypes lookup is "
           "case-sensitive)"))


def event_time_col(df: DataFrame, ts_col: str) -> Column:
    """TIMESTAMP (LTZ) view of ``ts_col`` for watermarks / time windows.

    Always routed through ``timestamp_micros(epoch_us_col(...))`` so the
    resulting instants — and hence tumbling/session window boundaries,
    which Spark computes by pure epoch-µs arithmetic — are UTC-aligned
    and identical to the batch bucket math no matter the session
    timezone.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp":
        return F.col(ts_col)
    return F.timestamp_micros(epoch_us_col(df, ts_col))
