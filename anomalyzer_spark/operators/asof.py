"""Distributed as-of (point-in-time) join.

For every left row, attach the payload of the LAST right row with the same
key and ``right_ts <= left_ts`` (inclusive). The reference has no joins at
all (SURVEY.md §2.7) — this is a target-only operator for the
enrichment/feature-pipeline use cases.

Spark-first formulation: no pandas, no per-key merge_asof. Union the two
sides with a tag, sort within each key by (ts, tag, tiebreak), and carry the
last right row forward as ONE struct with ``F.last(..., ignorenulls=True)``
over an unbounded-preceding row frame, then unpack its fields. Carrying a
single struct (not each payload column independently) guarantees every
payload value comes from the SAME, truly-latest right row — a legitimately
NULL payload field in that row stays NULL instead of being back-filled from
an older row. One hash exchange on the key, one sort — the same cost as a
regular sort-merge join, and it scales to any key cardinality without
collecting groups.

Ordering contract (also the oracle's contract, expressible in any SQL engine
with IGNORE NULLS window functions):
  * right rows sort BEFORE left rows at equal ts (tag 0 < 1) → inclusive <=;
  * among right rows with identical (key, ts), the greatest ``tiebreak``
    wins (they sort ascending; ``last`` takes the final one);
  * left rows with no prior right row get NULL payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join ``left`` ← ``right`` on key ``on`` with right_ts <= left_ts.

    Returns all ``left`` columns plus ``prefix+c`` for each payload column
    (NULL when no right row qualifies).
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    tb = [tiebreak] if tiebreak else []
    pay_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        # one struct per right row: never NULL itself (even if every field
        # is NULL), so last(ignorenulls) picks the latest ROW atomically.
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_pay"),
        *[F.col(t).alias(f"_tb_{t}") for t in tb],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(pay_type).alias("_pay"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"_tb_{t}") for t in tb],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    order = [F.col("_ts").asc(), F.col("_tag").asc()] + [
        F.col(f"_tb_{t}").asc_nulls_first() for t in tb
    ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "_k",
        "_tag",
        *[F.col(f"_l_{c}") for c in lcols],
        F.last("_pay", ignorenulls=True).over(w).alias("_asof"),
    )
    return carried.where(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_asof").getField(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
