"""Range (interval) joins without a cartesian product.

Spark compiles a bare ``ON p.ts >= i.start AND p.ts < i.end`` into a
BroadcastNestedLoopJoin (small side) or a cartesian + filter — O(n·m)
either way, a scale-killer the moment neither side is tiny. The standard
fix (the same idea as Databricks' range-join optimization and the
bucket-join dedup/ANN stages elsewhere in this repo) is to QUANTIZE the
range dimension into fixed-width buckets so the range predicate becomes
an equi-join key:

* an interval [start, end) explodes into the buckets it covers —
  bounded rows as long as intervals are bounded relative to the bucket
  width (guarded: ``max_buckets_per_interval`` fails fast instead of
  letting one open-ended interval fan out a million rows);
* a point maps to exactly ONE bucket, so point-in-interval pairs meet in
  exactly one bucket — no post-join dedup at all;
* interval×interval overlaps can meet in several shared buckets, so the
  match is counted only in its FIRST shared bucket
  (``bucket == floor(max(a.start, b.start) / width)``) — dedup by
  arithmetic, not by an extra DISTINCT exchange.

Both joins then run as ordinary shuffled equi-joins on (keys…, bucket)
— AQE-skew-splittable, broadcastable when one side is small — followed
by the exact range predicate as a cheap post-filter.

Skew contract: a HOT bucket (one spanning a popular time window — a
flash-sale minute, a batch-load timestamp) concentrates its rows in one
shuffle partition. This operator deliberately adds no salting of its
own and relies on AQE skew-join splitting
(``spark.sql.adaptive.enabled`` + ``spark.sql.adaptive.skewJoin
.enabled``, both defaults here — see session.py) to split that
partition at runtime; results are identical either way. With AQE
disabled the join stays CORRECT but the hot bucket serializes into a
single oversized task (straggler, possible spill) — pinned by the
hot-bucket test in tests/test_range_join.py. If a workload's skew is
KNOWN ahead of time, shrinking ``bucket_width`` spreads a hot window
across more buckets at the cost of a wider interval explode.

Pick ``bucket_width`` near the TYPICAL interval length: much smaller
multiplies the interval explode; much larger packs unrelated rows into
one bucket and pushes work into the post-filter. Range columns must be
INTEGRAL (checked, ValueError otherwise): the covered-bucket arithmetic
(``end − 1`` for the exclusive edge, first-shared-bucket dedup) is
integer arithmetic — a fractional ``end`` would silently drop an
interval's last bucket and the dedup filter could then drop real
overlaps. Time ranges should be epoch MICROSECONDS
(``timeutil.epoch_us_col``) — bucketing divides through ``double``, so
magnitudes must stay under 2^53 for exact bucket ids (epoch-µs is exact
until year ~2255; epoch-NANOS is not supported, convert first). The two
inputs' column names must be DISJOINT apart from ``keys`` (checked):
the post-join range predicate references both sides' columns by bare
name — rename one side (the natural self-join case included) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: explode fan-out guard — one interval covering more buckets than this
#: fails fast (raise_error) instead of silently materializing the fan-out
DEFAULT_MAX_BUCKETS = 4096

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _check_integral(df: DataFrame, cols: list[str], side: str) -> None:
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) not in _INTEGRAL:
            raise ValueError(
                f"range_join: {side} column {c!r} has type "
                f"{dtypes.get(c)!r}; range columns must be integral "
                f"(convert timestamps to epoch-µs via timeutil, scale "
                f"fractional ranges to integers first)")


def _check_disjoint(left: DataFrame, right: DataFrame,
                    keys: list[str]) -> None:
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"range_join: both sides carry column(s) {sorted(clash)} — "
            f"the post-join range predicate references columns by bare "
            f"name, so non-key names must be disjoint; rename one side "
            f"(e.g. a self-overlap join needs one side's columns "
            f"aliased) or add them to keys")


def _bucket(col, width):
    return F.floor(col / F.lit(width)).cast("long")


def _interval_buckets(
    df: DataFrame,
    start_col: str,
    end_col: str,
    width,
    max_buckets: int,
    side: str,
) -> DataFrame:
    """Explode each [start, end) interval into one row per covered bucket.
    Empty/negative intervals (end <= start) cover nothing and drop out."""
    lo = _bucket(F.col(start_col), width)
    # end is EXCLUSIVE: an interval ending exactly on a bucket edge does
    # not cover that bucket
    hi = _bucket(F.col(end_col) - F.lit(1), width)
    n = hi - lo + 1
    guarded = F.when(
        n <= max_buckets, F.sequence(lo, hi)
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"range_join: an interval in {side!r} covers "),
        n.cast("string"),
        F.lit(f" buckets (> max_buckets_per_interval={max_buckets}); "
              f"raise bucket_width (or the cap) — refusing the fan-out"))))
    return (
        df.where(F.col(end_col) > F.col(start_col))
        .withColumn("_rj_bucket", F.explode(guarded))
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width,
    keys: list[str] | None = None,
    *,
    max_buckets_per_interval: int = DEFAULT_MAX_BUCKETS,
) -> DataFrame:
    """Inner join of points to the intervals containing them:
    ``start <= point < end`` (half-open), plus equality on ``keys``.

    Output: all columns of ``points`` then all columns of ``intervals``
    (shared ``keys`` once). Each matching (point, interval) pair appears
    exactly once — the point lives in one bucket, so no dedup exchange
    exists in the plan: one explode, one equi-join on (keys…, bucket),
    one post-filter.
    """
    keys = keys or []
    _check_integral(points, [point_col], "points")
    _check_integral(intervals, [start_col, end_col], "intervals")
    _check_disjoint(points, intervals, keys)
    iv = _interval_buckets(
        intervals, start_col, end_col, bucket_width,
        max_buckets_per_interval, "intervals")
    pt = points.withColumn("_rj_bucket", _bucket(F.col(point_col),
                                                 bucket_width))
    joined = pt.join(iv, [*keys, "_rj_bucket"]).where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col)))
    return joined.drop("_rj_bucket")


def range_join_intervals(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width,
    keys: list[str] | None = None,
    *,
    max_buckets_per_interval: int = DEFAULT_MAX_BUCKETS,
) -> DataFrame:
    """Inner join of overlapping half-open intervals:
    ``l.start < r.end AND r.start < l.end``, plus equality on ``keys``.

    A pair sharing several buckets is emitted ONCE: the join additionally
    requires the met bucket to be the pair's FIRST shared bucket — the
    bucket of ``max(l.start, r.start)`` — which is pure arithmetic on
    columns already present, so the plan has no DISTINCT exchange.
    """
    keys = keys or []
    _check_integral(left, [left_start, left_end], "left")
    _check_integral(right, [right_start, right_end], "right")
    _check_disjoint(left, right, keys)
    lv = _interval_buckets(left, left_start, left_end, bucket_width,
                           max_buckets_per_interval, "left")
    rv = _interval_buckets(right, right_start, right_end, bucket_width,
                           max_buckets_per_interval, "right")
    first_shared = _bucket(
        F.greatest(F.col(left_start), F.col(right_start)), bucket_width)
    joined = lv.join(rv, [*keys, "_rj_bucket"]).where(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (F.col("_rj_bucket") == first_shared))
    return joined.drop("_rj_bucket")
