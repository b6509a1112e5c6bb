"""Declarative data-quality checks — the ingest gate for a 100 TB corpus.

The pattern is the public Deequ/Great-Expectations one: the user declares
WHAT must hold (completeness, uniqueness, value bounds, set membership,
pattern conformance, row count) and the engine computes every declared
metric in **one aggregate pass over the data** — a single scan, map-side
partial aggregation, one tiny exchange to a 1-row frame. At 100 TB the
cost is the scan you were already paying to ingest; adding a check adds a
column to the agg, never a job.

Report shape: the 1-row metric frame is unpivoted (driver-free — the
unpivot runs on the single aggregated row) into the long-form contract
    (check, column, metric, value, threshold, passed)
so downstream gating is `report.where(~passed)` and the report itself is
a DataFrame that can be written next to the data it describes.

Scale notes:
* every metric except exact uniqueness is an algebraic aggregate
  (count/sum/min/max/avg of row-local predicates) — partial-agg friendly,
  no distinct expansion;
* ``uniqueness`` defaults to ``approx_count_distinct`` (HyperLogLog++,
  single pass, mergeable — the only honest default at 100 TB); pass
  ``exact=True`` for small frames or when the gate is exact-dup-free
  (that is what the DuckDB oracle cross-checks, since HLL sketches are
  engine-specific);
* no ``.collect()`` anywhere — composing the report is plan surgery on a
  1-row frame.

Check constructors return plain dicts (the declarative spec is data, so
configs serialize to JSON next to pipeline configs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "completeness", "uniqueness", "in_range", "in_set", "matches",
    "mean_between", "min_between", "max_between", "stddev_between",
    "quantile_between", "row_count", "satisfies", "top_share",
    "verify_checks", "verify_checks_by", "verify_quantile_profile",
]


def completeness(column: str, min_ratio: float = 1.0) -> dict:
    """Fraction of rows with ``column`` NOT NULL must be ≥ ``min_ratio``."""
    return {"kind": "completeness", "column": column,
            "threshold": float(min_ratio)}


def uniqueness(column: str, min_ratio: float = 1.0, *,
               exact: bool = False) -> dict:
    """distinct(column) / count(column NOT NULL) must be ≥ ``min_ratio``.

    ``exact=False`` (default) uses HyperLogLog++ — the single-pass,
    mergeable sketch that is the only sane default at corpus scale;
    ``exact=True`` uses COUNT(DISTINCT) (adds a distinct expansion —
    fine on dimension-sized frames, deliberate on fact-sized ones).
    """
    return {"kind": "uniqueness", "column": column,
            "threshold": float(min_ratio), "exact": bool(exact)}


def in_range(column: str, lo=None, hi=None, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values inside [lo, hi] must be ≥ ``min_ratio``
    (one bound may be None for a one-sided check; NULLs are completeness's
    job, not this check's)."""
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one of lo/hi")
    return {"kind": "in_range", "column": column, "lo": lo, "hi": hi,
            "threshold": float(min_ratio)}


def in_set(column: str, values, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values in ``values`` must be ≥ ``min_ratio``."""
    vals = list(values)
    if not vals:
        raise ValueError("in_set needs a non-empty value list")
    return {"kind": "in_set", "column": column, "values": vals,
            "threshold": float(min_ratio)}


def matches(column: str, pattern: str, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values fully matching regex ``pattern`` must be
    ≥ ``min_ratio`` (Java/RE2-portable regex — same constraint as
    ``text.redact_pii``)."""
    return {"kind": "matches", "column": column, "pattern": pattern,
            "threshold": float(min_ratio)}


def mean_between(column: str, lo: float, hi: float) -> dict:
    """avg(column) must lie in [lo, hi] (NULLs ignored, SQL semantics)."""
    return {"kind": "mean_between", "column": column, "lo": float(lo),
            "hi": float(hi)}


def min_between(column: str, lo: float, hi: float) -> dict:
    """min(column) must lie in [lo, hi] (NULLs ignored)."""
    return {"kind": "min_between", "column": column, "lo": float(lo),
            "hi": float(hi)}


def max_between(column: str, lo: float, hi: float) -> dict:
    """max(column) must lie in [lo, hi] (NULLs ignored)."""
    return {"kind": "max_between", "column": column, "lo": float(lo),
            "hi": float(hi)}


def stddev_between(column: str, lo: float, hi: float) -> dict:
    """Sample standard deviation must lie in [lo, hi] (the variance
    gate: a column going constant — stddev collapsing to 0 — is a
    classic silent upstream failure)."""
    return {"kind": "stddev_between", "column": column, "lo": float(lo),
            "hi": float(hi)}


def quantile_between(column: str, q: float, lo: float, hi: float, *,
                     exact: bool = True) -> dict:
    """The q-quantile (0 < q < 1, linear interpolation) must lie in
    [lo, hi]. ``exact=True`` (default) uses ``percentile`` — a holistic
    aggregate that buffers the column per partition; fine for the
    dimension-sized frames a gate usually profiles, and what the DuckDB
    oracle reproduces (``quantile_cont``). ``exact=False`` switches to
    ``approx_percentile`` (GK sketch, mergeable, bounded memory — the
    100 TB default; estimates are engine-specific, so cross-engine
    attestation covers the exact path and the sketch is asserted only
    within its documented accuracy, as in the sketch_stats slot)."""
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0, 1)")
    return {"kind": "quantile_between", "column": column, "q": float(q),
            "lo": float(lo), "hi": float(hi), "exact": bool(exact)}


def row_count(min_rows: int = 0, max_rows=None) -> dict:
    """Total row count must lie in [min_rows, max_rows]."""
    return {"kind": "row_count", "column": None, "lo": int(min_rows),
            "hi": None if max_rows is None else int(max_rows)}


def top_share(column: str, max_share: float, k: int = 1) -> dict:
    """Heavy-hitters / frequency-skew gate: the combined share of the
    ``k`` most frequent NON-NULL values must be ≤ ``max_share`` — the
    "one domain is 40% of today's batch" check that completeness and
    range conformance cannot see. Tie-break for the top-k cut is
    (count desc, value asc), so the metric is deterministic.

    Scale note — the one check kind that is NOT a plain aggregate: exact
    heavy hitters need a per-value count, so this adds ONE grouped
    aggregation over the checked column (map-side partial agg absorbs the
    hot keys — the very skew being measured — so the shuffle carries at
    most |distinct| rows) plus a top-k cut over that distinct-value frame
    (ungrouped: TakeOrderedAndProject — per-partition top-k, safe even on
    a corpus-cardinality column; grouped: a ranking window PARTITIONED by
    the group keys). On a corpus-cardinality column the metric itself is
    near-degenerate (every share ≈ 1/n) and the gate you actually want is
    exact-dup detection (``dedup.exact_dedup``). All other declared
    checks still fuse into the single base pass."""
    if not 0.0 <= max_share <= 1.0:
        raise ValueError("max_share must be in [0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    return {"kind": "top_share", "column": column, "k": int(k),
            "lo": None, "hi": float(max_share)}


def satisfies(predicate_sql: str, name: str, min_ratio: float = 1.0) -> dict:
    """Fraction of rows where ``predicate_sql`` (a boolean SQL expression
    over the frame's columns) is TRUE must be ≥ ``min_ratio`` — the escape
    hatch for cross-column invariants (`"l_shipdate <= l_receiptdate"`)."""
    return {"kind": "satisfies", "column": name,
            "predicate": predicate_sql, "threshold": float(min_ratio)}


def _ratio(num, den):
    # 0/0 → NULL in SQL; an empty frame should FAIL ratio checks loudly,
    # not pass vacuously, so map the empty-denominator case to 0.0.
    return F.when(den > 0, num.cast("double") / den.cast("double")) \
            .otherwise(F.lit(0.0))


def _metric_expr(c: dict):
    """(aggregate Column producing the metric value, metric label)."""
    kind = c["kind"]
    n = F.count(F.lit(1))
    if kind == "completeness":
        return _ratio(F.count(F.col(c["column"])), n), "non_null_ratio"
    if kind == "uniqueness":
        col = F.col(c["column"])
        distinct = (F.count_distinct(col) if c["exact"]
                    else F.approx_count_distinct(col))
        return _ratio(distinct, F.count(col)), "distinct_ratio"
    if kind == "in_range":
        col = F.col(c["column"])
        cond = F.lit(True)
        if c["lo"] is not None:
            cond = cond & (col >= F.lit(c["lo"]))
        if c["hi"] is not None:
            cond = cond & (col <= F.lit(c["hi"]))
        ok = F.count(F.when(cond, 1))
        return _ratio(ok, F.count(col)), "in_range_ratio"
    if kind == "in_set":
        col = F.col(c["column"])
        ok = F.count(F.when(col.isin(c["values"]), 1))
        return _ratio(ok, F.count(col)), "in_set_ratio"
    if kind == "matches":
        col = F.col(c["column"])
        ok = F.count(F.when(col.rlike("^(?:" + c["pattern"] + ")$"), 1))
        return _ratio(ok, F.count(col)), "match_ratio"
    if kind == "mean_between":
        return F.avg(F.col(c["column"])).cast("double"), "mean"
    if kind == "min_between":
        return F.min(F.col(c["column"])).cast("double"), "min"
    if kind == "max_between":
        return F.max(F.col(c["column"])).cast("double"), "max"
    if kind == "stddev_between":
        return F.stddev_samp(F.col(c["column"])).cast("double"), "stddev"
    if kind == "quantile_between":
        col = F.col(c["column"]).cast("double")
        expr = (F.percentile(col, F.lit(c["q"])) if c["exact"]
                else F.percentile_approx(col, F.lit(c["q"])))
        return expr.cast("double"), f"q{c['q']}"
    if kind == "row_count":
        return n.cast("double"), "rows"
    if kind == "satisfies":
        ok = F.count(F.when(F.expr(c["predicate"]), 1))
        return _ratio(ok, n), "satisfied_ratio"
    raise ValueError(f"unknown check kind: {kind!r}")


#: checks gated by [lo, hi] bounds on the metric itself (threshold NULL
#: in the report) rather than a min-ratio threshold
_BOUNDED = ("mean_between", "min_between", "max_between",
            "stddev_between", "quantile_between", "row_count",
            "top_share")


def _top_share_frame(df: DataFrame, keys: list[str], c: dict, i: int):
    """1-row (or per-group) frame carrying ``_top{i}`` = summed count of
    the k most frequent non-null values. Grouped count over the
    DISTINCT-VALUE frame (see top_share docstring for why this cannot
    ride the single base aggregate), then the top-k cut; the share's
    denominator (per-group non-null count) rides the BASE pass as a
    hidden ``_den{i}`` aggregate, so top_share costs exactly one extra
    scan, not two.

    Ungrouped cut = ``orderBy(count desc, value).limit(k)`` — Spark plans
    TakeOrderedAndProject (per-partition top-k + driver merge of k rows),
    so even a corpus-cardinality column never funnels its distinct-value
    frame through one task the way an unpartitioned ranking window
    (``Window.orderBy`` with no partition keys) would. The grouped cut
    keeps a ranking window PARTITIONED by the group keys: parallelism is
    the group count, which is the caller's grain."""
    col = F.col(c["column"])
    cnts = (df.where(col.isNotNull())
            .groupBy(*keys, c["column"])
            .agg(F.count(F.lit(1)).alias("_c")))
    order = [F.col("_c").desc(), col.asc()]
    if keys:
        from pyspark.sql.window import Window
        w = Window.partitionBy(*keys).orderBy(*order)
        ranked = cnts.select(*keys, "_c",
                             F.row_number().over(w).alias("_rn"))
        return (ranked.where(F.col("_rn") <= c["k"])
                .groupBy(*keys).agg(F.sum("_c").alias(f"_top{i}")))
    return (cnts.orderBy(*order).limit(c["k"])
            .agg(F.sum("_c").alias(f"_top{i}")))


def _passed(c: dict, value):
    if c["kind"] in _BOUNDED:
        ok = F.lit(True)
        if c.get("lo") is not None:
            ok = ok & (value >= F.lit(float(c["lo"])))
        if c.get("hi") is not None:
            ok = ok & (value <= F.lit(float(c["hi"])))
        # empty-frame mean is NULL → fail, not pass
        return F.coalesce(ok, F.lit(False))
    return value >= F.lit(c["threshold"])


def _report(metrics: DataFrame, checks: list[dict], labels: list[str],
            keys: list[str]) -> DataFrame:
    # unpivot via explode-of-structs on the aggregated frame: ONE plan
    # branch, so the aggregate provably runs once (a union of N selects
    # over the same agg would lean on exchange reuse instead).
    rows = []
    for i, (c, metric) in enumerate(zip(checks, labels)):
        value = F.col(f"m{i}").cast("double")
        if c["kind"] in _BOUNDED:
            thresh = F.lit(None).cast("double")
        else:
            thresh = F.lit(float(c["threshold"]))
        rows.append(F.struct(
            F.lit(f"{i}:{c['kind']}").alias("check"),
            F.lit(c["column"]).cast("string").alias("column"),
            F.lit(metric).alias("metric"),
            value.alias("value"),
            thresh.alias("threshold"),
            _passed(c, value).alias("passed"),
        ))
    return (metrics.select(*keys, F.explode(F.array(*rows)).alias("r"))
            .select(*keys, "r.*"))


def _compile(checks: list[dict]):
    if not checks:
        raise ValueError("verify_checks needs at least one check")
    aggs, labels = [], []
    for i, c in enumerate(checks):
        if c["kind"] == "top_share":
            # the top-k numerator joins in from _top_share_frame; the
            # denominator (non-null count) fuses into this base pass
            aggs.append(F.count(F.col(c["column"])).alias(f"_den{i}"))
            labels.append(f"top{c['k']}_share")
            continue
        expr, metric = _metric_expr(c)
        aggs.append(expr.alias(f"m{i}"))
        labels.append(metric)
    return aggs, labels


def verify_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run every check in ONE aggregate pass; return the long-form report
    (check, column, metric, value, threshold, passed), one row per check,
    in the declared order (``check`` is ``"<i>:<kind>"`` so the report
    orders and keys deterministically even when one column carries two
    checks of the same kind). Exception: each ``top_share`` check adds
    one grouped aggregation over its column (its docstring explains why);
    all other kinds still fuse into the single pass."""
    aggs, labels = _compile(checks)
    metrics = df.agg(*aggs)  # 1 row; the only pass for non-top_share kinds
    for i, c in enumerate(checks):
        if c["kind"] == "top_share":
            # 1-row x 1-row cross join, broadcast by construction;
            # empty/all-NULL column -> _den{i}=0 -> _ratio reports 0.0
            metrics = (metrics.crossJoin(_top_share_frame(df, [], c, i))
                       .withColumn(f"m{i}", _ratio(F.col(f"_top{i}"),
                                                   F.col(f"_den{i}"))))
    return _report(metrics, checks, labels, [])


def verify_checks_by(df: DataFrame, keys: list[str],
                     checks: list[dict]) -> DataFrame:
    """Per-group quality gate: every check evaluated independently for
    each ``keys`` group — the shape for "did TODAY's partition land
    complete?" or per-domain conformance. Report = (*keys, check,
    column, metric, value, threshold, passed), one row per group ×
    check. Still one pass: a single groupBy aggregate (map-side partial
    agg; output rows = groups × checks, data scanned once) — plus one
    grouped aggregation per ``top_share`` check (see its docstring).
    A group whose top_share column is entirely NULL reports share 0.0
    (no values, no skew) rather than failing vacuously."""
    if not keys:
        raise ValueError("verify_checks_by needs at least one key "
                         "(use verify_checks for the global gate)")
    aggs, labels = _compile(checks)
    metrics = df.groupBy(*keys).agg(*aggs)
    for i, c in enumerate(checks):
        if c["kind"] == "top_share":
            # null-SAFE join keys: groupBy treats NULL as a real group on
            # both sides, but a name-list equi-join (NULL == NULL -> NULL)
            # would never match the NULL-key group — its share silently
            # coalesced to 0.0 while every other check kind reported it
            aux = _top_share_frame(df, list(keys), c, i)
            renamed = aux.select(
                *[F.col(k).alias(f"_aux_{k}") for k in keys],
                F.col(f"_top{i}"))
            cond = None
            for k in keys:
                eq = metrics[k].eqNullSafe(renamed[f"_aux_{k}"])
                cond = eq if cond is None else (cond & eq)
            # all-NULL group: no aux row (left-join NULL numerator) AND
            # _den{i}=0 -> _ratio reports 0.0 (no values, no skew)
            metrics = (metrics.join(renamed, cond, "left")
                       .drop(*[f"_aux_{k}" for k in keys])
                       .withColumn(f"m{i}", _ratio(F.col(f"_top{i}"),
                                                   F.col(f"_den{i}"))))
    return _report(metrics, checks, labels, list(keys))


def verify_quantile_profile(
    profile: DataFrame, checks: list[dict],
) -> DataFrame:
    """The MERGEABLE quantile gate: evaluate ``quantile_between`` checks
    against a persisted KLL quantile profile (``sketch.kll_profile`` /
    ``drift.quantile_profile``) instead of the data — "did p99 doc
    length stay under 50k THIS MONTH?" answered by folding thirty
    kilobyte shard frames (``sketch.merge_kll``), never rescanning the
    corpus. Same long-form report as ``verify_checks`` ((check, column,
    metric, value, threshold, passed)); ``value`` is the sketch's
    quantile_disc-style element, whose true rank is within q·n ± the
    profile's error bound — size ``k`` so that slack is below the
    gate's tolerance. Only ``quantile_between`` checks are accepted
    (other kinds need the data; run them in the landing pass).
    Build the profile of a CONTINUOUS column with
    ``drift.quantile_profile(..., sharded=True)`` (the plain build
    holds a column's whole distinct-value set in one window
    partition); this gate consumes either build unchanged."""
    from .sketch import kll_quantiles

    if not checks:
        raise ValueError("verify_quantile_profile needs at least one check")
    bad = [c["kind"] for c in checks if c["kind"] != "quantile_between"]
    if bad:
        raise ValueError(
            f"only quantile_between checks can run from a profile; got "
            f"{sorted(set(bad))} — run other kinds with verify_checks "
            "on the data")
    qs = sorted({float(c["q"]) for c in checks})
    vals = kll_quantiles(profile, qs)
    # fold the (column, q, value) rows to ONE row of m{i} columns, then
    # unpivot into the report structs (the _report single-branch shape)
    metrics = vals.agg(*[
        F.max(F.when((F.col("column") == c["column"])
                     & (F.col("q") == float(c["q"])), F.col("value")))
        .alias(f"m{i}")
        for i, c in enumerate(checks)])
    rows = []
    for i, c in enumerate(checks):
        value = F.col(f"m{i}").cast("double")
        rows.append(F.struct(
            F.lit(f"{i}:quantile_between").alias("check"),
            F.lit(c["column"]).cast("string").alias("column"),
            F.lit(f"q{c['q']}").alias("metric"),
            value.alias("value"),
            F.lit(None).cast("double").alias("threshold"),
            _passed(c, value).alias("passed"),
        ))
    return metrics.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
