"""Deterministic, reproducible corpus sampling for training-data curation.

Random `df.sample()` is nondeterministic across retries/partitions, which
breaks reproducible dataset builds; the scalable pattern is HASH-based
selection: a row is in the sample iff a stable hash of its id lands in the
acceptance window. Properties that matter at 100 TB:

* deterministic — same ids in, same sample out, on any cluster, any
  partitioning, any retry;
* map-only — a filter on a hash expression, no shuffle, full pushdown of
  everything else;
* composable — supersets nest (rate 1% ⊂ rate 10% with the same seed/key),
  so growing a sample never resamples what was already selected.

``stratified_sample_n`` (exact n per stratum) is the one shape that DOES
shuffle — a per-stratum top-n by hash rank (one exchange on the stratum
key, map-side ``WindowGroupLimit``): deterministic "reservoir" semantics
without driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: denominator of the acceptance-window arithmetic — md5-derived 48-bit
#: uniform, exact in int64
_BUCKETS = 1 << 48

#: above this many distinct domains, temperature_sample switches from a
#: CASE expression (depth = domain count — planner-hostile at high
#: cardinality) to a broadcast (domain, rate) join
_CASE_MAX = 64


def _hash48(id_col: Column, seed: int) -> Column:
    """Stable 48-bit uniform hash of (seed, id) — md5-derived so it is
    engine-portable (DuckDB/NumPy reproduce it) and independent of Spark's
    internal hash seed."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), id_col.cast("string"))
                  .cast("binary")), 1, 12),
        16, 10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    *,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample by id hash. Map-only; samples
    at different rates (same seed) NEST: rate r1 < r2 → sample(r1) ⊆
    sample(r2)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(_hash48(F.col(id_col), seed) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    *,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. language rebalancing: keep 100%
    of low-resource languages, 5% of English). Still map-only — the rate
    is a CASE expression on the stratum column; strata absent from
    ``rates`` use ``default_rate``. A ``None`` key sets the rate for
    NULL-stratum rows (a bare equality CASE would never match NULL and
    silently route those rows to ``default_rate``)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    rate = F.lit(default_rate)
    for s, r in rates.items():
        cond = (F.col(strata_col).isNull() if s is None
                else (F.col(strata_col) == s))
        rate = F.when(cond, F.lit(r)).otherwise(rate)
    return df.where(
        _hash48(F.col(id_col), seed)
        < (rate * F.lit(_BUCKETS)).cast("long"))


def temperature_sample(
    df: DataFrame,
    alpha: float,
    domain_col: str,
    id_col: str = "doc_id",
    *,
    target_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Temperature-flattened domain mixture (the multilingual/multi-domain
    rebalancing rule): a domain with corpus share p_d is sampled toward
    share q_d ∝ p_d^alpha. ``alpha=1`` keeps natural proportions,
    ``alpha=0`` equalizes domains, values in between up-sample the tail —
    the standard knob for keeping low-resource domains from drowning.

    ``target_rows`` sets the expected output size (default: the input row
    count, i.e. pure re-weighting); each domain's acceptance rate is
    ``min(1, q_d · target / n_d)`` — rates cap at 1 (sampling never
    duplicates rows; true up-sampling past a domain's size is an epochs
    decision, not a filter), so heavy flattening of very skewed corpora
    lands under target when small domains saturate.

    Plan shape: one tiny per-domain count aggregate (map-side partial),
    rates derived on the driver from that bounded aggregate (#domains
    rows, never data), then the deterministic md5-window filter of
    ``hash_sample``. Small domain maps (≤ ``_CASE_MAX`` distinct values
    — the languages case) compile to a map-only CASE via
    ``stratified_sample``; larger ones (source-site domains) would build
    a CASE tree as deep as the domain count, so they route through a
    broadcast null-safe equi-join against the tiny (domain, rate) frame
    instead — one broadcast of #domains rows, still no corpus shuffle.
    NULL domains are first-class: counted, weighted, and sampled like
    any other domain value.

    Batch-only (the per-domain count is a blocking aggregate; use the
    stream-capable ``hash_sample``/``stratified_sample`` with
    pre-computed rates for streaming frames). Driver memory holds one
    (domain, count) entry per DISTINCT domain — fine for languages or
    source sites, not for a high-cardinality key like URL.
    """
    if alpha < 0.0:
        raise ValueError("alpha must be >= 0")
    if df.isStreaming:
        raise ValueError(
            "temperature_sample requires a batch DataFrame (per-domain "
            "counts are a blocking aggregate); compute rates on a batch "
            "snapshot and apply stratified_sample to the stream instead")
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df
    total = sum(counts.values())
    target = total if target_rows is None else target_rows
    weights = {d: (n / total) ** alpha for d, n in counts.items()}
    z = sum(weights.values())
    rates = {
        d: min(1.0, (w / z) * target / counts[d])
        for d, w in weights.items()
    }
    if len(rates) <= _CASE_MAX:
        return stratified_sample(
            df, rates, domain_col, id_col, default_rate=0.0, seed=seed)
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        [(d, r) for d, r in rates.items()],
        f"_ts_domain {dict(df.dtypes)[domain_col]}, _ts_rate double")
    joined = df.join(
        F.broadcast(rate_df),
        df[domain_col].eqNullSafe(rate_df["_ts_domain"]), "left")
    return joined.where(
        _hash48(F.col(id_col), seed)
        < (F.coalesce(F.col("_ts_rate"), F.lit(0.0))
           * F.lit(_BUCKETS)).cast("long")
    ).drop("_ts_domain", "_ts_rate")


def stratified_sample_n(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str,
    id_col: str = "doc_id",
    *,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n, stratum_size)`` rows per stratum, deterministically:
    rank rows within each stratum by id hash (a uniform random order that
    is stable across runs) and keep the first n — reservoir-sampling
    semantics without driver state. One exchange on the stratum key; the
    rank limit runs map-side (WindowGroupLimit) so no stratum ships more
    than n rows per input split."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = Window.partitionBy(strata_col).orderBy(
        _hash48(F.col(id_col), seed).asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def select_top_fraction(
    df: DataFrame,
    score_col: str,
    fraction: float,
    id_col: str = "doc_id",
    *,
    seed: int = 42,
) -> DataFrame:
    """Keep (approximately, deterministically) the top ``fraction`` of
    rows by ``score_col`` — the global-selection step of model-based
    filtering ("keep the best 30% of the corpus by quality score")
    WITHOUT a global sort.

    Exact global threshold, no sort: scores round to 6 decimals (the
    repo-wide comparison precision), the per-value count histogram is
    one map-side-combined aggregate (bounded by the distinct rounded
    scores — ≤ 2M values for a [0,1] score, trivially collected), and
    the driver walks the descending cumulative counts to the threshold
    value t. Rows with score > t all pass; rows AT t pass through the
    deterministic md5 acceptance window at the residual rate — the
    boundary is expected-count rather than exact-count, in exchange for
    a MAP-ONLY selection filter (an exact boundary would rank the tie
    set: one hot window partition holding every row at the threshold
    value); the only exchange anywhere is the histogram aggregate, whose
    map-side partial combine reduces each split to at most one row per
    distinct rounded score before anything moves.
    NULL scores never pass. The same (histogram → threshold → hash
    window) is replayable in SQL, so the pass is DuckDB-parity tested
    (tests/test_functions.py).

    Like the rest of the deterministic-sampling family: retry- and
    partitioning-independent, and nested runs (same seed) select nested
    sets as ``fraction`` grows across the SAME threshold value.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction == 0.0:
        return df.where(F.lit(False))
    if fraction == 1.0:
        return df.where(F.col(score_col).isNotNull())
    sc = F.round(F.col(score_col), 6)
    # driver memory holds one (value, count) entry per DISTINCT rounded
    # score — fine for bounded scores ([0,1] quality → ≤ 2M entries), but
    # an unbounded score (raw perplexity, byte lengths) can approach one
    # entry per row: the limit turns a silent driver OOM into an
    # actionable error (pre-bucket such scores, e.g. round/log them).
    _max_distinct = 4_000_000
    rows = (
        df.where(sc.isNotNull())
        .groupBy(sc.alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
        .limit(_max_distinct + 1)
        .collect())
    if len(rows) > _max_distinct:
        raise ValueError(
            f"select_top_fraction: > {_max_distinct:,} distinct rounded "
            f"scores — the driver-side histogram would not be bounded. "
            f"Pre-bucket the score (coarser rounding, log-scale) first.")
    hist = sorted(((r["_v"], r["_c"]) for r in rows), key=lambda t: -t[0])
    total = sum(c for _, c in hist)
    if total == 0:
        return df.where(F.lit(False))
    target = fraction * total
    run = 0
    thr, at_thr = None, 0
    for v, c in hist:
        if run + c >= target:
            thr, at_thr = v, c
            break
        run += c
    else:                                   # fraction*total > total
        thr, at_thr = hist[-1]
        run = total - at_thr
    resid_rate = max(0.0, min(1.0, (target - run) / at_thr))
    accept = _hash48(F.col(id_col), seed) < int(resid_rate * _BUCKETS)
    return df.where(
        sc.isNotNull() & ((sc > thr) | ((sc == thr) & accept)))
