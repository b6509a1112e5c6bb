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


def cap_stratum_tokens(
    df: DataFrame,
    budget: int,
    strata_col: str,
    token_col: str,
    id_col: str = "doc_id",
    *,
    seed: int = 42,
    n_segments: int = 32,
) -> DataFrame:
    """Hard per-stratum TOKEN budget — the crawl-curation rule
    ``stratified_sample_n`` (a row-count cap) cannot express: "no
    source/domain contributes more than ``budget`` tokens". Within each
    stratum, rows are taken in the deterministic id-hash order (the
    family's stable uniform shuffle) while the running ``token_col`` sum
    stays within ``budget``; the row that would cross it — and everything
    after — is dropped. STRICT cap: a stratum whose every candidate row
    exceeds the budget alone contributes nothing (callers wanting
    at-least-one-row semantics should pre-filter oversized rows or union
    a ``stratified_sample_n(1)`` floor). NULL token counts never pass.

    Plan — the skew-safe two-level cumsum (the ``pack_chunks`` shard
    precedent): a naive ``Window.partitionBy(stratum)`` serializes a HEAD
    domain (10% of a crawl = 10% of the corpus in one window partition),
    so each stratum is split into ``n_segments`` contiguous hash RANGES
    (global hash order == (segment, hash) lexicographic). Segment token
    totals are one map-side-combined aggregate (strata × segments rows);
    their per-stratum exclusive prefix sums broadcast back as offsets;
    the row-level cumsum then windows by (stratum, segment) — partitions
    bounded by stratum/segments — and a row passes iff offset + local
    running sum <= budget. Bit-identical to the single-window
    formulation (the DuckDB parity test replays THAT form), retry- and
    partitioning-independent, nested as ``budget`` grows.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    hk = _hash48(F.col(id_col), seed)
    # exact integer division (float div could round across a range
    # boundary and break the contiguous-segment order invariant); an
    # n_segments that doesn't divide 2^48 just gets one extra short
    # trailing segment — harmless
    d = F.lit(_BUCKETS // n_segments)
    seg = ((hk - F.pmod(hk, d)) / d).cast("int").alias("_seg")
    rows = (
        df.where(F.col(token_col).isNotNull())
        .withColumn("_hk", hk)
        .withColumn("_seg", seg)
    )
    seg_tot = rows.groupBy(strata_col, "_seg").agg(
        F.sum(F.col(token_col)).alias("_segsum"))
    woff = (Window.partitionBy(strata_col).orderBy("_seg")
            .rowsBetween(Window.unboundedPreceding, 0))
    offsets = seg_tot.select(
        strata_col, "_seg",
        (F.sum("_segsum").over(woff) - F.col("_segsum")).alias("_off"))
    wrun = (Window.partitionBy(strata_col, "_seg")
            .orderBy(F.col("_hk").asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, 0))
    return (
        rows.join(F.broadcast(offsets), [strata_col, "_seg"])
        .withColumn("_run", F.col("_off") + F.sum(F.col(token_col)).over(wrun))
        .where(F.col("_run") <= budget)
        .drop("_hk", "_seg", "_off", "_run")
    )


def cap_stratum_share(
    df: DataFrame,
    max_share: float,
    strata_col: str,
    token_col: str,
    id_col: str = "doc_id",
    *,
    seed: int = 42,
    total_tokens: int | None = None,
) -> DataFrame:
    """Relative form of ``cap_stratum_tokens``: "no stratum may exceed
    ``max_share`` of the corpus' total tokens" — the budget is
    ``floor(max_share · total)`` with total measured over the INPUT
    (pre-cap) corpus, so the rule is declarative (a share of what
    arrived, not a fixed-point of what survives). One extra bounded
    aggregate (a single total) plus ``cap_stratum_tokens``'s exchange.

    At 100 TB that extra aggregate is a full corpus scan for ONE number —
    pass ``total_tokens`` from persisted corpus metadata to skip it (the
    ``bm25_corpus_stats`` precedent: a table's token total is a write-time
    statistic, not something to recount per query).
    """
    if not 0.0 < max_share <= 1.0:
        raise ValueError("max_share must be in (0, 1]")
    total = (total_tokens if total_tokens is not None
             else df.agg(F.sum(F.col(token_col))).first()[0]) or 0
    return cap_stratum_tokens(
        df, int(max_share * total), strata_col, token_col, id_col,
        seed=seed)


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    *,
    alpha: float | None = None,
    weights: dict[str, float] | None = None,
    target_rows: int | None = None,
    target_tokens: int | None = None,
    token_col: str | None = None,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Epoch-aware domain-mixture plan — the decision `temperature_sample`
    explicitly declines to make: when flattening a skewed corpus, small
    domains should be UP-sampled (seen for more than one epoch), not just
    protected from down-sampling. This computes, per domain, how many
    epochs of that domain the mixed dataset should contain.

    Target shares come from exactly one of:

    * ``alpha`` — temperature flattening, share q_d ∝ p_d^alpha over the
      natural shares p_d (``alpha=1`` natural, ``alpha=0`` uniform); or
    * ``weights`` — an explicit {domain: weight} map (normalized; domains
      absent from the map get weight 0; a ``None`` key weights the NULL
      domain).

    The budget is ``target_rows`` (or ``target_tokens`` with
    ``token_col`` — shares and epochs then measured in tokens, the unit
    a training run actually budgets); default is the corpus size, i.e.
    pure re-mixing. Per domain: ``epochs = min(max_epochs,
    share · budget / size)`` — a value < 1 is a down-sampling rate, > 1
    repeats the domain, and ``max_epochs`` caps repetition (the standard
    guard against memorizing a tiny domain; see e.g. the data-constrained
    scaling literature on diminishing returns past ~4 epochs).

    Returns one row per domain — (``domain``, ``n_rows``[, ``n_tokens``],
    ``natural_share``, ``target_share``, ``epochs``, ``planned_rows``
    [, ``planned_tokens``]), shares/epochs rounded to 6 — computed fully
    declaratively: ONE map-side-combined aggregate over the corpus, then
    window totals over the #domains-row result (each subtree plans once —
    the ``psi_report`` precedent), so the plan frame is itself a small
    DataFrame: persistable next to the dataset it describes, joinable,
    and replayable as pure SQL. NULL domains are first-class. Feed the
    result to ``apply_mixture_plan``.
    """
    if (alpha is None) == (weights is None):
        raise ValueError("pass exactly one of alpha= or weights=")
    if alpha is not None and alpha < 0.0:
        raise ValueError("alpha must be >= 0")
    if target_tokens is not None and token_col is None:
        raise ValueError("target_tokens requires token_col")
    if token_col is not None and target_rows is not None:
        raise ValueError(
            "token_col plans in tokens — use target_tokens, not "
            "target_rows (mixed units would mis-scale every epoch)")
    if max_epochs <= 0.0:
        raise ValueError("max_epochs must be > 0")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("n_tokens"))
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(*aggs)
    size = F.col("n_tokens") if token_col is not None else F.col("n_rows")
    w_all = Window.partitionBy()
    per = per.withColumn(
        "natural_share", size / F.sum(size).over(w_all))
    if alpha is not None:
        wcol = F.pow(F.col("natural_share"), F.lit(float(alpha)))
        per = per.withColumn("_w", wcol)
    else:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(d, float(v)) for d, v in weights.items()],
            f"_mx_domain {dict(df.dtypes)[domain_col]}, _w double")
        per = (per.join(
            F.broadcast(wdf),
            per["domain"].eqNullSafe(wdf["_mx_domain"]), "left")
            .drop("_mx_domain")
            .withColumn("_w", F.coalesce(F.col("_w"), F.lit(0.0))))
    budget = (target_tokens if token_col is not None and
              target_tokens is not None else target_rows)
    budget_col = (F.lit(float(budget)) if budget is not None
                  else F.sum(size).over(w_all))
    per = per.withColumn(
        "target_share", F.col("_w") / F.sum("_w").over(w_all))
    per = per.withColumn(
        "epochs",
        F.round(F.least(
            F.lit(float(max_epochs)),
            F.col("target_share") * budget_col / size), 6))
    out = [F.col("domain"), F.col("n_rows")]
    if token_col is not None:
        out.append(F.col("n_tokens"))
    out += [
        F.round("natural_share", 6).alias("natural_share"),
        F.round("target_share", 6).alias("target_share"),
        F.col("epochs"),
        F.round(F.col("epochs") * F.col("n_rows"), 0)
        .cast("long").alias("planned_rows"),
    ]
    if token_col is not None:
        out.append(F.round(F.col("epochs") * F.col("n_tokens"), 0)
                   .cast("long").alias("planned_tokens"))
    return per.select(*out)


def apply_mixture_plan(
    df: DataFrame,
    plan: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    *,
    seed: int = 42,
) -> DataFrame:
    """Materialize a ``mixture_plan``: each row is kept ``floor(epochs)``
    times unconditionally plus once more with probability
    ``frac(epochs)`` — deterministic, by the same md5 acceptance window
    as ``hash_sample``, salted with the epoch index so the fractional
    epoch is an independent draw from the full epochs. Output adds an
    ``epoch`` column (0-based) so repeated rows are distinguishable
    downstream (shuffling/packing should treat (id, epoch) as the key;
    epoch-aware shuffles also keep repeats apart in training order).

    Domains absent from the plan are dropped (epochs 0). Fractional
    epochs NEST: re-planning a domain from 2.3 to 2.6 epochs keeps every
    previously selected row and adds more, because the acceptance window
    only widens (same property as ``hash_sample``).

    Plan shape: the plan frame is #domains rows — broadcast onto the
    corpus (null-safe equi-join, no corpus shuffle), then a map-side
    ``explode(sequence(...))`` fans each row to its candidate epochs and
    the acceptance filter trims the last one. The whole apply is
    MAP-ONLY: no aggregate, no window, no driver state — it composes
    with streaming frames (plan from a batch snapshot, the standard
    rates-then-stream split ``temperature_sample`` documents) and scales
    by rows. The md5 window is engine-portable (DuckDB-parity tested,
    tests/test_functions.py).
    """
    if "epochs" not in plan.columns or "domain" not in plan.columns:
        raise ValueError("plan must have (domain, epochs) columns "
                         "(the mixture_plan output)")
    p = plan.select("domain", "epochs").withColumnRenamed(
        "domain", "_mx_domain")
    joined = df.join(
        F.broadcast(p),
        df[domain_col].eqNullSafe(p["_mx_domain"]), "inner")
    full = F.floor(F.col("epochs")).cast("int")
    frac = F.col("epochs") - full
    cand = F.explode(
        F.sequence(F.lit(0), F.greatest(
            F.ceil(F.col("epochs")).cast("int") - 1, F.lit(0))))
    salted = F.concat_ws(
        "#", F.col(id_col).cast("string"), F.col("_epoch").cast("string"))
    return (
        joined.withColumn("_epoch", cand)
        .where((F.col("_epoch") < full)
               | (_hash48(salted, seed)
                  < (frac * F.lit(_BUCKETS)).cast("long")))
        .drop("_mx_domain", "epochs")
        .withColumnRenamed("_epoch", "epoch")
    )


def split_train_eval(
    df: DataFrame,
    eval_fraction: float,
    id_col: str = "doc_id",
    *,
    groups: DataFrame | None = None,
    group_col: str = "group_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, LEAKAGE-SAFE train/eval split: every row gains a
    ``split_col`` of ``'eval'`` (hash fraction ≈ ``eval_fraction``) or
    ``'train'``.

    The leakage problem this exists for: a random row-level split puts
    near-duplicate documents on BOTH sides, and the eval half then
    scores memorization, not generalization. Pass ``groups`` — any
    (``id_col``, ``group_col``) frame, i.e. the output of
    ``dedup.duplicate_groups`` / ``similarity.embedding_dedup_groups`` /
    ``semantic_dedup_groups`` — and the split hash is taken over the
    row's GROUP id (its own id for ungrouped rows), so an entire
    near-dup family lands on ONE side, always (group-atomicity pinned in
    tests/test_split.py).

    Properties (all inherited from the ``hash_sample`` construction):
    deterministic (same seed → same split, any partitioning/cluster);
    NESTING — widening ``eval_fraction`` only grows the eval side, so a
    5% smoke eval is a subset of the 10% one; engine-portable (the
    md5-derived ``_hash48``, DuckDB/NumPy-replayable).

    Plan shape: one broadcast-free left equi-join on id against the
    bounded groups frame (grouped docs only), then a map-only CASE —
    clean rows never shuffle. At 100 TB this composes as: mine pairs
    (LSH / SemDeDup), resolve groups once, persist them as corpus
    metadata, and every split/rebalance derives from the same frame."""
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError("eval_fraction must be in [0, 1]")
    key = F.coalesce(F.col("_split_key"), F.col(id_col).cast("string"))
    if groups is not None:
        g = groups.select(
            F.col(id_col),
            F.col(group_col).cast("string").alias("_split_key"))
        joined = df.join(g, id_col, "left")
    else:
        joined = df.withColumn("_split_key",
                               F.lit(None).cast("string"))
    return joined.withColumn(
        split_col,
        F.when(_hash48(key, seed) < int(eval_fraction * _BUCKETS),
               F.lit("eval")).otherwise(F.lit("train")),
    ).drop("_split_key")
