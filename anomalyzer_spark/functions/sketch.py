"""Mergeable HyperLogLog distinct-count profiles — the cardinality leg
of incremental corpus monitoring.

``drift.histogram_profile``/``merge_profiles`` fold value DISTRIBUTIONS
across shard profiles without rescans; distinct counts (unique urls,
domains, content hashes, users) don't fold that way — per-shard distinct
counts are not additive, and Spark's ``approx_count_distinct`` keeps its
HLL state opaque inside one aggregation, so it cannot be persisted per
shard and merged weeks later. This module keeps the sketch as a plain
DataFrame of registers, so it parquets, diffs, and merges like any other
profile:

* **hll_profile**: (column, p, reg, rho) — one row per OCCUPIED
  register per profiled column. Built by ONE map-side-combined
  ``max`` aggregate over the scan (partial state per task is at most
  ``m = 2**p`` rows per column — bounded, spill-free). The hash is
  md5-derived (first 15 hex digits = 60 bits: ``p`` register bits,
  ``w = 60 - p`` rank bits) so DuckDB replays every register exactly
  (``('0x' || substr(md5(..), 1, 15))::BIGINT`` — the ``_hash48``
  convention); the rank (leading-zero count) is EXACT INTEGER bit math
  (smear + ``bit_count``), no float ``log2`` edge cases in either
  engine.
* **merge_hll**: union + ``max`` per register — HLL's register-wise max
  is associative/commutative/idempotent, so shard profiles merge into
  exactly the whole-corpus profile (pinned to equality in tests), and
  re-merging a shard is a no-op (at-least-once-safe).
* **hll_estimate**: the standard Flajolet–Fusy–Gandouet–Meunier
  estimator with linear-counting small-range correction. The harmonic
  fold is computed as an EXACT integer sum (each register contributes
  ``2**(w + 1 - rho)`` scaled units, summed in decimal(38,0)) so the
  estimate is bit-stable across partitionings and engines; floats
  appear only in the final alpha·m²/S division. Relative error is the
  usual ~1.04/sqrt(m) (p=12 ⇒ ~1.6%).

At 100 TB: profile each shard as it lands (the cost is the scan you
already pay, plus a ≤ m-row aggregate), persist the kilobyte register
frames, and answer "distinct documents this month" by merging frames —
the corpus is never rescanned. NULLs are skipped (count of distinct
non-null values, matching ``count(DISTINCT col)`` semantics); values
hash by their string form (the repo-wide portable-hash convention), so
cross-type equality follows string equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_estimate", "hll_overlap", "hll_profile", "merge_hll",
           "merge_mg", "mg_profile"]

#: hash width in bits (15 md5 hex digits — fits BIGINT in both engines)
_HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias constant (p >= 4)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _h60(value: Column) -> Column:
    """60-bit md5-derived hash of the value's string form (portable:
    DuckDB replays it digit-for-digit)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("hll"), value.cast("string"))
                  .cast("binary")), 1, 15),
        16, 10,
    ).cast("long")


def _rho(rem: Column, w: int) -> Column:
    """1 + number of leading zeros of ``rem`` within ``w`` bits, via
    bit smear + bit_count — exact integer math (floor(log2()) on a
    double can misround at exact powers of two; this cannot)."""
    s = rem
    for shift in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftright(s, shift))
    return F.lit(w + 1) - F.bit_count(s)


def hll_profile(
    df: DataFrame,
    cols: list[str],
    *,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sparse HLL register frame for each column: (*group_cols, column,
    p, reg, rho) with one row per occupied register, ``rho`` the max
    rank seen. ``p`` register-index bits (m = 2**p registers,
    4 <= p <= 16); absent registers mean rho 0. One unpivot scan
    feeding ONE ``max`` aggregate — map-side combined, partial state
    bounded by m rows per (group, column) per task.

    ``group_cols=["domain"]`` keeps one sketch PER GROUP (distinct urls
    per domain, unique users per tenant — the grouped-cardinality
    monitor): the group keys simply become extra frame columns, and
    ``merge_hll`` / ``hll_estimate`` / ``hll_overlap`` key on every
    non-register column automatically, so grouped profiles persist,
    merge and estimate exactly like global ones (pinned: a group's rows
    equal the ungrouped profile of that group's slice). NULL group
    keys form their own group (Spark groupBy semantics). State is
    m rows per group — sketch many groups, but mind groups × m."""
    if not cols:
        raise ValueError("hll_profile needs at least one column")
    if not 4 <= p <= 16:
        raise ValueError("need 4 <= p <= 16")
    group_cols = list(group_cols or [])
    clash = set(group_cols) & {"column", "p", "reg", "rho"}
    if clash:
        raise ValueError(f"group_cols clash with profile schema: {clash}")
    w = _HASH_BITS - p
    # one-scan unpivot (the drift._unpivot shape: explode of an array of
    # cheap structs — NOT a union of per-column projections, which would
    # scan the input once per column)
    rows = [F.struct(F.lit(c).alias("column"),
                     F.col(c).cast("string").alias("v")) for c in cols]
    long = (df.select(*[F.col(g) for g in group_cols],
                      F.explode(F.array(*rows)).alias("r"))
            .select(*group_cols, "r.*")
            .where(F.col("v").isNotNull()))
    h = _h60(F.col("v"))
    u = long.select(
        *group_cols,
        F.col("column"),
        F.shiftright(h, w).alias("reg"),
        _rho(h.bitwiseAND(F.lit((1 << w) - 1)), w).alias("_rho"))
    return (u.groupBy(*group_cols, "column", "reg")
            .agg(F.max("_rho").alias("rho"))
            .select(*group_cols, "column", F.lit(p).alias("p"),
                    "reg", "rho"))


def merge_hll(profiles: list[DataFrame]) -> DataFrame:
    """Fold per-shard ``hll_profile`` frames into one — register-wise
    max, so merge(shards) == profile(whole corpus) EXACTLY (pinned),
    re-merging a shard is a no-op, and merge order never matters.
    Mixed ``p`` for the same column is REJECTED (register indices from
    different p are incomparable; profile shards with one p). Operates
    on the kilobyte frames only — no corpus access. Grouped profiles
    (``hll_profile(group_cols=...)``) merge the same way: every column
    besides (reg, rho) is a key."""
    if not profiles:
        raise ValueError("merge_hll needs at least one profile")
    u = profiles[0]
    for prof in profiles[1:]:
        u = u.unionByName(prof)
    keys = _hll_keys(u)
    ident = [c for c in keys if c != "p"]
    bad = [tuple(r[c] for c in ident) for r in
           u.select(*keys).distinct()
           .groupBy(*ident).agg(F.count(F.lit(1)).alias("np"))
           .where(F.col("np") > 1).collect()]
    if bad:
        raise ValueError(
            f"inconsistent p across shards for columns {sorted(bad)}; "
            "re-profile with one p to make sketches mergeable")
    return (u.groupBy(*keys, "reg")
            .agg(F.max("rho").alias("rho")))


def _hll_keys(profile: DataFrame) -> list[str]:
    """Every non-register column of an HLL frame — ('column', 'p') plus
    whatever group keys the profile carries — in frame order."""
    return [c for c in profile.columns if c not in ("reg", "rho")]


def hll_estimate(profile: DataFrame) -> DataFrame:
    """(column, p, n_est double) from a register frame. Raw estimate
    ``alpha(m) · m² / Σ 2^-rho`` (empty registers contribute 2⁰ each);
    linear counting ``m · ln(m / V)`` when the raw estimate is below
    2.5 m and some register is empty (V = count of empty registers).
    The harmonic sum is folded as exact scaled integers in
    decimal(38,0) — ``2^(w+1-rho)`` per occupied register — so the
    result is independent of partitioning and row order; no
    large-range correction (at 60 hash bits, collision bias is
    negligible below ~10^16 distinct). Grouped profiles estimate per
    group (one output row per key combination)."""
    keys = _hll_keys(profile)
    # one tiny aggregate per key over the (<= m)-row register frame
    agg = (profile.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_occ"),
        # shiftleft by a COLUMN exponent (the PySpark wrapper only takes
        # int literals; the SQL builtin takes expressions)
        F.sum(F.expr(
            f"cast(shiftleft(cast(1 as bigint), "
            f"{_HASH_BITS + 1} - p - rho) as decimal(38,0))"))
        .alias("_ssum")))
    m = F.pow(F.lit(2.0), F.col("p"))
    v = m - F.col("_occ")
    scale = F.pow(F.lit(2.0), F.lit(float(_HASH_BITS + 1)) - F.col("p"))
    inv_sum = (F.col("_ssum").cast("double") + v * scale) / scale
    alpha = (
        F.when(F.col("p") == 4, F.lit(_alpha(16)))
        .when(F.col("p") == 5, F.lit(_alpha(32)))
        .when(F.col("p") == 6, F.lit(_alpha(64)))
        .otherwise(F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)))
    raw = alpha * m * m / inv_sum
    est = F.when((raw <= 2.5 * m) & (v > 0), m * F.log(m / v)) \
        .otherwise(raw)
    return agg.select(*keys, est.alias("n_est"))


def hll_overlap(profile_a: DataFrame, profile_b: DataFrame) -> DataFrame:
    """Distinct-overlap estimate between two profiled corpora (releases,
    snapshots, shards) from their register frames ALONE — no joins over
    data, no rescans: (column, p, n_a, n_b, n_union, n_intersection)
    per shared column, via inclusion–exclusion
    (``n_intersection = n_a + n_b − n_union``, clamped at 0, with the
    union estimated from ``merge_hll`` — registers union losslessly).

    The standard HLL caveat applies and is the contract here: the
    intersection's ABSOLUTE error scales with the UNION's size
    (~1.04/√m of ``n_union``), so a small true overlap between two huge
    corpora estimates noisily — use the exact/bloom ``decontam`` legs
    when the decision needs per-item truth; this answers the corpus-
    level "how much do these releases share?" question at profile
    cost. Columns (or grouped keys) present in only one profile are
    omitted (no overlap statement can be made); mixed p is rejected by
    the merge. Grouped profiles overlap per group."""
    keys = _hll_keys(profile_a)
    est_a = hll_estimate(profile_a).withColumnRenamed("n_est", "n_a")
    est_b = hll_estimate(profile_b).withColumnRenamed("n_est", "n_b")
    est_u = hll_estimate(merge_hll([profile_a, profile_b])) \
        .withColumnRenamed("n_est", "n_union")
    return (est_a.join(est_b, keys)
            .join(est_u, keys)
            .select(*keys, "n_a", "n_b", "n_union",
                    F.greatest(
                        F.lit(0.0),
                        F.col("n_a") + F.col("n_b") - F.col("n_union"))
                    .alias("n_intersection")))


# ---------------------------------------------------------------------------
# Misra–Gries mergeable heavy hitters
# ---------------------------------------------------------------------------

def _mg_keys(profile: DataFrame) -> list[str]:
    """Every key column of an MG frame — 'column' plus whatever group
    keys the profile carries — in frame order."""
    return [c for c in profile.columns
            if c not in ("key", "cnt", "off", "n")]


def _mg_compress(
    counts: DataFrame, k: int, keys: list[str],
) -> tuple[DataFrame, DataFrame]:
    """MG compression of an exact (*keys, key, cnt) frame: subtract each
    key-combination's (k+1)-th largest count and keep the strictly-
    positive remainder (≤ k survivors per combination; ties at the
    threshold drop). The ranking window is partitioned by ``keys`` with
    the rnk filter adjacent, so WindowGroupLimit caps every map
    partition's contribution at k+1 rows per combination BEFORE the
    exchange — the counts frame itself never funnels through one task.
    Returns (survivors (*keys, key, cnt), thresholds (*keys, _thr) —
    one row per input combination)."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy(*keys)
         .orderBy(F.col("cnt").desc(), F.col("key").asc()))
    thr = (counts.withColumn("_rnk", F.row_number().over(w))
           .where(F.col("_rnk") <= k + 1)
           .groupBy(*keys)
           .agg(F.coalesce(
               F.max(F.when(F.col("_rnk") == k + 1, F.col("cnt"))),
               F.lit(0).cast("long")).alias("_thr")))
    survivors = (counts.join(F.broadcast(thr), keys)
                 .select(*keys, "key",
                         (F.col("cnt") - F.col("_thr")).alias("cnt"))
                 .where(F.col("cnt") > 0))
    return survivors, thr


def mg_profile(
    df: DataFrame,
    cols: list[str],
    *,
    k: int = 64,
    group_cols: list[str] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Mergeable Misra–Gries heavy-hitter summary per column: (column,
    key string, cnt, off, n) with ≤ ``k`` survivor rows per column plus
    ONE metadata sentinel row (key NULL, cnt 0) that keeps (off, n)
    available even when no value survives compression. The guarantee
    (pinned in tests): for every value x with true count f(x),
    ``cnt(x) ≤ f(x) ≤ cnt(x) + off`` (cnt = 0 when absent), and every x
    with ``f(x) > off`` IS present; ``off ≤ n / (k+1)``. ``n`` is the
    column's non-null row count.

    This is the UNBOUNDED-cardinality complement to
    ``drift.category_profile`` (exact, mergeable, but O(distinct) rows)
    and ``checks.top_share`` (exact one-pass gate, no persistence):
    top domains/urls/tokens per shard as a ≤ k-row frame that folds
    across shards without rescans (``merge_mg`` — merged guarantees
    compose per Agarwal et al., *Mergeable Summaries*, PODS'12). Values
    summarize by their string form (the repo-wide portable convention);
    NULLs are skipped. Cost: the per-(column, value) count aggregate —
    map-side combined, hot values are hot KEYS, not hot partitions —
    plus the map-side-limited ranking described in ``_mg_compress``.

    The counts frame feeds THREE consumers (threshold ranking,
    survivor subtraction, per-column totals) and Catalyst gives them no
    ReusedExchange (the bm25/tfidf precedent), which would mean three
    corpus scans — so ``materialize=True`` (default) eagerly
    localCheckpoints it: one corpus scan, one count exchange, and every
    consumer reads the (O(distinct values), distributed) checkpoint.
    Pass ``materialize=False`` for a lazy plan-only frame.

    ``group_cols=["domain"]`` keeps one summary PER GROUP (top urls per
    domain — the grouped-tops monitor): group keys become frame columns
    (one sentinel per (group, column)) and ``merge_mg`` keys on them
    automatically (the grouped-HLL convention). The guarantee and all
    row bounds then hold per group; state is ≤ k+1 rows per
    (group, column)."""
    if not cols:
        raise ValueError("mg_profile needs at least one column")
    if k < 1:
        raise ValueError("k must be >= 1")
    group_cols = list(group_cols or [])
    clash = set(group_cols) & {"column", "key", "cnt", "off", "n"}
    if clash:
        raise ValueError(f"group_cols clash with profile schema: {clash}")
    keys = group_cols + ["column"]
    rows = [F.struct(F.lit(c).alias("column"),
                     F.col(c).cast("string").alias("key")) for c in cols]
    u = (df.select(*[F.col(g) for g in group_cols],
                   F.explode(F.array(*rows)).alias("r"))
         .select(*group_cols, "r.*")
         .where(F.col("key").isNotNull()))
    counts = u.groupBy(*keys, "key").agg(F.count(F.lit(1)).alias("cnt"))
    if materialize:
        counts = counts.localCheckpoint(eager=True)
    n = counts.groupBy(*keys).agg(F.sum("cnt").alias("n"))
    survivors, thr = _mg_compress(counts, k, keys)
    # metadata per key combination (covers every profiled one, including
    # those whose values all died in compression); NULL-key sentinel
    # keeps it in the frame
    meta = (n.join(thr, keys)
            .select(*keys, F.col("_thr").cast("long").alias("off"), "n"))
    out = survivors.join(F.broadcast(meta), keys) \
        .select(*keys, "key", "cnt", "off", "n")
    sentinel = meta.select(
        *keys, F.lit(None).cast("string").alias("key"),
        F.lit(0).cast("long").alias("cnt"), "off", "n")
    return out.unionByName(sentinel)


def merge_mg(profiles: list[DataFrame], *, k: int = 64) -> DataFrame:
    """Fold per-shard ``mg_profile`` frames into one ≤ k-row-per-column
    summary of the UNION of the shards — counter-wise sum, then one MG
    compression; the error offsets add (plus the new compression's
    threshold), so the merged ``off`` keeps the containment guarantee
    ``cnt ≤ f ≤ cnt + off`` over the union. Merge order never matters
    (pinned). Operates on the ≤ k-row frames only — no corpus access
    and no driver round-trips: each input's per-column (off, n) rides
    its NULL-key sentinel row (exactly one per column by construction,
    in fresh and merged profiles alike), so shard metadata folds as a
    plain sum over sentinel rows."""
    if not profiles:
        raise ValueError("merge_mg needs at least one profile")
    if k < 1:
        raise ValueError("k must be >= 1")
    u = profiles[0]
    for prof in profiles[1:]:
        u = u.unionByName(prof)
    return _merge_mg_union(u, k)


def _merge_mg_union(u: DataFrame, k: int) -> DataFrame:
    """Merge a UNION of MG profile frames: survivor rows carry
    denormalized (off, n) copies, but only the NULL-key sentinels
    (exactly one per input per key combination) are authoritative —
    their sum is the merged offset/row count. Key columns ('column'
    plus any group keys) come from the schema. Shared by ``merge_mg``
    and the streaming sketch store reader, which hands the union over
    as one batch_id-partitioned scan instead of a frame per
    micro-batch."""
    keys = _mg_keys(u)
    summed = (u.where(F.col("key").isNotNull())  # drop metadata sentinels
              .groupBy(*keys, "key").agg(F.sum("cnt").alias("cnt")))
    meta_df = (u.where(F.col("key").isNull())
               .groupBy(*keys)
               .agg(F.sum("off").alias("_off"), F.sum("n").alias("n")))
    survivors, thr = _mg_compress(summed, k, keys)
    new_meta = (meta_df.join(
        F.broadcast(thr), keys, "left")
        .select(*keys,
                (F.col("_off")
                 + F.coalesce(F.col("_thr"), F.lit(0))).alias("off"),
                "n"))
    out = survivors.join(F.broadcast(new_meta), keys) \
        .select(*keys, "key", "cnt", "off", "n")
    sentinel = new_meta.select(
        *keys, F.lit(None).cast("string").alias("key"),
        F.lit(0).cast("long").alias("cnt"), "off", "n")
    return out.unionByName(sentinel)
