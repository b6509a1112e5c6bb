"""Distributed Bloom filters — compact membership prefilters that keep
100 TB corpus scans map-only when the "small" side of a screen stops
being small.

The exact-decontamination join (``decontam.contamination``) broadcasts
the eval n-gram set; that works while eval sets are benchmark-sized.
Screening a corpus against a PRIOR CORPUS RELEASE (deduplicating a new
crawl against last year's tokens, the cross-release hygiene pass) makes
the right side billions of grams — too big to broadcast as join rows,
and ``broadcast_eval=False`` shuffles the ENTIRE corpus gram stream to
meet it. A Bloom filter restores the asymmetry: at ~1% false-positive
rate it spends ~1.8 bytes per member (vs ~tens of bytes per broadcast
join row), and the corpus side drops to "shuffle volume proportional
to the contamination rate, not the corpus size": only grams that PASS
the filter (true hits + the fpp sliver) ever reach the exact confirm
join. False positives cannot leak into results — the confirm join
restores exactness; the filter only prunes.

This is a SPLIT-BLOCK (register-blocked) Bloom filter — the
Putze/Sanders/Singler layout production engines use (Impala, Kudu,
Parquet column indexes): hash 0 picks one 64-bit WORD, hashes 1..k set
bits WITHIN that word. Query cost is then ONE lookup per value instead
of k scattered ones, which here buys the distributed property that
matters: membership compiles to ONE broadcast hash join (the bitset is
resident once per executor, not once per hash function) plus k
codegen'd bit tests folded into a single mask comparison. The price is
a constant-factor fpp penalty vs an ideal Bloom filter at equal bits
(all k bits share a 64-bit block), paid for here by over-provisioning
the bit budget 1.5× — build-time memory, never query-time work.

Execution shape (all JVM, no UDFs, no literals carrying the bitset):

* the bitset lives as a DataFrame of ``(word_idx long, bits long)`` —
  one 64-bit block per row, built with one ``bit_or`` aggregate over
  one row per member value (no explode). A 100M-member filter at 1%
  fpp is ~2.2M rows / ~180 MB broadcast — and it is broadcast ONCE.
* membership = broadcast join on the block index + ``(bits & mask) ==
  mask`` where ``mask`` is the k-bit pattern recomputed from the value
  (pure expressions, whole-stage codegen). A value whose block row is
  absent is definitively clean and drops at the join.
* the filter frame round-trips through parquet (``save``/``load``), so
  a release's bloom is built once and screened against many times —
  the ``bm25_corpus_stats`` persist-once precedent.

Sizing starts from the textbook m = -n·ln(p)/ln(2)^2, k = (m/n)·ln(2)
(Bloom 1970), then applies the 1.5× blocked over-provision and caps k
at 8 (past that, extra in-block bits stop earning their build cost).
``build_bloom`` counts the member set when ``num_bits`` is not given,
so callers state intent (``fpp=``) rather than internals.

No reference analogue (the reference is a univariate stats library);
parity, fpp-bound, and one-broadcast plan pins in tests/test_bloom.py.
"""

from __future__ import annotations

from dataclasses import dataclass
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "GramBloom", "optimal_params", "build_bloom",
    "filter_maybe_contains", "save_bloom", "load_bloom",
]

# word_idx of the parameter-carrying sentinel row: block indexes are
# non-negative so -1 never matches a probe key, and its presence means
# an EMPTY filter still round-trips its parameters through parquet.
_SENTINEL = -1

#: blocked-bloom bit budget multiplier vs the ideal-filter formula —
#: the constant-factor fpp penalty of confining k bits to one 64-bit
#: block, bought back with bits (Putze et al. 2007 measure ~1.2-2x for
#: 64-bit blocks at practical fpp; 1.5x centers that range and the
#: measured fp rate in tests stays within ~2x of the requested fpp)
_BLOCK_OVERPROVISION = 1.5


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(num_bits, num_hashes) for ``n_items`` members at ``fpp`` under
    the blocked layout: ideal-filter sizing × 1.5, rounded up to whole
    64-bit blocks; k = ideal k clamped to [1, 8]."""
    if n_items < 1:
        n_items = 1
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m_ideal = -n_items * math.log(fpp) / (math.log(2) ** 2)
    m = int(math.ceil(m_ideal * _BLOCK_OVERPROVISION))
    m = ((m + 63) // 64) * 64
    k = max(1, min(8, round(m_ideal / n_items * math.log(2))))
    return m, k


@dataclass(frozen=True)
class GramBloom:
    """A built filter: the bitset frame plus the parameters every probe
    must reproduce bit-for-bit (hash seeds, block count, in-block k)."""
    bits: DataFrame
    num_bits: int
    num_hashes: int
    seed: int
    n_items: int  # member count at build time (0 = unknown/loaded-empty)

    def fill_ratio(self) -> float:
        """Fraction of bits set — a health probe: the blocked
        over-provision targets ~0.35-0.45 at build sizing (ideal
        filters equilibrate at 0.5; the extra 1.5× bits push fill
        down). Much higher means the filter is undersized for its
        member count. One small aggregate over the bitset frame."""
        row = self.bits.where(F.col("word_idx") != _SENTINEL).select(
            F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).alias("s")
        ).collect()[0]
        return row["s"] / self.num_bits


def _block(value, n_blocks: int, seed: int):
    """Block (word) index of ``value`` — hash 0. NULL hashes to NULL
    and falls out of the build projection / probe join."""
    return F.pmod(F.xxhash64(value, F.lit(seed)), F.lit(n_blocks))


def _mask_expr(col_name: str, num_hashes: int, seed: int):
    """The k-bit in-block mask of a value as ONE SQL expression
    (hashes 1..k each pick a bit position in [0, 64)). SQL text rather
    than the Column API because ``shiftleft``'s Python wrapper only
    accepts a literal shift amount; the SQL function takes any
    expression. ``col_name`` must be a plain staged alias (callers
    stage ``_bv``)."""
    terms = [
        f"shiftleft(1L, cast(pmod(xxhash64({col_name}, {seed + 1 + i}), "
        f"64) as int))"
        for i in range(num_hashes)
    ]
    return F.expr(" | ".join(terms))


def build_bloom(
    values_df: DataFrame,
    value_col: str,
    *,
    num_bits: int | None = None,
    num_hashes: int | None = None,
    fpp: float = 0.01,
    seed: int = 0,
    persist: bool = True,
) -> GramBloom:
    """Build a split-block Bloom filter over the distinct non-null
    values of ``values_df[value_col]`` (any type ``xxhash64`` accepts —
    strings for gram screens, longs for id screens).

    Omit ``num_bits``/``num_hashes`` to size from a distinct count at
    the requested ``fpp`` (one counting pass over the member side — the
    side that is built ONCE and probed many times, so the count
    amortizes). The build is one row per value (block index + in-block
    mask, no explode) into one ``bit_or`` aggregate keyed by block —
    the only exchange is on the member side, bounded by num_bits/64
    groups.

    ``persist=True`` (default) caches the bitset frame: without it the
    probe's broadcast would re-run the member aggregation.
    """
    vals = values_df.select(F.col(value_col).alias("_bv")) \
        .where(F.col("_bv").isNotNull()).distinct()
    n_items = 0
    if num_bits is None:
        n_items = vals.count()
        num_bits, k_auto = optimal_params(n_items, fpp)
        if num_hashes is None:
            num_hashes = k_auto
    if num_hashes is None:
        num_hashes = 5
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    if not 1 <= num_hashes <= 16:
        raise ValueError("num_hashes must be in [1, 16]")
    n_blocks = num_bits // 64
    spark = values_df.sparkSession
    sentinel = spark.createDataFrame(
        [(_SENTINEL, 0)], "word_idx long, bits long")
    bits = (
        vals.select(
            _block(F.col("_bv"), n_blocks, seed).alias("word_idx"),
            _mask_expr("_bv", num_hashes, seed).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
        .unionByName(sentinel)
    )
    if persist:
        bits = bits.persist()
    return GramBloom(bits=bits, num_bits=num_bits,
                     num_hashes=num_hashes, seed=seed, n_items=n_items)


def filter_maybe_contains(
    df: DataFrame,
    bloom: GramBloom,
    value_col: str,
) -> DataFrame:
    """Rows of ``df`` whose ``value_col`` is POSSIBLY in the filter —
    every true member survives (no false negatives); non-members
    survive with probability ~fpp and must be settled by an exact
    confirm join downstream.

    Compiles to ONE broadcast hash join on the block index (the bitset
    is executor-resident exactly once, whatever ``num_hashes`` is)
    plus a codegen'd ``(bits & mask) == mask`` test; the probe side
    never shuffles and its columns/partitioning pass through
    unchanged. NULL values are definitively non-members (dropped,
    matching the inner-join semantics of every gram consumer).
    """
    n_blocks = bloom.num_bits // 64
    probe = bloom.bits.where(F.col("word_idx") != _SENTINEL).select(
        F.col("word_idx").alias("_bw"), F.col("bits").alias("_bbits"))
    staged = df.withColumn("_bv", F.col(value_col)) \
        .withColumn("_bblock", _block(F.col("_bv"), n_blocks, bloom.seed)) \
        .withColumn("_bmask",
                    _mask_expr("_bv", bloom.num_hashes, bloom.seed))
    return (
        staged.join(F.broadcast(probe), F.col("_bblock") == F.col("_bw"))
        .where(F.col("_bbits").bitwiseAND(F.col("_bmask"))
               == F.col("_bmask"))
        .drop("_bv", "_bblock", "_bmask", "_bw", "_bbits")
    )


def save_bloom(bloom: GramBloom, path: str) -> None:
    """Persist the filter to parquet — bitset rows plus the parameters
    as constant columns (the sentinel row guarantees at least one row,
    so parameters survive even for an empty member set)."""
    (bloom.bits
     .withColumn("num_bits", F.lit(bloom.num_bits))
     .withColumn("num_hashes", F.lit(bloom.num_hashes))
     .withColumn("seed", F.lit(bloom.seed))
     .withColumn("n_items", F.lit(bloom.n_items))
     .coalesce(1)
     .write.mode("overwrite").parquet(path))


def load_bloom(spark: SparkSession, path: str,
               persist: bool = True) -> GramBloom:
    """Load a filter written by ``save_bloom``. The bitset frame reads
    lazily; parameters come from one bounded row fetch."""
    df = spark.read.parquet(path)
    head = df.limit(1).collect()
    if not head:
        raise ValueError(f"empty bloom store at {path}")
    r = head[0]
    bits = df.select("word_idx", "bits")
    if persist:
        bits = bits.persist()
    return GramBloom(bits=bits, num_bits=r["num_bits"],
                     num_hashes=r["num_hashes"], seed=r["seed"],
                     n_items=r["n_items"])
