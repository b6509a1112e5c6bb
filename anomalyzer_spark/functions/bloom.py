"""Distributed Bloom filters — compact membership prefilters that keep
100 TB corpus scans map-only when the "small" side of a screen stops
being small.

The exact-decontamination join (``decontam.contamination``) broadcasts
the eval n-gram set; that works while eval sets are benchmark-sized.
Screening a corpus against a PRIOR CORPUS RELEASE (deduplicating a new
crawl against last year's tokens, the cross-release hygiene pass) makes
the right side billions of grams — too big to broadcast as join rows,
and ``broadcast_eval=False`` shuffles the ENTIRE corpus gram stream to
meet it. A Bloom filter restores the asymmetry: at 1% false-positive
rate it spends ~1.2 bytes per member (vs ~tens of bytes per broadcast
join row), so a billion-gram reference set becomes a ~1.2 GB bitset —
and the corpus side drops to "shuffle volume proportional to the
contamination rate, not the corpus size": only grams that PASS the
filter (true hits + the fpp sliver) ever reach the exact confirm join.
False positives cannot leak into results — the confirm join restores
exactness; the filter only prunes.

Execution shape (all JVM, no UDFs, no literals carrying the bitset):

* the bitset lives as a DataFrame of ``(word_idx long, bits long)`` —
  64 filter bits per row, built with one ``bit_or`` aggregate over the
  k hash positions of the member values (``xxhash64`` with per-hash
  seeds, ``pmod num_bits``). A 2^23-bit filter is 131k rows / ~2 MB.
* membership compiles to k successive BROADCAST hash joins of the gram
  stream against that frame (join key ``pos div 64``) plus a bit test
  ``bits & shiftleft(1L, pos % 64)`` — map-side only, inside
  whole-stage codegen, and each join PRUNES: a gram missing any word
  row is definitively absent and drops at that join (inner join
  against set-words only). The probe side never exchanges.
* the filter frame round-trips through parquet (``save``/``load``), so
  a release's bloom is built once and screened against many times —
  the ``bm25_corpus_stats`` persist-once precedent.

Sizing is the textbook formula: m = -n·ln(p)/ln(2)^2 bits and
k = (m/n)·ln(2) hashes for n members at false-positive rate p
(Bloom 1970; the same sizing Spark's own ``BloomFilterImpl`` uses for
runtime join filters). ``build_bloom`` counts the member set when
``num_bits`` is not given, so callers state intent (``fpp=``) rather
than internals.

No reference analogue (the reference is a univariate stats library);
parity and fpp-bound tests in tests/test_bloom.py.
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

# word_idx of the parameter-carrying sentinel row: positions are
# non-negative so -1 never matches a probe key, and its presence means
# an EMPTY filter still round-trips its parameters through parquet.
_SENTINEL = -1


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(num_bits, num_hashes) for ``n_items`` members at ``fpp`` —
    m = -n·ln(p)/ln(2)^2 rounded up to a multiple of 64, k = m/n·ln(2)
    clamped to [1, 16]."""
    if n_items < 1:
        n_items = 1
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, min(16, round(m / n_items * math.log(2))))
    return m, k


@dataclass(frozen=True)
class GramBloom:
    """A built filter: the bitset frame plus the parameters every probe
    must reproduce bit-for-bit (hash seeds and modulus)."""
    bits: DataFrame
    num_bits: int
    num_hashes: int
    seed: int
    n_items: int  # member count at build time (0 = unknown/loaded-empty)

    def fill_ratio(self) -> float:
        """Fraction of bits set — a health probe: > ~0.5 means the
        filter is undersized for its member count and fpp is degrading
        (expected fill is 1-(1-1/m)^(kn) ~ 1-e^(-kn/m) ~ 0.5 at the
        optimal k). One small aggregate over the bitset frame."""
        row = self.bits.where(F.col("word_idx") != _SENTINEL).select(
            F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).alias("s")
        ).collect()[0]
        return row["s"] / self.num_bits


def _position(value, num_bits: int, seed: int, i: int):
    """Hash position i of ``value`` — xxhash64 with a distinct per-hash
    seed column, pmod to [0, num_bits). NULL values hash to NULL and
    fall out of the build explode / probe joins."""
    return F.pmod(F.xxhash64(value, F.lit(seed + i)), F.lit(num_bits))


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
    """Build a Bloom filter over the distinct non-null values of
    ``values_df[value_col]`` (any type ``xxhash64`` accepts — strings
    for gram screens, longs for id screens).

    Omit ``num_bits``/``num_hashes`` to size from a distinct count at
    the requested ``fpp`` (one counting pass over the member side — the
    side that is built ONCE and probed many times, so the count
    amortizes). The build is one explode (k positions per value) into
    one ``bit_or`` aggregate keyed by 64-bit word index — the only
    exchange is on the member side, bounded by num_bits/64 groups.

    ``persist=True`` (default) caches the bitset frame: every probe
    broadcasts it ``num_hashes`` times, and without caching each
    broadcast would re-run the member aggregation.
    """
    vals = values_df.select(F.col(value_col).alias("_v")) \
        .where(F.col("_v").isNotNull()).distinct()
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
    spark = values_df.sparkSession
    sentinel = spark.createDataFrame(
        [(_SENTINEL, 0)], "word_idx long, bits long")
    bits = (
        vals.select(F.explode(F.array(*[
            _position(F.col("_v"), num_bits, seed, i)
            for i in range(num_hashes)
        ])).alias("_pos"))
        .select(
            F.expr("_pos div 64").alias("word_idx"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_bit"),
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

    Compiles to ``num_hashes`` broadcast hash joins (probe side never
    shuffles; each join prunes misses immediately) plus codegen'd bit
    tests. Columns and partitioning of ``df`` pass through unchanged.
    NULL values are definitively non-members (dropped, matching the
    inner-join semantics of every gram consumer).
    """
    out = df
    probe = bloom.bits.where(F.col("word_idx") != _SENTINEL)
    for i in range(bloom.num_hashes):
        p, w, b = f"_bpos{i}", f"_bw{i}", f"_bbits{i}"
        side = probe.select(F.col("word_idx").alias(w),
                            F.col("bits").alias(b))
        out = (
            out.withColumn(
                p, _position(F.col(value_col), bloom.num_bits,
                             bloom.seed, i))
            .join(F.broadcast(side), F.expr(f"{p} div 64") == F.col(w))
            .where(F.expr(
                f"({b} & shiftleft(1L, cast({p} % 64 as int))) != 0"))
            .drop(p, w, b)
        )
    return out


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
