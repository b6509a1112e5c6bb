"""Sequence packing — fitting documents into fixed-token training bins.

The last mile of a pretraining data pipeline: documents become fixed-size
context windows. Two industry-standard shapes, two different Spark
strategies:

* ``pack_chunks`` — concat-and-chunk (the PRETRAINING shape): documents
  are concatenated in a deterministic pseudo-random order and the token
  stream is cut into ``capacity``-token chunks; documents may straddle a
  chunk boundary. This is pure relational algebra — a per-shard running
  token sum (one window) and integer division — so it is fully
  SQL-expressible (the DuckDB parity test in tests/test_packing.py
  reproduces it verbatim) and scales as one exchange on the shard key.
* ``pack_bins_ffd`` — whole-document first-fit-decreasing (the SFT /
  instruction-tuning shape, where an example must not be split): a
  sequential greedy that no window function expresses, run per shard as
  an Arrow-batched ``applyInPandas`` kernel. Deterministic: FFD order is
  (tokens desc, id asc), bins probed first-fit in creation order.

Sharding is the 100 TB axis for BOTH: a single global packing order would
serialize into one task (a global ordered cumsum has exactly one
partition), so the corpus is split into ``n_shards`` deterministic
md5-hash shards and packed independently within each — shards are the
unit of parallelism AND of reproducibility (same ids → same shards →
same packing on any cluster/partitioning/retry, the ``sampling.hash_sample``
determinism contract). Chunk/bin ids are (shard, local id) pairs so ids
never depend on task scheduling.

Token counts default to ``text.word_tokens`` (the BPE-ish lexer) so
packing agrees with the rest of the curation stack; pass ``length_col``
to pack by a precomputed token count (e.g. from the real tokenizer
upstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import _hash48
from .text import word_tokens

#: order documents within a shard by this many hash bits — a deterministic
#: shuffle, so consecutive documents in a chunk are an unbiased mix of the
#: corpus instead of whatever order the source listed them in
_ORDER_SEED_OFFSET = 1


def _with_shard_and_length(
    df: DataFrame,
    capacity: int,
    length_col: str | None,
    text_col: str,
    id_col: str,
    n_shards: int,
    seed: int,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    if capacity < 1:
        raise ValueError("capacity must be >= 1 token")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    reserved = {"shard", "_ord", "n_toks", "chunk_id", "start_tok",
                "chunk_tok_start", "chunk_tok_end", "bin_id", "oversize",
                id_col}
    clash = [c for c in (carry_cols or []) if c in reserved]
    if clash:
        raise ValueError(f"carry_cols {clash} collide with packing "
                         f"output columns; alias them first")
    n_toks = (F.col(length_col).cast("long") if length_col is not None
              else F.size(word_tokens(F.col(text_col))).cast("long"))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (carry_cols or [])],
        n_toks.alias("n_toks"),
        F.pmod(_hash48(F.col(id_col), seed), F.lit(n_shards))
        .cast("int").alias("shard"),
        # deterministic pseudo-random order WITHIN the shard (different
        # seed stream than the shard hash, or order would correlate with
        # shard membership)
        _hash48(F.col(id_col), seed + _ORDER_SEED_OFFSET).alias("_ord"),
    ).where(F.col("n_toks") > 0)


def pack_chunks(
    df: DataFrame,
    capacity: int,
    *,
    length_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 42,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: one row per (document, chunk) span.

    Within each shard, documents are concatenated in deterministic hash
    order; the resulting token stream is cut every ``capacity`` tokens.
    Output columns: ``shard``, ``chunk_id`` (per shard, 0-based),
    ``doc_id``, ``n_toks`` (document total), ``start_tok`` (document's
    offset in the shard stream), ``chunk_tok_start``/``chunk_tok_end``
    (the [start, end) slice of THIS document's tokens that lands in this
    chunk). A document spanning k boundaries emits k+1 rows; every token
    lands in exactly one chunk, so chunk utilization is 100% by
    construction (the final short chunk per shard aside).

    Plan shape: one exchange on ``shard`` (the window), then map-side
    span arithmetic + a bounded ``sequence`` explode (a document emits at
    most ceil(n_toks/capacity)+1 rows). No driver state, no Python.
    ``carry_cols`` rides provenance columns (language, source, PII
    counts…) through the shard exchange for free — re-attaching them
    after the fact would cost a corpus×corpus join.
    """
    carry = list(carry_cols or [])
    staged = _with_shard_and_length(
        df, capacity, length_col, text_col, id_col, n_shards, seed,
        carry_cols=carry)
    w = Window.partitionBy("shard").orderBy(
        F.col("_ord").asc(), F.col(id_col).asc())
    spans = staged.select(
        "shard", id_col, "n_toks", *carry,
        (F.sum("n_toks").over(w) - F.col("n_toks")).alias("start_tok"),
    )
    # integer `div`, not float `/`: double division loses exactness past
    # 2^53 tokens per shard, which would silently misplace chunk
    # boundaries on a shard-shaped token stream that large
    first_c = F.expr(f"start_tok div {capacity}")
    last_c = F.expr(f"(start_tok + n_toks - 1) div {capacity}")
    seg = spans.select(
        "shard", id_col, "n_toks", "start_tok", *carry,
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
    )
    c_lo = F.col("chunk_id") * capacity
    c_hi = c_lo + capacity
    return seg.select(
        "shard", "chunk_id", id_col, "n_toks", "start_tok", *carry,
        (F.greatest(c_lo, F.col("start_tok")) - F.col("start_tok"))
        .alias("chunk_tok_start"),
        (F.least(c_hi, F.col("start_tok") + F.col("n_toks"))
         - F.col("start_tok")).alias("chunk_tok_end"),
    )


def pack_bins_ffd(
    df: DataFrame,
    capacity: int,
    *,
    length_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Whole-document first-fit-decreasing bin packing: one row per
    document — (shard, bin_id, doc_id, n_toks, oversize).

    No document is split across bins (the SFT contract); a bin's total
    never exceeds ``capacity`` EXCEPT the degenerate single-document bin
    of an oversize document (``oversize = true``, n_toks > capacity) —
    flagged, not dropped, so the caller decides truncate-vs-discard.

    FFD is inherently sequential (each placement depends on all previous
    bins' fill), so no window function expresses it; it runs as an
    Arrow-batched per-shard kernel (``applyInPandas``). Within a shard
    the order is (n_toks desc, id asc) and bins are probed first-fit in
    creation order — fully deterministic, partitioning-independent. FFD
    uses ≤ (11/9)·OPT + 6/9 bins (Dósa's bound, public result), so waste
    is bounded ~22% worst-case and typically a few percent.

    Shards cap kernel state at O(docs-per-shard); size ``n_shards`` so a
    shard's (id, n_toks) pairs fit one task's memory — the documents'
    TEXT never enters the kernel.
    """
    staged = _with_shard_and_length(
        df, capacity, length_col, text_col, id_col, n_shards, seed)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_toks", id_col], ascending=[False, True],
            kind="mergesort", ignore_index=True)
        fills: list[int] = []  # bin → tokens used
        bin_ids: list[int] = []
        for t in pdf["n_toks"]:
            t = int(t)
            placed = -1
            if t <= capacity:
                for b, used in enumerate(fills):
                    if used + t <= capacity:
                        placed = b
                        break
            if placed < 0:  # no bin fits (or oversize doc): open a new one
                placed = len(fills)
                fills.append(0)
            fills[placed] += t
            bin_ids.append(placed)
        out = pdf[["shard", id_col, "n_toks"]].copy()
        out["bin_id"] = pd.array(bin_ids, dtype="int64")
        out["oversize"] = out["n_toks"] > capacity
        return out

    out_schema = (
        f"shard int, `{id_col}` "
        f"{dict(staged.dtypes)[id_col]}, n_toks long, bin_id long, "
        f"oversize boolean")
    return (
        staged.select("shard", id_col, "n_toks")
        .groupBy("shard").applyInPandas(ffd, out_schema)
    )


def packing_stats(packed_bins: DataFrame, capacity: int) -> DataFrame:
    """Utilization summary of a ``pack_bins_ffd`` result, per shard:
    bins, docs, token fill, utilization, and oversize-document count.
    ``utilization`` = fill / (bins·capacity) over NON-oversize bins only
    (an oversize doc's solo bin says nothing about packing quality);
    a shard consisting solely of oversize bins reports 0.0, not NULL,
    so threshold alerts can't silently skip it. Small aggregate for
    pipeline monitoring."""
    per_bin = packed_bins.groupBy("shard", "bin_id").agg(
        F.sum("n_toks").alias("_fill"),
        F.count(F.lit(1)).alias("_docs"),
        F.max(F.col("oversize").cast("int")).alias("_over"),
    )
    return per_bin.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("_docs").alias("n_docs"),
        F.sum("_fill").alias("total_tokens"),
        F.coalesce(
            F.round(
                # try_divide, not `/`: an all-oversize shard has zero
                # non-oversize bins and ANSI `/` throws DIVIDE_BY_ZERO
                # instead of the NULL the coalesce expects
                F.try_divide(
                    F.sum(F.when(F.col("_over") == 0, F.col("_fill"))
                          .otherwise(F.lit(0))),
                    F.sum(F.when(F.col("_over") == 0, F.lit(1)).otherwise(
                        F.lit(0))) * F.lit(capacity)),
                6,
            ),
            F.lit(0.0),
        ).alias("utilization"),
        F.sum("_over").alias("n_oversize"),
    )


def pack_token_ids(
    df: DataFrame,
    capacity: int,
    *,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 42,
) -> DataFrame:
    """TOKEN-EXACT concat-and-chunk packing: assemble the fixed-length id
    sequences themselves, not just the span bookkeeping. Input rows carry a
    tokenizer-id array (e.g. ``bpe.bpe_ids`` over ``bpe_encode`` output);
    output is one row per (shard, chunk) ready for a training loader:

      shard, chunk_id, input_ids array (exactly ``capacity`` ids except
      each shard's final chunk), n_docs, and doc_spans — one
      (doc_id, start, end) struct per document piece, [start, end) offsets
      INTO input_ids, ordered by position — the attention-mask /
      provenance sidecar.

    Composition of ``pack_chunks`` (same shard hash, same order hash, same
    span arithmetic — the chunk boundaries are bit-identical to the
    bookkeeping operator's) with an array-slice + one grouped assembly.
    Plan shape: the pack_chunks shard-window exchange, then ONE exchange
    on (shard, chunk_id) for the assembly aggregation; the id arrays ride
    both exchanges (they must — the payload IS the output; at 100 TB the
    bytes-per-chunk is capacity × 4-8 B, so chunk rows are ~fixed-size and
    the aggregation state is bounded by capacity, not document length).
    Deterministic: same ids + seed ⇒ same chunks on any partitioning.
    Rows with NULL or empty id arrays are DROPPED (pack_chunks' n_toks>0
    filter, applied before the shard window — they cannot shift later
    documents' offsets; pinned in tests/test_token_packing.py).
    """
    spans = pack_chunks(
        df.select(F.col(id_col), F.col(ids_col),
                  F.size(F.col(ids_col)).cast("long").alias("_n_ids")),
        capacity, length_col="_n_ids", id_col=id_col,
        n_shards=n_shards, seed=seed, carry_cols=[ids_col])
    piece = F.slice(
        F.col(ids_col),
        F.col("chunk_tok_start").cast("int") + 1,
        (F.col("chunk_tok_end") - F.col("chunk_tok_start")).cast("int"))
    pos = F.greatest(F.col("chunk_id") * capacity, F.col("start_tok")) \
        - F.col("chunk_id") * capacity
    parts = spans.select(
        "shard", "chunk_id",
        F.struct(
            pos.cast("long").alias("pos"),
            F.col(id_col).alias(id_col),
            piece.alias("piece"),
        ).alias("_part"))
    assembled = parts.groupBy("shard", "chunk_id").agg(
        F.sort_array(F.collect_list("_part")).alias("_parts"))
    return assembled.select(
        "shard", "chunk_id",
        F.flatten(F.transform(F.col("_parts"), lambda p: p["piece"]))
        .alias("input_ids"),
        F.size("_parts").alias("n_docs"),
        F.transform(
            F.col("_parts"),
            lambda p: F.struct(
                p[id_col].alias(id_col),
                p["pos"].alias("start"),
                (p["pos"] + F.size(p["piece"])).alias("end")),
        ).alias("doc_spans"),
    )
