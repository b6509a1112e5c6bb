"""N-gram language-model perplexity — the CCNet-style statistical quality
filter: score every document by how surprising its token stream is under
a bigram model trained on a REFERENCE corpus (wiki-quality text scores
low perplexity; boilerplate soup and lorem-ipsum score high), then keep
the head/middle of the distribution.

Unlike the bounded-sample models in this repo (IVF/PQ/BPE/quality), the
LM here is fully RELATIONAL: counts are DataFrames, never driver state —
the reference corpus can be any size (counts are hot-key-safe hash
aggregates with map-side combine), and scoring is two equi-joins that
Catalyst broadcasts while the count frames are small and shuffles once
runtime stats say otherwise. Everything is deterministic closed-form
(add-k smoothing), so the whole pass — training AND scoring — is
DuckDB-reproducible; parity in tests/test_ngram_lm.py.

Tokens are ``text.word_tokens`` (the module-wide lexical spec); the
model is a bigram over that stream with add-``k`` smoothing:

    logp(w | c) = ln( (count(c, w) + k) / (count(c) + k * (V + 1)) )

where ``V`` is the reference vocabulary size and the ``+1`` reserves
one share of each context's smoothing mass for the unseen token, so an
OOV word is never more probable than every seen word. Unseen contexts
fall back to the uniform ``ln(k / (k * (V + 1)))`` — the same formula
with ``count = 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_tokens

__all__ = ["train_bigram_lm", "perplexity"]


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, ctx, w) — one row per adjacent token pair."""
    toks = word_tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.when(F.size("_t") >= 2,
                       F.slice("_t", 1, F.size("_t") - 1))
                .otherwise(F.array().cast("array<string>"))
            ).alias("_p", "ctx"),
            F.col("_t"),
        )
        .select(
            F.col(id_col), "ctx",
            F.element_at("_t", F.col("_p") + 2).alias("w"),
        )
    )


def train_bigram_lm(
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Count frames for the bigram model, from a reference corpus of ANY
    size. Returns ``{"bigrams": (ctx, w, c_bi), "contexts": (ctx, c_ctx),
    "vocab_size": V}`` — two aggregates riding one bigram explode (the
    context counts re-aggregate the bigram frame, so the token stream
    shuffles once on the (ctx, w) key and once, already reduced, on ctx).
    ``vocab_size`` counts distinct CONTEXT tokens (every non-final token;
    a final-only token contributes mass as ``w`` but no context row).
    The count frames are plain DataFrames — persist them with parquet if
    the model is reused across jobs.
    """
    if ref_df.isStreaming:
        raise ValueError(
            "train_bigram_lm requires a batch DataFrame (the vocabulary "
            "count is a blocking aggregate); train on a batch snapshot "
            "and score the stream in foreachBatch instead")
    bg = _bigrams(ref_df, text_col, id_col)
    bigrams = bg.groupBy("ctx", "w").agg(F.count(F.lit(1)).alias("c_bi"))
    contexts = bigrams.groupBy("ctx").agg(F.sum("c_bi").alias("c_ctx"))
    v = contexts.count()
    return {"bigrams": bigrams, "contexts": contexts, "vocab_size": v}


def perplexity(
    df: DataFrame,
    lm: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: float = 0.1,
) -> DataFrame:
    """Per-document bigram perplexity under ``lm``: returns
    (``<id_col>``, ``n_bigrams``, ``nll``, ``ppl``) — ``nll`` is the mean
    negative log-probability (rounded to 6), ``ppl = exp(nll)``; a
    document with fewer than two tokens has ``n_bigrams = 0`` and NULL
    scores (it passes through — length filtering is a different
    operator's decision).

    Plan shape (the 100 TB read): one map-only bigram explode, a LEFT
    join against the bigram counts on (ctx, w) and against the context
    counts on ctx (broadcast while the model is small — the usual case:
    a reference LM's vocabulary, not a corpus; AQE shuffles it
    otherwise), one per-document aggregate, then a LEFT equi-join back
    onto the id frame (both sides corpus-sized but UNIQUE on the id —
    one co-partitioned hash exchange, no broadcast, no skew) so every
    input document emits exactly one row. Unseen pairs/contexts coalesce
    to count 0 — the smoothing formula needs no special path.
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    if df.isStreaming:
        raise ValueError(
            "perplexity requires a batch DataFrame (the per-document "
            "mean is a blocking aggregate); run it inside foreachBatch "
            "for streams — the count-frame joins are stream-safe but "
            "the aggregate is not")
    v1 = lm["vocab_size"] + 1
    bg = _bigrams(df, text_col, id_col)
    scored = (
        bg.join(lm["bigrams"], ["ctx", "w"], "left")
        .join(lm["contexts"], "ctx", "left")
        .select(
            F.col(id_col),
            (-F.log(
                (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(k * v1))
            )).alias("_nlp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_nlp"), 6).alias("nll"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "nll",
            F.round(F.exp(F.col("nll")), 6).alias("ppl"),
        )
    )
