"""Lexical corpus retrieval: BM25 top-k document ranking for a set of
queries — the classic keyword-search complement to the embedding-space
ANN operators (``similarity``) and the per-document keyword extraction
of ``text.tfidf_terms``. Typical pipeline uses: retrieval-augmented
dataset construction, eval-set sourcing ("find the corpus documents a
benchmark question could have leaked from" — the lexical pre-filter
``decontam`` runs exact n-grams for), and corpus QA ("what does the
corpus say about X").

Tokenization is ``text.word_tokens`` — the repo-wide lexical spec shared
with ``vocab``/``tfidf_terms``/``text_profile`` — so scores are
consistent with the rest of the text stack and replayable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anomalyzer_spark.functions.text import word_tokens

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "query_id",
    materialize: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25.

    Scoring is the Lucene formulation: per shared term ``t``,
    ``idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
    ``idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))`` — strictly
    positive even for a term in every document. Query terms are
    DISTINCT per query (query term frequency is ignored — the standard
    short-query simplification; repeat a term across queries, not
    within one, if you want to boost it). Documents sharing no term
    with a query simply don't appear. Returns (``<qid_col>``,
    ``<id_col>``, ``score``, ``rnk``) — at most ``k`` rows per query,
    ``score`` rounded to 6, ties broken by ascending document id.

    Plan shape (the 100 TB read): the query frame is assumed SMALL
    (an eval set, not a second corpus) — its distinct terms broadcast,
    so the corpus-side explode is filtered MAP-SIDE to postings of
    query terms only and the full postings list never exists, let
    alone shuffles. Document length rides the explode as a map-only
    ``size(word_tokens(...))`` column (no corpus-sized length join
    later), so the only corpus-keyed exchange is the (doc, term) tf
    aggregate over the FILTERED postings, map-side-combined. Document
    frequency re-aggregates that same bounded frame (#query-terms
    rows) and comes back as a broadcast, as do the corpus constants
    N/avgdl (a one-row map-side-combined aggregate — the one
    unavoidable second scan leg, map-only and column-pruned to
    ``text``). The per-query top-k is one window exchange keyed by
    query with map-side WindowGroupLimit, so no query ships more than
    ``k`` candidates per split. Hot terms (a stopword in a query) are
    hot KEYS with partial aggregation, not hot partitions.

    The filtered tf frame feeds BOTH the scoring join and the
    document-frequency aggregate, and Catalyst gives the two consumers
    no ReusedExchange (they prune different columns — the ``tfidf``
    precedent); unlike ``tfidf``, here the shared frame is BOUNDED
    (docs-containing-query-terms rows, not the corpus), so
    ``materialize=True`` (default) eagerly localCheckpoints it — the
    LSH-pair-generator precedent — buying one fewer corpus scan and one
    fewer postings shuffle at the cost of running the postings job at
    DataFrame-build time. Pass ``materialize=False`` for a lazy,
    plan-only frame. DuckDB value parity in tests/test_retrieval.py.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if k1 < 0 or not 0.0 <= b <= 1.0:
        raise ValueError("need k1 >= 0 and 0 <= b <= 1")
    qterms = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(
            word_tokens(F.col(query_col)))).alias("token"))
    qtokens = qterms.select("token").distinct()
    postings = (
        docs.select(
            F.col(id_col),
            F.size(word_tokens(F.col(text_col))).alias("dl"),
            F.explode(word_tokens(F.col(text_col))).alias("token"))
        .join(F.broadcast(qtokens), "token")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    if materialize:
        postings = postings.localCheckpoint(eager=True)
    stats = docs.select(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size(word_tokens(F.col(text_col)))).alias("_avgdl"),
    ).withColumn("_j", F.lit(1))
    dfreq = postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"))
    scored = (
        postings
        .join(F.broadcast(dfreq), "token")
        .withColumn("_j", F.lit(1))
        .join(F.broadcast(stats), "_j")
        .withColumn(
            "_idf",
            F.log(1.0 + (F.col("_n") - F.col("doc_freq") + 0.5)
                  / (F.col("doc_freq") + 0.5)))
        .withColumn(
            "_term_score",
            F.col("_idf") * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))))
        .join(F.broadcast(qterms), "token")
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum("_term_score"), 6).alias("score"))
    )
    w = (Window.partitionBy(qid_col)
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(qid_col, id_col, "score", "rnk")
    )
