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

from anomalyzer_spark.functions.text import word_token_count, word_tokens

__all__ = ["bm25_corpus_stats", "bm25_topk", "tokenize_docs"]


def tokenize_docs(
    docs: DataFrame, *, text_col: str = "text",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``docs`` plus a ``tokens_col`` array<string> column under the
    repo-wide lexical spec (``text.word_tokens``) — the persist-once
    recipe for ``bm25_topk(tokens_col=...)``. BM25 scoring CPU is
    tokenizer-dominated (the regex pass, measured in
    tools/scale_sweep.py's bm25 cells); a corpus that outlives its query
    batches writes this column once next to the text (the
    ``bm25_corpus_stats`` precedent: corpus-version metadata, computed
    per version, read per batch) and every subsequent scoring pass skips
    the regex entirely."""
    return docs.withColumn(tokens_col, word_tokens(F.col(text_col)))


def bm25_corpus_stats(
    docs: DataFrame, *, text_col: str = "text",
    tokens_col: str | None = None,
) -> tuple[int, float]:
    """The (n_docs, avgdl) corpus constants ``bm25_topk`` needs — ONE
    map-side-combined aggregate over the corpus, returned as plain
    numbers to persist as corpus-version metadata and pass back via
    ``corpus_stats=`` (skipping the per-query-batch stats scan).
    ``avgdl`` counts ``word_token_count`` tokens — the same lexical spec
    the scorer uses — or ``size(tokens_col)`` when the corpus is
    pre-tokenized (identical by construction). Empty corpus -> (0, 0.0)
    (which ``bm25_topk`` rejects, correctly: BM25 over nothing is
    meaningless)."""
    dl = (F.size(F.col(tokens_col)).cast("double") if tokens_col
          else word_token_count(F.col(text_col)))
    row = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(dl).alias("avgdl"),
    ).first()
    return int(row["n"]), float(row["avgdl"] or 0.0)


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
    corpus_stats: tuple[int, float] | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25.

    ``tokens_col``: score a PRE-TOKENIZED corpus (an array<string>
    column written once by ``tokenize_docs`` — same lexical spec) —
    the production lever for tokenizer-dominated scoring CPU: the
    corpus regex pass disappears from EVERY query batch, and with
    ``corpus_stats=`` also set the corpus text column is never read at
    all. Results are identical to the from-text path by construction
    (parity-pinned in tests/test_retrieval.py). Queries always tokenize
    from text — they are the small side.

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
    alone shuffles. The token array is STAGED once per document (its
    own projection) and both ``size`` and ``explode`` read the staged
    attribute — one regex pass per document, not two. Document length
    rides the explode as that map-only ``size`` column (no
    corpus-sized length join later), so the only corpus-keyed exchange
    is the (doc, term) tf aggregate over the FILTERED postings,
    map-side-combined. Document frequency re-aggregates that same
    bounded frame (#query-terms rows) and comes back as a broadcast,
    as do the corpus constants N/avgdl (a one-row map-side-combined
    aggregate — the one remaining second scan leg, map-only and
    column-pruned to ``text``; pass ``corpus_stats=(n_docs, avgdl)``
    to inline persisted corpus metadata and skip that scan entirely —
    the production path when the corpus outlives the query batch). The per-query top-k is one window exchange keyed by
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
    # Stage the token array ONCE per row (its own projection), then derive
    # BOTH size() and explode() from the staged attribute. CollapseProject
    # will not inline a non-cheap expression (regexp_extract_all) used by
    # two consumers, so the regex runs once per document instead of twice
    # — the r9 verdict's triple-tokenization fix; plan-pinned below.
    # explode_OUTER, not explode: InferFiltersFromGenerate would add a
    # size(_toks)>0 filter to a plain explode and push it BELOW the
    # staging projection, re-evaluating the regex per row in the Filter
    # (measured). The rule skips outer generators, and the null-token
    # rows an outer explode emits for empty docs are dropped by the
    # inner join on token — same output, one regex per document.
    staged = docs.select(
        F.col(id_col),
        (F.col(tokens_col) if tokens_col
         else word_tokens(F.col(text_col))).alias("_toks"))
    postings = (
        staged.select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode_outer("_toks").alias("token"))
        .join(F.broadcast(qtokens), "token")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    if materialize:
        postings = postings.localCheckpoint(eager=True)
    # Corpus constants: the one unavoidable second scan leg (map-only,
    # column-pruned to text, one tokenization per row). At production
    # scale N/avgdl are corpus METADATA — recomputed once per corpus
    # version, not per query batch — so callers pass corpus_stats to
    # skip this scan entirely (the drift_psi persisted-profile
    # precedent); bm25_corpus_stats is the recomputation recipe.
    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
        if n_docs < 1 or avgdl <= 0:
            raise ValueError("corpus_stats needs n_docs >= 1, avgdl > 0")
        stats = docs.sparkSession.range(1).select(
            F.lit(int(n_docs)).cast("long").alias("_n"),
            F.lit(float(avgdl)).alias("_avgdl"),
            F.lit(1).alias("_j"))
    else:
        dl = (F.size(F.col(tokens_col)).cast("double") if tokens_col
              else word_token_count(F.col(text_col)))
        stats = docs.select(
            F.count(F.lit(1)).alias("_n"),
            F.avg(dl).alias("_avgdl"),
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
