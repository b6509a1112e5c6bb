"""Tests for BM25 top-k retrieval: formula pinned against an independent
pure-Python implementation, ranking/tiebreak semantics, and DuckDB
value parity on the fixture corpus."""

import math
import re

import pytest

from anomalyzer_spark.functions import retrieval

_TOK = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


def _bm25_py(docs, queries, k=10, k1=1.2, b=0.75):
    """Independent reference implementation (dict-and-loop)."""
    toks = {d: _TOK.findall(t.lower()) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, q in queries:
        scores = {}
        for term in sorted(set(_TOK.findall(q.lower()))):
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for d, v in toks.items():
                tf = v.count(term)
                if tf:
                    scores[d] = scores.get(d, 0.0) + (
                        idf * tf * (k1 + 1)
                        / (tf + k1 * (1 - b + b * len(v) / avgdl)))
        ranked = sorted(scores.items(), key=lambda t: (-round(t[1], 6), t[0]))
        out[qid] = [(d, round(s, 6)) for d, s in ranked[:k]]
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark shuffles data between executors during wide operations"),
        (1, "broadcast joins avoid the shuffle when one side is small"),
        (2, "the catalyst optimizer prunes columns and pushes filters"),
        (3, "executors cache shuffle files between stages"),
        (4, "a totally unrelated document about cooking pasta"),
        (5, "shuffle shuffle shuffle"),           # tf saturation case
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [(0, "shuffle executors"), (1, "broadcast join"), (2, "quantum")],
        "query_id long, query string")


def test_bm25_matches_reference_impl(spark, corpus, queries):
    got = {}
    for r in retrieval.bm25_topk(corpus, queries, k=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rnk"], r["doc_id"], r["score"]))
    for qid in got:
        got[qid] = [(d, s) for _, d, s in sorted(got[qid])]
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    qs = [(r["query_id"], r["query"]) for r in queries.collect()]
    want = _bm25_py(docs, qs, k=4)
    assert got[0] == pytest.approx(want[0])
    assert got[1] == pytest.approx(want[1])
    # no shared term → query absent from the result entirely
    assert 2 not in got
    # sanity on semantics: doc 5 is pure repetition of 'shuffle' but tf
    # saturates — it must not dominate a doc matching BOTH query terms
    assert got[0][0][0] in (0, 3)


def test_bm25_validation_and_k(spark, corpus, queries):
    with pytest.raises(ValueError, match="k must be"):
        retrieval.bm25_topk(corpus, queries, k=0)
    with pytest.raises(ValueError, match="k1"):
        retrieval.bm25_topk(corpus, queries, b=1.5)
    out = retrieval.bm25_topk(corpus, queries, k=1)
    per = {}
    for r in out.collect():
        per[r["query_id"]] = per.get(r["query_id"], 0) + 1
    assert all(v == 1 for v in per.values())
    # partitioning invariance
    a = sorted(map(tuple, retrieval.bm25_topk(
        corpus.repartition(5), queries, k=3).collect()))
    c = sorted(map(tuple, retrieval.bm25_topk(corpus, queries, k=3).collect()))
    assert a == c


def test_bm25_duckdb_parity(spark, sf_dir):
    """Full-stack replay in DuckDB SQL on the fixture corpus: identical
    (query, doc, score, rnk) rows."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qrows = [(0, "anomaly detection pipeline"), (1, "model training data"),
             (2, "spark shuffle")]
    queries = spark.createDataFrame(qrows, "query_id long, query string")
    got = sorted(map(tuple, retrieval.bm25_topk(
        docs, queries, k=5).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    con.execute("CREATE TABLE queries (query_id BIGINT, query VARCHAR)")
    con.executemany("INSERT INTO queries VALUES (?, ?)", qrows)
    tok = r"regexp_extract_all(lower({0}), '[a-z]+|[0-9]+|[^a-z0-9\s]')"
    want = sorted(map(tuple, con.execute(f"""
WITH q AS (
  SELECT query_id, unnest(list_distinct({tok.format('query')})) AS token
  FROM queries),
dtok AS (
  SELECT doc_id, len({tok.format('text')}) AS dl,
         unnest({tok.format('text')}) AS token
  FROM documents),
post AS (
  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
  FROM dtok WHERE token IN (SELECT DISTINCT token FROM q)
  GROUP BY 1, 2),
stats AS (
  SELECT count(*) AS n, avg(len({tok.format('text')})) AS avgdl
  FROM documents),
ts AS (
  SELECT p.doc_id, p.token,
         ln(1 + (s.n - f.doc_freq + 0.5) / (f.doc_freq + 0.5))
           * p.tf * 2.2
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)) AS tsc
  FROM post p
  JOIN (SELECT token, count(*) AS doc_freq FROM post GROUP BY 1) f
    USING (token)
  CROSS JOIN stats s),
sc AS (
  SELECT q.query_id, t.doc_id, round(sum(t.tsc), 6) AS score
  FROM ts t JOIN q USING (token) GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM sc)
SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 5
""").fetchall()))
    assert got == want and len(got) > 0


def test_word_token_count_parity(spark, sf_dir):
    """word_token_count == size(word_tokens) on every fixture document
    (same pattern, leftmost non-overlapping matches)."""
    from pyspark.sql import functions as F

    from anomalyzer_spark.functions.text import word_token_count, word_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(
        word_token_count(F.col("text")).alias("a"),
        F.size(word_tokens(F.col("text"))).alias("b"),
    ).where(F.col("a") != F.col("b")).count()
    assert bad == 0


def test_bm25_corpus_stats_shortcut(spark, corpus, queries):
    """Passing precomputed (n_docs, avgdl) must reproduce the self-computed
    scores exactly (the production skip-the-stats-scan path), and bogus
    stats must be rejected."""
    from pyspark.sql import functions as F

    from anomalyzer_spark.functions.text import word_token_count

    n, avgdl = corpus.select(
        F.count(F.lit(1)),
        F.avg(word_token_count(F.col("text")))).first()
    a = sorted(map(tuple, retrieval.bm25_topk(
        corpus, queries, k=4, corpus_stats=(n, avgdl)).collect()))
    b = sorted(map(tuple, retrieval.bm25_topk(corpus, queries, k=4).collect()))
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="corpus_stats"):
        retrieval.bm25_topk(corpus, queries, corpus_stats=(0, 5.0))


def test_bm25_single_tokenization_plan(spark, corpus, queries):
    """The corpus postings leg stages word_tokens ONCE per subtree: in
    the lazy (materialize=False, corpus_stats given) plan the only
    corpus-text regex sites are the two staging projections (the
    postings subtree plans twice — scoring + doc_freq consumers — which
    materialize=True collapses to one via localCheckpoint), and NO
    Filter node re-evaluates the regex (the explode_outer /
    InferFiltersFromGenerate pin). Regression pin for the r9
    triple-tokenization fix."""
    df = retrieval.bm25_topk(
        corpus, queries, k=3, materialize=False, corpus_stats=(6, 8.0))
    plan = df._jdf.queryExecution().executedPlan().toString()
    corpus_regex = plan.count("regexp_extract_all(lower(text")
    assert corpus_regex == 2, plan
    filter_regex = [l for l in plan.splitlines()
                    if "Filter" in l and "regexp_extract_all(lower(text" in l]
    assert not filter_regex, filter_regex


def test_bm25_corpus_stats_helper(spark, corpus, queries):
    """The persisted-metadata recipe: bm25 with bm25_corpus_stats ==
    self-computed bm25 exactly."""
    stats = retrieval.bm25_corpus_stats(corpus)
    assert stats[0] == 6 and stats[1] > 0
    a = sorted(map(tuple, retrieval.bm25_topk(
        corpus, queries, k=4, corpus_stats=stats).collect()))
    b = sorted(map(tuple, retrieval.bm25_topk(corpus, queries, k=4).collect()))
    assert a == b and len(a) > 0
    empty = corpus.where("doc_id < 0")
    assert retrieval.bm25_corpus_stats(empty) == (0, 0.0)


@pytest.mark.slow
def test_bm25_pretokenized_parity_and_no_corpus_regex(spark, corpus,
                                                      queries):
    """tokens_col= (the persist-once recipe) must reproduce the from-text
    scores EXACTLY, bm25_corpus_stats must agree across both feeds, and
    with tokens_col + corpus_stats the lazy plan must contain ZERO
    corpus-text regex sites (the tokenizer CPU the recipe removes)."""
    tok = retrieval.tokenize_docs(corpus)
    want = sorted(map(tuple, retrieval.bm25_topk(
        corpus, queries, k=4).collect()))
    got = sorted(map(tuple, retrieval.bm25_topk(
        tok, queries, k=4, tokens_col="tokens").collect()))
    assert got == want and len(got) > 0
    assert retrieval.bm25_corpus_stats(tok, tokens_col="tokens") == \
        retrieval.bm25_corpus_stats(corpus)
    stats = retrieval.bm25_corpus_stats(tok, tokens_col="tokens")
    # the recipe persists the token column; localCheckpoint stands in for
    # the parquet round-trip so the lazy plan shows what a query batch
    # actually costs against stored tokens
    stored = tok.localCheckpoint(eager=True)
    df = retrieval.bm25_topk(stored, queries, k=3, materialize=False,
                             corpus_stats=stats, tokens_col="tokens")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all(lower(text") == 0, plan
    # query tokenization still happens (queries are the small side)
    assert plan.count("regexp_extract_all(lower(query") > 0
