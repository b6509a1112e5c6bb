"""Hybrid retrieval: rrf_fuse pinned against a hand reference (weights,
ties, single-list membership), and hybrid_topk full-stack DuckDB value
parity on the fixture corpus (BM25 leg + cosine leg + fusion all
replayed in SQL)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from anomalyzer_spark.functions import retrieval


def _rrf_py(lists, k=10, k_rrf=60):
    """Reference: lists = [(weight, {qid: [doc ids ranked 1..n]})]."""
    scores = {}
    for weight, ranked in lists:
        for qid, docs in ranked.items():
            for r, d in enumerate(docs, start=1):
                scores.setdefault(qid, {})
                scores[qid][d] = scores[qid].get(d, 0.0) \
                    + weight / (k_rrf + r)
    out = {}
    for qid, per in scores.items():
        ranked = sorted(per.items(), key=lambda t: (-round(t[1], 6), t[0]))
        out[qid] = [(d, round(s, 6), i + 1)
                    for i, (d, s) in enumerate(ranked[:k])]
    return out


def _ranked_df(spark, ranked):
    rows = [(qid, d, r) for qid, docs in ranked.items()
            for r, d in enumerate(docs, start=1)]
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rnk int")


def test_rrf_fuse_matches_reference(spark):
    # doc 30 appears in only one list; doc 10 tops both; doc 20/40 create
    # a rounded-score tie broken by doc id within query 1.
    a = {0: [10, 20, 30], 1: [20, 40]}
    b = {0: [10, 40], 1: [40, 20]}
    got = {}
    fused = retrieval.rrf_fuse(
        [(_ranked_df(spark, a), 1.0), (_ranked_df(spark, b), 0.5)],
        k=3, k_rrf=60)
    for row in fused.collect():
        got.setdefault(row["query_id"], []).append(
            (row["doc_id"], row["rrf_score"], row["rnk"]))
    want = _rrf_py([(1.0, a), (0.5, b)], k=3)
    assert {q: sorted(v, key=lambda t: t[2]) for q, v in got.items()} == want


def test_rrf_fuse_unweighted_list_and_validation(spark):
    a = {0: [1, 2]}
    plain = retrieval.rrf_fuse([_ranked_df(spark, a)], k=2)
    weighted = retrieval.rrf_fuse([(_ranked_df(spark, a), 1.0)], k=2)
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, weighted.collect()))
    with pytest.raises(ValueError, match="at least one"):
        retrieval.rrf_fuse([])
    with pytest.raises(ValueError, match="k >= 1"):
        retrieval.rrf_fuse([_ranked_df(spark, a)], k=0)
    with pytest.raises(ValueError, match="fetch_k"):
        retrieval.hybrid_topk(None, None, None, k=10, fetch_k=5)


_TOK_SQL = r"regexp_extract_all(lower({0}), '[a-z]+|[0-9]+|[^a-z0-9\s]')"


def _bm25_sql(fetch_k):
    tok = _TOK_SQL
    return f"""
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
  FROM ts t JOIN q USING (token) GROUP BY 1, 2)
SELECT query_id, doc_id,
       row_number() OVER (
         PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
FROM sc QUALIFY rnk <= {fetch_k}"""


def _cosine_sql(fetch_k):
    cos = ("list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) "
           "* sqrt(list_dot_product(cv, cv)))")
    return f"""
WITH q AS (SELECT query_id, query_vec::DOUBLE[] AS qv FROM queries),
c AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT query_id, doc_id, {cos} AS cos_sim FROM q CROSS JOIN c)
SELECT query_id, doc_id,
       row_number() OVER (
         PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rnk
FROM s WHERE cos_sim IS NOT NULL QUALIFY rnk <= {fetch_k}"""


def test_hybrid_topk_duckdb_parity(spark, sf_dir):
    """End-to-end hybrid: both legs AND the weighted fusion replayed in
    DuckDB on the fixture corpus — identical (query, doc, score, rnk)."""
    k, fetch_k, wl, wv = 5, 8, 1.0, 0.7
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    # queries: three fixture documents query for themselves — text prefix
    # as the lexical query, their own embedding as the vector query, so
    # both legs are guaranteed non-degenerate.
    qrows = con.execute("""
        SELECT d.doc_id, array_to_string(
                 ({0})[1:6], ' ') AS query, e.embedding
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.doc_id IN (3, 77, 201) ORDER BY d.doc_id
    """.format(_TOK_SQL.format("d.text"))).fetchall()
    con.execute("CREATE TABLE queries "
                "(query_id BIGINT, query VARCHAR, query_vec FLOAT[])")
    con.executemany("INSERT INTO queries VALUES (?, ?, ?)", qrows)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = spark.createDataFrame(
        qrows, "query_id long, query string, query_vec array<float>")
    got = sorted(map(tuple, retrieval.hybrid_topk(
        docs, embs, queries, k=k, fetch_k=fetch_k,
        lexical_weight=wl, vector_weight=wv).collect()))

    want = sorted(map(tuple, con.execute(f"""
WITH lex AS ({_bm25_sql(fetch_k)}),
vec AS ({_cosine_sql(fetch_k)}),
contrib AS (
  SELECT query_id, doc_id, {wl} / (60 + rnk) AS c FROM lex
  UNION ALL
  SELECT query_id, doc_id, {wv} / (60 + rnk) AS c FROM vec),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score
  FROM contrib GROUP BY 1, 2)
SELECT query_id, doc_id, rrf_score,
       row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rnk
FROM fused QUALIFY rnk <= {k}""").fetchall()))
    assert got == want and len(got) == 3 * k
    # structural sanity (the fixture texts are near-uniform word bags, so
    # lexical self-retrieval isn't an invariant — value parity above is
    # the real check): per query, ranks are 1..k and the fused score is
    # non-increasing in rank.
    for qid in (3, 77, 201):
        rows = sorted((r for r in got if r[0] == qid), key=lambda r: r[3])
        assert [r[3] for r in rows] == list(range(1, k + 1))
        scores = [r[2] for r in rows]
        assert scores == sorted(scores, reverse=True)
