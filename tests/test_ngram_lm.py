"""Bigram-LM perplexity (functions/ngram_lm.py): full DuckDB replay of
training + scoring over the driver fixtures, hand-computed smoothing
pins, and the reference-vs-garbage separation property."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import ngram_lm

_TOK_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
K = 0.1


def test_perplexity_duckdb_parity(spark, sf_dir):
    """Model trained on even doc_ids, scored on ALL fixture docs — both
    stages replayed in DuckDB (counts + smoothing + per-doc mean)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    lm = ngram_lm.train_bigram_lm(ref)
    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["nll"], r["ppl"])
        for r in ngram_lm.perplexity(docs, lm, k=K).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(f"""
WITH tk AS (SELECT doc_id,
              regexp_extract_all(lower(text), '{_TOK_RE}') AS t
            FROM documents),
bg AS (SELECT doc_id, t[i] AS ctx, t[i + 1] AS w
       FROM tk, unnest(range(1, greatest(len(t), 1))) AS u(i)),
refbg AS (SELECT ctx, w, count(*) AS c_bi FROM bg
          WHERE doc_id % 2 = 0 GROUP BY 1, 2),
refctx AS (SELECT ctx, sum(c_bi) AS c_ctx FROM refbg GROUP BY ctx),
v AS (SELECT count(*) + 1 AS v1 FROM refctx),
sc AS (
  SELECT bg.doc_id,
         -ln((coalesce(c_bi, 0) + {K}) /
             (coalesce(c_ctx, 0) + {K} * v1)) AS nlp
  FROM bg LEFT JOIN refbg USING (ctx, w)
          LEFT JOIN refctx USING (ctx), v),
agg AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(nlp), 6) AS nll
        FROM sc GROUP BY doc_id)
SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams, nll,
       round(exp(nll), 6) AS ppl
FROM (SELECT doc_id FROM documents) d LEFT JOIN agg USING (doc_id)
ORDER BY doc_id""").fetchall()
    assert len(got) == len(want) > 0
    assert got == [tuple(w) for w in want]
    # reference docs should be less perplexing than average held-out noise
    assert any(g[1] > 0 for g in got)


def test_perplexity_hand_computed(spark):
    """ref = 'a b' x3 → V=1 (one context 'a'); score 'a b' and 'a z'."""
    ref = spark.createDataFrame([(0, "a b"), (1, "a b"), (2, "a b")],
                                "doc_id long, text string")
    lm = ngram_lm.train_bigram_lm(ref)
    assert lm["vocab_size"] == 1
    tgt = spark.createDataFrame([(0, "a b"), (1, "a z"), (2, "q r")],
                                "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ngram_lm.perplexity(tgt, lm, k=K).collect()}
    # seen pair: (3 + .1) / (3 + .1*2)
    assert out[0]["nll"] == pytest.approx(
        round(-math.log(3.1 / 3.2), 6))
    # unseen word, seen context: .1 / 3.2
    assert out[1]["nll"] == pytest.approx(round(-math.log(0.1 / 3.2), 6))
    # unseen context: uniform fallback .1 / .2
    assert out[2]["nll"] == pytest.approx(round(-math.log(0.5), 6))
    # ordering: exact match < OOV word < OOV context-and-word here
    assert out[0]["ppl"] < out[2]["ppl"] < out[1]["ppl"]
    with pytest.raises(ValueError):
        ngram_lm.perplexity(tgt, lm, k=0.0)


def test_perplexity_separates_reference_from_shuffled(spark, sf_dir):
    """The filter's reason to exist: fixture docs score lower ppl under a
    fixture-trained LM than the same corpus with word order destroyed
    (deterministic md5 shuffle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = ngram_lm.train_bigram_lm(docs)
    natural = ngram_lm.perplexity(docs, lm).agg(
        F.avg("ppl")).collect()[0][0]
    shuffled = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.array_sort(F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.struct(F.md5(F.concat(w, F.col("text")))
                                       .alias("h"), w.alias("w")))),
                lambda s: s["w"]), " ").alias("text"))
    broken = ngram_lm.perplexity(shuffled, lm).agg(
        F.avg("ppl")).collect()[0][0]
    assert natural < broken


def test_perplexity_every_doc_returns_exactly_once(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a"), (2, ""), (3, None)],
        "doc_id long, text string")
    lm = ngram_lm.train_bigram_lm(df)
    out = ngram_lm.perplexity(df, lm).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3]
    by = {r["doc_id"]: r for r in out}
    assert by[0]["n_bigrams"] == 2 and by[0]["ppl"] is not None
    for i in (1, 2, 3):
        assert by[i]["n_bigrams"] == 0 and by[i]["ppl"] is None
