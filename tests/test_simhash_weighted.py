"""tf-idf-weighted SimHash: fixture-corpus DuckDB replay (tf, df,
Lucene idf, micro-unit quantization, bit signs), the template-dominance
property the weighting exists for, corpus_stats shortcut parity, and
empty-document semantics."""

import duckdb

from pyspark.sql import functions as F

from anomalyzer_spark.functions import dedup

_NORM = ("trim(regexp_replace(regexp_replace(lower(text),"
         "'[^a-z0-9]+',' ','g'),'\\s+',' ','g'))")


def test_simhash_weighted_duckdb_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(map(tuple, dedup.simhash_weighted(
        docs, "text", "doc_id", bits=32).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = sorted(map(tuple, con.execute(f"""
WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents),
w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM d),
wf AS (SELECT doc_id, word, count(*) AS tf FROM w
       WHERE word <> '' GROUP BY 1, 2),
dfq AS (SELECT word, count(*) AS doc_freq FROM wf GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
post AS (
  SELECT doc_id, word,
         round(tf * ln(1 + (n - doc_freq + 0.5) / (doc_freq + 0.5))
               * 1000000)::BIGINT AS wi,
         md5(word) AS hx
  FROM wf JOIN dfq USING (word) CROSS JOIN nd),
bs AS (
  SELECT doc_id, j,
         sum(CASE WHEN substr(hx, j + 1, 1) IN
               ('8','9','a','b','c','d','e','f') THEN wi ELSE -wi END) AS s
  FROM post CROSS JOIN range(0, 32) r(j) GROUP BY 1, 2),
sg AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << j)
             ELSE 0::BIGINT END)::BIGINT AS simhash
  FROM bs GROUP BY 1),
nt AS (SELECT doc_id, count(*)::BIGINT AS n_terms FROM wf GROUP BY 1)
SELECT doc_id, coalesce(sg.simhash, 0) AS simhash,
       coalesce(nt.n_terms, 0) AS n_terms
FROM documents LEFT JOIN sg USING (doc_id) LEFT JOIN nt USING (doc_id)
""").fetchall()))
    assert got == want and len(got) == 500


def test_weighting_resists_template_dominance(spark):
    """The failure mode the variant exists for: a shared 24-word
    boilerplate template dominates the unweighted signature (every
    pair lands within the hamming radius), while idf weighting lets
    each document's rare content words separate them."""
    template = " ".join(f"boiler{i}" for i in range(100))
    rows = [(i, template + f" unique{i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = dedup.simhash_pairs(docs, max_hamming=3).count()
    weighted = dedup.simhash_weighted_pairs(docs, max_hamming=3).count()
    # unweighted: the 100 template votes drown the single ±1 content
    # vote on almost every bit — most of the 66 pairs collapse into the
    # hamming radius. weighted: idf ~2.16 vs ~0.039 (55x) makes the
    # rare word carry every bit, so the pair set (near-)empties.
    assert plain >= 40
    assert weighted <= 5 and weighted < plain / 4


def test_corpus_stats_shortcut_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta delta"),
         (2, ""), (3, "   ")],
        "doc_id long, text string")
    a = sorted(map(tuple, dedup.simhash_weighted(docs).collect()))
    b = sorted(map(tuple, dedup.simhash_weighted(
        docs, corpus_stats=(4, 0.0)).collect()))
    assert a == b and len(a) == 4
    by_id = {r[0]: r for r in a}
    assert by_id[2][1] == 0 and by_id[2][2] == 0  # empty-fold signature
    assert by_id[3][1] == 0 and by_id[3][2] == 0
    assert by_id[0][1] != 0
