"""Fragment-level matching over winnowing fingerprints.

DuckDB parity (the winnow slot's oracle CTE extended with the self-join),
the winnowing shared-substring guarantee on planted fragments, the
boilerplate ``max_df`` guard, and the no-cartesian plan shape.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import text

#: mirrors the winnow slot oracle (k=8, window=4) + pair aggregation
_SQL = """
WITH docs AS (SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
       '\\s+', ' ', 'g')) AS norm FROM documents),
g AS (SELECT doc_id, norm, greatest(length(norm) - 7, 0) AS ngrams FROM docs),
h AS (SELECT doc_id,
  CASE WHEN ngrams > 0 THEN
    list_transform(range(1, ngrams + 1), i ->
      ('0x' || substr(md5(substr(norm, i::INT, 8)), 1, 8))::BIGINT)
  ELSE [] END AS hashes FROM g),
m AS (SELECT doc_id, CASE WHEN len(hashes) > 0 THEN
    list_distinct(list_transform(range(1, greatest(len(hashes) - 3, 1) + 1),
      i -> list_aggregate(hashes[i : i + 3], 'min')))
  ELSE [] END AS fps FROM h),
ex AS (SELECT doc_id, len(fps) AS nfp, unnest(fps) AS fp FROM m)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  count(*)::BIGINT AS shared_fps,
  round(count(*)::DOUBLE / least(min(a.nfp), min(b.nfp)), 6) AS overlap
FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def test_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    got = sorted(tuple(r) for r in
                 text.fingerprint_matches(docs, min_shared=2).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = sorted(tuple(r) for r in con.sql(_SQL).fetchall())
    assert got == want
    assert want, "fixture corpus should contain fragment matches"


def test_planted_fragment_is_found(spark):
    frag = "the unique shared fragment that both documents contain verbatim"
    rows = [
        (1, f"first document begins here {frag} and then diverges fully"),
        (2, f"totally different opening words {frag} closing differently"),
        (3, "an unrelated document with none of that shared content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r
             for r in text.fingerprint_matches(df, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    assert 0 < pairs[(1, 2)]["overlap"] <= 1.0


def test_max_df_drops_boilerplate(spark):
    banner = "identical site navigation banner repeated on every page"
    rows = [(i, f"{banner} unique content number {i * 7919}")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    allp = text.fingerprint_matches(df, min_shared=1).count()
    capped = text.fingerprint_matches(df, min_shared=1, max_df=3).count()
    assert allp == 15          # banner links every pair
    assert capped < allp       # hot fingerprints dropped pre-join


def test_no_cartesian_and_validation(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    plan = text.fingerprint_matches(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError, match="min_shared"):
        text.fingerprint_matches(df, min_shared=0)
