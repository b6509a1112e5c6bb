"""Automated driver-contract cross-check: every oracle_sql() query must
hash-match its Spark implementation. Full sweep at sf0.01 lives in
tools/check_correctness.py; here a fast representative subset runs at
sf0.001 so pytest stays quick but the contract is continuously guarded."""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from tools.check_correctness import TABLES, compare

FAST_QUERIES = (
    # detect_det retired round 5 (slot given to ivfpq_topk; its surface is
    # fully shadowed by detect_bytest_det's per-test prob/weight hashes)
    "detect_bytest_det",
    "text_profile",
    # exact_dedup retired round 9 (slot given to bm25; shadowing argument
    # in q_bm25's docstring — its oracle lives verbatim in
    # tests/test_functions.py::test_exact_dedup_duckdb_parity)
    "bm25",
    "dedup_paragraphs",
    "decontam",
    "text_pipeline",
    "ngram_jaccard",
    # lineitem_cube retired round 9 (slot given to dup_spans; shadowing
    # argument in q_dup_spans's docstring — its oracle lives verbatim in
    # tests/test_functions.py::test_lineitem_cube_duckdb_parity)
    "dup_spans",
    # simhash retired round 10 (slot given to semantic_pairs; shadowing
    # argument in q_semantic_pairs's docstring — its oracle lives
    # verbatim in tests/test_functions.py::test_simhash_duckdb_parity).
    # semantic_pairs itself is NOT fast-listed: like ivf_topk, its oracle
    # inlines centroids fitted on the ORACLE sf's sample (default sf0.01),
    # so running it at this file's sf0.001 compares across models —
    # sf-matched parity is tests/test_semantic_dedup.py plus the driver
    # gate via tools/check_correctness.py (which passes sf_dir).
    "cosine_topk",
    "pricing_summary",
    "orders_rollup",
    "running_totals",
    "events_json",
    "asof_join",
    "multimodal",
    "kafka_parse",
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spark_pdf = entry_mod.queries()[name](spark, sf_dir).toPandas()
    duck_pdf = duck.sql(entry_mod.oracle_sql()[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs), "every oracle needs a query"
    # the driver gate records at most 50 queries; more than 50 means the
    # tail silently loses its correctness row (see queries() comment)
    assert len(qs) == 50, f"registry must stay at exactly 50, got {len(qs)}"
    assert len(osql) == 50


def test_bench_headline_queries_exist():
    """A registry rotation must never orphan a bench HEADLINE entry — the
    driver's bench run would KeyError (nearly shipped in round 7)."""
    import bench
    qs = entry_mod.queries()
    missing = [h for h in bench.HEADLINE if h not in qs]
    assert not missing, f"HEADLINE entries without registry slots: {missing}"
