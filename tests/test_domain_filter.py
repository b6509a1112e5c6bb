"""web.filter_by_domains: the domain-list gate with subdomain
inheritance (UT1-blocklist class) — hand cases, DuckDB replay of the
suffix-chain membership, allow/block symmetry, and the
join-not-cartesian plan pin."""

import duckdb
import pytest

from pyspark.sql import functions as F

from anomalyzer_spark.functions import web
from anomalyzer_spark.plans import assert_plan


def _docs(spark):
    rows = [
        (1, "https://www.example.com/page"),        # exact (www stripped)
        (2, "https://a.b.example.com/deep"),        # subdomain inherits
        (3, "https://example.org/fine"),            # not listed
        (4, "https://badexample.com/x"),            # NOT a suffix match
        (5, "https://sub.blocked.co.uk/y"),         # multi-label entry
        (6, "not a url"),                           # NULL host
        (7, None),
        (8, "https://tld-entry.test/z"),            # bare-TLD entry hits
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def _list(spark):
    return spark.createDataFrame(
        [("example.com",), ("blocked.co.uk",), ("test",)],
        "domain string")


def test_block_allow_and_duckdb_parity(spark):
    d = _docs(spark)
    bl = _list(spark)
    kept = {r["doc_id"] for r in
            web.filter_by_domains(d, bl, "url").collect()}
    # blocked: 1 (exact), 2 (subdomain), 5 (multi-label), 8 (TLD entry);
    # NULL-host rows 6/7 are KEPT in block mode
    assert kept == {3, 4, 6, 7}
    allowed = {r["doc_id"] for r in
               web.filter_by_domains(d, bl, "url", mode="allow").collect()}
    assert allowed == {1, 2, 5, 8}  # fail-closed: NULL hosts dropped
    # DuckDB replay of the suffix-chain membership (block mode)
    con = duckdb.connect()
    con.execute("CREATE VIEW d AS SELECT * FROM (VALUES "
                + ",".join(
                    "(%d, %s)" % (i, "NULL" if u is None else f"'{u}'")
                    for i, u in [(r["doc_id"], r["url"])
                                 for r in d.collect()])
                + ") t(doc_id, url)")
    want = {r[0] for r in con.execute(r"""
WITH h AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(lower(coalesce(
      regexp_extract(url, '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)',
                     1), '')), '\.+$', ''), '^www\.', '') AS host
  FROM d),
sfx AS (
  SELECT doc_id, unnest(list_transform(
    range(1, len(string_split(host, '.')) + 1),
    i -> array_to_string(string_split(host, '.')[i:], '.'))) AS s
  FROM h WHERE host <> ''),
hit AS (SELECT DISTINCT doc_id FROM sfx
        WHERE s IN ('example.com', 'blocked.co.uk', 'test'))
SELECT doc_id FROM d ANTI JOIN hit USING (doc_id)""").fetchall()}
    assert want == kept
    with pytest.raises(ValueError, match="mode"):
        web.filter_by_domains(d, bl, "url", mode="drop")


def test_row_multiplicity_and_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("https://s"), F.col("doc_id") % 7,
                 F.lit(".example"), F.col("doc_id") % 3,
                 F.lit(".com/p")).alias("url"))
    bl = spark.createDataFrame([("example0.com",)], "domain string")
    out = web.filter_by_domains(d, bl, "url")
    # multiple suffix hits never duplicate rows; exactly the example0
    # third is dropped
    assert out.count() == d.where(F.col("doc_id") % 3 != 0).count()
    assert_plan(out, forbids=("CartesianProduct", "BroadcastNestedLoop"))


def test_curate_blocklist_gate(spark):
    from anomalyzer_spark.pipeline import CurationConfig, curate
    d = spark.createDataFrame(
        [(1, "https://bad.example.com/x", "good text one."),
         (2, "https://fine.org/y", "good text two."),
         (3, None, "no url text.")],
        "doc_id long, url string, text string")
    bl = spark.createDataFrame([("example.com",)], "domain string")
    res = curate(d, CurationConfig(url_col="url", dedup=None),
                 blocklist=bl)
    assert {r["doc_id"] for r in res.stages["domain_gated"].collect()} \
        == {2, 3}
    with pytest.raises(ValueError, match="url_col"):
        curate(d, CurationConfig(dedup=None), blocklist=bl)


def test_host_suffixes_unit(spark):
    df = spark.createDataFrame(
        [("https://a.b.example.com/x",), ("junk",)], "u string")
    got = df.select(web.host_suffixes(F.col("u")).alias("s")).collect()
    assert got[0]["s"] == ["a.b.example.com", "b.example.com",
                          "example.com", "com"]
    assert got[1]["s"] == []
