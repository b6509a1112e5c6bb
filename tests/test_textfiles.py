"""JSONL/CSV ingestion (sources/textfiles.py): enforced schema,
corrupt-row capture, and the one-pass quarantine split."""

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.sources import textfiles


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        '{"doc_id": 2, "text": "hola"}',                   # missing field
        'this is not json at all',                         # corrupt
        '{"doc_id": "notanint", "text": "x", "lang": "fr"}',  # type clash
        '{"doc_id": 5, "text": "ok", "lang": "de"}',
    ]) + "\n")
    return str(p)


def test_read_jsonl_contract(spark, jsonl_path):
    df = textfiles.read_jsonl(
        spark, jsonl_path, "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in df.collect() if r["doc_id"] is not None}
    assert df.count() == 5
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] is None          # missing field → NULL, not bad
    assert rows[2][textfiles.CORRUPT_COL] is None
    bad = df.where(F.col(textfiles.CORRUPT_COL).isNotNull()).collect()
    payloads = {r[textfiles.CORRUPT_COL] for r in bad}
    assert "this is not json at all" in payloads
    assert any("notanint" in p for p in payloads)  # type clash captured
    assert len(bad) == 2


def test_split_bad_one_pass(spark, jsonl_path):
    df = textfiles.read_jsonl(
        spark, jsonl_path, "doc_id long, text string, lang string")
    clean, bad = textfiles.split_bad(df)
    assert textfiles.CORRUPT_COL not in clean.columns
    assert clean.count() == 3 and bad.count() == 2
    assert {r["doc_id"] for r in clean.collect()} == {1, 2, 5}
    with pytest.raises(ValueError):
        textfiles.split_bad(clean)          # already split


def test_read_csv_contract(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("doc_id,text,n\n1,aaa,10\n2,bbb,notanumber\n3,ccc,30\n")
    df = textfiles.read_csv(
        spark, str(p), "doc_id long, text string, n long")
    clean, bad = textfiles.split_bad(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}
    assert bad.count() == 1 and "notanumber" in bad.collect()[0][0]


def test_schema_must_not_predefine_capture_column(spark, tmp_path):
    with pytest.raises(ValueError):
        textfiles.read_jsonl(
            spark, str(tmp_path), "doc_id long, _corrupt_record string")


def test_read_jsonl_gzip_passthrough(spark, tmp_path):
    """Crawl dumps arrive gzipped; the text source decompresses by
    extension and the parse contract is unchanged."""
    import gzip
    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 1, "text": "aaa"}\nbroken line\n'
                '{"doc_id": 2, "text": "bbb"}\n')
    df = textfiles.read_jsonl(spark, str(p), "doc_id long, text string")
    clean, bad = textfiles.split_bad(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert bad.collect()[0][0] == "broken line"
