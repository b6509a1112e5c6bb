"""r14 review regressions: the dedup operators' NULL/degenerate-text
contracts — exact_dedup must never DELETE rows (NULL-safe sentinel
group; raw-bytes fallback so non-Latin docs don't collapse into one
"duplicate" group), near-dup candidacy requires shingle evidence (no
quadratic sentinel-signature blowup), simhash agrees with
simhash_weighted on wordless docs, and cdc_chunks chunks NULL text as
empty text."""

import hashlib

from pyspark.sql import functions as F

from anomalyzer_spark.functions import dedup


def test_exact_dedup_never_deletes_rows(spark):
    rows = [(1, "same text"), (2, "same text"),
            (3, None), (4, None),
            (5, "你好世界"), (6, "完全不同的文字"),   # non-Latin, distinct
            (7, "!!!"), (8, "???"),                   # lexer-empty, distinct
            (9, ""), (10, "")]                        # truly empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.exact_dedup(df).collect()}
    # EVERY row comes back — md5(NULL) used to be NULL and the
    # equi-join silently deleted rows 3/4 (through curate()'s
    # keep-first semi-join: permanent corpus loss)
    assert set(out) == set(range(1, 11))
    # identical texts group; NULLs form ONE well-defined group
    assert out[1]["content_hash"] == out[2]["content_hash"]
    assert out[3]["content_hash"] == out[4]["content_hash"]
    assert out[3]["group_size"] == 2 and out[4]["is_duplicate"] is True
    # two DIFFERENT non-Latin docs are NOT duplicates (raw-bytes
    # fallback when the [a-z0-9] lexer erases everything)
    assert out[5]["content_hash"] != out[6]["content_hash"]
    assert out[5]["group_size"] == 1 and out[6]["group_size"] == 1
    # distinct punctuation-only docs likewise stay distinct
    assert out[7]["content_hash"] != out[8]["content_hash"]
    # empty strings are identical content; distinct from the NULL group
    assert out[9]["content_hash"] == out[10]["content_hash"]
    assert out[9]["content_hash"] != out[3]["content_hash"]
    # Latin-text hashing is unchanged (the portable md5-of-normalized
    # spec every oracle replays)
    assert out[1]["content_hash"] == hashlib.md5(b"same text").hexdigest()


def test_minhash_requires_shingle_evidence(spark):
    rows = [(i, None) for i in range(20)] \
        + [(i + 100, "...") for i in range(20)] \
        + [(200, "real words here to shingle together nicely"),
           (201, "real words here to shingle together nicely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df)
    # zero-evidence docs are excluded from candidacy entirely — they
    # used to share one sentinel signature, collide in every band
    # bucket, and generate ~M^2/2 candidate pairs
    assert {r["doc_id"] for r in sigs.collect()} == {200, 201}
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.5,
                                    materialize=False).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(200, 201)}


def test_simhash_wordless_contract(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "..."), (4, "real words")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["simhash"], r["n_words"])
           for r in dedup.simhash(df).collect()}
    # wordless docs: signature 0 / n_words 0 — the simhash_weighted
    # contract, so the two operators agree on degenerate input (the
    # old fold gave '' the md5-of-empty-word pattern and NULL a NULL
    # signature with n_words=-1)
    assert out[1] == (0, 0) and out[2] == (0, 0) and out[3] == (0, 0)
    assert out[4][0] != 0 and out[4][1] == 2


def test_cdc_chunks_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dedup.cdc_chunks(df).collect()}
    # NULL chunks as empty: one zero-length chunk with a REAL md5, so
    # chunk-level grouping never buckets under the NULL key
    for i in (1, 2):
        assert rows[i]["chunk_idx"] == 0
        assert rows[i]["chunk_len"] == 0
        assert rows[i]["chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_validation_raises_not_asserts(spark):
    import pytest
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        dedup.minhash_band_buckets(df, bands=24, num_hashes=128)
    with pytest.raises(ValueError, match="bits"):
        dedup.simhash(df, bits=64)
