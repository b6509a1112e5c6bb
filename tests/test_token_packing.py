"""Token-exact packing: pack_token_ids over tokenizer-id arrays.

Three checks: (1) the round-trip invariant — flattening every chunk of a
shard in order reproduces the shard's concatenated document id stream
exactly (every token once, order preserved, all interior chunks full);
(2) DuckDB parity of the ASSEMBLED sequences (same shard/order hashes,
span arithmetic, list slicing and ordered aggregation); (3) the pipeline
composition — curate-style docs → train_bpe → bpe_encode → bpe_ids →
pack_token_ids round-trips real documents.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import bpe, packing

CAP, SHARDS = 16, 4


def _ids_df(spark, seed=5, n_docs=40):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.integers(0, 1000,
                             size=int(rng.integers(1, 40))).tolist())
            for i in range(n_docs)]
    return rows, spark.createDataFrame(
        rows, "doc_id long, token_ids array<bigint>")


def test_round_trip_and_full_chunks(spark):
    rows, df = _ids_df(spark)
    packed = packing.pack_token_ids(df, CAP, n_shards=SHARDS).collect()
    spans = {(r["shard"], r["chunk_id"]): r for r in packed}

    # reconstruct each shard's stream from the chunks, in chunk order
    by_shard: dict[int, list] = {}
    for (shard, cid) in sorted(spans):
        r = spans[(shard, cid)]
        assert len(r["input_ids"]) <= CAP
        # every chunk except the shard's last is exactly full
        if (shard, cid + 1) in spans:
            assert len(r["input_ids"]) == CAP, (shard, cid)
        # doc_spans tile the chunk contiguously
        pos = 0
        for s in r["doc_spans"]:
            assert s["start"] == pos
            pos = s["end"]
        assert pos == len(r["input_ids"])
        by_shard.setdefault(shard, []).extend(r["input_ids"])

    # expected stream: documents in (hash order) per shard — recompute via
    # the bookkeeping operator, which has its own DuckDB parity pin
    book = packing.pack_chunks(
        df.select("doc_id", F.size("token_ids").cast("long").alias("n")),
        CAP, length_col="n", n_shards=SHARDS).collect()
    ids_by_doc = dict(rows)
    expect: dict[int, dict[int, list]] = {}
    for r in book:
        expect.setdefault(r["shard"], {})[r["start_tok"]] = \
            ids_by_doc[r["doc_id"]]
    for shard, stream in by_shard.items():
        want = [t for _, toks in sorted(expect[shard].items())
                for t in toks]
        assert stream == want, f"shard {shard}"


def test_matches_duckdb_assembly(spark):
    rows, df = _ids_df(spark, seed=11)
    got = sorted(
        (r["shard"], r["chunk_id"], tuple(r["input_ids"]), r["n_docs"],
         tuple((s["doc_id"], s["start"], s["end"]) for s in r["doc_spans"]))
        for r in packing.pack_token_ids(df, CAP, n_shards=SHARDS).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, ids BIGINT[])")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = sorted(
        (r[0], r[1], tuple(r[2]), r[3],
         tuple((a, b, c) for a, b, c in
               zip(r[4], r[5], r[6])))
        for r in con.sql(f"""
WITH spans AS (
  SELECT shard, doc_id, ids, n_toks,
    sum(n_toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                      ROWS UNBOUNDED PRECEDING) - n_toks AS start_tok
  FROM (
    SELECT doc_id, ids, len(ids)::BIGINT AS n_toks,
      ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 12))::BIGINT
        % {SHARDS} AS shard,
      ('0x' || substr(md5('43|' || doc_id::VARCHAR), 1, 12))::BIGINT AS ord
    FROM docs) WHERE n_toks > 0),
seg AS (
  SELECT shard, doc_id, ids, n_toks, start_tok,
    unnest(generate_series((start_tok // {CAP})::BIGINT,
                           ((start_tok + n_toks - 1) // {CAP})::BIGINT))
      AS chunk_id
  FROM spans),
pieces AS (
  SELECT shard, chunk_id, doc_id,
    greatest(chunk_id * {CAP}, start_tok) - chunk_id * {CAP} AS pos,
    ids[(greatest(chunk_id * {CAP}, start_tok) - start_tok + 1)::INT :
        (least((chunk_id + 1) * {CAP}, start_tok + n_toks)
         - start_tok)::INT] AS piece
  FROM seg)
SELECT shard::INT AS shard, chunk_id,
  flatten(list(piece ORDER BY pos)) AS input_ids,
  count(*)::INT AS n_docs,
  list(doc_id ORDER BY pos) AS span_docs,
  list(pos ORDER BY pos) AS span_starts,
  list(pos + len(piece) ORDER BY pos) AS span_ends
FROM pieces GROUP BY shard, chunk_id
""").fetchall())
    assert got == want


def test_bpe_composition_round_trips_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(60)
    merges = bpe.train_bpe(docs, n_merges=50)
    enc = bpe.bpe_encode(docs, merges)
    vocab = sorted({t for r in enc.select("tokens").collect()
                    for t in r["tokens"]})
    with_ids = bpe.bpe_ids(enc, vocab)
    # no OOV: vocab was built from this corpus
    assert with_ids.where(F.array_contains("token_ids", -1)).count() == 0

    packed = packing.pack_token_ids(
        with_ids.select("doc_id", "token_ids"), 32, n_shards=2).collect()
    ids_by_doc = {r["doc_id"]: list(r["token_ids"])
                  for r in with_ids.collect()}
    # every document's id sequence must be recoverable from its spans,
    # in order, across chunk boundaries
    got: dict[int, dict[int, list]] = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["chunk_id"])):
        for s in r["doc_spans"]:
            got.setdefault(s["doc_id"], {})[
                (r["shard"], r["chunk_id"])[1] * 10**9 + s["start"]] = \
                list(r["input_ids"][s["start"]:s["end"]])
    for did, toks in ids_by_doc.items():
        if not toks:
            continue
        pieces = [p for _, p in sorted(got[did].items())]
        assert [t for p in pieces for t in p] == toks, f"doc {did}"


def test_null_and_empty_id_arrays_are_dropped_not_corrupting(spark):
    # pack_chunks' n_toks > 0 filter runs BEFORE the shard window, so a
    # NULL array (size = -1) or empty array neither shifts later
    # documents' offsets nor nulls out assembled chunks
    df = spark.createDataFrame(
        [(1, [7, 8, 9]), (2, None), (3, []), (4, [1, 2, 3, 4, 5])],
        "doc_id long, token_ids array<bigint>")
    packed = packing.pack_token_ids(df, 4, n_shards=1).collect()
    got = {}
    for r in sorted(packed, key=lambda r: r["chunk_id"]):
        assert r["input_ids"] is not None
        for s in r["doc_spans"]:
            got.setdefault(s["doc_id"], []).extend(
                r["input_ids"][s["start"]:s["end"]])
    assert got == {1: [7, 8, 9], 4: [1, 2, 3, 4, 5]}
