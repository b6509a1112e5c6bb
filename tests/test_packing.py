"""Sequence-packing operators (functions/packing.py).

``pack_chunks`` is relational end-to-end, so it gets the strongest check
available: full value parity against an independent DuckDB SQL
transcription over the driver's parquet fixtures (the same standard the
registry queries meet). ``pack_bins_ffd`` is a sequential kernel, so it
is pinned by (a) an independent pure-Python FFD reference and (b) the
packing invariants every caller relies on.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import packing

CAP = 64
SHARDS = 4

#: DuckDB transcription of pack_chunks: same word_tokens lexer, same
#: md5-derived shard + order hashes, same per-shard running sum and span
#: arithmetic (generate_series = the sequence explode).
_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT
      AS n_toks,
    ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 12))::BIGINT % {SHARDS}
      AS shard,
    ('0x' || substr(md5('43|' || doc_id::VARCHAR), 1, 12))::BIGINT AS ord
  FROM documents),
spans AS (
  SELECT shard, doc_id, n_toks,
    sum(n_toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                      ROWS UNBOUNDED PRECEDING) - n_toks AS start_tok
  FROM toks WHERE n_toks > 0),
seg AS (
  SELECT shard, doc_id, n_toks, start_tok,
    unnest(generate_series((start_tok // {CAP})::BIGINT,
                           ((start_tok + n_toks - 1) // {CAP})::BIGINT))
      AS chunk_id
  FROM spans)
SELECT shard::INT AS shard, chunk_id, doc_id, n_toks, start_tok,
  greatest(chunk_id * {CAP}, start_tok) - start_tok AS chunk_tok_start,
  least((chunk_id + 1) * {CAP}, start_tok + n_toks) - start_tok
    AS chunk_tok_end
FROM seg
ORDER BY shard, chunk_id, doc_id
"""


def test_pack_chunks_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        packing.pack_chunks(docs, CAP, n_shards=SHARDS, seed=42)
        .orderBy("shard", "chunk_id", "doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_CHUNKS_SQL).fetchall()
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert tuple(g) == w


def test_pack_chunks_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = packing.pack_chunks(docs, CAP, n_shards=SHARDS)
    # every token of every doc lands in exactly one chunk
    per_doc = out.groupBy("doc_id", "n_toks").agg(
        F.sum(F.col("chunk_tok_end") - F.col("chunk_tok_start")).alias("got"))
    assert per_doc.where(F.col("got") != F.col("n_toks")).count() == 0
    # every chunk except each shard's last holds exactly CAP tokens
    per_chunk = out.groupBy("shard", "chunk_id").agg(
        F.sum(F.col("chunk_tok_end") - F.col("chunk_tok_start")).alias("fill"))
    last = per_chunk.groupBy("shard").agg(F.max("chunk_id").alias("chunk_id"))
    full = per_chunk.join(last, ["shard", "chunk_id"], "left_anti")
    assert full.where(F.col("fill") != CAP).count() == 0
    # determinism across partitionings
    again = (packing.pack_chunks(docs.repartition(13), CAP, n_shards=SHARDS)
             .orderBy("shard", "chunk_id", "doc_id").collect())
    first = (out.orderBy("shard", "chunk_id", "doc_id").collect())
    assert first == again


def _ffd_reference(items, capacity):
    """Independent FFD: items = [(doc_id, n_toks)]; returns {doc: bin}."""
    order = sorted(items, key=lambda x: (-x[1], x[0]))
    fills, out = [], {}
    for doc, t in order:
        placed = -1
        if t <= capacity:
            for b, used in enumerate(fills):
                if used + t <= capacity:
                    placed = b
                    break
        if placed < 0:
            placed = len(fills)
            fills.append(0)
        fills[placed] += t
        out[doc] = placed
    return out


def test_pack_bins_ffd_matches_reference_and_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = packing.pack_bins_ffd(docs, CAP, n_shards=SHARDS).collect()
    assert len(out) > 0
    # (a) per-shard assignment equals the independent reference
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        want = _ffd_reference([(r["doc_id"], r["n_toks"]) for r in rows], CAP)
        for r in rows:
            assert r["bin_id"] == want[r["doc_id"]], (shard, r["doc_id"])
    # (b) invariants: each doc exactly once; no non-oversize bin over CAP;
    #     oversize rows are alone in their bin
    assert len({r["doc_id"] for r in out}) == len(out)
    fills: dict[tuple, int] = {}
    members: dict[tuple, int] = {}
    oversize_bins = set()
    for r in out:
        b = (r["shard"], r["bin_id"])
        fills[b] = fills.get(b, 0) + r["n_toks"]
        members[b] = members.get(b, 0) + 1
        if r["oversize"]:
            oversize_bins.add(b)
            assert r["n_toks"] > CAP
    for b, fill in fills.items():
        if b in oversize_bins:
            assert members[b] == 1
        else:
            assert fill <= CAP


def test_pack_bins_ffd_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, packing.pack_bins_ffd(
        docs, CAP, n_shards=SHARDS).collect()))
    b = sorted(map(tuple, packing.pack_bins_ffd(
        docs.repartition(17), CAP, n_shards=SHARDS).collect()))
    assert a == b


def test_packing_stats(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bins = packing.pack_bins_ffd(docs, CAP, n_shards=SHARDS)
    stats = packing.packing_stats(bins, CAP).collect()
    assert {r["shard"] for r in stats} <= set(range(SHARDS))
    for r in stats:
        # >= 0.0, not > 0.0: a shard whose bins are ALL oversize reports
        # utilization 0.0 by documented design (pinned below)
        assert 0.0 <= r["utilization"] <= 1.0
        assert r["n_bins"] >= 1 and r["n_docs"] >= r["n_bins"] - r["n_oversize"]


def test_packing_stats_all_oversize_shard_reports_zero(spark):
    """A shard consisting solely of oversize solo bins pins the documented
    utilization = 0.0 (not NULL, not an error) so threshold alerts can't
    silently skip it."""
    docs = spark.createDataFrame(
        [(i, "x " * (CAP * 3)) for i in range(6)],
        "doc_id long, text string")
    bins = packing.pack_bins_ffd(docs, CAP, n_shards=1)
    rows = bins.collect()
    assert rows and all(r["oversize"] for r in rows)
    stats = packing.packing_stats(bins, CAP).collect()
    assert len(stats) == 1 and stats[0]["utilization"] == 0.0


def test_pack_chunks_carry_cols_ride_free(spark, sf_dir):
    """carry_cols must pass provenance through unchanged (equal to a
    post-hoc join on doc_id) without altering any packing output, and
    must refuse names that collide with packing's own columns."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = packing.pack_chunks(docs, CAP, n_shards=SHARDS)
    carried = packing.pack_chunks(docs, CAP, n_shards=SHARDS,
                                  carry_cols=["lang", "source"])
    keys = ("shard", "chunk_id", "doc_id", "n_toks", "start_tok",
            "chunk_tok_start", "chunk_tok_end")
    assert sorted(tuple(r[k] for k in keys) for r in plain.collect()) == \
        sorted(tuple(r[k] for k in keys) for r in carried.collect())
    want = {r["doc_id"]: (r["lang"], r["source"])
            for r in docs.select("doc_id", "lang", "source").collect()}
    for r in carried.collect():
        assert (r["lang"], r["source"]) == want[r["doc_id"]]
    with pytest.raises(ValueError, match="collide"):
        packing.pack_chunks(docs, CAP, carry_cols=["start_tok"])


def test_pack_chunks_rejects_bad_params(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="capacity"):
        packing.pack_chunks(docs, 0)
    with pytest.raises(ValueError, match="n_shards"):
        packing.pack_bins_ffd(docs, CAP, n_shards=0)


def test_pack_chunks_plan_single_exchange(spark, sf_dir):
    """The packing plan's only shuffle is the per-shard window — the
    100 TB shape: token counting and span arithmetic are map-side, the
    chunk explode rides above the window without a second exchange."""
    from anomalyzer_spark.plans import count_exchanges, explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_str(packing.pack_chunks(docs, CAP, n_shards=SHARDS))
    assert count_exchanges(plan) == 1
