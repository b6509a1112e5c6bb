"""Streaming NEAR-duplicate (MinHash) dedup — the incremental store path.

``dedup_stream`` covers exact duplicates; a crawl-shaped stream is full of
NEAR-duplicates, and finding them incrementally needs candidate generation
against everything seen so far — a stream×history self-join that pure
streaming operators cannot express (the history side must be re-readable
per batch and the verification needs old documents' shingle sets). This is
therefore the ``foreachBatch``-against-a-persisted-index shape, the same
pattern as ``functions.ann_index.serve_ivfpq_stream``:

per micro-batch of new documents
  1. band-bucket the batch (``dedup.minhash_band_buckets`` — the SAME
     bucket definition as the batch operator) and shingle it, and write
     both to the store under ``batch_id=N`` subdirectories FIRST;
  2. join the (small, broadcast) batch buckets against the full bucket
     store — candidates are exactly the pairs with ≥1 shared band bucket
     and at least one new member;
  3. exact-verify candidates' Jaccard from the shingle store
     (``dedup.verify_jaccard_pairs`` — the same verification stage as the
     batch operator) and write the surviving pairs to ``batch_id=N``.

Why the final state equals the batch ``minhash_lsh_pairs`` exactly: every
qualifying pair shares a band bucket; the pair is discovered in the batch
where its LATER member arrives (the earlier member is then in the store,
and a same-batch pair finds itself through the just-written store rows),
and can never be rediscovered (candidates always include a new member).
Verification and rounding are the shared batch code, so values match
hash-for-hash — pinned in tests/test_streaming.py and value-hash checked
against the batch DuckDB oracle by the ``minhash_stream`` contract query.

Delivery: foreachBatch is AT-LEAST-ONCE; every write (buckets, shingles,
pairs) overwrites its own ``batch_id=N`` directory, so a replayed batch
rewrites identical files instead of appending duplicates — the
effectively-once-by-idempotence contract serve_ivfpq_stream pins. Writing
the store BEFORE candidate generation makes the replay read the same
store contents the crashed attempt saw (the new rows self-pair harmlessly:
``id_a < id_b`` drops self-matches, DISTINCT drops mirror matches).

State at 100 TB: the store is the corpus' band buckets (bands rows/doc)
and shingle sets — O(corpus), like any full-history near-dup index. The
per-batch join broadcasts the NEW side, so the store is scanned, never
shuffled; partition the store by a bucket prefix (``pfx``, written here)
so broadcast-join dynamic partition pruning can skip store files whose
prefixes the batch does not touch. Bound history with a retention sweep
on ``batch_id`` when the dedup horizon allows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import (
    minhash_band_buckets, verify_jaccard_pairs, word_shingles,
)

_PAIR_SCHEMA = "id_a long, id_b long, jaccard double"


def _store_paths(store_dir: str) -> tuple[str, str, str]:
    return (f"{store_dir}/buckets", f"{store_dir}/shingles",
            f"{store_dir}/pairs")


def minhash_dedup_stream(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    trigger: dict | None = None,
):
    """Start the incremental MinHash near-dup pipeline over a document
    stream. Returns the started StreamingQuery (caller awaits/stops);
    read results with ``minhash_pairs_store`` / ``minhash_groups_store``.

    Document ids must be unique across the stream (the usual curation
    contract; re-sent ids would self-pair away but double-count in
    groups).
    """
    buckets_dir, shingles_dir, pairs_dir = _store_paths(store_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new = batch_df.select(F.col(id_col), F.col(text_col))
        # 1. extend the store first (replay-idempotent batch_id overwrite;
        #    also lets same-batch pairs resolve through the store read)
        (
            minhash_band_buckets(new, text_col, id_col, k=k,
                                 num_hashes=num_hashes, bands=bands)
            .withColumn("pfx", F.substring("bucket", 1, 2))
            .write.mode("overwrite").partitionBy("pfx")
            .parquet(f"{buckets_dir}/batch_id={batch_id}")
        )
        (
            new.select(F.col(id_col),
                       word_shingles(F.col(text_col), k).alias("sh"))
            .write.mode("overwrite")
            .parquet(f"{shingles_dir}/batch_id={batch_id}")
        )
        # 2. candidates: (small) new buckets broadcast against the store —
        #    the store side is scanned, never shuffled
        store_b = spark.read.parquet(buckets_dir)
        new_b = spark.read.parquet(f"{buckets_dir}/batch_id={batch_id}")
        cand = (
            store_b.alias("s")
            .join(F.broadcast(new_b.alias("n")), ["pfx", "bucket"])
            .where(F.col(f"s.{id_col}") != F.col(f"n.{id_col}"))
            .select(
                F.least(f"s.{id_col}", f"n.{id_col}").alias("id_a"),
                F.greatest(f"s.{id_col}", f"n.{id_col}").alias("id_b"),
            )
            .distinct()
        )
        # 3. exact verification from the shingle store (candidate-scoped)
        cand_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .unionByName(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sh = (
            spark.read.parquet(shingles_dir)
            .join(F.broadcast(cand_ids), id_col, "left_semi")
            .select(id_col, "sh")
        )
        (
            verify_jaccard_pairs(sh, cand, threshold, id_col)
            .write.mode("overwrite")
            .parquet(f"{pairs_dir}/batch_id={batch_id}")
        )

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def minhash_pairs_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """All near-dup pairs accumulated so far: (id_a, id_b, jaccard).

    Equals the batch ``minhash_lsh_pairs`` over every document ingested
    (each pair is written exactly once — see module docstring). Returns an
    empty typed frame when nothing was ingested yet.
    """
    pairs_dir = _store_paths(store_dir)[2]
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame([], _PAIR_SCHEMA)
    return (spark.read.parquet(pairs_dir)
            .select("id_a", "id_b", "jaccard"))


def minhash_groups_store(
    spark: SparkSession,
    store_dir: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup groups over the accumulated pair state: the connected-
    component resolution (``dedup.duplicate_groups``) run over the pairs
    store and the ingested ids (from the shingle store) — (id, group_id,
    group_size), multi-doc groups only."""
    from ..functions.dedup import duplicate_groups

    shingles_dir = _store_paths(store_dir)[1]
    docs = spark.read.parquet(shingles_dir).select(
        F.col(id_col)).distinct()
    groups = duplicate_groups(
        docs, minhash_pairs_store(spark, store_dir), id_col)
    return groups.where(F.col("group_size") > 1)


def run_minhash_stream_on_dir(
    spark: SparkSession,
    input_path: str,
    store_dir: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a parquet file/dir through ``minhash_dedup_stream``
    (availableNow) and return the accumulated pair state."""
    batch = spark.read.parquet(input_path)
    reader = spark.readStream.schema(batch.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    q = minhash_dedup_stream(
        spark, stream, store_dir, checkpoint_path, text_col, id_col,
        k=k, num_hashes=num_hashes, bands=bands, threshold=threshold)
    q.awaitTermination()
    return minhash_pairs_store(spark, store_dir)
