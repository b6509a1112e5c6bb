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

State at 100 TB — growth is BOUNDED, not append-forever:

* the store is the corpus' band buckets (bands rows/doc) and shingle sets
  — O(in-horizon corpus). ``retention_batches=H`` evicts state older than
  the dedup horizon after every batch (``batch_id < current - H + 1``
  directories are dropped for buckets, shingles AND pairs — a pair whose
  discovery batch left the horizon references evicted documents and is
  stale by the same horizon contract).
* ``compact_every=C`` folds the surviving per-batch directories into a
  single ``compacted/<name>/gen=N`` generation every C batches, so the
  file count stays O(C + 1 generation) instead of one directory (and its
  task-count many files) per micro-batch forever. The generation carries
  ``batch_id`` as a data column, so retention keeps working on compacted
  rows; out-of-horizon rows are physically dropped at the next rewrite.
  Compaction is crash-safe without atomic rename: the new generation is
  written first, its ``_folded.json`` manifest records the highest live
  ``batch_id`` it absorbed, readers take the newest COMPLETE generation
  (``_SUCCESS`` + manifest) and only read live directories NEWER than its
  fold point — a crash between generation write and live-dir deletion
  double-stores but never double-reads. A replayed batch that already
  compacted skips re-compaction (its generation exists and is complete).

The per-batch join broadcasts the NEW side, so the store is scanned, never
shuffled; the store is partitioned by a bucket prefix (``pfx``, written
here) so broadcast-join dynamic partition pruning can skip store files
whose prefixes the batch does not touch. Store reads pin an explicit
schema (``pfx`` string): partition type inference would type an all-digit
hex prefix batch as int and silently drift the join key type.

Directory deletes use local-filesystem calls — on a real cluster this
store lives on an object store / DFS and the sweep would issue the same
deletes through that FS client; the layout and manifest protocol are
FS-agnostic.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..functions.dedup import (
    minhash_band_buckets, verify_jaccard_pairs, word_shingles,
)

def _pair_ddl(id_type: str) -> str:
    return f"id_a {id_type}, id_b {id_type}, jaccard double"


def _store_paths(store_dir: str) -> tuple[str, str, str]:
    return (f"{store_dir}/buckets", f"{store_dir}/shingles",
            f"{store_dir}/pairs")


def _with_batch_id(schema: StructType) -> StructType:
    return StructType(list(schema.fields)
                      + [StructField("batch_id", LongType())])


def _live_batch_ids(live_dir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p).split("=", 1)[1])
        for p in glob.glob(f"{live_dir}/batch_id=*") if os.path.isdir(p))


def _latest_gen(comp_dir: str) -> tuple[str | None, int]:
    """Newest COMPLETE compacted generation (``_SUCCESS`` + manifest) and
    the highest live batch_id folded into it; (None, -1) when none."""
    if not os.path.isdir(comp_dir):
        return None, -1
    gens = sorted(
        (int(os.path.basename(p).split("=", 1)[1]), p)
        for p in glob.glob(f"{comp_dir}/gen=*") if os.path.isdir(p))
    for _, path in reversed(gens):
        manifest = f"{path}/_folded.json"
        if os.path.isfile(f"{path}/_SUCCESS") and os.path.isfile(manifest):
            with open(manifest) as f:
                return path, int(json.load(f)["max_folded"])
    return None, -1


def _read_component(
    spark: SparkSession,
    store_dir: str,
    name: str,
    schema: StructType | None,
    min_live: int | None,
) -> DataFrame | None:
    """Current state of one store component: newest complete compacted
    generation ∪ live ``batch_id=N`` dirs newer than its fold point, rows
    older than ``min_live`` filtered out. ``schema`` (data columns, pfx
    included where applicable — batch_id appended here) is pinned on every
    read so partition type inference can never drift a join key. Returns
    None when the component holds nothing yet."""
    live_dir = f"{store_dir}/{name}"
    gen_path, folded = _latest_gen(f"{store_dir}/compacted/{name}")
    full = _with_batch_id(schema) if schema is not None else None
    parts: list[DataFrame] = []
    if gen_path is not None:
        r = spark.read
        if full is not None:
            r = r.schema(full)
        parts.append(r.parquet(gen_path))
    live_ids = [b for b in _live_batch_ids(live_dir) if b > folded]
    if live_ids:
        r = spark.read
        if full is not None:
            r = r.schema(full)
        live = r.parquet(live_dir).where(F.col("batch_id") > folded)
        if full is None:
            live = live.withColumn(
                "batch_id", F.col("batch_id").cast("long"))
        parts.append(live)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if min_live is not None:
        out = out.where(F.col("batch_id") >= min_live)
    return out


def _sweep_live(
    store_dir: str,
    min_live: int,
    folded: dict[str, int],
    components: tuple[str, ...] = ("buckets", "shingles", "pairs"),
) -> None:
    """Drop live ``batch_id`` dirs already folded into a complete
    generation or older than the retention horizon. ``components``
    defaults to this module's store; semantic_stream passes its own."""
    for name in components:
        live_dir = f"{store_dir}/{name}"
        cut = max(min_live - 1, folded.get(name, -1))
        for b in _live_batch_ids(live_dir):
            if b <= cut:
                shutil.rmtree(f"{live_dir}/batch_id={b}",
                              ignore_errors=True)


def _compact_component(
    spark: SparkSession,
    store_dir: str,
    name: str,
    schema: StructType,
    min_live: int | None,
    upto: int,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Fold the current state of one component into ``compacted/<name>/
    gen=<upto>``: write the new generation, stamp its manifest, then drop
    the absorbed live dirs and every older generation. Skips if gen=<upto>
    is already complete (batch replay after a crash-past-compaction)."""
    comp_dir = f"{store_dir}/compacted/{name}"
    gen_path = f"{comp_dir}/gen={upto}"
    if (os.path.isfile(f"{gen_path}/_SUCCESS")
            and os.path.isfile(f"{gen_path}/_folded.json")):
        return
    cur = _read_component(spark, store_dir, name, schema, min_live)
    if cur is None:
        return
    # repartition, never coalesce(1): the generation holds the WHOLE
    # in-horizon component, and funnelling it through one task would stall
    # the stream (and hotspot one executor) exactly on the long-running
    # corpora compaction exists for — defaultParallelism writers bound the
    # file count to one generation's worth while staying parallel
    w = (cur.repartition(*partition_cols) if partition_cols
         else cur.repartition(spark.sparkContext.defaultParallelism))
    wr = w.write.mode("overwrite")
    if partition_cols:
        wr = wr.partitionBy(*partition_cols)
    wr.parquet(gen_path)
    with open(f"{gen_path}/_folded.json", "w") as f:
        json.dump({"max_folded": upto}, f)
    # absorbed state: live dirs ≤ upto and superseded generations
    for b in _live_batch_ids(f"{store_dir}/{name}"):
        if b <= upto:
            shutil.rmtree(f"{store_dir}/{name}/batch_id={b}",
                          ignore_errors=True)
    for p in glob.glob(f"{comp_dir}/gen=*"):
        if os.path.isdir(p) and p != gen_path:
            shutil.rmtree(p, ignore_errors=True)


def _materialize_groups(
    spark: SparkSession,
    store_dir: str,
    id_col: str,
    upto: int,
) -> None:
    """Resolve the current pair state into groups and write them as a
    ``compacted/groups/gen=<upto>`` generation (same complete-generation
    protocol as the store components; skipped on batch replay)."""
    comp_dir = f"{store_dir}/compacted/groups"
    gen_path = f"{comp_dir}/gen={upto}"
    if (os.path.isfile(f"{gen_path}/_SUCCESS")
            and os.path.isfile(f"{gen_path}/_folded.json")):
        return
    groups = minhash_groups_store(spark, store_dir, id_col)
    (groups.repartition(spark.sparkContext.defaultParallelism)
     .write.mode("overwrite").parquet(gen_path))
    with open(f"{gen_path}/_folded.json", "w") as f:
        json.dump({"max_folded": upto}, f)
    for p in glob.glob(f"{comp_dir}/gen=*"):
        if os.path.isdir(p) and p != gen_path:
            shutil.rmtree(p, ignore_errors=True)


def _ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    retention_batches: int | None,
    compact_every: int | None,
    materialize_groups: bool,
) -> None:
    """One store ingest step — the shared body of the streaming handle
    and the batch ``minhash_increment`` (identical semantics by
    construction: same writes, same store read, same verification)."""
    if batch_df.isEmpty():
        return
    buckets_dir, shingles_dir, pairs_dir = _store_paths(store_dir)
    min_live = (batch_id - retention_batches + 1
                if retention_batches is not None else None)
    new = batch_df.select(F.col(id_col), F.col(text_col))
    # 1. extend the store first (replay-idempotent batch_id overwrite;
    #    also lets same-batch pairs resolve through the store read)
    bk = (
        minhash_band_buckets(new, text_col, id_col, k=k,
                             num_hashes=num_hashes, bands=bands)
        .withColumn("pfx", F.substring("bucket", 1, 2))
    )
    bucket_schema = bk.schema
    # cluster by pfx before the partitioned write: without it every task
    # writes a file into every pfx directory it touches (~tasks × 256
    # files PER BATCH — measured 8k files for one 4.5k-doc batch, and
    # store scans/increments paid it back as pure file overhead); with
    # it the batch writes one file per touched pfx
    (bk.repartition("pfx")
     .write.mode("overwrite").partitionBy("pfx")
     .parquet(f"{buckets_dir}/batch_id={batch_id}"))
    sh_new = new.select(F.col(id_col),
                        word_shingles(F.col(text_col), k).alias("sh"))
    shingle_schema = sh_new.schema
    (sh_new.write.mode("overwrite")
     .parquet(f"{shingles_dir}/batch_id={batch_id}"))
    # 2. candidates: (small) new buckets broadcast against the store —
    #    the store side is scanned, never shuffled
    store_b = _read_component(
        spark, store_dir, "buckets", bucket_schema, min_live)
    new_b = spark.read.schema(bucket_schema).parquet(
        f"{buckets_dir}/batch_id={batch_id}")
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
        _read_component(
            spark, store_dir, "shingles", shingle_schema, min_live)
        .join(F.broadcast(cand_ids), id_col, "left_semi")
        .select(id_col, "sh")
    )
    (
        verify_jaccard_pairs(sh, cand, threshold, id_col)
        .write.mode("overwrite")
        .parquet(f"{pairs_dir}/batch_id={batch_id}")
    )
    # 4. bound state: evict out-of-horizon dirs; periodically fold the
    #    survivors into one compacted generation
    if min_live is not None:
        folded = {n: _latest_gen(f"{store_dir}/compacted/{n}")[1]
                  for n in ("buckets", "shingles", "pairs")}
        _sweep_live(store_dir, min_live, folded)
    if compact_every is not None and \
            (batch_id + 1) % compact_every == 0:
        pair_schema = StructType([
            StructField("id_a", bucket_schema[id_col].dataType),
            StructField("id_b", bucket_schema[id_col].dataType),
            StructField("jaccard", DoubleType()),
        ])
        _compact_component(spark, store_dir, "buckets", bucket_schema,
                           min_live, batch_id, ("pfx",))
        _compact_component(spark, store_dir, "shingles",
                           shingle_schema, min_live, batch_id)
        _compact_component(spark, store_dir, "pairs", pair_schema,
                           min_live, batch_id)
        if materialize_groups:
            _materialize_groups(spark, store_dir, id_col, batch_id)


def minhash_increment(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    batch_id: int | None = None,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    retention_batches: int | None = None,
    compact_every: int | None = None,
    materialize_groups: bool = False,
) -> DataFrame:
    """Batch-mode incremental near-dup dedup: ingest ONE increment of
    documents into the persisted MinHash store and return the NEW pairs
    it introduced (new-vs-corpus and new-vs-new, exact-verified:
    ``id_a < id_b``, ``jaccard`` ≥ threshold) — the scheduled-batch-job
    twin of ``minhash_dedup_stream``, for pipelines that land a daily/
    hourly crawl increment as a plain DataFrame and should dedup it
    against everything already ingested WITHOUT rescanning the corpus.
    Identical store layout, candidate generation, verification and
    retention/compaction — the two entry points share ``_ingest_batch``
    verbatim, so a store may even be served by the stream and fed by
    batch jobs (or vice versa) and accumulated pairs keep equaling the
    batch ``minhash_lsh_pairs`` over all ingested documents (pinned).

    ``batch_id``: defaults to one past the highest ingested id
    (live dirs and compacted fold points both count). Re-running with
    an EXPLICIT ``batch_id`` is an idempotent replay (same overwrite
    contract as the stream). Cost per increment, precisely: the
    increment's shingling/writes and the candidate-scoped verification
    are O(increment + matches); the candidate probe additionally pays
    ONE map-only scan of the bucket INDEX (bands rows per corpus doc —
    a small fraction of corpus text bytes; broadcast-probed, so the
    corpus never shuffles; pfx partition pruning helps only when an
    increment is prefix-localized, which a random batch is not).
    Measured (tools/scale_sweep synthetic corpus, local[32]): a fixed
    5k-doc increment costs 5.7 s against a 45k-doc store and 10.1 s
    against a 495k-doc store — the index-scan term — vs whole-corpus
    re-dedup at 15 s / 31 s (and re-dedup also re-pays its own text
    scan + corpus-wide signature shuffle, which is the asymptotic
    difference).

    MinHash parameters must match across every ingest into one store
    (same spec as the stream; differing k/num_hashes/bands would make
    buckets incomparable). The returned pair frame's id type is derived
    from ``docs.schema[id_col]`` — the writer's actual type — so string-
    keyed stores read back correctly without a separate declaration."""
    if materialize_groups and compact_every is None:
        raise ValueError(
            "materialize_groups=True requires compact_every (groups are "
            "materialized at compaction ticks)")
    if batch_id is None:
        last = -1
        for name in ("buckets", "shingles", "pairs"):
            ids = _live_batch_ids(f"{store_dir}/{name}")
            if ids:
                last = max(last, ids[-1])
            last = max(last, _latest_gen(f"{store_dir}/compacted/{name}")[1])
        batch_id = last + 1
    _ingest_batch(
        spark, docs, batch_id, store_dir=store_dir, text_col=text_col,
        id_col=id_col, k=k, num_hashes=num_hashes, bands=bands,
        threshold=threshold, retention_batches=retention_batches,
        compact_every=compact_every, materialize_groups=materialize_groups)
    from pyspark.sql.types import DoubleType, StructField, StructType

    pair_schema = StructType([
        StructField("id_a", docs.schema[id_col].dataType),
        StructField("id_b", docs.schema[id_col].dataType),
        StructField("jaccard", DoubleType()),
    ])
    pairs_path = f"{_store_paths(store_dir)[2]}/batch_id={batch_id}"
    if not os.path.isdir(pairs_path):  # empty increment wrote nothing
        return spark.createDataFrame([], pair_schema)
    return spark.read.schema(pair_schema).parquet(pairs_path)


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
    retention_batches: int | None = None,
    compact_every: int | None = None,
    materialize_groups: bool = False,
):
    """Start the incremental MinHash near-dup pipeline over a document
    stream. Returns the started StreamingQuery (caller awaits/stops);
    read results with ``minhash_pairs_store`` / ``minhash_groups_store``.

    ``materialize_groups=True`` (requires ``compact_every``) additionally
    resolves connected-component groups at every compaction tick and
    writes them as ``compacted/groups/gen=N`` — the materialization
    ``minhash_groups_store``'s read-cost note points at: frequent readers
    get a parquet scan (as-of the last tick) instead of re-running full
    connected components over all accumulated pairs per call.

    ``retention_batches=H`` bounds state to the last H micro-batches (the
    dedup horizon): older bucket/shingle/pair state is evicted after every
    batch. ``compact_every=C`` folds surviving per-batch directories into
    one compacted generation every C batches, bounding the store's file
    count for long-running streams (see module docstring for the
    crash-safety protocol). Both default to None — keep-everything,
    one-directory-per-batch — which preserves exact equality with batch
    ``minhash_lsh_pairs`` over the WHOLE corpus; with retention, equality
    holds over the in-horizon corpus (pairs whose endpoints both survive).

    Document ids must be unique across the stream (the usual curation
    contract; re-sent ids would self-pair away but double-count in
    groups).
    """
    if materialize_groups and compact_every is None:
        raise ValueError(
            "materialize_groups=True requires compact_every (groups are "
            "materialized at compaction ticks); without it the stream "
            "would silently never materialize and "
            "prefer_materialized readers would fall back to the full "
            "connected-components recomputation this option exists to "
            "avoid")
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        _ingest_batch(
            spark, batch_df, batch_id, store_dir=store_dir,
            text_col=text_col, id_col=id_col, k=k, num_hashes=num_hashes,
            bands=bands, threshold=threshold,
            retention_batches=retention_batches,
            compact_every=compact_every,
            materialize_groups=materialize_groups)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def minhash_pairs_store(
    spark: SparkSession,
    store_dir: str,
    *,
    only_ingested_ids: bool = False,
    id_col: str = "doc_id",
    id_type: str = "long",
) -> DataFrame:
    """All near-dup pairs accumulated so far: (id_a, id_b, jaccard).
    ``id_type`` (Spark DDL type name) types the EMPTY frame returned
    before any batch lands — pass it when doc ids aren't long, or the
    empty frame won't union/join with downstream frames.

    Equals the batch ``minhash_lsh_pairs`` over every document ingested
    (each pair is written exactly once — see module docstring); under a
    retention horizon the state covers the in-horizon corpus, and
    ``only_ingested_ids=True`` additionally drops pairs referencing
    documents that have been evicted from the shingle store (one endpoint
    in-horizon, the other gone) — the exact-match contract against batch
    ``minhash_lsh_pairs`` over the surviving corpus. Returns an empty
    typed frame when nothing was ingested yet.
    """
    pairs = _read_component(spark, store_dir, "pairs", None, None)
    if pairs is None:
        return spark.createDataFrame([], _pair_ddl(id_type))
    pairs = pairs.select("id_a", "id_b", "jaccard")
    if only_ingested_ids:
        ids = _read_component(spark, store_dir, "shingles", None, None)
        ids = (ids.select(F.col(id_col)).distinct()
               if ids is not None else
               spark.createDataFrame([], f"`{id_col}` {id_type}"))
        # no broadcast hint: unlike the per-batch cand_ids (bounded by one
        # micro-batch), this id set is the whole in-horizon corpus — let
        # Spark/AQE pick the semi-join strategy at its actual size
        pairs = (
            pairs
            .join(ids.select(F.col(id_col).alias("id_a")),
                  "id_a", "left_semi")
            .join(ids.select(F.col(id_col).alias("id_b")),
                  "id_b", "left_semi")
            .select("id_a", "id_b", "jaccard")
        )
    return pairs


def minhash_groups_store(
    spark: SparkSession,
    store_dir: str,
    id_col: str = "doc_id",
    *,
    prefer_materialized: bool = False,
    id_type: str = "long",
) -> DataFrame:
    """Near-dup groups over the accumulated pair state: the connected-
    component resolution (``dedup.duplicate_groups``) run over the pairs
    store and the ingested ids (from the shingle store) — (id, group_id,
    group_size), multi-doc groups only.

    Read cost: this re-runs FULL connected components over every pair
    accumulated so far on each call — O(all-pairs-so-far · log diameter),
    unlike the incremental per-batch pair writes. Fine as an occasional
    read-side view; a caller that needs groups frequently should run the
    stream with ``materialize_groups=True`` and pass
    ``prefer_materialized=True`` here — that reads the parquet written at
    the last compaction tick (as-of that tick) instead of recomputing,
    falling back to the live computation when no materialization exists.
    """
    from ..functions.dedup import duplicate_groups

    if prefer_materialized:
        gen_path, _ = _latest_gen(f"{store_dir}/compacted/groups")
        if gen_path is not None:
            return spark.read.parquet(gen_path)

    ing = _read_component(spark, store_dir, "shingles", None, None)
    if ing is None:
        return spark.createDataFrame(
            [], f"`{id_col}` {id_type}, group_id long, group_size long")
    docs = ing.select(F.col(id_col)).distinct()
    groups = duplicate_groups(
        docs, minhash_pairs_store(spark, store_dir, only_ingested_ids=True,
                                  id_col=id_col, id_type=id_type), id_col)
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
    retention_batches: int | None = None,
    compact_every: int | None = None,
    materialize_groups: bool = False,
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
        k=k, num_hashes=num_hashes, bands=bands, threshold=threshold,
        retention_batches=retention_batches, compact_every=compact_every,
        materialize_groups=materialize_groups)
    q.awaitTermination()
    return minhash_pairs_store(spark, store_dir)
