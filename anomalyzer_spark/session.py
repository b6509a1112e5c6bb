"""SparkSession factory with engine defaults.

Local testing runs ``local[N]``; the same settings are what we'd ship on a
real cluster (AQE on for runtime re-planning + skew-join handling, Arrow on
for the pandas kernels).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import SparkSession


def get_spark(app: str = "anomalyzer-spark", shuffle_partitions: int | None = None):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # must reach the JVM launcher BEFORE the gateway starts — builder
    # confs are too late for driver JVM flags in local mode (see _build
    # comment on DontCompileHugeMethods)
    opts = os.environ.get("SPARK_SUBMIT_OPTS", "")
    if "DontCompileHugeMethods" not in opts:
        # -XX:-DontCompileHugeMethods: JIT the huge whole-stage-codegen
        # methods (see _build). ReservedCodeCacheSize: a long session
        # running many wide generated stages fills the default ~240 MB
        # code cache, C2 shuts off, and LATE queries silently fall back
        # to the interpreter (observed: simhash at 26x CPU, identical
        # plan hash, as query #12 of a 19-query session — back at its
        # floor run alone or with 512m; r15: the grown 26-query session
        # with the attestation riders overflowed 512m the same way —
        # dedup_paragraphs at 9x CPU as query #19, identical plan hash,
        # back at its floor alone — so the reserve is 1g now. Cost is
        # virtual address space, not resident memory).
        os.environ["SPARK_SUBMIT_OPTS"] = (
            opts + " -XX:-DontCompileHugeMethods"
            " -XX:ReservedCodeCacheSize=1g").strip()
    spark = _build(app, cpus, shuffle_partitions)
    # Warm Spark 4's ICU-backed Unicode casing ONCE, single-threaded: the
    # first non-ASCII lower()/upper() triggers CollationAwareUTF8String's
    # static init (~4-6s here). If 32 concurrent tasks race that class
    # init instead, contention blows it up to minutes (observed >400s CPU)
    # — pay it deterministically at session start.
    spark.sql("select lower('İstanbul 中文 ÉΑΒΓ')").collect()
    return spark


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


#: conf key for compact_checkpoint's bytes-per-partition divisor (the
#: batch sibling of anomalyzer.streaming.bytesPerStatePartition)
COMPACT_BYTES_CONF = "anomalyzer.batch.bytesPerCheckpointPartition"
_COMPACT_BYTES_DEFAULT = 64 * 1024 * 1024


def compact_checkpoint(df, *, bytes_per_partition: int | None = None):
    """Eager ``localCheckpoint`` whose DOWNSTREAM partition count derives
    from the checkpoint's MEASURED size instead of the input's split
    count — the batch sibling of ``streaming.adaptive_state_partitions``.

    A checkpointed intermediate inherits its parent's partitioning, which
    is sized for the SOURCE scan, not for the (usually far smaller)
    checkpoint: a few thousand scalar rows spread over 32 splits make
    every downstream stage pay 32 tasks of scheduling for microseconds of
    work each — and at 100 TB the same constant under-partitions. After
    materializing, this reads the persisted blocks' size from the block
    manager and coalesces to ``ceil(bytes / bytes_per_partition)``
    clamped to [1, current partitions] (``coalesce`` is a narrow
    dependency — no shuffle; when the derived count is not smaller, the
    frame is returned unchanged). The divisor is conf-parameterised
    (``anomalyzer.batch.bytesPerCheckpointPartition``, default 64 MiB —
    the AQE advisory-size class), so production tunes it per cluster.

    Use it for checkpoints whose consumers do LIGHT per-row work (joins,
    aggregates, filters over scalars) — for a checkpoint feeding
    CPU-heavy per-row expressions, fewer partitions also means fewer
    cores on that work, so keep the plain ``localCheckpoint`` there.
    Values/schema are untouched: ``coalesce`` only merges partitions.
    (Classic-session only: reads the block manager through private py4j
    handles, like the streaming sibling.)"""
    spark = df.sparkSession
    if bytes_per_partition is None:
        try:
            bytes_per_partition = int(
                spark.conf.get(COMPACT_BYTES_CONF, None)
                or _COMPACT_BYTES_DEFAULT)
        except ValueError:
            bytes_per_partition = _COMPACT_BYTES_DEFAULT
    before = _persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    new_ids = _persistent_rdd_ids(spark) - before
    size = 0
    try:
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
            if int(info.id()) in new_ids:
                size += int(info.memSize()) + int(info.diskSize())
    except Exception:  # never let sizing break the query path
        return out
    cur = out.rdd.getNumPartitions()
    n = max(1, min(cur, -(-size // max(1, bytes_per_partition))))
    return out.coalesce(n) if n < cur else out


@contextlib.contextmanager
def checkpoint_scope(spark: SparkSession):
    """Bound the storage of eager ``localCheckpoint`` frames to a scope.

    The LSH/SimHash pair generators, ``cosine_pairs``, and
    ``search_ivfpq_index`` localCheckpoint intermediates EAGERLY (Catalyst
    gives their self-joins no ReusedExchange; see dedup.py/similarity.py).
    Those checkpoint blocks are normally reclaimed only when the
    ContextCleaner garbage-collects the Python frame reference — fine for
    per-query sessions, but a long-lived serving session calling these in
    a loop accumulates blocks between GC cycles. Wrap each serving
    iteration in this scope and every RDD persisted INSIDE it (which is
    what a localCheckpoint is under the hood) is explicitly unpersisted on
    exit:

        with checkpoint_scope(spark):
            pairs = minhash_lsh_pairs(docs, ...)
            out = pairs.collect()          # consume INSIDE the scope

    Results must be fully consumed (collected/written) before the scope
    closes — a checkpointed frame has no lineage left to recompute from
    once its blocks are dropped. RDDs already persisted before entry are
    left untouched; anything the scope body itself persisted on purpose
    should be persisted OUTSIDE the scope."""
    before = _persistent_rdd_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for k in jmap.keySet().toArray():
            if int(k) not in before:
                jmap.get(k).unpersist(False)


def _build(app: str, cpus: str, shuffle_partitions: int | None):
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        # local mode runs all 32 task slots in the driver JVM: an 8g heap
        # GC-thrashes once object-heavy stages (higher-order exprs, Arrow
        # batches) accumulate — benchmarks showed every query after the
        # kernel stage slowing 3-10x. 32g on the 128 GiB box keeps GC flat.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # Whole-stage codegen for the wide higher-order expressions (minhash
        # fold, simhash, detect staging) emits methods past HotSpot's
        # -XX:DontCompileHugeMethods bytecode limit; whether the JIT warms
        # them anyway varies per JVM instance, making those queries
        # bimodally 2-3x slower (measured 1.8s vs 3.4-5.0s for minhash at
        # sf0.1). get_spark force-enables huge-method JIT via
        # SPARK_SUBMIT_OPTS (builder confs are too late for driver JVM
        # flags in local mode); the executor conf below covers real
        # clusters where executors are separate JVMs.
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods "
                "-XX:ReservedCodeCacheSize=1g")
        # Python workers: guard the per-task importlib.invalidate_caches
        # against re-parsing pyspark.zip's central directory every task
        # (~0.65 s wall / ~0.24 s CPU per task on distribution installs —
        # see _daemon.py). The package is importable wherever the UDF
        # kernels already run (they reference anomalyzer_spark.oracle by
        # module name), so this adds no deployment constraint.
        .config("spark.python.daemon.module", "anomalyzer_spark._daemon")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
