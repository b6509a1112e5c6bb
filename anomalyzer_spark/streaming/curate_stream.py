"""Streaming curation — continuous ingest through the `curate()` stack.

``foreachBatch`` is the adapter (as for minhash_stream's store and the
streaming decontamination test): each micro-batch of raw documents runs
the CONFIGURED curation pipeline as a batch and lands in an idempotent
per-batch output directory, so the at-least-once replay contract becomes
effectively-once (a replayed batch id overwrites its own directory,
never duplicates rows).

Scope semantics are the honest part (see pipeline.py's streaming note):

* map-shaped stages — normalize, profile filters, redaction — mean the
  same thing per batch as offline;
* **exact dedup, near-dup dedup, the top_fraction gate, and the
  temperature mixture are BATCH-SCOPED**: "unique", "best X%", and the
  domain shares are computed within each micro-batch. Cross-batch
  exact/near dedup state is ``dedup_stream`` / ``minhash_dedup_stream``
  (run them downstream of this writer, or upstream of a final compact);
* decontamination against a STATIC eval frame is batch-safe as-is (the
  eval side never changes mid-stream).

``batch_union_equals_offline(cfg)`` tells you whether the configured
stages are batch-split-invariant (only map-shaped stages + static-eval
decontam are): when True, the union of batch outputs provably equals the
offline ``curate`` of the same corpus — pinned in
tests/test_streaming.py; when False the pipeline still runs, with the
batch-scope semantics above.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..pipeline import CurationConfig, curate

__all__ = ["batch_union_equals_offline", "run_curation_stream_on_dir"]


def batch_union_equals_offline(cfg: CurationConfig) -> bool:
    """True iff every configured stage is per-row (batch-split-invariant):
    the streamed union then equals offline curation byte-for-byte."""
    return (cfg.dedup is None
            and cfg.temperature_alpha is None
            and cfg.top_fraction is None
            and cfg.pack_capacity is None)


def run_curation_stream_on_dir(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: CurationConfig = CurationConfig(dedup=None),
    *,
    eval_df=None,
    schema=None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Stream parquet documents from ``input_dir`` through ``curate(cfg)``
    into idempotent ``batch_id=N`` parquet directories under
    ``output_dir``. Returns the started query (caller awaits/stops).

    ``schema`` defaults to the directory's existing parquet schema (one
    driver-side read of footers — the stream itself needs an explicit
    schema). With ``available_now`` the query drains what exists and
    stops — the batch-replay mode the equivalence test uses; pass False
    for a continuously running ingest.
    """
    if schema is None:
        schema = spark.read.parquet(input_dir).schema

    def _handle(batch_df, batch_id):
        out = curate(batch_df, cfg, eval_df=eval_df).output
        out.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
