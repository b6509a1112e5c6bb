"""bm25 one-pass (tokenize-once checkpoint) vs two-pass (from-text) sweep.

The r15 bm25/text_pipeline/decontam persist-once changes are plan-real
but were fixture-neutral at sf0.1 (the checkpoint materialization costs
about what the saved tokenizer pass saved). This probe makes the
scale-shape claim falsifiable (r15 verdict item 8): it replicates the
sf0.1 documents K times (doc_id offset per replica — deterministic,
values preserved), then times the bm25 LEX leg both ways at each K with
the noop sink. Expected shape: the one-pass form's advantage grows with
K, because the saved pass is the regex tokenizer (CPU-heavy, scales with
corpus bytes) while the extra cost is one checkpoint write + two cheap
columnar reads.

Usage: python tools/bm25_scale_probe.py [--mults 1,2,5] [--repeat 2]
Prints one JSON line: {"mult": {"one_pass_s": ..., "two_pass_s": ...}}.
Scratch parquet lands under /tmp and is removed on exit.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from anomalyzer_spark.functions import retrieval  # noqa: E402
from anomalyzer_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def lex_one_pass(spark, path):
    d = spark.read.parquet(path).select("doc_id", "text")
    q = spark.createDataFrame(entry_mod.BM25_QUERIES,
                              "query_id long, query string")
    tk = retrieval.tokenize_docs(d).select("doc_id", "tokens") \
        .localCheckpoint(eager=True)
    return retrieval.bm25_topk(
        tk, q, k=entry_mod.BM25_K, tokens_col="tokens",
        corpus_stats=retrieval.bm25_corpus_stats(tk, tokens_col="tokens"))


def lex_two_pass(spark, path):
    d = spark.read.parquet(path).select("doc_id", "text")
    q = spark.createDataFrame(entry_mod.BM25_QUERIES,
                              "query_id long, query string")
    return retrieval.bm25_topk(d, q, k=entry_mod.BM25_K)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,5")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    spark = get_spark("bm25-scale-probe")
    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    scratch = f"/tmp/bm25_probe_{os.getpid()}"
    out: dict[str, dict] = {}
    try:
        for k in mults:
            path = f"{scratch}/x{k}"
            reps = [base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text") for i in range(k)]
            df = reps[0]
            for r in reps[1:]:
                df = df.unionByName(r)
            df.write.mode("overwrite").parquet(path)
            cell: dict[str, float] = {}
            for name, fn in (("one_pass_s", lex_one_pass),
                             ("two_pass_s", lex_two_pass)):
                noop(fn(spark, path))  # warm
                times = []
                for _ in range(args.repeat):
                    t0 = time.perf_counter()
                    noop(fn(spark, path))
                    times.append(round(time.perf_counter() - t0, 3))
                cell[name] = min(times)
                print(f"# x{k} {name}: {min(times)} {times}",
                      file=sys.stderr)
            out[str(k)] = cell
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
