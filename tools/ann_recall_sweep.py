"""ANN recall at production sizing on CLUSTERED embeddings.

The registry-config recall table in BASELINE.md (ivfpq 0.29) measures the
near-uniform fixture — the quantizer worst case, sized for DuckDB-oracle
tractability. Real embedding corpora are clustered; production sizing
raises PQ's per-subspace codebook (k=256) and the probe count. This tool
turns that claim into numbers: a deterministic clustered corpus (Gaussian
blobs around seeded centers), exact cosine baseline, then
``similarity.ann_recall`` across index configs.

Usage: python tools/ann_recall_sweep.py [--n 5000] [--dim 64]
       [--clusters 50] [--queries 40] [--k 10]
Prints one JSON line {config: {macro_recall, worst}} for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from anomalyzer_spark.functions import ann_index  # noqa: E402
from anomalyzer_spark.functions import similarity as S  # noqa: E402
from anomalyzer_spark.session import get_spark  # noqa: E402


def make_clustered(spark, n: int, dim: int, n_clusters: int, seed: int = 7):
    """Deterministic Gaussian blobs: cluster centers ~N(0,1), members =
    center + 0.15·N(0,1). NumPy-generated on the driver then parallelized
    (this is a measurement fixture, not a scale path)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + 0.15 * rng.standard_normal((n, dim))
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v.round(6)]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def macro(recall_df):
    rows = recall_df.collect()
    rs = [r["recall"] for r in rows]
    return round(float(np.mean(rs)), 3), round(float(np.min(rs)), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=50)
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("ann-recall-sweep")
    e = make_clustered(spark, args.n, args.dim, args.clusters)
    e = e.repartition(spark.sparkContext.defaultParallelism)
    e.cache().count()
    q = e.where(F.col("vec_id") < args.queries)

    exact = S.cosine_topk(e, q, k=args.k).localCheckpoint(eager=True)

    sample = np.asarray(
        [r["embedding"] for r in
         e.where(F.col("vec_id") < 2048).orderBy("vec_id").collect()],
        dtype=np.float64)
    # production-ish sizing: cells ~ sqrt(n)-to-n/100, PQ k=256
    n_cells = max(16, args.n // 100)
    cents = S.train_ivf_centroids(sample, n_cells)
    books256 = S.train_pq_codebooks(sample, m=8, k=256)
    books16 = S.train_pq_codebooks(sample, m=8, k=16)

    out = {}
    for name, build in (
        (f"ivf_{n_cells}c_probe4", lambda: S.ivf_topk(
            e, q, k=args.k, n_clusters=n_cells, n_probe=4,
            centroids=cents)),
        (f"ivf_{n_cells}c_probe8", lambda: S.ivf_topk(
            e, q, k=args.k, n_clusters=n_cells, n_probe=8,
            centroids=cents)),
        ("pq_m8_k16", lambda: S.pq_topk(e, q, books16, k=args.k)),
        ("pq_m8_k256", lambda: S.pq_topk(e, q, books256, k=args.k)),
        ("ivfpq_k256_probe4", lambda: S.ivfpq_topk(
            e, q, cents, books256, k=args.k, n_probe=4)),
        ("ivfpq_k256_probe8", lambda: S.ivfpq_topk(
            e, q, cents, books256, k=args.k, n_probe=8)),
        ("ivfpq_k256_probe16", lambda: S.ivfpq_topk(
            e, q, cents, books256, k=args.k, n_probe=16)),
        # production shape: ADC generates candidates, exact re-rank picks
        # the k — refine=10k/4k means the exact pass touches 100/40
        # vectors per query, ~2-0.8% of this corpus
        ("ivfpq_k256_probe8_refine4k", lambda: S.ivfpq_topk(
            e, q, cents, books256, k=args.k, n_probe=8,
            refine=4 * args.k)),
        ("ivfpq_k256_probe8_refine10k", lambda: S.ivfpq_topk(
            e, q, cents, books256, k=args.k, n_probe=8,
            refine=10 * args.k)),
        ("pq_k256_refine10k", lambda: S.pq_topk(
            e, q, books256, k=args.k, refine=10 * args.k)),
    ):
        m, worst = macro(S.ann_recall(build(), exact, k=args.k))
        out[name] = {"macro_recall": m, "worst": worst}
        print(f"# {name}: macro={m} worst={worst}", file=sys.stderr)

    # persisted-index rows: the float-corpus refine vs the int8 stored
    # tier (refine_source="quantized") over the SAME index — the recall
    # cost of the 4-8x storage cut, measured head-to-head
    with tempfile.TemporaryDirectory() as td:
        idx = f"{td}/ivfpq_idx"
        ann_index.build_ivfpq_index(e, idx, cents, books256,
                                    quantized_refine=True)
        for name, build in (
            ("index_probe8_refine10k_float",
             lambda: ann_index.search_ivfpq_index(
                 spark, idx, q, cents, books256, k=args.k, n_probe=8,
                 refine=10 * args.k, corpus=e)),
            ("index_probe8_refine10k_int8",
             lambda: ann_index.search_ivfpq_index(
                 spark, idx, q, cents, books256, k=args.k, n_probe=8,
                 refine=10 * args.k, refine_source="quantized")),
        ):
            m, worst = macro(S.ann_recall(build(), exact, k=args.k))
            out[name] = {"macro_recall": m, "worst": worst}
            print(f"# {name}: macro={m} worst={worst}", file=sys.stderr)
    print(json.dumps({"metric": "ann_recall_clustered",
                      "n": args.n, "dim": args.dim,
                      "clusters": args.clusters, "k": args.k,
                      "configs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
