"""r14 review regressions: the ANN/semantic operators' NULL and
degenerate-vector contracts — model fits sanitize BEFORE
sampling/training, refine drops NULL-cosine candidates (refine >=
corpus EQUALS cosine_topk even with zero-norm rows), degenerate
cosines rank LAST in cell assignment, and validation raises instead
of asserting/truncating."""

import pytest

from pyspark.sql import functions as F

from anomalyzer_spark.functions import similarity


def _embs(spark, n=24, dim=4, nulls=(), zeros=()):
    rows = []
    for i in range(n):
        if i in nulls:
            v = None
        elif i in zeros:
            v = [0.0] * dim
        else:
            v = [float((i * 7 + j * 3) % 11 - 5) or 1.0
                 for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_pairs_null_embeddings_dont_crash_training(spark):
    # NULL embeddings used to sort FIRST into the md5-ordered sample
    # (md5(concat(seed, NULL)) is NULL) and crash the NumPy fit
    df = _embs(spark, n=24, nulls=(0, 1, 2))
    pairs = similarity.semantic_pairs(
        df, threshold=0.5, n_clusters=2, sample_rows=10,
        materialize=False)
    ids = {i for r in pairs.collect() for i in (r["id_a"], r["id_b"])}
    assert ids and not ids & {0, 1, 2}  # NULL rows don't participate


def test_ivf_topk_trains_past_null_embeddings(spark):
    df = _embs(spark, n=24, nulls=(5,))
    out = similarity.ivf_topk(
        df, df.where(F.col("vec_id") < 3), n_clusters=2, n_probe=2, k=3)
    got = out.collect()
    assert len(got) > 0
    assert all(r["neighbor_id"] != 5 for r in got)


def test_refine_equals_exact_with_zero_norm_rows(spark):
    # a zero-norm corpus vector scores NULL cosine; refine used to keep
    # the NULL-sim row while cosine_topk dropped it
    df = _embs(spark, n=8, zeros=(7,))
    q = df.where(F.col("vec_id") < 2)
    import numpy as np
    sample = np.asarray(
        [r["embedding"] for r in
         df.where(F.col("vec_id") != 7).orderBy("vec_id").collect()],
        dtype=np.float64)
    books = similarity.train_pq_codebooks(sample, m=2, k=4)
    ref = similarity.pq_topk(df, q, books, k=10, refine=10)
    exact = similarity.cosine_topk(df, q, k=10)
    key = lambda r: (r["query_id"], r["neighbor_id"])
    assert sorted(map(key, ref.collect())) \
        == sorted(map(key, exact.collect()))
    assert all(r["cos_sim"] is not None for r in ref.collect())


def test_degenerate_cosine_ranks_last_in_cells(spark):
    # a zero-norm VECTOR must not be pulled to cell 0 by NULL-first
    # struct sort; with the +Infinity sentinel it still lands in a
    # cell (ties broken by cid order) but a zero-norm CENTROID is
    # never "nearest" for a real vector
    cents = [[0.0, 0.0], [1.0, 0.0]]
    df = spark.createDataFrame([(1, [2.0, 0.1])],
                               "vec_id long, embedding array<double>")
    cell = df.select(similarity.nearest_cells(
        "embedding", cents, 1)[0].alias("c")).collect()[0]["c"]
    assert cell == 1  # the real centroid wins; cell 0 ranked last


def test_validation_raises(spark):
    with pytest.raises(ValueError, match="n_clusters"):
        similarity.train_ivf_centroids([[1.0, 0.0]] * 3, 8)
    df = _embs(spark, n=6)
    with pytest.raises(ValueError, match="bands"):
        similarity.lsh_topk(df, df, n_planes=16, bands=3)
