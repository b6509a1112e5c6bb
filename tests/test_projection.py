"""PCA projection (functions/projection.py): DuckDB value parity of the
corpus-wide projection, spectral sanity of the fit, and the map-only
plan pin."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import projection

K = 8


def _sample(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id < 256 ORDER BY vec_id").fetchall()
    return np.asarray([r[1] for r in rows], dtype=np.float64)


def test_train_pca_spectral_properties(sf_dir):
    x = _sample(sf_dir)
    m = projection.train_pca(x, K)
    comps = np.asarray(m["components"])
    # orthonormal rows (up to the 6-decimal literal rounding)
    g = comps @ comps.T
    assert np.allclose(g, np.eye(K), atol=1e-4)
    # explained variance sorted descending, non-negative, bounded by total
    ev = m["explained_var"]
    assert all(a >= b for a, b in zip(ev, ev[1:])) and ev[-1] >= 0
    assert sum(ev) <= m["total_var"] + 1e-6
    # sign convention: largest-|coord| entry of every component positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    # determinism: same sample → identical model
    assert projection.train_pca(x, K) == m


def test_train_pca_reconstruction_improves_with_k(sf_dir):
    x = _sample(sf_dir)
    d = x.shape[1]
    errs = []
    for k in (2, d // 2, d):
        m = projection.train_pca(x, k)
        comps = np.asarray(m["components"])
        mean = np.asarray(m["mean"])
        xc = x - mean
        rec = (xc @ comps.T) @ comps
        errs.append(float(((xc - rec) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] == pytest.approx(0.0, abs=1e-3)  # k=d is a rotation


@pytest.mark.slow
def test_project_embeddings_duckdb_parity(spark, sf_dir):
    x = _sample(sf_dir)
    m = projection.train_pca(x, K)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        (r["vec_id"], tuple(r["proj"]), r["label"])
        for r in projection.project_embeddings(
            e, m, keep_cols=["label"]).collect())

    mean_sql = ", ".join(repr(float(v)) for v in m["mean"])
    coord = ("list_sum(list_transform(range(1, {d} + 1), i -> "
             "(v[i] - [{mean}][i]) * [{comp}][i]))")
    coords = ", ".join(
        "round(" + coord.format(
            d=len(m["mean"]), mean=mean_sql,
            comp=", ".join(repr(float(v)) for v in c)) + ", 6)"
        for c in m["components"])
    con = duckdb.connect()
    want = con.execute(f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
           FROM read_parquet('{sf_dir}/embeddings.parquet'))
SELECT vec_id, [{coords}] AS proj, label FROM e ORDER BY vec_id
""").fetchall()
    assert len(got) == len(want) > 0
    for (gid, gproj, glab), (wid, wproj, wlab) in zip(got, want):
        assert gid == wid and glab == wlab
        assert gproj == tuple(wproj)


def test_project_embeddings_plan_is_map_only(spark, sf_dir):
    x = _sample(sf_dir)
    m = projection.train_pca(x, 4)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = projection.project_embeddings(e, m)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_project_rejects_bad_model_and_width(spark):
    x = np.random.RandomState(0).randn(64, 8)
    m = projection.train_pca(x, 3)
    with pytest.raises(ValueError):
        projection.train_pca(x, 0)
    with pytest.raises(ValueError):
        projection.train_pca(x, 9)
    with pytest.raises(ValueError):
        projection.train_pca(x[:1], 2)
    bad = dict(m, mean=m["mean"] + [0.0])
    df = spark.createDataFrame(
        [(0, [float(i) for i in range(8)])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        projection.project_embeddings(df, bad)
    # width mismatch at execution time raises (checked_width contract)
    df9 = spark.createDataFrame(
        [(0, [float(i) for i in range(9)])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception):
        projection.project_embeddings(df9, m).collect()


# ---------------------------------------------------------------------------
# ann_recall (evaluation utility — lives with the model-quality tests)
# ---------------------------------------------------------------------------

def test_ann_recall_hand_built(spark):
    from anomalyzer_spark.functions.similarity import ann_recall
    exact = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 20, 1), (1, 21, 2), (2, 30, 1)],
        "query_id long, neighbor_id long, rnk long")
    approx = spark.createDataFrame(
        [(0, 10, 1), (0, 99, 2), (1, 21, 1), (1, 20, 2)],
        "query_id long, neighbor_id long, rnk long")
    out = {r["query_id"]: r for r in ann_recall(approx, exact).collect()}
    assert out[0]["n_exact"] == 2 and out[0]["n_hit"] == 1
    assert out[0]["recall"] == 0.5
    assert out[1]["recall"] == 1.0          # order within k is irrelevant
    assert out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0  # missed query
    # k truncation: at k=1 query 1's approx rank-1 (21) != exact rank-1 (20)
    out1 = {r["query_id"]: r["recall"]
            for r in ann_recall(approx, exact, k=1).collect()}
    assert out1 == {0: 1.0, 1: 0.0, 2: 0.0}


def test_ann_recall_on_real_indexes(spark, sf_dir):
    from anomalyzer_spark.functions import similarity
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    q = e.where(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(e, q, id_col="vec_id",
                                   vec_col="embedding",
                                   query_id_col="vec_id", k=5)
    lsh = similarity.lsh_topk(e, q, id_col="vec_id", vec_col="embedding",
                              query_id_col="vec_id", k=5,
                              n_planes=16, bands=4, dim=64, seed=7)
    rec = similarity.ann_recall(lsh, exact).collect()
    assert len(rec) == 8
    macro = sum(r["recall"] for r in rec) / len(rec)
    assert 0.0 <= macro <= 1.0
    # self-neighbor (rank 1 = the query itself) is always in an LSH
    # candidate set -> every query recalls at least 1 of 5
    assert all(r["n_hit"] >= 1 for r in rec)
