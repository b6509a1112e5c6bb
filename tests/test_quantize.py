"""int8 embedding quantization: round-trip bounds and cosine fidelity.

NumPy reference parity on the codes, the per-element absmax error bound,
measured cosine error against the documented ~1/127 figure on the real
embeddings fixture, zero-vector handling, parquet round-trip of the
tinyint codes, and the map-only plan shape.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import similarity


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding").limit(300)


def test_codes_match_numpy_reference(spark, sf_dir):
    rows = _embs(spark, sf_dir).collect()
    got = {r["vec_id"]: r for r in
           similarity.quantize_embeddings(_embs(spark, sf_dir)).collect()}
    for r in rows:
        x = np.array(r["embedding"], dtype=np.float64)
        scale = np.abs(x).max() / 127.0
        want = (np.round(x / scale) if scale else np.zeros_like(x)) \
            .astype(np.int8)
        g = got[r["vec_id"]]
        assert g["scale"] == pytest.approx(scale)
        assert list(g["codes"]) == want.tolist(), r["vec_id"]
        # absmax bound: |x - scale*code| <= scale/2 per element
        err = np.abs(x - scale * want.astype(np.float64))
        assert err.max() <= scale / 2 + 1e-12


def test_cosine_error_bound(spark, sf_dir):
    rows = _embs(spark, sf_dir).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], np.float64) for r in rows}
    q = {r["vec_id"]: (r["scale"], np.array(r["codes"], np.float64))
         for r in similarity.quantize_embeddings(
             _embs(spark, sf_dir)).collect()}
    ids = sorted(vecs)[:60]
    worst = 0.0
    for i in ids[:30]:
        for j in ids[30:]:
            a, b = vecs[i], vecs[j]
            da, db = q[i][0] * q[i][1], q[j][0] * q[j][1]
            exact = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            approx = da @ db / (np.linalg.norm(da) * np.linalg.norm(db))
            worst = max(worst, abs(exact - approx))
    assert worst < 0.02, worst  # documented ~1/127 class error


def test_zero_vector_and_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>")
    qdf = similarity.quantize_embeddings(df)
    path = str(tmp_path / "codes")
    qdf.write.parquet(path)
    back = {r["vec_id"]: r for r in spark.read.parquet(path).collect()}
    assert back[1]["scale"] == 0.0 and list(back[1]["codes"]) == [0, 0, 0]
    assert list(back[2]["codes"]) == [64, -127, 32]
    # dequantize_col reconstructs within the bound
    rec = df.join(qdf, "vec_id").select(
        "vec_id",
        similarity.dequantize_col(F.col("scale"), F.col("codes"))
        .alias("rec")).collect()
    rec = {r["vec_id"]: r["rec"] for r in rec}
    assert rec[2] == pytest.approx([1.0079, -2.0, 0.50394], abs=2e-2)


def test_quantize_is_map_only(spark, sf_dir):
    plan = similarity.quantize_embeddings(_embs(spark, sf_dir)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
