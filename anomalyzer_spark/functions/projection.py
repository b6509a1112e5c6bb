"""Deterministic PCA for embedding columns — the dimensionality-reduction
stage a semantic-dedup / clustering / ANN pipeline runs before its
distance-heavy passes (fewer dims = cheaper folds, denser LSH buckets,
smaller PQ codebooks).

Same scale shape as every model in this repo (IVF centroids, PQ
codebooks, BPE merges, the quality classifier): the model fits on a
BOUNDED in-memory sample on the driver — pure NumPy, bit-deterministic —
and applies corpus-wide as literal-constant column expressions: the
100 TB projection pass is JVM whole-stage codegen, zero Python, zero
shuffle, and the model broadcasts as plan constants. No MLlib / RDD
dependency; the fitted model is a plain dict, trivially serializable
next to the data it projects.

No reference analogue (the reference is a single-series stats library);
DuckDB value parity + spectral-property tests in tests/test_projection.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import checked_width

__all__ = ["train_pca", "project_embeddings"]


def train_pca(sample: np.ndarray, k: int, *, center: bool = True) -> dict:
    """Fit a ``k``-component PCA on an in-memory SAMPLE.

    Deterministic by construction: covariance eigendecomposition via
    ``np.linalg.eigh`` (symmetric — ordered, stable), eigenvalues sorted
    descending, and each component's SIGN fixed so its
    largest-magnitude coordinate is positive (eigenvectors are defined
    up to sign; without the convention two fits of the same data could
    disagree). Mean and components round to 6 decimals — the literal
    precision both engines compile, so the DuckDB oracle can inline the
    identical model.

    Returns ``{"mean", "components" (k×d, rows orthonormal pre-round),
    "explained_var" (k, descending), "total_var"}``. ``center=False``
    skips mean subtraction (uncentered PCA — for already-centered or
    cosine-normalized spaces where the origin is meaningful).
    """
    x = np.asarray(sample, dtype=np.float64)
    if x.ndim != 2:
        raise ValueError("sample must be 2-D (rows × dims)")
    n, d = x.shape
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    if n < 2:
        raise ValueError("need at least 2 sample rows")
    mean = x.mean(axis=0) if center else np.zeros(d)
    xc = x - mean
    cov = (xc.T @ xc) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # k × d
    evals = np.maximum(evals[order], 0.0)
    for i in range(k):                          # sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": np.round(mean, 6).tolist(),
        "components": np.round(comps, 6).tolist(),
        "explained_var": np.round(evals, 6).tolist(),
        "total_var": float(np.round(np.trace(cov), 6)),
    }


def _proj_sql(vec_name: str, mean: list[float],
              comp: list[float]) -> str:
    """One projected coordinate as a SQL fragment: dot(vec - mean, comp)
    as a sequential left-to-right fold — the same order DuckDB's
    ``list_sum(list_transform(...))`` runs, so both engines agree to the
    last bit before rounding. SQL STRING, not a Column tree (see
    similarity._l2_sql: py4j fold construction costs seconds per call;
    one expr string parses JVM-side in milliseconds)."""
    m = ", ".join(f"{float(v)!r}D" for v in mean)
    c = ", ".join(f"{float(v)!r}D" for v in comp)
    return (f"aggregate(zip_with(zip_with(`{vec_name}`, array({m}), "
            f"(x, mu) -> x - mu), array({c}), (xc, w) -> xc * w), "
            f"0D, (acc, x) -> acc + x)")


def project_embeddings(
    df: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Project ``vec_col`` onto the fitted components: one
    ``array<double>`` column of length k, each coordinate rounded to 6.

    Pure map — the model rides as plan literals, the projection is one
    codegen'd fold per component, input partitioning is inherited, and
    the plan is Exchange-free (pinned in tests). Width-mismatched rows
    raise via ``checked_width`` (a silently NULL-padded ``zip_with``
    would zero coordinates instead of erroring); NULL vectors drop with
    the same reasoned semantics as the ANN paths. ``keep_cols`` carries
    extra columns through the projection for free.
    """
    comps = model["components"]
    mean = model["mean"]
    dim = len(mean)
    if any(len(c) != dim for c in comps):
        raise ValueError("model components/mean width mismatch")
    staged = checked_width(df, vec_col, dim, what="pca model")
    coords = ", ".join(
        f"round({_proj_sql(vec_col, mean, c)}, 6)" for c in comps)
    keep = [F.col(c) for c in (keep_cols or [])]
    return staged.select(
        F.col(id_col),
        F.expr(f"array({coords})").alias(out_col),
        *keep,
    )
