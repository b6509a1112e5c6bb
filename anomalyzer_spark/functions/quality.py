"""Trainable quality classifier — the model-based corpus-filtering leg.

The heuristic ``text.text_stats`` score is fixed; production curation
(the CCNet/fastText pattern) instead TRAINS a classifier on "looks like
my reference corpus" vs "looks like raw crawl" and filters by model
score. Same split as every model in this repo (IVF/PQ quantizers, BPE
merges):

* **train** on a bounded, deterministic, hash-ordered sample of each
  class — a NumPy logistic regression over the ``text_stats`` feature
  columns, full-batch gradient descent, fixed iteration count, no
  randomness (zero-initialized weights) — same corpus + seed ⇒ same
  model on any cluster;
* **score** the 100 TB corpus with the learned weights compiled into a
  PURE COLUMN expression (sigmoid of the standardized dot product) — the
  hot path is JVM whole-stage codegen, zero Python, zero shuffle.

A linear model over 6 lexical ratios is deliberately small: it's the
shape that can run as a column expression. Swap in a real fastText/LLM
scorer by replacing ``score_quality`` with a pandas-UDF pass; the
train/score split and the bounded-sample contract stay the same.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _hash48
from .text import _stats_exprs

#: feature columns drawn from text_stats (ratios + log length — all
#: bounded, so standardization is stable)
FEATURES = ("log_n_chars", "avg_word_len", "punct_ratio", "digit_ratio",
            "upper_ratio", "stopword_ratio")


def _featurize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    stats = df.select(F.col(id_col), *_stats_exprs(text_col))
    return stats.select(
        F.col(id_col),
        F.log1p(F.col("n_chars").cast("double")).alias("log_n_chars"),
        "avg_word_len", "punct_ratio", "digit_ratio", "upper_ratio",
        "stopword_ratio")


def train_quality_model(
    pos_df: DataFrame,
    neg_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sample_rows: int = 5_000,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-3,
    seed: int = 42,
) -> dict:
    """Fit the classifier: ``pos_df`` = reference-quality documents,
    ``neg_df`` = the rejection class (raw crawl, junk). Returns the model
    dict {features, mean, std, weights, bias} for ``score_quality``.
    Driver memory holds 2×``sample_rows`` feature ROWS (6 doubles each),
    never text."""
    if sample_rows < 2:
        raise ValueError("sample_rows must be >= 2")

    def _sample(df: DataFrame) -> np.ndarray:
        rows = (
            _featurize(
                df.select(F.col(id_col),
                          F.col(text_col)), text_col, id_col)
            .withColumn("_o", _hash48(F.col(id_col), seed))
            .orderBy("_o", id_col).limit(sample_rows)
            .select(*FEATURES).collect()
        )
        return np.array([[r[f] for f in FEATURES] for r in rows],
                        dtype=np.float64)

    xp, xn = _sample(pos_df), _sample(neg_df)
    if not len(xp) or not len(xn):
        raise ValueError("both classes need at least one sampled row")
    x = np.vstack([xp, xn])
    y = np.concatenate([np.ones(len(xp)), np.zeros(len(xn))])
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    std[std == 0.0] = 1.0
    xs = (x - mean) / std
    w = np.zeros(xs.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = xs.T @ (p - y) / n + l2 * w
        gb = float(np.mean(p - y))
        w -= lr * g
        b -= lr * gb
    return {
        "features": list(FEATURES),
        "mean": mean.tolist(),
        "std": std.tolist(),
        "weights": w.tolist(),
        "bias": b,
    }


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    out_col: str = "model_score",
) -> DataFrame:
    """(id, model_score ∈ [0,1]) — the learned sigmoid compiled to column
    arithmetic over the same feature expressions training used. Map-only,
    JVM-side; filter with ``.where(F.col('model_score') >= t)`` and the
    predicate rides the scan."""
    if list(model["features"]) != list(FEATURES):
        raise ValueError(f"model features {model['features']} do not match "
                         f"this version's {list(FEATURES)}")
    feats = _featurize(df.select(F.col(id_col), F.col(text_col)),
                       text_col, id_col)
    z = F.lit(float(model["bias"]))
    for f, m, s, w in zip(FEATURES, model["mean"], model["std"],
                          model["weights"]):
        z = z + F.lit(float(w)) * ((F.col(f) - F.lit(float(m)))
                                   / F.lit(float(s)))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(F.col(id_col), score.alias(out_col))
