"""Trainable quality classifier (functions/quality.py): separability on
planted classes, determinism across partitionings, JVM-only scoring plan,
and an independent NumPy scoring cross-check."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import quality


def _good_texts(n):
    base = ("The committee reviewed the annual report and found that "
            "most of the findings were consistent with earlier studies. "
            "It is important to note that the results may vary.")
    return [f"Document {i}. {base} Section {i} of the archive." * 2
            for i in range(n)]


def _junk_texts(n):
    return [("@@@@ ###" + "1" * 40 + " $$%% ^^&&" + "!?" * 30
             + f" x{i} " + "///\\\\" * 10) for i in range(n)]


def _frame(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_classifier_separates_planted_classes(spark):
    pos = _frame(spark, _good_texts(40))
    neg = _frame(spark, _junk_texts(40), start=1000)
    model = quality.train_quality_model(pos, neg, sample_rows=40)
    ps = [r["model_score"]
          for r in quality.score_quality(pos, model).collect()]
    ns = [r["model_score"]
          for r in quality.score_quality(neg, model).collect()]
    assert min(ps) > 0.8 and max(ns) < 0.2
    assert all(0.0 <= s <= 1.0 for s in ps + ns)


def test_model_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    junk = _frame(spark, _junk_texts(30), start=10_000)
    m1 = quality.train_quality_model(docs.repartition(1), junk,
                                     sample_rows=100)
    m2 = quality.train_quality_model(docs.repartition(9), junk,
                                     sample_rows=100)
    assert m1 == m2
    s1 = {r["doc_id"]: r["model_score"]
          for r in quality.score_quality(docs, m1).collect()}
    s2 = {r["doc_id"]: r["model_score"]
          for r in quality.score_quality(docs.repartition(5), m2).collect()}
    assert s1 == s2 and len(s1) > 0


def test_scoring_matches_independent_numpy_sigmoid(spark):
    """The compiled column expression must equal a hand NumPy evaluation
    of the same model over the same feature frame."""
    pos = _frame(spark, _good_texts(20))
    neg = _frame(spark, _junk_texts(20), start=1000)
    model = quality.train_quality_model(pos, neg, sample_rows=20)
    both = pos.unionAll(neg)
    feats = quality._featurize(both, "text", "doc_id").collect()
    w = np.array(model["weights"])
    mean, std = np.array(model["mean"]), np.array(model["std"])
    want = {}
    for r in feats:
        x = np.array([r[f] for f in quality.FEATURES])
        z = float(((x - mean) / std) @ w + model["bias"])
        want[r["doc_id"]] = 1.0 / (1.0 + np.exp(-z))
    got = {r["doc_id"]: r["model_score"]
           for r in quality.score_quality(both, model).collect()}
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_scoring_plan_jvm_only_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    junk = _frame(spark, _junk_texts(10), start=10_000)
    model = quality.train_quality_model(docs, junk, sample_rows=50)
    plan = quality.score_quality(docs, model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEval stages


def test_guards(spark):
    pos = _frame(spark, _good_texts(3))
    with pytest.raises(ValueError, match="sample_rows"):
        quality.train_quality_model(pos, pos, sample_rows=1)
    model = quality.train_quality_model(pos, _frame(spark, _junk_texts(3),
                                                    start=50))
    model["features"] = ["bogus"]
    with pytest.raises(ValueError, match="do not match"):
        quality.score_quality(pos, model)
