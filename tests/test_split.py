"""Leakage-safe train/eval split (sampling.split_train_eval): group
atomicity (a near-dup family never straddles the split), determinism,
nesting, fraction accuracy, and composition with the real pair-mining +
group-resolution stack."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import dedup, sampling


def _docs(spark, n=400):
    rows = [(i, f"document body number {i} with words {i % 7} {i % 13}")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fraction_determinism_and_nesting(spark):
    df = _docs(spark)
    s10 = sampling.split_train_eval(df, 0.10, seed=7)
    s25 = sampling.split_train_eval(df, 0.25, seed=7)
    n = df.count()
    e10 = {r["doc_id"] for r in s10.where("split = 'eval'").collect()}
    e25 = {r["doc_id"] for r in s25.where("split = 'eval'").collect()}
    # fraction approx (binomial, 400 rows)
    assert 0.04 * n <= len(e10) <= 0.18 * n
    assert 0.17 * n <= len(e25) <= 0.34 * n
    # nesting: widening the fraction only grows the eval side
    assert e10 <= e25
    # determinism across re-evaluation and partitioning
    again = {r["doc_id"] for r in sampling.split_train_eval(
        df.repartition(7), 0.10, seed=7).where("split = 'eval'").collect()}
    assert again == e10
    # engine-portable hash: reproduce the split membership in python
    def h48(key):
        return int(hashlib.md5(f"7|{key}".encode()).hexdigest()[:12], 16)
    want = {i for i in range(400) if h48(i) < int(0.10 * (1 << 48))}
    assert want == e10


@pytest.mark.slow
def test_group_atomicity_with_real_near_dup_groups(spark):
    # planted dup families: every 10th doc is copied twice with new ids
    base = _docs(spark, 120)
    copies = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text")
    copies2 = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000).alias("doc_id"), "text")
    corpus = base.unionByName(copies).unionByName(copies2)
    pairs = dedup.minhash_lsh_pairs(
        corpus, "text", "doc_id", k=3, num_hashes=64, bands=16,
        threshold=0.7)
    groups = dedup.duplicate_groups(corpus, pairs, "doc_id")
    split = sampling.split_train_eval(
        corpus, 0.3, groups=groups, seed=11)
    # 1. group atomicity: no group id maps to two split values
    straddle = (split.join(groups.select("doc_id", "group_id"), "doc_id")
                .groupBy("group_id")
                .agg(F.count_distinct("split").alias("k"))
                .where(F.col("k") > 1).count())
    assert straddle == 0
    # 2. and specifically: a copy is always on its original's side
    sides = {r["doc_id"]: r["split"] for r in split.collect()}
    for i in range(0, 120, 10):
        assert sides[i] == sides[i + 1000] == sides[i + 2000], i
    # 3. schema: input columns + split, no helper leakage
    assert set(split.columns) == {"doc_id", "text", "split"}
    # 4. both sides populated at 30%
    vals = {r["split"] for r in split.select("split").distinct().collect()}
    assert vals == {"train", "eval"}


def test_validation_and_ungrouped_rows_use_own_id(spark):
    df = _docs(spark, 50)
    with pytest.raises(ValueError, match="eval_fraction"):
        sampling.split_train_eval(df, 1.5)
    # an EMPTY groups frame must reduce to the row-hash split exactly
    empty = spark.createDataFrame([], "doc_id long, group_id long")
    a = sorted(map(tuple, sampling.split_train_eval(
        df, 0.2, groups=empty, seed=3).collect()))
    b = sorted(map(tuple, sampling.split_train_eval(
        df, 0.2, seed=3).collect()))
    assert a == b
