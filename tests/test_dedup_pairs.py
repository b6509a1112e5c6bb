"""SimHash Hamming-banded pair generation: value parity against a
brute-force all-pairs reference (the banding guarantee: Hamming <= d
implies an exact match on >= 1 of d+1 bit-blocks, so recall at the
threshold is total, not probabilistic) and a no-cartesian plan pin.

Added round 10 alongside the simhash -> semantic_pairs registry rotation
so the pair machinery stays pinned while the per-document signature is
driver-hashed via text_profile's simhash32 column."""

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import dedup


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    # clusters of small textual edits (small Hamming) + unrelated text
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "entirely different content about spark engines and shuffles"),
        (4, "entirely different content about spark engines and shuffling"),
        (5, "completely unrelated pasta recipe with tomatoes and basil"),
        (6, ""),
        (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_force(spark_rows, max_hamming):
    sigs = {r["doc_id"]: r["simhash"] for r in spark_rows}
    ids = sorted(sigs)
    return sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= max_hamming
    )


@pytest.mark.parametrize("max_hamming", [0, 3, 7])
def test_simhash_pairs_match_brute_force(spark, near_dup_docs, max_hamming):
    """Banded pairs == brute-force all-pairs at the same threshold: the
    d+1-block pigeonhole makes banding EXACT for Hamming <= d, so any
    difference is a bug, not lost recall."""
    sig_rows = dedup.simhash(near_dup_docs, "text", "doc_id").collect()
    want = _brute_force(sig_rows, max_hamming)
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(
            near_dup_docs, "text", "doc_id",
            max_hamming=max_hamming).collect())
    assert got == want
    if max_hamming >= 0:
        # exact normalized dup (0,7) must always surface at hamming 0
        assert (0, 7, 0) in got


def test_simhash_pairs_no_cartesian_plan(spark, near_dup_docs):
    """The self-join is keyed by (block_id, block_val) — no cartesian /
    nested-loop path at any setting (materialize=False exposes the full
    lazy plan)."""
    df = dedup.simhash_pairs(near_dup_docs, "text", "doc_id",
                             max_hamming=3, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_partitioning_invariance(spark, near_dup_docs):
    a = sorted(map(tuple, dedup.simhash_pairs(
        near_dup_docs.repartition(7), "text", "doc_id").collect()))
    b = sorted(map(tuple, dedup.simhash_pairs(
        near_dup_docs, "text", "doc_id").collect()))
    assert a == b
