"""Bloom-filter membership prefilter (functions/bloom.py).

Strongest available checks: exact-equality parity of Bloom-prefiltered
decontamination against the plain path (false positives MUST be settled
by the confirm join), a no-false-negative guarantee, a measured
false-positive bound against the sizing formula, parquet round-trip,
and the plan shape the 100 TB asymmetry requires (probe side map-only:
broadcast joins, zero probe-side exchanges).
"""

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import bloom, decontam
from anomalyzer_spark.plans import assert_plan, count_exchanges, explain_str


def test_optimal_params_formula():
    m, k = bloom.optimal_params(1_000_000, 0.01)
    # textbook ~9.585 bits/item at 1% fpp, x1.5 blocked over-provision
    assert 14_377_000 <= m <= 14_378_000 and m % 64 == 0
    assert k == 7  # k comes from the IDEAL sizing, capped at 8
    with pytest.raises(ValueError):
        bloom.optimal_params(10, 1.5)


def test_no_false_negatives_and_fp_bound(spark):
    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(5000)], "v string")
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(20000)], "v string")
    bl = bloom.build_bloom(members, "v", fpp=0.01)
    assert bl.n_items == 5000
    kept = bloom.filter_maybe_contains(members, bl, "v").count()
    assert kept == 5000  # every true member survives
    fp = bloom.filter_maybe_contains(others, bl, "v").count()
    # blocked layout: sized for ~1% with the 1.5x over-provision; the
    # measured rate must stay within ~2.5x of the request
    assert fp / 20000 < 0.025
    # fill below the ideal 0.5 equilibrium (the over-provision), above
    # catastrophic-undersize territory
    assert 0.25 < bl.fill_ratio() < 0.55


def test_null_and_empty_semantics(spark):
    df = spark.createDataFrame([("a",), (None,)], "v string")
    bl = bloom.build_bloom(df, "v")
    assert bl.n_items == 1
    out = bloom.filter_maybe_contains(df, bl, "v").collect()
    assert [r["v"] for r in out] == ["a"]  # NULL is a definitive miss
    empty = bloom.build_bloom(df.limit(0), "v", num_bits=640, num_hashes=3)
    assert bloom.filter_maybe_contains(df, empty, "v").count() == 0


def test_save_load_roundtrip(spark, tmp_path):
    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(100)], "v string")
    bl = bloom.build_bloom(members, "v", fpp=0.05, seed=7)
    path = str(tmp_path / "bl")
    bloom.save_bloom(bl, path)
    bl2 = bloom.load_bloom(spark, path)
    assert (bl2.num_bits, bl2.num_hashes, bl2.seed, bl2.n_items) == \
        (bl.num_bits, bl.num_hashes, bl.seed, bl.n_items)
    assert bloom.filter_maybe_contains(members, bl2, "v").count() == 100
    # bitset identical word-for-word
    a = sorted(map(tuple, bl.bits.collect()))
    b = sorted(map(tuple, bl2.bits.collect()))
    assert a == b


def test_save_load_empty_store_keeps_params(spark, tmp_path):
    empty = bloom.build_bloom(
        spark.createDataFrame([], "v string"), "v",
        num_bits=1280, num_hashes=4, seed=3)
    path = str(tmp_path / "empty")
    bloom.save_bloom(empty, path)
    bl = bloom.load_bloom(spark, path)
    assert (bl.num_bits, bl.num_hashes, bl.seed) == (1280, 4, 3)


@pytest.mark.slow
def test_contamination_bloom_parity(spark, sf_dir):
    """The headline guarantee: Bloom prefiltering changes the PLAN, not
    the ANSWER — exact equality with the plain path, under both the
    broadcast and the shuffled match join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    want = sorted(map(tuple, decontam.contamination(docs, ev, n=8).collect()))
    assert len(want) > 0
    got = sorted(map(tuple, decontam.contamination(
        docs, ev, n=8, bloom_fpp=0.01).collect()))
    assert got == want
    got_shuffled = sorted(map(tuple, decontam.contamination(
        docs, ev, n=8, broadcast_eval=False, bloom_fpp=0.01).collect()))
    assert got_shuffled == want
    # prebuilt-filter path (the persisted per-release screen)
    ev_grams = decontam._grams(ev, "text", "doc_id", 8, "_e")
    bl = bloom.build_bloom(ev_grams.select("gram"), "gram", fpp=0.01)
    got_pre = sorted(map(tuple, decontam.contamination(
        docs, ev, n=8, eval_bloom=bl).collect()))
    assert got_pre == want


def test_decontaminate_bloom_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    want = {r["doc_id"] for r in
            decontam.decontaminate(docs, ev, n=8).select("doc_id").collect()}
    got = {r["doc_id"] for r in
           decontam.decontaminate(docs, ev, n=8, bloom_fpp=0.01)
           .select("doc_id").collect()}
    assert got == want


def test_probe_side_plan_is_map_only(spark, tmp_path):
    """The scale contract, on the realistic shape (a persisted
    per-release filter read back from parquet): membership compiles to
    ONE broadcast hash join whatever num_hashes is; the plan holds
    ZERO shuffle exchanges, and no Python evaluation node appears
    anywhere."""
    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(100)], "v string")
    probe = spark.range(0, 1000).select(
        F.concat(F.lit("m"), F.col("id")).alias("v"))
    built = bloom.build_bloom(members, "v", num_bits=64 * 64, num_hashes=4)
    bloom.save_bloom(built, str(tmp_path / "bl"))
    bl = bloom.load_bloom(spark, str(tmp_path / "bl"), persist=False)
    out = bloom.filter_maybe_contains(probe, bl, "v")
    # plan asserted BEFORE execution (the executed AQE explain prints
    # Final + Initial sections, double-counting every node)
    plan = assert_plan(
        out, max_exchanges=0, min_broadcasts=1,
        requires=("BroadcastHashJoin",),
        forbids=("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"),
    )
    # the blocked layout's whole point: ONE join regardless of k
    import re
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan,
                          re.MULTILINE)) == 1
    kept = {r["v"] for r in out.collect()}
    assert {f"m{i}" for i in range(100)} <= kept  # no false negatives
    assert len(kept) <= 120  # ~fpp sliver of the 900 non-members


def test_bloom_prefilter_prunes_before_match_join(spark, sf_dir, tmp_path):
    """In the contamination plan with a persisted prebuilt filter, the
    corpus side passes ONE bloom probe join and then the broadcast
    match join MAP-SIDE; the only shuffles are the per-document hit
    aggregate's two distinct-agg exchanges (RewriteDistinctAggregates:
    two count_distincts -> Expand + two-stage agg on bounded hit rows)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    ev_grams = decontam._grams(ev, "text", "doc_id", 8, "_e")
    built = bloom.build_bloom(ev_grams.select("gram"), "gram", fpp=0.01)
    bloom.save_bloom(built, str(tmp_path / "evbl"))
    bl = bloom.load_bloom(spark, str(tmp_path / "evbl"), persist=False)
    rep = decontam.contamination(docs, ev, n=8, eval_bloom=bl)
    plan = explain_str(rep)
    assert count_exchanges(plan) <= 2, plan
    import re
    n_bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan,
                           re.MULTILINE))
    assert n_bhj == 2  # one bloom probe + one match join
