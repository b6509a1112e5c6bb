"""Streaming sketch store: HLL stream-final state equals the one-shot
batch profile EXACTLY (register max is associative + idempotent, with
and without compaction); MG stream-final equals the offline merge of
the same per-batch profiles and keeps its guarantees through
compaction; batch sketch_ingest interoperates and replays idempotently."""

import pytest
import glob

from pyspark.sql import functions as F

from anomalyzer_spark.functions import sketch
from anomalyzer_spark.streaming import (
    hll_sketch_store, mg_sketch_store, run_sketch_stream_on_dir,
    sketch_ingest,
)

_COLS = ["lang", "source"]


def _rows(df):
    return sorted(map(tuple, df.collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


@pytest.mark.slow
def test_stream_final_equals_batch(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(sdir)
    store = str(tmp_path / "store")
    run_sketch_stream_on_dir(
        spark, sdir, store, str(tmp_path / "ckpt"), _COLS,
        p=10, mg_k=8)
    # HLL: exact frame equality with the one-shot whole-corpus profile
    assert _rows(hll_sketch_store(spark, store)) \
        == _rows(sketch.hll_profile(docs, _COLS, p=10))
    # MG: equality with the offline merge over the same per-file splits
    per_file = [sketch.mg_profile(spark.read.parquet(f), _COLS, k=8)
                for f in sorted(glob.glob(f"{sdir}/part-*.parquet"))]
    assert _rows(mg_sketch_store(spark, store, k=8)) \
        == _rows(sketch.merge_mg(per_file, k=8))


@pytest.mark.slow
def test_compaction_keeps_hll_exact_and_mg_guarantees(
        spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(sdir)
    store = str(tmp_path / "store")
    run_sketch_stream_on_dir(
        spark, sdir, store, str(tmp_path / "ckpt"), _COLS,
        p=10, mg_k=8, compact_every=2)
    # generations were written and live dirs swept
    assert glob.glob(f"{store}/compacted/hll/gen=*")
    assert len(glob.glob(f"{store}/hll/batch_id=*")) == 0
    # HLL exactness survives any fold grouping
    assert _rows(hll_sketch_store(spark, store)) \
        == _rows(sketch.hll_profile(docs, _COLS, p=10))
    # MG guarantees vs exact counts (fold grouping may legally change
    # WHICH near-threshold keys survive, not the contract)
    rows = mg_sketch_store(spark, store, k=8).collect()
    for c in _COLS:
        crows = [r for r in rows if r["column"] == c]
        off = crows[0]["off"]
        assert all(r["off"] == off for r in crows)
        exact = {r["k"]: r["cnt"] for r in
                 docs.groupBy(F.col(c).alias("k"))
                 .agg(F.count(F.lit(1)).alias("cnt")).collect()}
        surv = {r["key"]: r["cnt"] for r in crows if r["key"] is not None}
        assert crows[0]["n"] == sum(exact.values())
        for key, cnt in surv.items():
            assert cnt <= exact[key] <= cnt + off
        for key, f in exact.items():
            if f > off:
                assert key in surv


def test_batch_ingest_interop_and_replay(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "store")
    for i in range(3):
        sketch_ingest(spark, docs.where(F.col("doc_id") % 3 == i),
                      store, _COLS, p=10, mg_k=8)
    whole = _rows(sketch.hll_profile(docs, _COLS, p=10))
    assert _rows(hll_sketch_store(spark, store)) == whole
    before = _rows(mg_sketch_store(spark, store, k=8))
    # at-least-once replay of the middle increment: same batch_id,
    # overwrite — both stores unchanged
    sketch_ingest(spark, docs.where(F.col("doc_id") % 3 == 1),
                  store, _COLS, batch_id=1, p=10, mg_k=8)
    assert _rows(hll_sketch_store(spark, store)) == whole
    assert _rows(mg_sketch_store(spark, store, k=8)) == before


def test_store_persists_and_enforces_params(spark, sf_dir, tmp_path):
    """mg_k is not recoverable from an MG frame (unlike HLL's p column),
    so the store persists it: mismatched ingest or read raises, and a
    reader passing no k gets the ingest-time guarantee."""
    import pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "store")
    sketch_ingest(spark, docs, store, _COLS, p=10, mg_k=8)
    # default read picks up the persisted mg_k
    assert _rows(mg_sketch_store(spark, store)) \
        == _rows(mg_sketch_store(spark, store, k=8))
    with pytest.raises(ValueError, match="mg_k"):
        mg_sketch_store(spark, store, k=64)
    with pytest.raises(ValueError, match="mg_k"):
        sketch_ingest(spark, docs, store, _COLS, p=10, mg_k=16)
    with pytest.raises(ValueError, match="p="):
        sketch_ingest(spark, docs, store, _COLS, p=12, mg_k=8)


@pytest.mark.slow
def test_kll_component_stream_and_guarantees(spark, sf_dir, tmp_path):
    """num_cols adds the quantile leg: stream-final KLL state equals
    the offline merge of the same per-batch profiles, holds the rank
    guarantee against exact ranks, and compaction preserves it; the
    persisted kll_k is enforced."""
    import bisect

    import pytest

    from anomalyzer_spark.streaming import kll_sketch_store, sketch_ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(sdir)
    store = str(tmp_path / "store")
    run_sketch_stream_on_dir(
        spark, sdir, store, str(tmp_path / "ckpt"), _COLS,
        num_cols=["n_chars"], p=10, mg_k=8, kll_k=16)
    got = kll_sketch_store(spark, store)
    per_file = [sketch.kll_profile(spark.read.parquet(f), ["n_chars"], k=16)
                for f in sorted(glob.glob(f"{sdir}/part-*.parquet"))]
    assert _rows(got) == _rows(sketch.merge_kll(per_file, k=16))
    # rank guarantee vs exact ranks over the whole corpus
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    for r in sketch.kll_ranks(got, [float(vals[len(vals) // 2])]).collect():
        true = bisect.bisect_right(vals, r["value"])
        assert abs(r["est_rank"] - true) <= r["err"]
    # compacted store keeps the guarantee and the same n
    store2 = str(tmp_path / "store2")
    run_sketch_stream_on_dir(
        spark, sdir, store2, str(tmp_path / "ckpt2"), _COLS,
        num_cols=["n_chars"], p=10, mg_k=8, kll_k=16, compact_every=2)
    assert glob.glob(f"{store2}/compacted/kll/gen=*")
    got2 = kll_sketch_store(spark, store2)
    meta2 = [r for r in got2.collect() if r["item"] is None]
    assert meta2[0]["n"] == len(vals)
    for r in sketch.kll_ranks(got2, [float(vals[-1])]).collect():
        assert abs(r["est_rank"] - len(vals)) <= r["err"]
    # kll_k is persisted and enforced
    with pytest.raises(ValueError, match="kll_k"):
        kll_sketch_store(spark, store, k=64)
    with pytest.raises(ValueError, match="kll_k"):
        sketch_ingest(spark, docs, store, _COLS, num_cols=["n_chars"],
                      p=10, mg_k=8, kll_k=64)
    # a store ingested WITHOUT num_cols reads back an empty typed frame
    store3 = str(tmp_path / "store3")
    sketch_ingest(spark, docs, store3, _COLS, p=10, mg_k=8)
    assert kll_sketch_store(spark, store3).count() == 0


@pytest.mark.slow
def test_bottomk_component_exact_stream_state(spark, sf_dir, tmp_path):
    """bk_cols adds the set-sample leg: the canonical merge makes the
    stream-final state EQUAL the one-shot batch sketch (the HLL-grade
    pin), with and without compaction; bk_k is persisted and enforced."""
    import pytest

    from anomalyzer_spark.streaming import (bottomk_sketch_store,
                                            sketch_ingest)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(sdir)
    for tag, extra in (("plain", {}), ("compacted", {"compact_every": 2})):
        store = str(tmp_path / f"store_{tag}")
        run_sketch_stream_on_dir(
            spark, sdir, store, str(tmp_path / f"ckpt_{tag}"), _COLS,
            bk_cols=["lang", "source"], p=10, mg_k=8, bk_k=16, **extra)
        assert _rows(bottomk_sketch_store(spark, store)) \
            == _rows(sketch.bottomk_profile(docs, _COLS, k=16)), tag
    with pytest.raises(ValueError, match="bk_k"):
        bottomk_sketch_store(spark, str(tmp_path / "store_plain"), k=64)
    with pytest.raises(ValueError, match="bk_k"):
        sketch_ingest(spark, docs, str(tmp_path / "store_plain"), _COLS,
                      bk_cols=["lang"], p=10, mg_k=8, bk_k=64)
    # a store ingested WITHOUT bk_cols reads back empty typed
    store3 = str(tmp_path / "store3")
    sketch_ingest(spark, docs, store3, _COLS, p=10, mg_k=8)
    assert bottomk_sketch_store(spark, store3).count() == 0


@pytest.mark.slow
def test_grouped_store_all_components(spark, sf_dir, tmp_path):
    """group_cols carries per-group sketches through the store: HLL and
    bottom-k stream state equal the one-shot grouped batch profiles
    exactly, KLL equals the offline grouped merge, and a grouped store
    rejects ungrouped ingests (persisted group_ddl)."""
    import pytest

    from anomalyzer_spark.streaming import (bottomk_sketch_store,
                                            kll_sketch_store, sketch_ingest)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(sdir)
    store = str(tmp_path / "store")
    run_sketch_stream_on_dir(
        spark, sdir, store, str(tmp_path / "ckpt"), ["source"],
        num_cols=["n_chars"], bk_cols=["source"], group_cols=["lang"],
        p=10, mg_k=8, kll_k=16, bk_k=8, compact_every=2)
    assert _rows(hll_sketch_store(spark, store)) == _rows(
        sketch.hll_profile(docs, ["source"], p=10, group_cols=["lang"]))
    assert _rows(bottomk_sketch_store(spark, store)) == _rows(
        sketch.bottomk_profile(docs, ["source"], k=8,
                               group_cols=["lang"]))
    got_kll = kll_sketch_store(spark, store)
    assert "lang" in got_kll.columns
    per_file = [sketch.kll_profile(spark.read.parquet(f), ["n_chars"],
                                   k=16, group_cols=["lang"])
                for f in sorted(glob.glob(f"{sdir}/part-*.parquet"))]
    # compaction reorders fold grouping legally; per-group n must match
    want_n = {(r["lang"],): r["n"]
              for r in sketch.merge_kll(per_file, k=16).collect()
              if r["item"] is None}
    got_n = {(r["lang"],): r["n"] for r in got_kll.collect()
             if r["item"] is None}
    assert got_n == want_n
    with pytest.raises(ValueError, match="group columns"):
        sketch_ingest(spark, docs, store, ["source"], p=10, mg_k=8)
