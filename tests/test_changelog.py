"""Changelog application (functions/changelog.py).

Strongest available checks: full value parity of apply_changes and
scd2_history against independent DuckDB transcriptions over the SAME
in-memory changelog (both engines see identical rows), semantic pins on
the CDC corner cases (delete->reinsert, insert->update->delete,
supersession inside one changelog), and the plan shape the 100 TB
asymmetry requires (untouched snapshot rows never shuffle).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import changelog
from anomalyzer_spark.plans import assert_plan

SNAP_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def _changes_pdf(orders_pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic synthetic changelog over the orders snapshot:
    multi-version updates (seq 1 superseded by seq 2), deletes (seq 3),
    brand-new inserts (seq 1), one delete->reinsert (seq 2 then 4)."""
    rows = []
    for r in orders_pdf.itertuples(index=False):
        k = int(r.o_orderkey)
        if k % 5 == 0:  # two-version update: seq 1 superseded by seq 2
            rows.append((k, int(r.o_custkey), "U1", float(r.o_totalprice),
                         1, "upsert"))
            rows.append((k, int(r.o_custkey), "U2",
                         round(float(r.o_totalprice) + 10.0, 2), 2, "upsert"))
        if k % 7 == 0:  # delete (beats the update when k%35==0: seq 3)
            rows.append((k, int(r.o_custkey), "XX", 0.0, 3, "delete"))
        if k % 70 == 0:  # delete -> reinsert: ends PRESENT (seq 4)
            rows.append((k, int(r.o_custkey), "RE", 1.0, 4, "upsert"))
    mx = int(orders_pdf["o_orderkey"].max())
    for i in range(1, 21):  # inserts on fresh keys
        rows.append((mx + i, 1 + i, "NW", float(100 * i), 1, "upsert"))
    return pd.DataFrame(
        rows, columns=SNAP_COLS + ["seq", "op"]).astype(
        {"o_orderkey": "int64", "o_custkey": "int64", "seq": "int64"})


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    snap_pdf = (
        pd.read_parquet(f"{sf_dir}/orders.parquet")[SNAP_COLS]
        .astype({"o_orderkey": "int64", "o_custkey": "int64"}))
    ch_pdf = _changes_pdf(snap_pdf)
    snap = spark.createDataFrame(snap_pdf)
    ch = spark.createDataFrame(ch_pdf)
    con = duckdb.connect()
    con.register("snapshot", snap_pdf)
    con.register("changes", ch_pdf)
    return snap, ch, con


def test_apply_changes_duckdb_parity(frames):
    snap, ch, con = frames
    got = sorted(map(tuple, changelog.apply_changes(
        snap, ch, ["o_orderkey"], "seq", op_col="op").collect()))
    want = sorted(map(tuple, con.execute("""
WITH latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
    FROM changes) WHERE rn = 1)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM snapshot
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM latest
WHERE op <> 'delete'""").fetchall()))
    assert len(got) > 100 and got == want


def test_apply_changes_semantics(frames):
    snap, ch, con = frames
    out = changelog.apply_changes(
        snap, ch, ["o_orderkey"], "seq", op_col="op")
    by_key = {r["o_orderkey"]: r for r in out.collect()}
    snap_keys = {r[0] for r in snap.select("o_orderkey").collect()}
    k5 = next(k for k in sorted(snap_keys) if k % 5 == 0 and k % 7 != 0)
    assert by_key[k5]["o_orderstatus"] == "U2"  # seq 2 supersedes seq 1
    k7 = next(k for k in sorted(snap_keys) if k % 7 == 0 and k % 70 != 0)
    assert k7 not in by_key  # latest is delete
    for k in snap_keys:
        if k % 70 == 0:
            assert by_key[k]["o_orderstatus"] == "RE"  # reinsert wins
    mx = max(snap_keys)
    assert by_key[mx + 20]["o_orderstatus"] == "NW"  # fresh insert
    untouched = next(k for k in sorted(snap_keys)
                     if k % 5 != 0 and k % 7 != 0)
    assert by_key[untouched] is not None


def test_apply_changes_upsert_only_without_op(frames):
    snap, ch, _ = frames
    out = changelog.apply_changes(snap, ch, ["o_orderkey"], "seq")
    # no op_col: the delete rows are ordinary upserts, nothing vanishes
    n_expected = (snap.count()
                  + ch.select("o_orderkey").distinct().count()
                  - snap.join(ch.select("o_orderkey").distinct(),
                              "o_orderkey", "left_semi").count())
    assert out.count() == n_expected


def test_apply_changes_missing_column_raises(frames):
    snap, ch, _ = frames
    with pytest.raises(ValueError, match="o_totalprice"):
        changelog.apply_changes(
            snap, ch.drop("o_totalprice"), ["o_orderkey"], "seq")


def test_scd2_history_duckdb_parity(frames):
    _, ch, con = frames
    got = sorted(map(tuple, changelog.scd2_history(
        ch, ["o_orderkey"], "seq", op_col="op").collect()))
    want = sorted(map(tuple, con.execute("""
SELECT * FROM (
  SELECT *, seq AS valid_from,
         lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS valid_to,
         (lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) IS NULL
          AND op <> 'delete') AS is_current
  FROM changes)
WHERE op <> 'delete'""").fetchall()))
    assert len(got) > 100 and got == want


def test_scd2_delete_closes_last_version(frames):
    snap, ch, _ = frames
    snap_keys = {r[0] for r in snap.select("o_orderkey").collect()}
    hist = changelog.scd2_history(ch, ["o_orderkey"], "seq", op_col="op")
    # a snapshot k%35 key: U1(1) -> U2(2) -> delete(3); the delete emits
    # no row but closes U2 at seq 3, so the key has NO current version
    # (fresh-insert keys can also be %35 == 0 — exclude them)
    rows = [r for r in hist.collect() if r["o_orderkey"] % 35 == 0
            and r["o_orderkey"] % 70 != 0
            and r["o_orderkey"] in snap_keys]
    assert rows and all(not r["is_current"] for r in rows)
    closed = [r for r in rows if r["valid_from"] == 2]
    assert closed and all(r["valid_to"] == 3 for r in closed)


def test_apply_changes_plan_untouched_rows_never_shuffle(frames):
    """The scale contract: the snapshot side meets a BROADCAST left-anti
    join (untouched rows keep their partitioning); the changelog folds
    with ONE exchange (max_by partial agg); the union adds none."""
    snap, ch, _ = frames
    out = changelog.apply_changes(
        snap, ch, ["o_orderkey"], "seq", op_col="op")
    # the two static exchanges are the SAME changelog max_by fold
    # appearing under both union branches (changed-keys broadcast and
    # upserts); AQE reuses the stage at runtime (ReusedQueryStage).
    # The snapshot side holds NO exchange: it meets the anti join as a
    # broadcast probe (SortMergeJoin forbidden pins that).
    assert_plan(
        out, max_exchanges=2, min_broadcasts=1,
        requires=("BroadcastHashJoin",),
        forbids=("SortMergeJoin", "CartesianProduct"),
    )
    # shuffled fallback for a huge changelog: no broadcast requirement
    out2 = changelog.apply_changes(
        snap, ch, ["o_orderkey"], "seq", op_col="op",
        broadcast_keys=False)
    assert_plan(out2, forbids=("CartesianProduct",))
