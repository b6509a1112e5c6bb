"""SemDeDup-style cluster-blocked dedup (similarity.semantic_pairs /
semantic_dedup_groups): exact parity with brute-force cosine pairs on
separated clusters, the n_assign boundary-recall knob, the per-cell cap,
and the no-cartesian plan guarantee."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import similarity as S


def _clustered(spark, *, n_clusters=4, per=30, dim=16, dup_pairs=6,
               seed=7):
    """Well-separated clusters plus planted near-duplicate pairs
    (vector + tiny noise) INSIDE clusters."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 20
    vecs = np.concatenate(
        [c + rng.standard_normal((per, dim)) for c in centers])
    base = len(vecs)
    dups = []
    for i in range(dup_pairs):
        src = vecs[i * per // dup_pairs]
        dups.append(src + rng.standard_normal(dim) * 1e-3)
    vecs = np.concatenate([vecs, np.array(dups)])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    sample = vecs[np.arange(0, base, 2)]
    cents = S.train_ivf_centroids(sample, n_clusters)
    return df, cents, base


@pytest.mark.slow
def test_semantic_pairs_match_brute_force_on_separated_clusters(spark):
    df, cents, _ = _clustered(spark)
    got = sorted((r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df, threshold=0.999, centroids=cents).collect())
    want = sorted((r["id_a"], r["id_b"]) for r in S.cosine_pairs(
        df, threshold=0.999, use_lsh=False).collect())
    # separated clusters: every qualifying pair is within-cluster, so
    # cluster blocking loses nothing and parity is exact
    assert len(want) >= 6
    assert got == want


def test_semantic_pairs_duplicate_ids_match_join_predicate(spark):
    """r15 verdict item 6: the batch kernel's pair predicate is
    ``id_a < id_b`` like the join path — two rows SHARING an id in one
    cell emit no pair with each other (no (x, x) self-pair), while each
    copy still pairs with every other row. Near-identical vectors under
    one duplicated id make the self-pair the would-be top hit, so a
    regression to index-inequality semantics fails loudly."""
    rng = np.random.default_rng(3)
    center = rng.standard_normal(8) * 10
    # ids 0/1/2 distinct + id 5 DUPLICATED (two near-identical rows)
    rows = [(0, center + rng.standard_normal(8) * 1e-3),
            (1, center + rng.standard_normal(8) * 1e-3),
            (2, center + rng.standard_normal(8) * 1e-3),
            (5, center + rng.standard_normal(8) * 1e-3),
            (5, center + rng.standard_normal(8) * 1e-3)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in rows],
        "vec_id long, embedding array<double>")
    cents = [center.tolist()]  # one cell: everything is a candidate
    got = [(r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df, threshold=0.999, centroids=cents, n_clusters=1).collect()]
    assert (5, 5) not in got
    # both copies of id 5 still pair with the distinct ids
    assert got.count((0, 5)) == 2 and got.count((2, 5)) == 2
    assert sorted(set(got)) == [(0, 1), (0, 2), (0, 5),
                                (1, 2), (1, 5), (2, 5)]


def test_semantic_dedup_groups_contract(spark):
    df, cents, base = _clustered(spark)
    groups = S.semantic_dedup_groups(
        df, threshold=0.999, centroids=cents).collect()
    assert len(groups) >= 12  # 6 planted pairs -> >= 6 groups of >= 2
    by_group = {}
    for r in groups:
        by_group.setdefault(r["group_id"], []).append(r["vec_id"])
    for gid, members in by_group.items():
        assert gid == min(members)      # keep-first canonical
        assert len(members) > 1         # multi-member only


def test_trained_sample_path_finds_planted_pairs(spark):
    # centroids=None trains on the bounded md5-ordered sample — same
    # model in, same pairs out as the precomputed-centroid call
    df, cents, _ = _clustered(spark)
    a = sorted((r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df, threshold=0.999, n_clusters=4, sample_rows=4096).collect())
    assert len(a) >= 6  # the planted pairs survive a self-trained model


def test_n_assign_multi_probe_superset_and_no_dupes(spark):
    df, cents, _ = _clustered(spark)
    one = set((r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df, threshold=0.99, centroids=cents, n_assign=1).collect())
    two = [(r["id_a"], r["id_b"]) for r in S.semantic_pairs(
        df, threshold=0.99, centroids=cents, n_assign=2).collect()]
    assert one.issubset(set(two))
    assert len(two) == len(set(two))  # dropDuplicates holds


def test_boundary_pair_recovered_by_multi_assign(spark):
    # two near-identical vectors sitting exactly between two centroids,
    # nudged to opposite sides: single-assign splits them, n_assign=2
    # finds the pair in the shared second-choice cell
    cents = [[1.0, 0.0], [0.0, 1.0]]
    mid = np.array([1.0, 1.0]) / np.sqrt(2)
    a = (mid + np.array([1e-4, 0.0])).tolist()
    b = (mid + np.array([0.0, 1e-4])).tolist()
    df = spark.createDataFrame(
        [(0, a), (1, b)], "vec_id long, embedding array<double>")
    one = S.semantic_pairs(
        df, threshold=0.99, centroids=cents, n_assign=1).collect()
    two = S.semantic_pairs(
        df, threshold=0.99, centroids=cents, n_assign=2).collect()
    assert one == []
    assert [(r["id_a"], r["id_b"]) for r in two] == [(0, 1)]


def test_max_cell_rows_keeps_most_central(spark):
    # one cell, cap 3: only the 3 most-central members may pair
    cents = [[1.0, 0.0, 0.0]]
    rows = []
    for i, ang in enumerate([0.00, 0.01, 0.02, 0.4, 0.5]):
        rows.append((i, [float(np.cos(ang)), float(np.sin(ang)), 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = S.semantic_pairs(
        df, threshold=0.0, centroids=cents, max_cell_rows=3).collect()
    ids = set()
    for r in pairs:
        ids.update([r["id_a"], r["id_b"]])
    assert ids == {0, 1, 2}  # the fringe (3, 4) was capped away
    assert len(pairs) == 3   # C(3,2)


def test_no_cartesian_in_plan(spark):
    df, cents, _ = _clustered(spark)
    plan = S.semantic_pairs(df, centroids=cents) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sample_smaller_than_clusters_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        S.semantic_pairs(df, n_clusters=8, sample_rows=4096)


def test_semantic_pairs_duckdb_parity_on_fixture(spark, sf_dir):
    # cross-engine value parity on the driver fixture: centroids from the
    # deterministic vec_id<256 sample (the entry-contract pattern), cell
    # assignment + within-cell pairs replayed in DuckDB SQL
    import duckdb

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    sample = e.where(F.col("vec_id") < 256) \
        .orderBy("vec_id").select("embedding").collect()
    cents = S.train_ivf_centroids(
        np.asarray([r[0] for r in sample], dtype=np.float64), 8)
    thr = 0.25
    got = sorted(
        (r["id_a"], r["id_b"], round(r["cos_sim"], 6))
        for r in S.semantic_pairs(
            e, threshold=thr, centroids=cents).collect())
    assert len(got) > 0, "threshold too high for the fixture"

    cent_sql = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]" for c in cents)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.execute(f"""
WITH ce AS (SELECT [{cent_sql}]::DOUBLE[][] AS cents),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cellified AS (
  SELECT vec_id, v,
    list_sort(list_transform(range(1, 9), i ->
      struct_pack(neg := -(list_dot_product(v, cents[i]) /
                  (sqrt(list_dot_product(v, v)) *
                   sqrt(list_dot_product(cents[i], cents[i])))),
                  cid := i - 1)))[1].cid AS cell
  FROM e, ce),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) *
         sqrt(list_dot_product(b.v, b.v))) AS cos_sim
      FROM cellified a JOIN cellified b USING (cell)
      WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
FROM p WHERE cos_sim >= {thr}""").fetchall()
    assert got == sorted(tuple(w) for w in want)
