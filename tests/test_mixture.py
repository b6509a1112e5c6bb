"""Tests for the epoch-aware mixture planner (mixture_plan /
apply_mixture_plan): plan math, epoch replication + md5 fractional
window, determinism, nesting, and DuckDB replay of the full
plan→apply composition."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import sampling

_BUCKETS = 1 << 48


@pytest.fixture(scope="module")
def skewed(spark):
    # 60 a / 30 b / 10 c — skewed enough that alpha=0 up-samples c
    rows = [(i, "a" if i < 60 else ("b" if i < 90 else "c"), 10 + i % 5)
            for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, dom string, toks long")


def test_mixture_plan_alpha_math_and_cap(spark, skewed):
    plan = {r["domain"]: r for r in
            sampling.mixture_plan(skewed, "dom", alpha=0.0).collect()}
    # alpha=0 → uniform target shares; budget defaults to 100 rows
    for d, n in (("a", 60), ("b", 30), ("c", 10)):
        assert plan[d]["n_rows"] == n
        assert plan[d]["natural_share"] == pytest.approx(n / 100, abs=1e-6)
        assert plan[d]["target_share"] == pytest.approx(1 / 3, abs=1e-6)
    # epochs = share*budget/n, capped at max_epochs=4: c wants 3.33x
    assert plan["a"]["epochs"] == pytest.approx(100 / 3 / 60, abs=1e-6)
    assert plan["c"]["epochs"] == pytest.approx(100 / 3 / 10, abs=1e-6)
    assert plan["c"]["planned_rows"] == round(100 / 3 / 10 * 10)
    # a tighter cap binds
    capped = {r["domain"]: r["epochs"] for r in
              sampling.mixture_plan(skewed, "dom", alpha=0.0,
                                    max_epochs=2.0).collect()}
    assert capped["c"] == 2.0
    # alpha=1 is the identity mixture: every domain at exactly 1 epoch
    nat = sampling.mixture_plan(skewed, "dom", alpha=1.0).collect()
    assert all(r["epochs"] == pytest.approx(1.0, abs=1e-6) for r in nat)


def test_mixture_plan_weights_null_domain_and_budget(spark):
    rows = [(i, None if i % 10 == 0 else "w", 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, dom string, toks long")
    plan = {r["domain"]: r for r in sampling.mixture_plan(
        df, "dom", weights={"w": 3.0, None: 1.0},
        target_rows=200).collect()}
    assert plan[None]["target_share"] == pytest.approx(0.25, abs=1e-6)
    # NULL domain: 5 rows, wants 0.25*200/5 = 10 epochs → capped at 4
    assert plan[None]["epochs"] == 4.0
    assert plan["w"]["epochs"] == pytest.approx(0.75 * 200 / 45, abs=1e-6)
    # domain absent from weights gets share 0
    plan2 = {r["domain"]: r["epochs"] for r in sampling.mixture_plan(
        df, "dom", weights={"w": 1.0}).collect()}
    assert plan2[None] == 0.0


def test_mixture_plan_token_budget_units(spark, skewed):
    plan = {r["domain"]: r for r in sampling.mixture_plan(
        skewed, "dom", alpha=0.0, token_col="toks",
        target_tokens=600).collect()}
    tok = {r["domain"]: r["n_tokens"] for r in plan.values()}
    for d in ("a", "b", "c"):
        want = min(4.0, (600 / 3) / tok[d])
        assert plan[d]["epochs"] == pytest.approx(want, abs=1e-6)
        assert plan[d]["planned_tokens"] == round(want * tok[d])
    with pytest.raises(ValueError, match="target_tokens"):
        sampling.mixture_plan(skewed, "dom", alpha=0.0, target_rows=10,
                              token_col="toks")
    with pytest.raises(ValueError, match="exactly one"):
        sampling.mixture_plan(skewed, "dom")
    with pytest.raises(ValueError, match="exactly one"):
        sampling.mixture_plan(skewed, "dom", alpha=1.0, weights={"a": 1})
    with pytest.raises(ValueError, match="max_epochs"):
        sampling.mixture_plan(skewed, "dom", alpha=1.0, max_epochs=0.0)


def _expect_apply(rows, epochs_by_dom, seed=42):
    """Independent hashlib replay of apply_mixture_plan."""
    out = []
    for doc_id, dom in rows:
        e = epochs_by_dom.get(dom, 0.0)
        full = math.floor(e)
        out += [(doc_id, ep) for ep in range(full)]
        frac = e - full
        h = int(hashlib.md5(
            f"{seed}|{doc_id}#{full}".encode()).hexdigest()[:12], 16)
        if frac > 0 and h < int(frac * _BUCKETS):
            out.append((doc_id, full))
    return sorted(out)


def test_apply_mixture_plan_epochs_and_determinism(spark, skewed):
    plan = sampling.mixture_plan(skewed, "dom", alpha=0.0)
    eps = {r["domain"]: r["epochs"] for r in plan.collect()}
    got = sorted((r["doc_id"], r["epoch"]) for r in
                 sampling.apply_mixture_plan(skewed, plan, "dom").collect())
    rows = [(r["doc_id"], r["dom"]) for r in skewed.collect()]
    assert got == _expect_apply(rows, eps)
    # full epochs appear unconditionally: every c-doc at least 3 times
    from collections import Counter
    per_doc = Counter(d for d, _ in got)
    assert all(per_doc[d] >= 3 for d, dom in rows if dom == "c")
    # deterministic + partitioning-invariant
    again = sorted(
        (r["doc_id"], r["epoch"]) for r in sampling.apply_mixture_plan(
            skewed.repartition(7), plan, "dom").collect())
    assert again == got
    # realized size tracks planned_rows (exact integer part + hash frac)
    planned = sum(r["planned_rows"] for r in plan.collect())
    assert abs(len(got) - planned) <= 10


def test_apply_mixture_plan_fraction_nests(spark):
    df = spark.createDataFrame([(i, "d") for i in range(400)],
                               "doc_id long, dom string")
    lo = spark.createDataFrame([("d", 2.3)], "domain string, epochs double")
    hi = spark.createDataFrame([("d", 2.6)], "domain string, epochs double")
    got_lo = {(r["doc_id"], r["epoch"]) for r in
              sampling.apply_mixture_plan(df, lo, "dom").collect()}
    got_hi = {(r["doc_id"], r["epoch"]) for r in
              sampling.apply_mixture_plan(df, hi, "dom").collect()}
    assert got_lo < got_hi          # widening the window only adds rows
    # epoch column is 0-based and dense for the integer part
    assert {e for _, e in got_lo} == {0, 1, 2}
    with pytest.raises(ValueError, match="plan must have"):
        sampling.apply_mixture_plan(df, df, "dom")


def test_mixture_duckdb_parity(spark, sf_dir):
    """Replay plan (alpha=0.5, token budget) AND apply in DuckDB SQL on
    the fixture corpus: identical plan values and identical selected
    (doc_id, epoch) multiset."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = sampling.mixture_plan(
        docs, "lang", alpha=0.5, token_col="n_chars",
        target_tokens=300_000, max_epochs=3.0)
    got_plan = {r["domain"]: (r["n_rows"], r["n_tokens"],
                              r["natural_share"], r["target_share"],
                              r["epochs"], r["planned_rows"],
                              r["planned_tokens"])
                for r in plan.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want_plan = {r[0]: tuple(r[1:]) for r in con.execute("""
WITH per AS (
  SELECT lang AS domain, count(*)::BIGINT AS n_rows,
         sum(n_chars)::BIGINT AS n_tokens
  FROM documents GROUP BY 1),
sh AS (
  SELECT *, n_tokens / sum(n_tokens) OVER () AS nat,
         pow(n_tokens / sum(n_tokens) OVER (), 0.5) AS w
  FROM per),
ep AS (
  SELECT *, least(3.0, round(
           (w / sum(w) OVER ()) * 300000 / n_tokens, 6)) AS epochs0,
         round(w / sum(w) OVER (), 6) AS tgt
  FROM sh)
SELECT domain, n_rows, n_tokens, round(nat, 6) AS natural_share,
       tgt AS target_share,
       least(3.0, round((w / sum(w) OVER ()) * 300000 / n_tokens, 6))
         AS epochs,
       round(epochs0 * n_rows, 0)::BIGINT AS planned_rows,
       round(epochs0 * n_tokens, 0)::BIGINT AS planned_tokens
FROM ep""").fetchall()}
    assert got_plan == want_plan
    got = sorted((r["doc_id"], r["epoch"]) for r in
                 sampling.apply_mixture_plan(docs, plan, "lang").collect())
    want = sorted(tuple(r) for r in con.execute("""
WITH per AS (
  SELECT lang AS domain, sum(n_chars)::BIGINT AS n_tokens
  FROM documents GROUP BY 1),
sh AS (SELECT *, pow(n_tokens / sum(n_tokens) OVER (), 0.5) AS w FROM per),
ep AS (SELECT domain, least(3.0, round(
         (w / sum(w) OVER ()) * 300000 / n_tokens, 6)) AS epochs FROM sh),
cand AS (
  SELECT d.doc_id, e.epochs, floor(e.epochs)::INT AS fullep, gs.epoch
  FROM documents d
  JOIN ep e ON d.lang = e.domain
  JOIN (SELECT unnest(range(0, 16)) AS epoch) gs
    ON gs.epoch < ceil(e.epochs)::INT)
SELECT doc_id, epoch FROM cand
WHERE epoch < fullep
   OR ('0x' || substr(md5('42|' || doc_id::VARCHAR || '#' ||
         fullep::VARCHAR), 1, 12))::BIGINT
      < floor((epochs - fullep) * 281474976710656)::BIGINT""").fetchall())
    assert got == want and len(got) > 0
