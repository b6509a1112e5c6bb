"""Benchmark decontamination (functions/decontam.py).

Strongest available checks: full value parity of the contamination
report against an independent DuckDB transcription over the driver's
parquet fixtures (eval set drawn from the corpus itself, so hits are
guaranteed), plus planted-contamination semantics and the broadcast
plan shape the 100 TB asymmetry requires.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import decontam

_NORM = ("trim(regexp_replace(regexp_replace(lower(text),"
         "'[^a-z0-9]+',' ','g'),'\\s+',' ','g'))")

N = 8


def _duck_report(sf_dir: str, min_hits: int = 1):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(f"""
WITH norm AS (SELECT doc_id, {_NORM} AS norm FROM documents),
w AS (SELECT doc_id, string_split(norm, ' ') AS w FROM norm),
g AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(w) - {N - 1}, 1) + 1),
          i -> array_to_string(w[i:i+{N - 1}], ' '))) AS grams
      FROM w),
tr AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM g),
ev AS (SELECT doc_id AS eval_id, unnest(grams) AS gram FROM g
       WHERE doc_id % 97 = 0),
hits AS (
  SELECT tr.doc_id, any_value(n_grams) AS n_grams,
         count(DISTINCT gram) AS n_hit_grams,
         count(DISTINCT eval_id) AS n_eval_docs
  FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id)
SELECT doc_id, n_grams, n_hit_grams, n_eval_docs,
       round(n_hit_grams / n_grams, 6) AS contamination
FROM hits WHERE n_hit_grams >= {min_hits}
ORDER BY doc_id""").fetchall()


def test_contamination_duckdb_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["n_grams"], r["n_hit_grams"], r["n_eval_docs"],
         r["contamination"])
        for r in decontam.contamination(docs, ev, n=N).collect())
    want = [tuple(w) for w in _duck_report(sf_dir)]
    assert len(got) > 0 and got == want
    # every eval-source document is trivially contaminated with itself
    ev_ids = {r["doc_id"] for r in ev.collect()}
    assert ev_ids <= {g[0] for g in got}


def test_decontaminate_removes_exactly_the_report(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    bad = {r["doc_id"]
           for r in decontam.contamination(docs, ev, n=N).collect()}
    clean = decontam.decontaminate(docs, ev, n=N)
    assert clean.columns == docs.columns  # schema passes through
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    allids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == allids - bad and len(bad) > 0


def test_planted_contamination_semantics(spark):
    """A train doc sharing a verbatim n-word window with an eval doc is
    flagged; one sharing only shorter overlaps is not. Short eval docs
    (< n words) match verbatim copies via the full-sequence gram."""
    w = [f"tok{i}" for i in range(40)]
    train = spark.createDataFrame(
        [(0, " ".join(w[:20])),                 # contains eval window
         (1, " ".join(w[20:40])),               # disjoint vocab half
         (2, " ".join(reversed(w[:20]))),       # same words, no 8-run
         (3, "short prompt copy")],             # verbatim short eval doc
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, " ".join(w[4:12])),              # one 8-gram inside doc 0
         (101, "short prompt copy")],
        "doc_id long, text string")
    rep = {r["doc_id"]: r for r in
           decontam.contamination(train, ev, n=8).collect()}
    assert set(rep) == {0, 3}
    assert rep[0]["n_hit_grams"] == 1 and rep[0]["n_eval_docs"] == 1
    assert rep[3]["contamination"] == 1.0
    kept = {r["doc_id"]
            for r in decontam.decontaminate(train, ev, n=8).collect()}
    assert kept == {1, 2}
    # min_hits gates the report
    assert decontam.contamination(train, ev, n=8, min_hits=2).count() == 0


def test_shuffled_eval_join_same_answer(spark, sf_dir):
    """broadcast_eval=False (the corpus-vs-corpus shape) must produce the
    identical report through the shuffled gram equi-join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    key = lambda r: (r["doc_id"], r["n_grams"], r["n_hit_grams"],
                     r["n_eval_docs"], r["contamination"])
    a = sorted(key(r) for r in
               decontam.contamination(docs, ev, n=N).collect())
    b = sorted(key(r) for r in decontam.contamination(
        docs, ev, n=N, broadcast_eval=False).collect())
    assert a == b and len(a) > 0


def test_self_decontamination_is_total(spark, sf_dir):
    """Invariant: every document fully overlaps itself (full-sequence
    gram for short docs included), so decontaminating a corpus against
    ITSELF flags everything at contamination 1.0 and leaves nothing."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(50))
    rep = decontam.contamination(docs, docs, n=N)
    assert rep.count() == 50
    assert rep.where(F.col("contamination") < 1.0).count() == 0
    assert decontam.decontaminate(docs, docs, n=N).count() == 0


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must"):
        decontam.contamination(df, df, n=0)
    with pytest.raises(ValueError, match="min_hits"):
        decontam.contamination(df, df, min_hits=0)


def test_plan_broadcasts_eval_side(spark, sf_dir):
    """The corpus must meet the eval grams via a BROADCAST join (the eval
    side is the small one by definition) — never a shuffled corpus join,
    never a cartesian product; the anti join is broadcast too."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    for frame in (decontam.contamination(docs, ev, n=N),
                  decontam.decontaminate(docs, ev, n=N)):
        s = frame._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in s
        assert "CartesianProduct" not in s
        assert "BroadcastNestedLoop" not in s


# ---------------------------------------------------------------------------
# fuzzy (MinHash) decontamination
# ---------------------------------------------------------------------------

def _corrupt_every_8th_word(col):
    """Replace words at positions 0, 8, 16, … with 'zzz' — breaks EVERY
    word 8-gram (each covers one replaced position) while most word
    3-gram shingles survive."""
    return F.array_join(
        F.transform(
            F.split(col, r"\s+"),
            lambda w, i: F.when(i % 8 == 0, F.lit("zzz")).otherwise(w)),
        " ")


def test_fuzzy_catches_edits_exact_misses(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    # corpus carries EDITED copies of the eval docs under shifted ids
    planted = docs.select("doc_id", "text").unionByName(
        ev.select((F.col("doc_id") + 500_000).alias("doc_id"),
                  _corrupt_every_8th_word(F.col("text")).alias("text")))
    planted_ids = {r["doc_id"] + 500_000 for r in ev.collect()}

    exact = {r["doc_id"] for r in decontam.contamination(
        planted, ev, n=8).collect()}
    assert not (exact & planted_ids), \
        "every 8-gram must be broken in the edited copies"

    fuzzy = decontam.fuzzy_contamination(planted, ev, threshold=0.3)
    rows = fuzzy.collect()
    hits = {r["doc_id"] for r in rows}
    assert planted_ids <= hits, "edited copies must be flagged by MinHash"
    # verbatim eval-source docs hit themselves at jaccard 1.0
    ev_ids = {r["doc_id"] for r in ev.collect()}
    assert ev_ids <= hits
    assert all(r["jaccard"] >= 0.3 for r in rows)
    selfpairs = {r["doc_id"]: r["jaccard"] for r in rows
                 if r["doc_id"] == r["eval_id"]}
    assert all(j == 1.0 for j in selfpairs.values()) and selfpairs


def test_fuzzy_precision_matches_exact_jaccard(spark, sf_dir):
    """Every flagged pair's jaccard must equal the brute-force shingle
    Jaccard (LSH prunes candidates; it must never invent similarity)."""
    from anomalyzer_spark.functions.dedup import word_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    got = {(r["doc_id"], r["eval_id"]): r["jaccard"]
           for r in decontam.fuzzy_contamination(
               docs, ev, threshold=0.2).collect()}
    sh = {r["doc_id"]: set(r["sh"]) for r in docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("sh")).collect()}
    for (tid, eid), j in got.items():
        a, b = sh[tid], sh[eid]
        assert j == round(len(a & b) / len(a | b), 6)


def test_fuzzy_decontaminate_removes_flagged_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    flagged = {r["doc_id"] for r in decontam.fuzzy_contamination(
        docs, ev, threshold=0.3).collect()}
    kept = {r["doc_id"] for r in decontam.fuzzy_decontaminate(
        docs, ev, threshold=0.3).collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - flagged and flagged


def test_fuzzy_plan_broadcasts_eval_side(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    plan = decontam.fuzzy_contamination(docs, ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastExchange") >= 2  # buckets + shingle sets
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    with pytest.raises(ValueError):
        decontam.fuzzy_contamination(docs, ev, threshold=0.0)


def test_pretokenized_corpus_parity_and_no_train_regex(spark, sf_dir):
    """train_words_col= (the persist-once normalized-words recipe) must
    reproduce the from-text report EXACTLY, and the lazy plan must carry
    ZERO train-side normalization regexes — only the eval side (the
    small side) still normalizes from text."""
    from anomalyzer_spark.functions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    want = sorted(map(tuple, decontam.contamination(
        docs, ev, n=8).collect()))
    # localCheckpoint stands in for the parquet round-trip of the stored
    # words column (building it lazily would keep the regex in-plan)
    tok = docs.select(
        "doc_id", "text",
        dedup.normalized_words(F.col("text")).alias("words"),
    ).localCheckpoint(eager=True)
    got_df = decontam.contamination(tok, ev, n=8, train_words_col="words")
    got = sorted(map(tuple, got_df.collect()))
    assert got == want and len(got) > 0
    # exactly the eval side's normalization remains: the from-text plan
    # normalizes in BOTH subtrees (train + eval), the pretokenized plan
    # only in eval — so its regex-site count must halve
    def regex_sites(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("regexp_replace(lower(text")

    # one normalization site per from-text subtree (the staging +
    # explode_outer fixes keep it out of inferred scan filters too);
    # inspect FRESH un-executed frames — a finalized AQE plan re-renders
    # broadcast-stage subtrees and double-counts
    both = regex_sites(decontam.contamination(docs, ev, n=8))
    only_eval = regex_sites(
        decontam.contamination(tok, ev, n=8, train_words_col="words"))
    assert (both, only_eval) == (2, 1)
    # decontaminate composes the same fast path
    clean = decontam.decontaminate(tok, ev, n=8,
                                   train_words_col="words")
    bad_ids = {r[0] for r in got}
    assert clean.where(F.col("doc_id").isin(list(bad_ids))).count() == 0


def test_multi_suite_one_pass(spark, sf_dir):
    """eval_suite_col screens K suites in one corpus pass: per-suite
    rows equal K separate single-suite reports (DuckDB-parity-covered
    machinery, so equality to the per-suite calls is the contract), the
    corpus-side plan keeps ONE normalization site, and decontaminate
    drops any-suite-contaminated docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % 97 == 0).withColumn(
        "suite", F.when(F.col("doc_id") % 2 == 0, "mmlu")
                  .otherwise("gsm8k"))
    multi = decontam.contamination(docs, ev, n=N, eval_suite_col="suite")
    # plan check FIRST on the fresh frame (a finalized AQE plan
    # re-renders broadcast-stage subtrees and double-counts — the
    # documented caveat above): one corpus normalization site
    # regardless of suite count is the whole point (K suites, one scan)
    from anomalyzer_spark.plans import explain_str
    plan = explain_str(multi)
    assert plan.count("regexp_replace(lower(text") == 2  # corpus + eval
    got = {(r["doc_id"], r["suite"]): (r["n_grams"], r["n_hit_grams"],
                                       r["n_eval_docs"], r["contamination"])
           for r in multi.collect()}
    want = {}
    for s in ("mmlu", "gsm8k"):
        for r in decontam.contamination(
                docs, ev.where(F.col("suite") == s), n=N).collect():
            want[(r["doc_id"], s)] = (r["n_grams"], r["n_hit_grams"],
                                      r["n_eval_docs"], r["contamination"])
    assert got == want and len(got) > 0
    # decontaminate drops docs contaminated in ANY suite
    clean = decontam.decontaminate(docs, ev, n=N, eval_suite_col="suite")
    bad = {d for d, _ in got}
    assert clean.where(F.col("doc_id").isin(list(bad))).count() == 0
    assert clean.count() == docs.count() - len(bad)
