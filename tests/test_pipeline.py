"""High-level curate() composition (pipeline.py): stage wiring over the
fixture corpus, keep-first near-dup semantics, determinism, and config
validation. Each stage's own semantics are tested with its operator —
here only the composition contract is pinned."""

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.pipeline import CurationConfig, curate, curation_report


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.mark.slow
def test_full_pipeline_monotone_and_packed(spark, docs):
    ev = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    cfg = CurationConfig(
        min_quality=0.3, min_tokens=5, dedup="exact",
        decontam_mode="exact", redact=True,
        temperature_alpha=0.7, pack_capacity=256, pack_shards=8)
    res = curate(docs, cfg, eval_df=ev)
    rep = curation_report(res)
    # every doc-count stage retains a non-increasing subset
    doc_stages = [rep[s] for s in
                  ("normalized", "filtered", "deduped", "decontaminated",
                   "redacted", "sampled") if s in rep]
    assert doc_stages == sorted(doc_stages, reverse=True)
    assert doc_stages[0] == docs.count()          # normalize drops nothing
    assert rep["decontaminated"] < rep["deduped"]  # eval hits removed
    assert "packed" in rep and rep["packed"] > 0
    out = res.output
    assert {"shard", "chunk_id", "doc_id"} <= set(out.columns)
    # provenance (lang/source) rode through every map stage
    assert "lang" in out.columns


def test_minhash_dedup_keep_first(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and AGAIN"),
        (3, "completely unrelated text about spark catalyst optimizer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(df, CurationConfig(
        normalize_form=None, dedup="minhash", dedup_threshold=0.5))
    kept = {r["doc_id"] for r in res.output.collect()}
    assert kept == {1, 3}          # near-dup pair keeps the smaller id


@pytest.mark.slow
def test_determinism_same_config_same_output(spark, docs):
    cfg = CurationConfig(min_tokens=3, temperature_alpha=0.5,
                         pack_capacity=128, pack_shards=4)
    a = sorted(map(tuple, curate(docs, cfg).output.collect()))
    b = sorted(map(tuple, curate(docs, cfg).output.collect()))
    assert a == b and a


def test_config_validation(spark, docs):
    with pytest.raises(ValueError):
        CurationConfig(dedup="bogus")
    with pytest.raises(ValueError):
        CurationConfig(decontam_mode="bogus")
    with pytest.raises(ValueError):
        CurationConfig(min_quality=1.5)
    with pytest.raises(ValueError):
        curate(docs, CurationConfig(decontam_mode="exact"))  # no eval_df


def test_noop_config_passes_through(spark, docs):
    res = curate(docs, CurationConfig(normalize_form=None, dedup=None))
    assert res.output.count() == docs.count()
    assert list(res.stages) == ["input"]


@pytest.mark.slow
def test_minhash_dedup_keep_best(spark):
    """dedup_keep='best' retains the higher-quality member of a near-dup
    pair even when it has the larger id (keep-first would pick id 1)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        # doc 2 = doc 1 doubled: near-identical distinct-shingle set
        # (high Jaccard) but twice the length → higher quality_score
        (2, base + " " + base),
        (3, "completely unrelated text about spark catalyst optimizer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(df, CurationConfig(
        normalize_form=None, dedup="minhash", dedup_threshold=0.4,
        dedup_keep="best"))
    kept = {r["doc_id"] for r in res.output.collect()}
    assert kept == {2, 3}
    # the helper column never leaks into the output schema
    assert set(res.output.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError):
        CurationConfig(dedup_keep="bogus")


@pytest.mark.slow
def test_minhash_dedup_keep_best_with_user_quality_score(spark):
    """A user frame that already carries a `quality_score` column must
    survive dedup_keep='best' — the internal score uses a reserved name,
    so no ambiguous-column error and the user's column passes through."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, 0.11),
        (2, base + " " + base, 0.22),
        (3, "completely unrelated text about spark catalyst optimizer",
         0.33),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, quality_score double")
    res = curate(df, CurationConfig(
        normalize_form=None, dedup="minhash", dedup_threshold=0.4,
        dedup_keep="best"))
    out = {r["doc_id"]: r["quality_score"] for r in res.output.collect()}
    assert set(out) == {2, 3}
    assert out[2] == 0.22 and out[3] == 0.33
    assert set(res.output.columns) == {"doc_id", "text", "quality_score"}


def test_top_fraction_gate(spark, docs):
    n = docs.count()
    res = curate(docs, CurationConfig(
        normalize_form=None, dedup=None, top_fraction=0.4))
    kept = res.output.count()
    assert abs(kept - 0.4 * n) <= max(5, 0.05 * n)
    # composes with the absolute gate: relative-of-the-eligible
    res2 = curate(docs, CurationConfig(
        normalize_form=None, dedup=None, min_tokens=5, top_fraction=0.4))
    assert res2.output.count() <= kept
    with pytest.raises(ValueError):
        CurationConfig(top_fraction=0.0)


def test_window_stage_feeds_packing(spark, docs):
    """Long-doc windowing between curation and packing: chunk ids carry
    provenance ('<doc>#<idx>'), every window lands in some packed chunk,
    and token bookkeeping survives the whole composition."""
    cfg = CurationConfig(normalize_form=None, dedup=None,
                         window=(16, 8), pack_capacity=64, pack_shards=4)
    res = curate(docs, cfg)
    assert "windowed" in res.stages
    win = res.stages["windowed"]
    n_windows = win.count()
    assert n_windows > docs.count()          # fixtures are > 16 tokens
    assert dict(win.dtypes)["doc_id"] == "string"
    assert win.where(~F.col("doc_id").contains("#")).count() == 0
    packed = res.output
    assert packed.select("doc_id").distinct().count() == n_windows
    # windowing is per-row → still batch-split-invariant for streaming
    from anomalyzer_spark.streaming import batch_union_equals_offline
    assert batch_union_equals_offline(
        CurationConfig(dedup=None, window=(16, 8)))
    with pytest.raises(ValueError):
        CurationConfig(window=(0, 8))


def test_map_only_config_compiles_shuffle_free(spark, docs):
    """normalize + redact is the pure-hygiene config — the composed plan
    must stay Exchange-free (the Arrow NFC stage is a map, not a
    shuffle), so at 100 TB it runs at scan speed."""
    res = curate(docs, CurationConfig(dedup=None, redact=True))
    plan = res.output._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan       # NFC stage present, still a map


def test_strip_spans_stage_composition(spark, docs):
    """The span_deduped stage equals strip_duplicate_spans applied to the
    deduped stage's frame (composition contract), carries provenance
    columns, drops the audit counters, and sits between dedup and the
    later rewrites."""
    from anomalyzer_spark.functions.dedup import strip_duplicate_spans

    cfg = CurationConfig(dedup="exact", strip_spans=15)
    res = curate(docs, cfg)
    assert list(res.stages) == ["normalized", "deduped", "span_deduped"]
    got = res.stages["span_deduped"]
    assert "n_spans_removed" not in got.columns
    assert "lang" in got.columns                    # provenance carried

    deduped = res.stages["deduped"]
    carry = [c for c in deduped.columns if c not in ("doc_id", "text")]
    want = strip_duplicate_spans(
        deduped, "text", "doc_id", min_len=15, carry_cols=carry
    ).drop("n_spans_removed", "n_tokens_dropped")
    assert sorted(got.columns) == sorted(want.columns)
    a = {r["doc_id"]: r["text"] for r in got.collect()}
    b = {r["doc_id"]: r["text"] for r in want.collect()}
    assert a == b and len(a) > 0
    # the fixture corpus HAS cross-doc duplicate passages: some doc shrank
    orig = {r["doc_id"]: r["text"] for r in deduped.collect()}
    assert any(len(a[d]) < len(orig[d]) for d in a)


def test_strip_spans_validation():
    with pytest.raises(ValueError, match="strip_spans"):
        CurationConfig(strip_spans=1)


@pytest.mark.slow
def test_curate_source_cap_stage(spark, sf_dir):
    """source_cap_tokens composes after dedup: per-source lexical-token
    totals respect the budget, the stage is recorded, and the share form
    + validation behave."""
    from anomalyzer_spark.functions.text import word_token_count
    from anomalyzer_spark.pipeline import CurationConfig, curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "source")
    cfg = CurationConfig(dedup="exact", source_cap_tokens=800)
    res = curate(docs, cfg)
    assert "source_capped" in res.stages
    out = res.output
    totals = out.withColumn(
        "t", word_token_count(F.col("text")).cast("long")) \
        .groupBy("source").agg(F.sum("t").alias("tot"))
    assert totals.where(F.col("tot") > 800).count() == 0
    assert 0 < out.count() < docs.count()
    # cap runs on the DEDUPED corpus: planting a duplicate of a kept doc
    # must not change the survivor set (the copy dies before the budget)
    first = out.orderBy("doc_id").first()
    dup = docs.unionByName(spark.createDataFrame(
        [(999_999, first["text"], first["source"])],
        "doc_id long, text string, source string"))
    again = curate(dup, cfg).output
    assert sorted(r["doc_id"] for r in again.collect()) == \
        sorted(r["doc_id"] for r in out.collect())
    with pytest.raises(ValueError, match="mutually exclusive"):
        CurationConfig(source_cap_tokens=10, source_cap_share=0.5)
    with pytest.raises(ValueError, match="source_cap_share"):
        CurationConfig(source_cap_share=1.5)


def test_normalize_quality_by_is_domain_fair(spark, docs):
    """normalize_quality_by reshapes the top_fraction cut to keep the
    best X% of EVERY group instead of the groups whose raw scores run
    high; the absolute gates stay on the raw score."""
    from anomalyzer_spark.pipeline import CurationConfig, curate

    d = docs.select("doc_id", "text", "source")
    raw = curate(d, CurationConfig(
        normalize_form=None, dedup=None, top_fraction=0.3)).output
    fair = curate(d, CurationConfig(
        normalize_form=None, dedup=None, top_fraction=0.3,
        normalize_quality_by="source")).output
    n = d.count()
    assert 0 < fair.count() <= raw.count() + n * 0.1
    # per-source retention under the fair cut is near-uniform (~30%
    # each); the raw cut is allowed to be lopsided
    per = {r["source"]: r["kept"] / r["tot"] for r in
           d.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
           .join(fair.groupBy("source").agg(
               F.count(F.lit(1)).alias("kept")), "source").collect()}
    assert per and max(per.values()) - min(per.values()) < 0.15, per
    with pytest.raises(ValueError, match="normalize_quality_by"):
        CurationConfig(normalize_quality_by="source")


@pytest.mark.slow
def test_eval_fraction_split_stage(spark, docs):
    """Terminal leakage-safe split: every output row carries split, the
    stage is deterministic, minhash near-dup groups are atomic, and
    window chunks of one document land on one side."""
    from anomalyzer_spark.pipeline import CurationConfig, curate

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta " * 6
             + f"tail {i % 7}", "s") for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cfg = CurationConfig(normalize_form=None, dedup="minhash",
                         dedup_threshold=0.5, eval_fraction=0.3)
    res = curate(d, cfg)
    assert "split" in res.stages
    out = res.output.collect()
    assert {r["split"] for r in out} <= {"train", "eval"}
    again = curate(d, cfg).output.collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # window chunks: all chunks of a base doc share one side
    cfg2 = CurationConfig(normalize_form=None, dedup=None,
                          window=(16, 8), eval_fraction=0.3)
    wout = curate(d, cfg2).output.select("doc_id", "split").collect()
    sides = {}
    for r in wout:
        base = r["doc_id"].split("#")[0]
        sides.setdefault(base, set()).add(r["split"])
    assert all(len(v) == 1 for v in sides.values())
    with pytest.raises(ValueError, match="mutually exclusive"):
        CurationConfig(eval_fraction=0.2, pack_capacity=128)
    with pytest.raises(ValueError, match="eval_fraction"):
        CurationConfig(eval_fraction=1.5)


def test_gopher_gate_stage(spark, docs):
    """cfg.gopher applies the rule gate before the profile filters; a
    dict passes threshold overrides through."""
    from anomalyzer_spark.functions import quality
    from anomalyzer_spark.pipeline import CurationConfig, curate

    d = docs.select("doc_id", "text")
    res = curate(d, CurationConfig(normalize_form=None, dedup=None,
                                   gopher=True))
    assert "gopher_gated" in res.stages
    want = {r["doc_id"] for r in quality.gopher_rules(d)
            .where("gopher_pass").collect()}
    assert {r["doc_id"] for r in res.output.collect()} == want
    loose = curate(d, CurationConfig(
        normalize_form=None, dedup=None,
        gopher={"min_words": 1, "min_stop_words": 0}))
    assert loose.output.count() >= res.output.count()
