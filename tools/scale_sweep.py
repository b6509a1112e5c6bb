"""Key-cardinality scaling sweep — reproducible evidence for the 100 TB axis.

Detection shards on the series key (SURVEY.md §4.3): per-key work is
O(window), so throughput must RISE with key count as per-query fixed cost
amortizes. This tool regenerates the BASELINE.md sweep on demand:
synthetic (key, ts, value) frames at increasing cardinality, warm session,
best-of-2 per cell, one JSON line at the end.

Usage: python tools/scale_sweep.py [--keys 10000,100000] [--points 15]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from anomalyzer_spark import AnomalyzerConf, detect  # noqa: E402
from anomalyzer_spark.session import get_spark  # noqa: E402

CONFS = {
    "deterministic": AnomalyzerConf(
        active_size=2, methods=("magnitude", "fence", "cdf"),
        upper_bound=500.0, lower_bound=0.0),
    # magnitude+ks, 500 perms — the md5-argsort oracle spec vs the
    # vectorized Philox production spec (config.perm_spec)
    "monte_carlo_hash": AnomalyzerConf(active_size=2),
    "monte_carlo_fast": AnomalyzerConf(active_size=2, perm_spec="fast"),
}


def make_frame(spark, n_keys: int, points: int):
    """Deterministic synthetic series: one row per (key, t)."""
    return (
        spark.range(n_keys).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            F.explode(F.sequence(F.lit(0), F.lit(points - 1))).alias("ts"),
        )
        .select(
            "k", "ts",
            (F.sin(F.col("ts") * 0.7) * 10
             + (F.crc32(F.concat(F.col("k"), F.col("ts"))) % 1000) / 100.0
             ).alias("value"),
        )
    )


def make_docs(spark, n_docs: int):
    """Deterministic synthetic corpus: ~40 pseudo-words per doc drawn from
    a doc-id-seeded stream; every 10th doc duplicates its predecessor's
    text (planted near/exact dups so the dedup operators do real work)."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # dup groups: doc 10k+9 copies 10k+8's content id
        (F.col("id") - F.when(F.col("id") % 10 == 9, 1).otherwise(0))
        .alias("_cid"),
    )
    word = ("concat('w', conv(substring(md5(concat(_cid, '|', i)), 1, 4)"
            ", 16, 10))")
    return base.select(
        "doc_id",
        F.expr(
            "array_join(transform(sequence(1, 40), i -> " + word + "), ' ')"
        ).alias("text"),
    )


def make_embs(spark, n_vecs: int, dim: int = 16):
    """Deterministic synthetic embeddings (crc32-derived coordinates —
    near-uniform, the quantizer worst case, matching the fixture)."""
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.crc32(F.concat(F.col("id"), F.lit("|"), j))
                       % 2000).cast("double") / 1000.0 - 1.0,
        ).alias("embedding"))


def dedup_cells(spark, doc_counts, repeat, only=None):
    from anomalyzer_spark.functions import (changelog, checks, code,
                                            decontam, dedup, drift, langid,
                                            multimodal, ngram_lm, packing,
                                            quality, retrieval, sampling,
                                            similarity, sketch, text, web)

    # 2-class language model for the langid_score cell: the model is
    # corpus-independent (fixed feature spec), so the fit happens ONCE per
    # sweep on bounded synthetic pools — the timed cell is pure scoring
    lang_model = langid.train_lang_model(
        {"wordy": spark.createDataFrame(
            [(f"alpha beta gamma delta w{i} epsilon zeta",) for i in
             range(32)], "text string"),
         "numeric": spark.createDataFrame(
            [(f"{i * 7} {i * 13} {i * 31} 42 { i * 3}",) for i in
             range(32)], "text string")},
        sample_rows=64, iters=100)

    out = {}
    for n in doc_counts:
        d = make_docs(spark, n).repartition(
            spark.sparkContext.defaultParallelism)
        d.cache().count()
        # embeddings sibling for the semantic-dedup cell; centroid fit
        # is once per scale (the model is corpus-level, not per-run)
        embs = make_embs(spark, n).repartition(
            spark.sparkContext.defaultParallelism)
        embs.cache().count()
        sem_sample = np.asarray(
            [r["embedding"] for r in
             embs.where(F.col("vec_id") < 512).orderBy("vec_id").collect()],
            dtype=np.float64)
        # join parallelism = n_clusters (cells are the join key), so the
        # cell count must scale with the corpus — the SemDeDup paper runs
        # ~11k clusters at web scale; docstring documents the rule
        sem_cents = similarity.train_ivf_centroids(
            sem_sample, min(64, max(16, n // 250)))
        # bm25 queries: real make_docs vocabulary (the word hash replayed
        # here) so postings/df/top-k do real work at every scale
        import hashlib as _hl

        def _w(cid, i):
            return "w" + str(int(
                _hl.md5(f"{cid}|{i}".encode()).hexdigest()[:4], 16))

        qdf = spark.createDataFrame(
            [(0, f"{_w(0, 1)} {_w(1, 2)} {_w(2, 3)}"),
             (1, f"{_w(3, 1)} {_w(4, 2)}")],
            "query_id long, query string")
        # skewed 60/30/10 domain split for the mixture cell
        dm = d.withColumn(
            "dom", F.when(F.col("doc_id") % 10 < 6, "a")
                    .when(F.col("doc_id") % 10 < 9, "b").otherwise("c"))
        # pre-tokenized corpus + persisted stats for the bm25_pretok cell
        # (materialized OUTSIDE the timer — that is the recipe being
        # measured: tokenize once, score many)
        if not only or "bm25_pretok" in only:
            d_tok = retrieval.tokenize_docs(d).localCheckpoint(eager=True)
            pretok_stats = retrieval.bm25_corpus_stats(
                d_tok, tokens_col="tokens")
        # round-12c: incremental dedup — the store holds 90% of the
        # corpus (seeded OUTSIDE the timer: the corpus-index-exists
        # shape), the timed cell ingests the remaining 10% increment.
        # make_docs plants every-10th-doc copies, so every increment doc
        # has a real near-dup in the store. Explicit batch_id=1 makes
        # each repeat an idempotent replay (same work, same store
        # state). Compare against the minhash_lsh cell at the same n:
        # that is what re-deduping the whole corpus costs instead.
        if not only or "minhash_inc" in only:
            import tempfile

            from anomalyzer_spark.streaming.minhash_stream import (
                minhash_increment)
            inc_store = tempfile.mkdtemp(prefix="mh_inc_") + "/store"
            minhash_increment(
                spark, d.where(F.col("doc_id") % 10 != 9), inc_store,
                k=3, num_hashes=64, bands=16, threshold=0.7)
            inc_docs = (d.where(F.col("doc_id") % 10 == 9)
                        .localCheckpoint(eager=True))
        for name, build in (
            ("exact_dedup", lambda: dedup.exact_dedup(d, "text", "doc_id")),
            ("minhash_lsh", lambda: dedup.minhash_lsh_pairs(
                d, "text", "doc_id", k=3, num_hashes=64, bands=16,
                threshold=0.7)),
            ("text_profile", lambda: text.text_profile(d, "text", "doc_id")),
            ("redact_pii", lambda: text.redact_pii(d, "text", "doc_id")),
            ("pack_chunks", lambda: packing.pack_chunks(
                d, 2048, n_shards=64)),
            ("pack_bins_ffd", lambda: packing.pack_bins_ffd(
                d, 2048, n_shards=64)),
            # bins + utilization summary; the delta vs the pack_bins_ffd
            # cell isolates the stats aggregate's own cost
            ("packing_stats", lambda: packing.packing_stats(
                packing.pack_bins_ffd(d, 2048, n_shards=64), 2048)),
            # eval set = every 100th doc; near-dup pairs in make_docs
            # guarantee real hits beyond self-matches
            ("decontam", lambda: decontam.contamination(
                d, d.where(F.col("doc_id") % 100 == 0), n=8)),
            # word-level split (make_docs text is single-line): ~40
            # paragraphs/doc — an upper-bound throughput shape for the
            # explode+count+join+rebuild path
            ("dedup_paragraphs", lambda: dedup.dedup_paragraphs(
                d, sep=" ", max_df=max(n // 10, 2))),
            ("tfidf_terms", lambda: text.tfidf_terms(
                d, "text", "doc_id", k=5, min_doc_freq=2)),
            ("chunk_windows", lambda: text.chunk_windows(
                d, "text", "doc_id", size=16, stride=8)),
            ("normalize_text", lambda: text.normalize_text(
                d, "text", "doc_id", collapse_ws=True)),
            # old = corpus, new = 9/10 kept with every 20th rewritten —
            # the added/removed/changed classification does real work
            ("snapshot_diff", lambda: dedup.snapshot_diff(
                d, d.where(F.col("doc_id") % 10 != 0).select(
                    "doc_id",
                    F.when(F.col("doc_id") % 20 == 1,
                           F.concat(F.col("text"), F.lit(" v2")))
                    .otherwise(F.col("text")).alias("text")))),
            # LM trained on even ids, scores the whole corpus (training
            # counts + scoring joins both inside the timed cell)
            ("perplexity", lambda: ngram_lm.perplexity(
                d, ngram_lm.train_bigram_lm(
                    d.where(F.col("doc_id") % 2 == 0)))),
            ("fuzzy_decontam", lambda: decontam.fuzzy_contamination(
                d, d.where(F.col("doc_id") % 100 == 0), threshold=0.5)),
            ("strip_repeats", lambda: dedup.strip_repeated_paragraphs(
                d, sep=" ")),
            ("corpus_card", lambda: text.corpus_card(d)),
            # round-9 governance cells: one-pass quality gate over the
            # corpus frame, PSI drift old-vs-rewritten, and the
            # cluster-blocked semantic pair generator
            ("quality_checks", lambda: checks.verify_checks(d, [
                checks.completeness("text"),
                checks.uniqueness("doc_id", exact=True),
                checks.matches("text", r"[ -~]*", 0.9),
                checks.satisfies("length(text) > 0", "non_empty"),
                checks.row_count(min_rows=1)])),
            ("psi_drift", lambda: drift.psi_drift(
                d.withColumn("len", F.length("text")),
                d.withColumn("len", F.length("text") + F.when(
                    F.col("doc_id") % 3 == 0, 40).otherwise(0)),
                ["len"])),
            ("semantic_pairs", lambda: similarity.semantic_pairs(
                embs, centroids=sem_cents, threshold=0.6)),
            # round-9 second-session cells: lexical retrieval (timed cell
            # includes the eager postings checkpoint) and the full
            # plan-then-apply mixture pass (uniform target over the
            # 60/30/10 skew → real up-sampling on the 'c' tail)
            ("bm25", lambda: retrieval.bm25_topk(d, qdf, k=10)),
            # hot-term variant (round 10): 'wcommon' appears in EVERY
            # document, so one query term's postings are corpus-sized —
            # the docstring's hot-keys-absorbed-by-partial-agg claim under
            # measurement. doc_freq partial-aggregates map-side and the
            # per-query candidate fan-out hits WindowGroupLimit, so the
            # cell must scale ~linearly with n, not super-linearly.
            ("bm25_hot", lambda: retrieval.bm25_topk(
                d.select("doc_id", F.concat(
                    F.col("text"), F.lit(" wcommon")).alias("text")),
                spark.createDataFrame(
                    [(0, f"wcommon {_w(0, 1)}"), (1, f"wcommon {_w(3, 1)}")],
                    "query_id long, query string"),
                k=10)),
            # cross-doc exact-substring dedup: the planted every-10th-doc
            # copies give ~n/5 docs real duplicated 40-word spans; the
            # timed cell is the FULL strip (span mining + text rebuild)
            ("strip_spans", lambda: dedup.strip_duplicate_spans(
                d, min_len=10)),
            ("mixture_apply", lambda: sampling.apply_mixture_plan(
                dm, sampling.mixture_plan(dm, "dom", alpha=0.0), "dom")),
            # round-10: per-source token budget over the skewed 60/30/10
            # domain split — the 'a' stratum is a head domain, which is
            # exactly the case the segmented two-level cumsum exists for
            ("source_cap", lambda: sampling.cap_stratum_tokens(
                dm.withColumn("len", F.length("text").cast("long")),
                n * 8, "dom", "len")),
            # round-11 cells: perceptual image dedup over synthetic PGM
            # payloads (every-10th-doc text copies -> identical payloads
            # -> real hamming-0 pairs; the timed cell is decode + dHash +
            # banded self-join), token-exact packing over word-hash id
            # arrays, and the trained-language-ID scoring pass (the fit
            # is outside — corpus-independent; this times the per-doc
            # script regexps + bucket fold + staged softmax)
            ("dhash_pairs", lambda: multimodal.dhash_pairs(
                d.select("doc_id", multimodal.pgm_payload_col(
                    F.col("text")).alias("content")))),
            ("pack_token_ids", lambda: packing.pack_token_ids(
                d.select("doc_id", F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.crc32(w).cast("long") % 32768)
                    .alias("token_ids")),
                2048, n_shards=64)),
            ("langid_score", lambda: langid.score_lang(
                d, lang_model, "text", "doc_id")),
            # fragment-level matching: planted every-10th-doc copies give
            # real shared-fingerprint pairs; max_df caps the hot
            # fingerprints that shared vocab words produce at scale
            ("fingerprint_matches", lambda: text.fingerprint_matches(
                d, min_shared=2, max_df=max(n // 10, 4))),
            # round-12: the pre-tokenized + persisted-stats scoring pass —
            # what a query batch costs when the corpus token column and
            # N/avgdl are corpus-version metadata (tokenize_docs /
            # bm25_corpus_stats recipes). The cell times ONLY the scoring
            # legs: the tokenized frame is materialized outside the timer
            # (d_tok is cached above with the corpus), so the delta vs the
            # plain bm25 cell is the regex pass the recipe removes.
            ("bm25_pretok", lambda: retrieval.bm25_topk(
                d_tok, qdf, k=10, tokens_col="tokens",
                corpus_stats=pretok_stats)),
            # round-12c: 10%-increment dedup against the prebuilt store
            # (seeded above) vs the whole-corpus minhash_lsh cell
            ("minhash_inc", lambda: minhash_increment(
                spark, inc_docs, inc_store, batch_id=1,
                k=3, num_hashes=64, bands=16, threshold=0.7)),
            # round-12c: mergeable shard sketches — the per-shard cost a
            # landing shard pays so corpus-wide distinct counts / top
            # values never rescan (one scan + bounded aggregates each)
            ("hll_profile", lambda: sketch.hll_profile(
                d, ["text"], p=12)),
            ("mg_heavy", lambda: sketch.mg_profile(d, ["text"], k=64)),
            # round-13 cells: the 12b/12c families that lacked sweep
            # evidence, plus the new KLL profile. changelog: a 10%-update
            # + 2%-delete feed against the corpus-as-snapshot (untouched
            # rows must never shuffle — broadcast anti on changed keys);
            # scd2: 3 versions per changed key, one lead-window pass.
            ("changelog_apply", lambda: changelog.apply_changes(
                d,
                d.where(F.col("doc_id") % 10 == 3).select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(" v2")).alias("text"),
                    F.lit(1).alias("seq"), F.lit("u").alias("op"))
                .unionByName(d.where(F.col("doc_id") % 50 == 7).select(
                    "doc_id", "text", F.lit(2).alias("seq"),
                    F.lit("d").alias("op"))),
                ["doc_id"], "seq", op_col="op")),
            ("scd2_history", lambda: changelog.scd2_history(
                d.where(F.col("doc_id") % 5 == 0).select(
                    "doc_id", "text",
                    F.explode(F.sequence(F.lit(1), F.lit(3))).alias("seq"))
                .select("doc_id", F.concat(
                    F.col("text"), F.lit(" v"),
                    F.col("seq").cast("string")).alias("text"), "seq"),
                ["doc_id"], "seq")),
            # crawl hygiene: planted URLs (the multimodal-rider shapes)
            # through the full normalize/host/domain projection, and a
            # planted HTML envelope through the extract_text regexp chain
            # + markup stats — both map-only; throughput is the claim
            ("normalize_url", lambda: d.select(
                "doc_id",
                web.normalize_url(F.concat(
                    F.lit("https://WWW.Site"), F.col("doc_id") % 23,
                    F.lit(".Example.CO.UK:443/p/"), F.col("doc_id"),
                    F.lit("/?utm_x=1&b=2&a=1#f")).alias("_u"))
                .alias("norm_url"),
                web.registrable_domain(F.concat(
                    F.lit("https://WWW.Site"), F.col("doc_id") % 23,
                    F.lit(".Example.CO.UK/"))).alias("dom"))),
            ("extract_text", lambda: d.select(
                "doc_id",
                web.extract_text(F.concat(
                    F.lit('<html><body><script>x="</div>";</script><p>'),
                    F.col("text"),
                    F.lit(' &amp; more</p><!-- c --><div>t</div>'
                          '</body></html>')).alias("vis")),
            ).withColumn("stats", web.markup_stats(F.concat(
                F.lit("<html><p>"), F.col("doc_id").cast("string"),
                F.lit("</p></html>"))))),
            ("code_stats", lambda: code.with_code_stats(d, "text")),
            # license/opt-out gate: SPDX extract + header-phrase CASE
            # chain on a planted header + opt-out scan — map-only
            ("license_gate", lambda: code.with_license_info(
                d.select("doc_id", F.concat(
                    F.lit("// SPDX-License-Identifier: MIT\n"),
                    F.col("text")).alias("text")))),
            ("gopher_rules", lambda: quality.gopher_rules(d)),
            ("c4_clean", lambda: quality.c4_clean(d)),
            # Luhn-gated card + ssn redaction on PII-planted text: the
            # candidate extract + checksum fold + literal replace fold,
            # all map-only (the compliance scrubber set)
            ("redact_luhn", lambda: text.redact_pii(
                d.select("doc_id", F.concat(
                    F.col("text"),
                    F.lit(" 4539 1488 0343 6467 and 123-45-6789 "
                          "DE89370400440532013000"))
                    .alias("text")),
                kinds=("iban", "credit_card", "ssn", "phone"),
                with_counts=True)),
            # score normalization, global path: one histogram profile
            # pass + a broadcast-literal CDF map (no global window)
            ("normalize_scores", lambda: quality.normalize_scores(
                d.select("doc_id",
                         F.length("text").cast("double").alias("s")),
                "s", n_bins=100)),
            # leakage-safe split: pure hash CASE, map-only
            ("split_train_eval", lambda: sampling.split_train_eval(
                d, 0.1)),
            # mergeable KLL quantile profile over a high-cardinality
            # numeric column (crc32 of the text — near-distinct values,
            # the counting rewrite's worst case)
            ("kll_profile", lambda: sketch.kll_profile(
                d.select(F.crc32(F.col("text")).alias("v")), ["v"],
                k=256)),
            # bottom-k coordinated sample over the text column (every
            # value distinct -> the distinct agg and the map-side-capped
            # ranking window both do full work)
            ("bottomk_profile", lambda: sketch.bottomk_profile(
                d, ["text"], k=512)),
            # sketch-level two-sample KS: profile old + rewritten-new and
            # compare — the whole cell is two KLL builds + one tiny window
            ("ks_profiles", lambda: drift.ks_from_profiles(
                sketch.kll_profile(
                    d.select(F.length("text").alias("len")), ["len"],
                    k=256),
                sketch.kll_profile(
                    d.select((F.length("text") + F.when(
                        F.col("doc_id") % 3 == 0, 40).otherwise(0))
                        .alias("len")), ["len"], k=256))),
        ):
            if only and name not in only:
                continue
            best = float("inf")
            for _ in range(repeat):
                t0 = time.perf_counter()
                build().write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            out[f"{name}_{n}"] = {"sec": round(best, 3),
                                  "docs_per_sec": round(n / best)}
            print(f"# {name} @ {n} docs: {best:.2f}s "
                  f"({n / best:,.0f} docs/s)", file=sys.stderr)
        # round-13 bespoke cell: small-file compaction of a fragmented
        # shard store. The fragmented state is rebuilt OUTSIDE the timer
        # before every repeat (compaction is destructive — a second pass
        # over a healthy store measures the no-op path, not the rewrite):
        # 8 shards x ~32 small files each from a deliberately
        # over-partitioned append; the timed call lists, prunes to the
        # affected partitions, and rewrites only those.
        if not only or "compact_shards" in only:
            import shutil
            import tempfile

            from anomalyzer_spark.sources import layout
            best = float("inf")
            compacted = 0
            store = tempfile.mkdtemp(prefix="compact_") + "/store"
            for _ in range(repeat):
                shutil.rmtree(store, ignore_errors=True)
                sharded = layout.assign_shards(d, 8)
                layout.export_training_shards(sharded, store)
                (sharded.repartition(32)
                 .write.mode("append").partitionBy("shard")
                 .parquet(f"{store}/data"))
                t0 = time.perf_counter()
                compacted = layout.compact_shards(spark, store, target_mb=64)
                best = min(best, time.perf_counter() - t0)
            assert compacted > 0, "fragmentation setup produced no work"
            out[f"compact_shards_{n}"] = {"sec": round(best, 3),
                                          "docs_per_sec": round(n / best)}
            print(f"# compact_shards @ {n} docs: {best:.2f}s "
                  f"({n / best:,.0f} docs/s, {compacted} partitions)",
                  file=sys.stderr)
            shutil.rmtree(store, ignore_errors=True)
        d.unpersist()
        embs.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="10000,100000")
    ap.add_argument("--points", type=int, default=15)
    ap.add_argument("--docs", default="5000,50000",
                    help="doc counts for the dedup/text suite ('' to skip)")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cells", default="",
                    help="comma-separated doc-cell names to run (default all)")
    args = ap.parse_args()
    key_counts = [int(k) for k in args.keys.split(",") if k]

    spark = get_spark("scale-sweep")
    cells = {}
    if args.docs:
        cells.update(dedup_cells(
            spark, [int(x) for x in args.docs.split(",") if x], args.repeat,
            only=set(args.cells.split(",")) - {""} or None))
    for n_keys in key_counts:
        df = make_frame(spark, n_keys, args.points)
        df.cache().count()  # isolate detect cost from input synthesis
        for name, conf in CONFS.items():
            best = float("inf")
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                detect(df, ["k"], "ts", "value", conf).write.mode(
                    "overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            cells[f"{name}_{n_keys}"] = {
                "sec": round(best, 3),
                "keys_per_sec": round(n_keys / best),
            }
            print(f"# {name} @ {n_keys} keys: {best:.2f}s "
                  f"({n_keys / best:,.0f} keys/s)", file=sys.stderr)
        df.unpersist()
    print(json.dumps({"metric": "key_cardinality_sweep",
                      "points_per_key": args.points, "cells": cells}))
    spark.stop()


if __name__ == "__main__":
    main()
