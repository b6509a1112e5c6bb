"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship detection query on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the extended
LLM-pipeline operators), each as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query.

Determinism rules shared by both sides (so the value-hash compare passes):
  * event-time ordering is by microsecond timestamps (DuckDB truncates the
    parquet TIMESTAMP(NANOS) to µs; our loader exposes the same µs column)
    with a unique id tiebreak;
  * double aggregations over many rows go through exact DECIMAL sums, then
    cast back to double (distributed partial-agg order would otherwise
    change last-bit results);
  * per-row double arithmetic (folds over small arrays) is sequential
    left-to-right in both engines (verified: DuckDB list_sum /
    list_dot_product == Spark F.aggregate fold bit-for-bit);
  * every float output column is rounded to 6 digits on both sides;
  * Monte-Carlo tests (highrank/lowrank/diff/ks) use an engine-portable
    hash permutation — replicate r of an n-point window permutes by argsort
    of md5(seed|key|test|r|j) over positions j (oracle.perm_matrix) — so
    the MC detect queries have FULL DuckDB oracles too (list_sort over the
    same md5 preimages).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomalyzer_spark import AnomalyzerConf, detect, detect_by_test
from anomalyzer_spark.functions import dedup, similarity, text
from anomalyzer_spark.operators.asof import asof_join
from anomalyzer_spark.session import compact_checkpoint
from anomalyzer_spark.sources import load_table, spread_partitions

# ---------------------------------------------------------------------------
# shared configs
# ---------------------------------------------------------------------------

#: deterministic methods only → fully SQL-expressible (oracle below)
DET_CONF = AnomalyzerConf(
    active_size=2, n_seasons=4, methods=("magnitude", "fence", "cdf"),
    upper_bound=500.0, lower_bound=0.0, sensitivity=0.1,
)
#: reference defaults (anomalyze.go:33-48): magnitude + ks, Monte-Carlo
DEFAULT_CONF = AnomalyzerConf(active_size=2, n_seasons=4)
#: literal pools + deterministically-refit softmax model for the
#: multimodal slot's language rider (langid.py): the fit is
#: bit-deterministic (bounded hash-ordered sample, zero-init, no RNG),
#: so the embedded literal equals a fresh train_lang_model() on these
#: pools — pinned by tests/test_entry_lang_model.py. Embedding the
#: literal keeps oracle_sql() session-free (the ivf_topk centroid
#: precedent for data-dependent oracle constants).
_LANG_POOLS = {'en': ['the quick brown fox jumps over the lazy dog by the river', 'she said they would meet again after the long winter months', 'children were playing in the park while their parents watched', 'he wrote a letter to his friend about the long journey home', 'reading books in the evening is a habit that many people share', 'the committee decided to postpone the meeting until next week'], 'de': ['der schnelle braune fuchs springt über den faulen hund am fluss', 'sie sagte dass sie sich nach dem langen winter wiedersehen würden', 'die kinder spielten im park während ihre eltern zuschauten', 'er schrieb seinem freund einen brief über die lange heimreise', 'abends bücher zu lesen ist eine gewohnheit vieler menschen', 'der ausschuss beschloss die sitzung auf nächste woche zu verschieben'], 'es': ['el rápido zorro marrón salta sobre el perro perezoso junto al río', 'ella dijo que se volverían a encontrar después del largo invierno', 'los niños jugaban en el parque mientras sus padres miraban', 'escribió una carta a su amigo sobre el largo viaje a casa', 'leer libros por la noche es una costumbre de mucha gente', 'el comité decidió aplazar la reunión hasta la próxima semana'], 'fr': ['le rapide renard brun saute par dessus le chien paresseux au bord', "elle a dit qu'ils se reverraient après les longs mois d'hiver", 'les enfants jouaient dans le parc pendant que leurs parents regardaient', 'il a écrit une lettre à son ami sur le long voyage de retour', 'lire des livres le soir est une habitude que beaucoup partagent', 'le comité a décidé de reporter la réunion à la semaine prochaine'], 'zh': ['敏捷的棕色狐狸跳过了河边那只懒惰的狗', '她说漫长的冬天过后他们会再次见面', '孩子们在公园里玩耍而他们的父母在旁边看着', '他给朋友写了一封关于长途旅行的信', '晚上读书是很多人共有的习惯', '委员会决定把会议推迟到下周']}
_LANG_MODEL = {'langs': ['de', 'en', 'es', 'fr', 'zh'], 'scripts': ['latin', 'latin_ext', 'cjk', 'kana', 'hangul', 'cyrillic', 'arabic', 'greek'], 'n_buckets': 32, 'max_chars': 128, 'mean': [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125], 'std': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125, 0.03125], 'weights': [[0.1863132654772916, 0.015006896973628904, -0.07852908214236658, 0.0, 0.0, 0.0, 0.0, 0.0, -0.6342246662945854, -0.33297643047595404, -0.5835727024711286, 0.3629912909778084, 0.9702607814389604, 1.1075856405949471, 0.6764916364388437, -0.34783212333257585, 0.19812462064028644, 0.7957347142117611, 0.5291617253871426, 0.43017654534935684, -0.1934193576120981, 0.8666107264196511, -0.2623095663296565, -0.2685434999574744, -0.7337970458408684, -0.052956135148455534, -0.4840348399457322, 0.10304845683798985, -0.3496289469001637, 0.005637188863039911, 0.5750607251195272, 0.4119790547675497, 0.881825756793194, -0.4078807018933798, 0.6029345920137537, 0.07082830718273583, -0.6691711682198103, -0.7066414565360203, -0.12886460852441622, 0.08033211500150209], [0.1806129229062547, -0.022024031466497684, -0.07853229905909642, 0.0, 0.0, 0.0, 0.0, 0.0, 0.4246064056322599, 0.7139680528235196, 0.21924842935961703, 0.48028693663761995, -0.49352726410223247, 0.15265250562437999, 0.327553789253577, -0.2324396126195964, -0.6208175857646402, 0.7649817688144657, 0.589663158165091, -0.5628738406890123, -0.3448984528306733, -0.6449009464525719, -0.2463346883217652, 0.9005267306305268, 0.23123007432777754, -0.31999874244025256, -0.3140127664338255, -0.26586442933223375, 0.5617695331813123, -0.23025947087714949, -0.08740576846412226, 0.14929604519518289, -0.712212931525576, 0.8089472728941499, -0.15560350256103755, -0.06661412953158158, -0.13942944869137225, -0.10151387594437038, 0.24514127565466284, 1.481869048278959], [0.24977469914789174, 0.006547660615805378, -0.07853975086544714, 0.0, 0.0, 0.0, 0.0, 0.0, 0.4578803587813461, -0.42131569670536506, 0.17822461063145734, -0.45345446655098565, 0.17517540652298702, -0.1880310771140545, -0.6486714140717461, 1.0104287677283974, 0.017815131195298803, -0.49546346419520415, -0.3013892506542864, -0.21551424479304918, 0.8445174024775916, 0.31786697011362935, -0.007019315991053611, -0.5423717998384502, -0.657384183021466, 0.8532018567598226, 1.7361471799961408, 0.6149760850700317, -0.04564692094484678, -0.10081923940391355, 0.5054415807631121, -0.7890313228391289, 0.039796822936644945, -0.7397065362819297, -0.005086103447723121, 0.22296222405621016, 0.19646895732313757, 0.966983358645547, 0.2304889521581203, -0.24419860161196416], [-0.26871308577882264, 0.007846228255066692, -0.07849862571652591, 0.0, 0.0, 0.0, 0.0, 0.0, -0.007681832638359734, 0.14359544134860375, 0.7349028248653877, -0.029732640550702287, 0.10881756784149316, -0.7779515099883821, -0.15351224714598827, -0.31088924015927644, 0.5984072528379714, -0.5184491466049529, -0.7256366272423438, 0.5030339474127042, -0.0680581495885841, -0.22564527839115023, 0.555969180182984, 0.23035405736079537, 1.6279495857052972, -0.1256468556333562, -0.4199342620605692, -0.2446034853473826, 0.19589649774676554, 0.3814535293765766, -0.8885293516884277, 0.6318138816523013, 0.13918515640760687, 0.9570662531550853, 0.04662827387653765, 0.23031898116562446, 0.8813838942494883, 0.3707274479092101, -0.3188767578915188, -1.0104003652346074], [-0.3479878017526158, -0.0073767543780033015, 0.3140997577834356, 0.0, 0.0, 0.0, 0.0, 0.0, -0.24058026548066033, -0.10327136699080386, -0.5488031623853336, -0.3600911205137401, -0.7607264917012053, -0.29425555911688983, -0.2018617644746851, -0.11926779161694792, -0.19352941890891584, -0.5468038722260676, -0.09179900565560209, -0.15482240727999866, -0.23814144244623633, -0.3139314716895573, -0.04030560954050764, -0.3199654881953965, -0.4679984311707401, -0.3546001235377574, -0.5181653115560131, -0.20755662722840454, -0.36239016308306715, -0.056012007958552476, -0.10456718573008866, -0.40405765877590405, -0.3485948046118698, -0.6184262878739241, -0.4888732598815297, -0.4574953828729879, -0.26925223466144316, -0.5295554740743659, -0.027888861396847025, -0.3076021964338883]], 'bias': [0.11477558603404646, 0.13430208545365732, 0.22410310220448346, -0.3598689716435678, -0.1133118020486212]}

#: all seven tests
FULL_CONF = AnomalyzerConf(
    active_size=2, n_seasons=4,
    methods=("magnitude", "diff", "highrank", "lowrank", "fence", "ks", "cdf"),
    upper_bound=500.0, lower_bound=0.0, perm_count=200,
)

#: the reference's largest documented window: act=2, NSeasons=59 → ref=118
#: (EXAMPLES.md:36, the CPU use case)
WIDE_CONF = AnomalyzerConf(
    active_size=2, n_seasons=59, methods=("magnitude", "fence", "cdf"),
    upper_bound=500.0, lower_bound=0.0,
)
#: one-sided fence — LowerBound NA, the reference's own doc example
#: (/root/reference/anomalyze_test.go:48-68, README.md:45): distance is
#: act_mean/upper_bound instead of the two-sided midpoint form
ONESIDED_CONF = AnomalyzerConf(
    active_size=2, n_seasons=4, methods=("magnitude", "fence", "cdf"),
    upper_bound=500.0, lower_bound=None, sensitivity=0.1,
)

JACCARD_THRESHOLD = 0.05
COSINE_THRESHOLD = 0.35
TOPK = 5
MAX_SHINGLE_FREQ = 1000  # hot-shingle df cap (pre-agg filter, dedup.py)
DUP_SPAN_LEN = 15        # duplicate_spans word-run threshold

#: curation_pipeline knobs (redact -> temperature-mix -> pack)
CURATION_CAP = 96       # tokens per packed chunk
CURATION_SHARDS = 8     # deterministic md5 packing shards
CURATION_ALPHA = 0.5    # temperature flattening exponent

#: pinned literal quality model for the data_pipeline mq_* rider —
#: attests score_quality's compiled sigmoid (training has its own
#: DuckDB-parity pytest; the fit is driver-side NumPy either way).
#: Feature order = quality.FEATURES.
MQ_MODEL = {
    "features": ["log_n_chars", "avg_word_len", "punct_ratio",
                 "digit_ratio", "upper_ratio", "stopword_ratio"],
    "mean": [4.8, 4.4, 0.03, 0.05, 0.04, 0.25],
    "std": [0.9, 0.8, 0.03, 0.06, 0.04, 0.12],
    "weights": [0.9, -0.6, -1.1, -0.8, -0.5, 1.3],
    "bias": -0.2,
}

#: pinned BPE merge table for the data_pipeline pt_* rider. The rules
#: are hierarchical plain-char pairs (plus one unit pair built from an
#: earlier rule), chosen so the lowest-rank-first merge loop is
#: equivalent to applying the rules in rank order everywhere — which a
#: SQL oracle can replay as sequential sentinel replaces over each
#: word's pre-EOW prefix (a plain-char pair can never match the final
#: symbol: it carries the '</w>' marker).
BPE_MERGES = [("t", "h"), ("e", "r"), ("i", "n"), ("th", "e")]
BPE_VOCAB = (["th", "er", "in", "the"]
             + list("abcdefghijklmnopqrstuvwxyz")
             + [c + "</w>" for c in "aeiounrts"])
PT_CAP = 64             # token-exact packing capacity for the rider
RANGE_BUCKET_WIDTH = 16  # range_join quantization bucket

#: per-query tmp roots with an atexit cleanup already registered
_QUERY_TMP_REGISTERED: set = set()


def _query_tmp(name: str) -> str:
    """Fresh per-process tmp root for a query that needs on-disk state
    (streaming checkpoints/stores, persisted indexes). Registered for
    atexit cleanup unconditionally on first use — gating on "dir absent"
    would skip registration when a recycled pid inherits a stale
    leftover, leaking it forever; rmtree on a missing dir is a no-op."""
    import atexit
    import os
    import shutil
    import tempfile

    tmp = os.path.join(
        tempfile.gettempdir(),
        f"anomalyzer_q_{name}_{os.getuid()}_{os.getpid()}")
    if tmp not in _QUERY_TMP_REGISTERED:
        _QUERY_TMP_REGISTERED.add(tmp)
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return tmp


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: all-7-test anomaly detection per event_type on sf0.001."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    return detect(ev, ["event_type"], "ts", "value", FULL_CONF,
                  tiebreak_cols=["event_id"])


# ---------------------------------------------------------------------------
# query implementations (Spark side)
# ---------------------------------------------------------------------------

def _round6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


def q_text_pipeline(spark, sf_dir):
    """Composed text pass — the three round-7 text operators under one
    oracle: ``normalize_text`` (C0/C1 strip + Arrow NFC; the plant below
    prepends DECOMPOSED accents and control bytes to every document so
    normalization does real byte work the hash attests) →
    ``chunk_windows`` (stride-overlap token windows; per-doc chunk count
    + token-coverage sum) → ``tfidf_terms`` (top-3 corpus-aware keywords
    per document, min_doc_freq=2). One row per document:
    (doc_id, n_chunks, sum_chunk_toks, top_terms, top_tfidf). The DuckDB
    oracle replays every stage (nfc_normalize + the same regex class +
    range-windowing + the smoothed tf-idf), so chunk arithmetic, NFC
    bytes, and ranking all sit under the value hash. Registry slot freed
    by retiring detect_det_users: deterministic-method detection on the
    user_id axis is shadowed by detect_full_users (SUPERSET method set,
    same 150 keys/windows/combiner — a deterministic-prob error moves
    its hash) plus detect_bytest_det's per-test deterministic
    prob/weight hashes; the det-methods math keeps four other slots
    (default/onesided/wide/bytest_det)."""
    d = _docs(spark, sf_dir)
    planted = d.select(
        "doc_id",
        F.concat(F.lit("cafe\u0301 \x01"), F.col("text"),
                 F.lit(" A\u030a fin\x7f")).alias("text"))
    # the normalized frame feeds THREE scan legs (chunking + tfidf's two
    # frequency aggregates) — materialize the Arrow NFC stage once
    # (eager localCheckpoint, the dedup-LSH pattern; measured 2.5→2.0 s
    # warm at sf0.1, 3× cold, values unchanged). r15 optimization: the
    # checkpoint stores the TOKENIZED form — the three legs consumed
    # only the word_tokens stream, so each used to re-run the tokenizer
    # regex over the normalized text; now the regex runs once at
    # materialization and the legs window/explode the persisted arrays
    # (tokens_col fast path — identical values by construction).
    from anomalyzer_spark.functions.text import word_tokens as _wt
    norm = text.normalize_text(planted).select(
        "doc_id", _wt(F.col("text")).alias("tokens")) \
        .localCheckpoint(eager=True)
    ch = text.chunk_windows(norm, size=24, stride=12, tokens_col="tokens")
    chstats = ch.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_toks").alias("sum_chunk_toks"))
    tf = text.tfidf_terms(norm, k=3, min_doc_freq=2, tokens_col="tokens")
    top = tf.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "token"))),
                lambda s: s["token"]), " ").alias("top_terms"),
        F.round(F.max(F.when(F.col("rnk") == 1, F.col("tfidf"))), 6)
        .alias("top_tfidf"))
    return chstats.join(top, "doc_id")


def q_detect_bytest_det(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = detect_by_test(ev, ["event_type"], "ts", "value", DET_CONF,
                         tiebreak_cols=["event_id"])
    return _round6(
        out.select("event_type", "n_points", "prob_magnitude", "prob_fence",
                   "prob_cdf", "weight_magnitude", "weight_fence",
                   "weight_cdf", "prob"),
        "prob_magnitude", "prob_fence", "prob_cdf", "prob",
    )


def q_detect_det_onesided(spark, sf_dir):
    """One-sided fence (lower_bound=None == the reference's NA LowerBound)."""
    ev = load_table(spark, sf_dir, "events")
    out = detect(ev, ["event_type"], "ts", "value", ONESIDED_CONF,
                 tiebreak_cols=["event_id"])
    return _round6(out.select("event_type", "n_points", "prob"), "prob")


def q_detect_bytest_full(spark, sf_dir):
    """EvalByTest with ALL SEVEN tests — per-test probabilities and dynamic
    weights including the Monte-Carlo columns (rank merged from
    highrank/lowrank), every one value-hash checked against DuckDB."""
    ev = load_table(spark, sf_dir, "events")
    out = detect_by_test(ev, ["event_type"], "ts", "value", FULL_CONF,
                         tiebreak_cols=["event_id"])
    pcols = ["prob_magnitude", "prob_diff", "prob_rank", "prob_fence",
             "prob_ks", "prob_cdf"]
    wcols = [p.replace("prob_", "weight_") for p in pcols]
    return _round6(
        out.select("event_type", "n_points", *pcols, *wcols, "prob"),
        *pcols, "prob")


def q_detect_wide(spark, sf_dir):
    """Reference's largest documented window (act=2, NSeasons=59)."""
    ev = load_table(spark, sf_dir, "events")
    out = detect(ev, ["event_type"], "ts", "value", WIDE_CONF,
                 tiebreak_cols=["event_id"])
    return _round6(out.select("event_type", "n_points", "prob"), "prob")


def q_detect_default(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = detect(ev, ["event_type"], "ts", "value", DEFAULT_CONF,
                 tiebreak_cols=["event_id"])
    return _round6(out.select("event_type", "n_points", "prob"), "prob")


def q_detect_full(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = detect(ev, ["event_type"], "ts", "value", FULL_CONF,
                 tiebreak_cols=["event_id"])
    return _round6(out.select("event_type", "n_points", "prob"), "prob")


def q_detect_full_users(spark, sf_dir):
    """All 7 tests per user — the Monte-Carlo kernel on the many-keys axis."""
    ev = load_table(spark, sf_dir, "events")
    out = detect(ev, ["user_id"], "ts", "value", FULL_CONF,
                 tiebreak_cols=["event_id"])
    return _round6(out.select("user_id", "n_points", "prob"), "prob")


def _docs(spark, sf_dir):
    """documents spread across cores (single local file → 1 split otherwise)."""
    return load_table(spark, sf_dir, "documents",
                      repartition=spark.sparkContext.defaultParallelism)


def _embs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings",
                   repartition=spark.sparkContext.defaultParallelism)
    return e.withColumn("embedding", F.col("embedding").cast("array<double>"))


def q_text_profile(spark, sf_dir):
    """The full per-document text profile — quality stats, language-ID,
    fingerprint, token counts, and Gopher-style repetition signals — as ONE
    map-only projection (functions/text.py text_profile): five operators,
    one scan, zero shuffles. Replaces the round-2/3 individual queries
    text_stats / lang_id / fingerprint / token_count / repetition (the
    driver's correctness gate records at most 50 queries; the operators are
    unchanged and all their columns are hash-checked here). Round 10 adds
    the per-document SimHash signature (``simhash32`` via
    dedup.simhash_col — the map-only expression the retired ``simhash``
    slot computed; that slot's n_words output stays hashed as this
    profile's ``norm_words``, same normalized-word split) so the rotation
    to semantic_pairs keeps the signature under a driver value hash.

    Round-14 riders (the r13 verdict's top attestation gap — both are
    curate() gates whose thresholds silently reshape corpora): the seven
    Gopher/MassiveText rule metrics + the AND gate
    (quality.gopher_rules, published defaults) ride as ``gph_*``, and
    the C4 line-level cleaner (quality.c4_clean) rides as the cleaned
    text's md5 + kept/dropped/sentence counts + doc gate ``c4_*`` — the
    DuckDB oracle replays every rule (the pytest parity SQL from
    tests/test_gopher_rules.py / test_c4_clean.py, verbatim semantics).
    Per-rule boolean flips on planted violators stay pytest-pinned; the
    value hash here attests the exact metric arithmetic and both gates
    over the fixture corpus. The two extra doc_id joins exist for
    oracle coverage, not as pipeline shape (the FFD-rider precedent)."""
    from anomalyzer_spark.functions import dedup as _dedup
    from anomalyzer_spark.functions import quality as _quality
    d = _docs(spark, sf_dir)
    # round-15 optimization: the r14 rider shape computed gopher_rules
    # and c4_clean as separate map-only frames joined back on doc_id —
    # three corpus scans, a duplicated newline split, and two join
    # exchanges for what is one map-only projection chain. The fused
    # gopher_c4_rules frame carries the raw text through, so the
    # profile itself rides the SAME scan via carry_cols: one scan,
    # zero joins, identical values (the rider expressions are the
    # exact standalone builders).
    gc = _quality.gopher_c4_rules(d).select(
        "doc_id", "text",
        F.col("n_words").alias("gph_n_words"),
        F.col("mean_word_len").alias("gph_mean_word_len"),
        F.col("symbol_word_ratio").alias("gph_symbol_word_ratio"),
        F.col("bullet_line_ratio").alias("gph_bullet_line_ratio"),
        F.col("ellipsis_line_ratio").alias("gph_ellipsis_line_ratio"),
        F.col("alpha_word_ratio").alias("gph_alpha_word_ratio"),
        F.col("n_stop_words").alias("gph_n_stop_words"),
        F.col("gopher_pass").alias("gph_pass"),
        F.md5(F.col("c4_text").cast("binary")).alias("c4_text_md5"),
        F.col("n_lines_kept").alias("c4_lines_kept"),
        F.col("n_lines_dropped").alias("c4_lines_dropped"),
        F.col("n_sentences").alias("c4_sentences"),
        F.col("c4_keep"))
    rider_cols = [c for c in gc.columns if c not in ("doc_id", "text")]
    out = text.text_profile(
        gc, "text", "doc_id",
        extra={"simhash32": _dedup.simhash_col(F.col("text"))},
        carry_cols=rider_cols)
    return out.withColumn("norm_len", F.col("norm_len").cast("long")) \
        .withColumn("ws_tokens", F.col("ws_tokens").cast("long")) \
        .withColumn("lex_tokens", F.col("lex_tokens").cast("long"))


def q_winnow(spark, sf_dir):
    """Winnowing (rolling-hash) fingerprints, one row per fingerprint.

    Round-15 rider: fingerprint_matches (fragment-level near-dup pairs
    over these fingerprints via dedup.shared_value_pairs, min_shared=2)
    collapsed per document as ``fm_pairs`` (pair count involving the
    doc) and ``fm_best`` (max containment overlap), left-joined onto
    the fingerprint rows — the oracle extends the winnow CTE with the
    same self-join + per-doc fold, so the containment join and overlap
    arithmetic sit under the value hash."""
    d = _docs(spark, sf_dir)
    out = text.winnow_fingerprints(d, "text", "doc_id", k=8, window=4)
    fm = text.fingerprint_matches(d.select("doc_id", "text"), min_shared=2)
    per_doc = (
        fm.select(F.col("id_a").alias("doc_id"), "overlap")
        .unionByName(fm.select(F.col("id_b").alias("doc_id"), "overlap"))
        .groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("fm_pairs"),
            F.max("overlap").alias("fm_best")))
    return out.select("doc_id", "n_grams",
                      F.explode("fingerprints").alias("fp")) \
        .join(per_doc, "doc_id", "left")


#: bm25 slot: fixed query set over the fixture vocabulary (several shared
#: terms with varying document frequency, so idf/tf/length-norm all do
#: real work) — inlined as VALUES in the DuckDB oracle.
BM25_QUERIES = [(0, "shuffle merge join"), (1, "stream window batch"),
                (2, "spark filter"), (3, "xyzzy nothing matches this")]
BM25_K = 10


def q_bm25(spark, sf_dir):
    """BM25 top-k lexical retrieval (functions/retrieval.py). Rotated in
    round 9 for exact_dedup, whose surfaces stay attested: the per-group
    state (content-hash grouping, group_size, min-id canonical) is the
    dedup_stream slot's oracle VERBATIM over the same normalization; the
    keep-first filter semantics sit under data_pipeline's and
    curation_pipeline's value hashes; md5 content identity per document
    is hashed by snapshot_diff (both sides); and the retired slot's
    per-document rendering oracle lives verbatim in
    tests/test_functions.py::test_exact_dedup_duckdb_parity.

    Round-12c rider: hybrid-retrieval attestation (retrieval.rrf_fuse
    — the weighted reciprocal-rank fusion of this slot's lexical top-k
    with an exact-cosine vector leg whose query vectors are the
    embeddings of vec_id = query_id). Each bm25 row carries its fused
    (rrf_score, hybrid_rnk) via LEFT join — NULL when the document
    fell out of the fused top-k — so both legs' RANKINGS and the
    fusion arithmetic sit under the value hash; the DuckDB oracle
    recomputes cosine, fusion and the join. Row count is unchanged
    (the all-miss query 3 stays lexical-empty)."""
    from anomalyzer_spark.functions import retrieval
    d = _docs(spark, sf_dir)
    q = spark.createDataFrame(BM25_QUERIES, "query_id long, query string")
    # (measured: the rider's cost is the vector leg's fixture scan, not
    # the lex frame's double consumption — an eager lex checkpoint of the
    # RESULT was tried and bought nothing, so the result stays lazy)
    # r15 optimization: the from-text path ran the tokenizer regex over
    # the corpus TWICE per lap (the staged postings projection + the
    # N/avgdl stats scan). Tokenize once into an eager checkpoint and
    # feed both the scorer (tokens_col) and the stats aggregate from it
    # — the documented persist-once recipe (tokenize_docs /
    # bm25_corpus_stats), parity-pinned identical to the from-text path.
    tk = retrieval.tokenize_docs(d.select("doc_id", "text")) \
        .select("doc_id", "tokens").localCheckpoint(eager=True)
    lex = retrieval.bm25_topk(
        tk, q, k=BM25_K, tokens_col="tokens",
        corpus_stats=retrieval.bm25_corpus_stats(tk, tokens_col="tokens"))
    e = _embs(spark, sf_dir)
    vecq = (e.where(F.col("vec_id") < len(BM25_QUERIES))
            .select("vec_id", "embedding"))
    vec = (similarity.cosine_topk(
        e, vecq, id_col="vec_id", query_id_col="vec_id", k=BM25_K)
        .select(F.col("query_id"), F.col("neighbor_id").alias("doc_id"),
                F.col("rnk")))
    fused = retrieval.rrf_fuse(
        [(lex.select("query_id", "doc_id", "rnk"), 1.0), (vec, 0.7)],
        k=BM25_K).select(
        "query_id", "doc_id", "rrf_score",
        F.col("rnk").cast("long").alias("hybrid_rnk"))
    return lex.join(fused, ["query_id", "doc_id"], "left")


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs with the hot-shingle pre-filter active
    (df(shingle) > MAX_SHINGLE_FREQ dropped BEFORE aggregation — the bound
    that keeps a stop-shingle from OOMing one executor at corpus scale)."""
    d = _docs(spark, sf_dir)
    out = dedup.ngram_jaccard_pairs(d, "text", "doc_id", k=3,
                                    threshold=JACCARD_THRESHOLD,
                                    max_shingle_freq=MAX_SHINGLE_FREQ)
    return out.withColumn("n_a", F.col("n_a").cast("long")).withColumn(
        "n_b", F.col("n_b").cast("long"))


def q_dup_spans(spark, sf_dir):
    """Cross-document exact-substring dedup (dedup.duplicate_spans):
    maximal duplicated word runs >= DUP_SPAN_LEN with the canonical
    occurrence flagged 'keep'. Rotated in round 9 for lineitem_cube,
    whose machinery stays attested: the grouping-sets engine surface
    (Expand, grouping-NULL -> 'ALL' rendering, partial agg through the
    expand) is orders_rollup's slot VERBATIM — CUBE is the same Expand
    with a larger lattice — the lineitem scan + decimal-sum arithmetic
    sit under pricing_summary's and skew_median's value hashes, and the
    retired slot's oracle lives verbatim in
    tests/test_functions.py::test_lineitem_cube_duckdb_parity."""
    d = _docs(spark, sf_dir)
    out = dedup.duplicate_spans(d, "text", "doc_id", min_len=DUP_SPAN_LEN)
    return out.select(
        "doc_id", "kind",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_tokens").cast("long").alias("n_tokens"))


def q_minhash_lsh(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=128,
                                   bands=32, threshold=JACCARD_THRESHOLD)


def q_minhash_stream(spark, sf_dir):
    """Streaming NEAR-dup (MinHash) dedup: documents drained through the
    foreachBatch store pipeline (streaming/minhash_stream.py) in three
    micro-batches; the accumulated pair state must equal the batch
    minhash_lsh_pairs on the same corpus — bucket generation and exact
    verification are the SAME code on both paths, so this query shares the
    batch DuckDB oracle verbatim. Registry slot freed by retiring the
    plain `resample` query (its bucket arithmetic stays value-hash checked
    through resample_stream, which emits the same buckets under the
    watermark cutoff, and through the composed detect_resampled).

    Cost model note (for any timing harness): the streaming drain runs
    EAGERLY here at query-construction time; the returned frame is just
    the pair-store read. Temp state lives under ONE per-process tmp root
    (uid+pid-scoped, wiped on entry, removed at interpreter exit), so
    repeated invocations in a session hold at most one copy on disk while
    CONCURRENT sessions never clobber each other's in-flight store/
    checkpoint (a shared fixed path did exactly that — and a foreign
    leftover checkpoint would silently skip the fresh input as already
    processed)."""
    from anomalyzer_spark.streaming import run_minhash_stream_on_dir

    tmp = _query_tmp("minhash_stream")
    # single-exchange 3-file split (see q_dedup_stream — pair state is
    # batch-split-invariant, so the oracle is untouched)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.repartition(3).write.mode("overwrite").parquet(f"{tmp}/in")
    return run_minhash_stream_on_dir(
        spark, f"{tmp}/in", f"{tmp}/store", f"{tmp}/ckpt",
        "text", "doc_id", k=3, num_hashes=128, bands=32,
        threshold=JACCARD_THRESHOLD, max_files_per_trigger=1)


def q_dedup_groups(spark, sf_dir):
    """Near-dup pairs resolved to connected-component groups (keep-first
    canonicalization) — only docs in a multi-doc group are returned."""
    d = _docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=128,
                                    bands=32, threshold=JACCARD_THRESHOLD)
    groups = dedup.duplicate_groups(d, pairs, "doc_id")
    return groups.where(F.col("group_size") > 1)


def q_cdc_dedup(spark, sf_dir):
    """Content-defined chunking dedup: per-document chunk counts and the
    fraction of chunks shared with any other occurrence in the corpus —
    sub-document dedup that survives insertions (boundaries move with
    content, not byte offsets)."""
    d = _docs(spark, sf_dir)
    ch = dedup.cdc_chunks(d, "text", "doc_id", window=16, divisor=64)
    occ = ch.groupBy("chunk_md5").agg(F.count(F.lit(1)).alias("_occ"))
    return (
        ch.join(occ, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_occ") > 1).cast("long")).alias("n_dup_chunks"),
            F.sum("chunk_len").alias("n_chars"),
        )
        .withColumn("dup_ratio",
                    F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6))
    )


#: semantic_pairs slot: SemDeDup threshold — low enough that the
#: near-uniform fixture embeddings yield a non-trivial pair/group set at
#: every gate scale, high enough that the within-cell candidate set is
#: heavily filtered (idem the cross-engine parity test's setting).
SEM_THRESHOLD = 0.25


def q_semantic_pairs(spark, sf_dir):
    """SemDeDup cluster-blocked embedding dedup (similarity.py
    semantic_pairs + dedup.duplicate_groups): k-means cells as the
    blocker, exact cosine within cells only, connected components over
    the surviving pairs. One row per PAIR, carrying its component's
    group_id/group_size — so cell assignment, pair membership, cosine
    values, AND the CC labels all sit under the driver value hash.
    Rotated in for ``simhash`` (round 10), whose surfaces stay attested:
    the per-document signature is hashed as text_profile's ``simhash32``
    (same dedup.simhash_col expression), its n_words as text_profile's
    ``norm_words`` (same normalized split), the Hamming-banded pair
    machinery is plan- and value-pinned in tests/test_dedup_pairs.py,
    and the retired slot's oracle lives verbatim in
    tests/test_functions.py::test_simhash_duckdb_parity. Quantizer model
    = the ivf_topk slot's exact centroids (same vec_id-sorted sample,
    same NumPy fit) so the oracle inlines one shared literal model."""
    e = _embs(spark, sf_dir)
    sample = e.where(F.col("vec_id") < IVF_SAMPLE_N) \
        .select("vec_id", "embedding").collect()
    cents = _ivf_centroids([(r["vec_id"], r["embedding"]) for r in sample])
    pairs = similarity.semantic_pairs(
        e, id_col="vec_id", vec_col="embedding",
        threshold=SEM_THRESHOLD, n_clusters=IVF_CLUSTERS, centroids=cents)
    # two consumers below (CC edges + the output join): pin the pair job
    # to one run — duplicate_groups checkpoints only its own edge frame.
    pairs = pairs.localCheckpoint(eager=True)
    groups = dedup.duplicate_groups(
        e.select("vec_id"), pairs, "vec_id").where(F.col("group_size") > 1)
    return (
        pairs.join(groups.withColumnRenamed("vec_id", "id_a"), "id_a")
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"),
                "group_id", "group_size")
    )


def q_data_pipeline(spark, sf_dir):
    """Composed LLM-data curation pipeline: exact-dedup keep-first →
    quality filter → language split → corpus stats, extended (round 5)
    with the reproducible-sampling + vocabulary stage so hash_sample and
    text.vocab get DuckDB value-hash coverage without a new registry slot:
    survivors are hash-sampled at 50% (deterministic md5 acceptance window
    — the same sample on any cluster/retry), the sampled sub-corpus builds
    a min_count=2 vocabulary (term + doc frequencies), and each language
    row carries its sampled-doc count plus the corpus-level vocab summary
    (size, doc-freq mass, top token by term_freq with lexicographic
    tiebreak). One declarative plan — scan → map stages → three small
    aggregations.

    Round-15 riders: ``mq_avg``/``mq_hi`` attest quality.score_quality's
    compiled sigmoid over the pinned MQ_MODEL literals (per-language
    decimal-exact mean of round-6 scores + the >= 0.5 keep count), and
    the corpus-level ``pt_*`` columns attest the bpe_encode(BPE_MERGES)
    -> bpe_ids(BPE_VOCAB) -> pack_token_ids(PT_CAP) lane: chunk/id/doc
    counts, a position-weighted id checksum, the OOV count, and the
    span-length round-trip mismatch count. The oracle replays BPE as
    rank-ordered sentinel replaces over each word's pre-EOW prefix
    (valid for the pinned hierarchical merge table), the vocab lookup,
    and the full shard/cumsum/slice/assembly packing arithmetic."""
    from anomalyzer_spark.functions import sampling

    d = _docs(spark, sf_dir)
    keep = dedup.exact_dedup(d, "text", "doc_id").where(
        ~F.col("is_duplicate")).select("doc_id")
    stats = text.text_stats(d, "text", "doc_id")
    langs = text.lang_id(d, "text", "doc_id").select("doc_id", "lang_pred")
    surv = (
        d.join(keep, "doc_id", "left_semi")
        .join(stats, "doc_id")
        .join(langs, "doc_id")
        .where(F.col("quality_score") >= 0.4)
        # surv feeds FIVE legs (per-lang agg, sample counts, vocab, LM
        # training, LM scoring) — materialize the join/filter pyramid
        # once (same trade as text_pipeline's NFC checkpoint)
        .localCheckpoint(eager=True)
    )
    per_lang = surv.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens")).alias("total_tokens"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(10,6)"))
            .cast("double") / F.count(F.lit(1)), 6).alias("avg_quality"),
    )
    samp = sampling.hash_sample(surv, 0.5, "doc_id", seed=42)
    samp_counts = samp.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_sample_docs"))
    voc = text.vocab(samp.select("doc_id", "text"), "text", "doc_id",
                     min_count=2)
    vstats = voc.agg(
        F.count(F.lit(1)).alias("sample_vocab_size"),
        F.sum("doc_freq").alias("sample_df_sum"))
    vtop = (voc.orderBy(F.col("term_freq").desc(), F.col("token").asc())
            .limit(1)
            .select(F.col("token").alias("sample_top_token"),
                    F.col("term_freq").alias("sample_top_tf")))
    # round-7 stage: self-trained bigram-LM perplexity of the sampled
    # sub-corpus, meaned per language (decimal-exact, like avg_quality) —
    # puts ngram_lm's training counts, smoothing, and scoring joins under
    # this slot's value hash without spending a new registry slot.
    from anomalyzer_spark.functions import ngram_lm
    lm = ngram_lm.train_bigram_lm(samp)
    ppl = ngram_lm.perplexity(samp, lm)
    ppl_lang = (
        samp.select("doc_id", "lang_pred").join(ppl, "doc_id")
        .where(F.col("ppl").isNotNull())
        .groupBy("lang_pred").agg(
            F.round(
                F.sum(F.col("ppl").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)), 6).alias("avg_sample_ppl")))
    # round-9 stage: epoch-aware mixture over the survivor languages
    # (alpha=0.3 temperature flattening in TOKEN space, default budget =
    # pure re-mix) — puts mixture_plan's share/epoch arithmetic AND
    # apply_mixture_plan's epoch replication + salted md5 fractional
    # window under this slot's value hash without a new registry slot.
    mplan = sampling.mixture_plan(surv, "lang_pred", alpha=0.3,
                                  token_col="n_tokens")
    mixed = sampling.apply_mixture_plan(surv, mplan, "lang_pred")
    mix_counts = mixed.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_mixed_rows"))
    plan_cols = mplan.select(
        F.col("domain").alias("lang_pred"),
        F.col("epochs").alias("mix_epochs"),
        F.col("planned_tokens").alias("mix_planned_tokens"))
    # round-15 stage 1: the PINNED-literal quality model (MQ_MODEL)
    # scored over the survivors by quality.score_quality — the compiled
    # standardize->dot->sigmoid column expression — meaned per language
    # (decimal-exact over round-6 scores) plus the >= 0.5 keep count,
    # so the model-based filter's scores sit under the value hash.
    from anomalyzer_spark.functions import quality as _quality
    mq = _quality.score_quality(surv.select("doc_id", "text"), MQ_MODEL)
    mq_lang = (
        surv.select("doc_id", "lang_pred").join(mq, "doc_id")
        .groupBy("lang_pred").agg(
            F.round(
                F.sum(F.round(F.col("model_score"), 6)
                      .cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)), 6).alias("mq_avg"),
            F.sum((F.round(F.col("model_score"), 6) >= 0.5)
                  .cast("long")).alias("mq_hi")))
    # round-15 stage 2: BPE tokenize (pinned BPE_MERGES) -> vocab-id map
    # (bpe_ids over BPE_VOCAB, OOV = -1) -> TOKEN-EXACT packing
    # (pack_token_ids, capacity PT_CAP). Corpus-level rider columns:
    # chunk/id/doc counts, a position-weighted id checksum (order- and
    # value-sensitive), the OOV count, and the round-trip mismatch
    # count (docs whose packed span lengths don't sum to their encoded
    # n_tokens — 0 unless packing drops or duplicates ids).
    from anomalyzer_spark.functions import bpe as _bpe
    from anomalyzer_spark.functions import packing
    enc = _bpe.bpe_encode(samp.select("doc_id", "text"), BPE_MERGES)
    # the encode (Arrow/Python) and the packed chunks each feed TWO
    # legs (stats + round-trip) — materialize once each, so the BPE
    # pass and the packing assembly run once, not per leg
    ids = _bpe.bpe_ids(enc, BPE_VOCAB) \
        .select("doc_id", "token_ids", "n_tokens") \
        .localCheckpoint(eager=True)
    pk = packing.pack_token_ids(
        ids.select("doc_id", "token_ids"), PT_CAP, n_shards=8, seed=42) \
        .localCheckpoint(eager=True)
    pos_sum = F.aggregate(
        F.zip_with(F.col("input_ids"),
                   F.sequence(F.lit(1), F.size("input_ids")),
                   lambda v, j: v.cast("long") * j.cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    ptstats = pk.agg(
        F.count(F.lit(1)).alias("pt_chunks"),
        F.sum(F.size("input_ids")).cast("long").alias("pt_ids"),
        F.sum("n_docs").cast("long").alias("pt_docs"),
        F.sum(pos_sum).alias("pt_pos_sum"),
        F.sum(F.size(F.filter("input_ids", lambda x: x == -1)))
        .cast("long").alias("pt_oov"))
    span_len = (
        pk.select(F.explode("doc_spans").alias("s"))
        .select(F.col("s.doc_id").alias("doc_id"),
                (F.col("s.end") - F.col("s.start")).alias("l"))
        .groupBy("doc_id").agg(F.sum("l").alias("_sl")))
    rt = (ids.select("doc_id", "n_tokens")
          .join(span_len, "doc_id", "left")
          .agg(F.sum((F.coalesce(F.col("_sl"), F.lit(0))
                      != F.col("n_tokens")).cast("long"))
               .alias("pt_rt_bad")))
    # round-15 stage 3: the one-row corpus DATASHEET (text.corpus_card
    # over the raw corpus, trusted lang column) as cc_* columns —
    # volumes, exact-dup rate, dominant language, decimal-exact avg
    # quality, exact percentiles all under the value hash.
    cc = text.corpus_card(d, lang_col="lang").select(
        F.col("n_docs").alias("cc_n_docs"),
        F.col("n_tokens").alias("cc_n_tokens"),
        F.col("n_chars").alias("cc_n_chars"),
        F.col("dup_rate").alias("cc_dup_rate"),
        F.col("top_lang").alias("cc_top_lang"),
        F.col("top_lang_share").alias("cc_top_lang_share"),
        F.col("avg_quality").alias("cc_avg_quality"),
        F.col("p50_chars").alias("cc_p50_chars"),
        F.col("p90_chars").alias("cc_p90_chars"))
    return (
        per_lang.join(samp_counts, "lang_pred", "left")
        .na.fill({"n_sample_docs": 0})
        .join(ppl_lang, "lang_pred", "left")
        .join(plan_cols, "lang_pred", "left")
        .join(mix_counts, "lang_pred", "left")
        .na.fill({"n_mixed_rows": 0})
        .join(mq_lang, "lang_pred", "left")
        .crossJoin(F.broadcast(vstats))
        .crossJoin(F.broadcast(vtop))
        .crossJoin(F.broadcast(ptstats))
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(cc))
    )


def q_cosine_topk(spark, sf_dir):
    e = _embs(spark, sf_dir)
    out = similarity.cosine_topk(
        e, e.where(F.col("vec_id") < 20), id_col="vec_id",
        vec_col="embedding", query_id_col="vec_id", k=TOPK)
    return _round6(out.withColumn("rnk", F.col("rnk").cast("long")), "cos_sim")


def q_emb_dedup_groups(spark, sf_dir):
    """SEMANTIC near-duplicate groups (functions/similarity.py
    embedding_dedup_groups): LSH-bucketed cosine pairs (the 100 TB
    candidate path — a band-bucket equi-join, never a cartesian product;
    exact cosine verified on candidates only) resolved to connected
    components via edge-scoped min-label propagation + pointer jumping.
    Output is integer-only (id, min-id group canonical, component size),
    cross-checked against a DuckDB WITH RECURSIVE transitive closure over
    the identical pair set. Replaced the round-6 ``cosine_pairs`` slot:
    the same cosine_pairs call (same seed-7 LSH config, same threshold)
    feeds both this query and ``emb_pipeline``, so raw-pair values stay
    attested through those oracles while the component resolution gains
    driver coverage."""
    e = _embs(spark, sf_dir)
    out = similarity.embedding_dedup_groups(
        e, id_col="vec_id", vec_col="embedding", threshold=COSINE_THRESHOLD,
        use_lsh=True, n_planes=16, bands=4, dim=64, seed=7)
    return out


def q_range_join(spark, sf_dir):
    """Bucket-quantized range join (operators/range_join.py): points land
    in the intervals containing them via ONE explode + ONE equi-join on
    the quantized bucket + a post-filter — never a cartesian/theta join,
    which is the plan Spark itself picks for a bare ``pt >= s AND pt < e``
    condition and the 100 TB scale-killer. The oracle IS that theta join
    (DuckDB runs it fine at sf0.01), so the value hash proves the bucket
    arithmetic loses and invents nothing. Points derive from lineitem
    line numbers, intervals from orders — arbitrary-overlap integer
    geometry off the driver's own fixtures."""
    from anomalyzer_spark.operators import range_join as rj
    # the probe side's heavy work (broadcast lookup + range post-filter)
    # runs where the scan splits land; the sf fixtures are ONE row group,
    # so spread the probe rows across cores first (the _docs pattern — a
    # local-split adapter, not part of the 100 TB plan, where real file
    # counts parallelize the scan natively). Measured 1.2 s -> 0.67 s.
    li = load_table(spark, sf_dir, "lineitem",
                    repartition=spark.sparkContext.defaultParallelism).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pt"),
        "l_orderkey", "l_linenumber")
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") * 9).alias("s"),
        (F.col("o_orderkey") * 9 + F.pmod(F.col("o_orderkey"), F.lit(40))
         + F.lit(5)).alias("e"))
    out = rj.range_join_points(li, od, "pt", "s", "e",
                               bucket_width=RANGE_BUCKET_WIDTH)
    return out.select("l_orderkey", "l_linenumber", "o_orderkey",
                      "pt", "s", "e")


#: deterministic PII enrichment for q_curation_pipeline: the fixture
#: corpus carries no PII-shaped spans, so both engines append the same
#: doc_id-derived email/url/ipv4 tokens — redaction then has real work on
#: every row and its effect flows through token counts into the packing
#: arithmetic (all downstream values shift if redaction drifts).
def _curation_text() -> F.Column:
    did = F.col("doc_id").cast("string")
    return F.concat_ws(
        " ", F.col("text"),
        F.concat(F.lit("user"), did, F.lit("@mail"),
                 F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
                 F.lit(".com")),
        F.concat(F.lit("http://s"),
                 F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
                 F.lit(".example/p/"), did),
        F.concat(F.pmod(F.col("doc_id"), F.lit(200)).cast("string"),
                 F.lit("."),
                 F.pmod(F.col("doc_id") * 3, F.lit(200)).cast("string"),
                 F.lit(".8.24")),
    )


def _curation_pipeline_core(spark, sf_dir):
    """Composed curation pass — the three round-6 curation operators under
    one oracle: ``redact_pii`` (map-only chained regexp_replace + per-kind
    match counts) -> ``temperature_sample`` (alpha=0.5 language
    rebalancing: one bounded per-domain aggregate, then the deterministic
    md5 acceptance window — no corpus shuffle) -> ``pack_chunks``
    (md5-sharded concat-and-chunk packing, one exchange on the shard key).
    Output rows are the packed chunks of the sampled redacted corpus with
    language + PII-count provenance: the DuckDB oracle recomputes every
    stage (including the temperature rates, in SQL) so the value hash
    attests redaction bytes, sampling membership, and chunk arithmetic
    at once."""
    from anomalyzer_spark.functions import packing, sampling
    d = _docs(spark, sf_dir)
    enriched = d.select("doc_id", "lang", _curation_text().alias("text"))
    # provenance (lang, PII counts) CARRIES through each stage — no
    # corpus×corpus join to re-attach it afterwards: the whole pipeline
    # is map-only until pack_chunks' single shard exchange (plus the
    # bounded per-language count aggregate temperature_sample runs).
    red = text.redact_pii(enriched, with_counts=True, carry_cols=["lang"])
    cur = red.withColumn(
        "n_pii",
        (F.col("n_email") + F.col("n_url") + F.col("n_ipv4")
         + F.col("n_phone")).cast("long"))
    samp = sampling.temperature_sample(cur, CURATION_ALPHA, "lang")
    return _curation_pack(samp), samp


def _curation_pack(samp, length_col=None):
    """The pack stage of the curation pipeline over a sampled frame —
    split out (r15) so the registry slot can re-run it over the eager
    checkpoint of ``samp`` instead of re-deriving the redact+sample
    pyramid a second time (the core keeps its lazy one-scan shape for
    the plan pin; values are identical either way). ``length_col``: a
    pre-computed ``size(word_tokens(text))`` column — the slot's
    text-free checkpoint path."""
    from anomalyzer_spark.functions import packing
    out = packing.pack_chunks(samp, CURATION_CAP,
                              length_col=length_col,
                              n_shards=CURATION_SHARDS, seed=42,
                              carry_cols=["lang", "n_pii"])
    return out.select("shard", "chunk_id", "doc_id", "lang", "n_pii",
                      "n_toks", "start_tok", "chunk_tok_start",
                      "chunk_tok_end")


def q_curation_pipeline(spark, sf_dir):
    """See _curation_pipeline_core (the one-scan/no-join pipeline shape,
    plan-pinned in tests/test_plans.py) — this slot wraps it with the
    round-10 FFD attestation rider (the ngram_lm-inside-data_pipeline
    precedent): the FFD whole-document packer was the last packing
    surface with only pytest parity, so its per-document bin assignment
    over the SAME sampled corpus/shards rides this slot's value hash as
    (ffd_bin, ffd_oversize), with the oracle replaying FFD via a DuckDB
    recursive CTE carrying the per-shard bin-fill list. Production
    callers use the operators separately; the extra pass + doc_id join
    exist for oracle coverage, not as pipeline shape.

    Round-14 riders (closing the r12-family attestation gap — the
    curate() knobs that change WHICH documents survive): ``nq_lang`` is
    quality.normalize_scores' grouped percent_rank (the
    normalize_quality_by path — domain-fair ranking of the sampled
    docs' redacted-text length within each lang), and ``split`` is
    sampling.split_train_eval's hash-window label (the eval_fraction
    path: seed 7, eval_fraction 0.25 over doc_id — the md5 _hash48
    window). The oracle recomputes the percent_rank and the hash
    threshold, so the survivor ranking and the split membership both
    sit under the value hash at both sf.

    Round-15 riders (closing the last curate()-reachable
    corpus-reshaping gap — the knobs that decide WHICH documents
    survive, previously pytest-only): over the same sampled corpus
    scored by redacted-text length, ``tf_keep`` is
    sampling.select_top_fraction(0.35) membership (exact histogram
    threshold + residual md5 acceptance window), ``kb_keep`` is
    dedup.keep_best membership over deterministic synthetic duplicate
    groups (even doc_ids share mod-50 groups, odd doc_ids are
    singletons — so BOTH the winner-per-group window and the untouched
    anti-join path are exercised), and ``cs_keep`` is
    sampling.cap_stratum_share(0.3, per lang) membership (input token
    total -> truncated budget -> per-stratum hash-order greedy
    prefix). The oracle replays the histogram/threshold walk, the
    group window, and the budget cumsum in SQL, so all three survivor
    sets sit under the value hash at both sf."""
    from pyspark.sql.window import Window

    from anomalyzer_spark.functions import dedup as _dedup
    from anomalyzer_spark.functions import packing
    from anomalyzer_spark.functions import quality as _quality
    from anomalyzer_spark.functions import sampling as _sampling
    from anomalyzer_spark.functions.text import word_tokens
    _, samp_full = _curation_pipeline_core(spark, sf_dir)
    # the rider legs fan out SIX reads of the sampled corpus (FFD,
    # nq_lang, split, and the r15 tf/kb/cs knobs) — materialize samp
    # once with an eager localCheckpoint so the full slot still scans
    # the corpus exactly ONCE; without this the knob riders re-derived
    # the redact+sample pyramid per leg (12 corpus scans — the pin
    # caught it in-round). r15 optimizations: (a) the pack stage ALSO
    # runs over the checkpoint now — the previous shape scanned the
    # corpus once in the final plan AND once in the eager checkpoint
    # materialization, i.e. the redact regex pyramid ran twice per
    # invocation; (b) the checkpoint is TEXT-FREE — every downstream
    # consumer needs only scalars (the packers' token count, the score
    # legs' byte length), so those are computed once in the checkpoint
    # projection (the packers' exact n_toks expression via length_col,
    # identical values) instead of shipping the full redacted text to
    # seven consumers. The core keeps its lazy one-scan plan for the
    # pin; this slot's plan reads only ExistingRDD.
    # r16: compact_checkpoint — the scalars-only checkpoint inherits the
    # corpus scan's split count (32 partitions for a few thousand rows),
    # so every rider leg paid a stage of 32 near-empty tasks per
    # exchange; the partition count now derives from the checkpoint's
    # measured bytes (guide §2.5 scale-adaptive partitioning; measured
    # kb 0.83→0.50 s, cs 1.12→0.33 s isolated). Consumers are joins/
    # windows/aggregates over scalars — exactly compact_checkpoint's
    # light-per-row contract.
    samp = compact_checkpoint(samp_full.select(
        "doc_id", "lang", "n_pii",
        F.size(word_tokens(F.col("text"))).cast("long").alias("_n_toks"),
        F.length("text").alias("_q"),
    ))
    out = _curation_pack(samp, length_col="_n_toks")
    bins = packing.pack_bins_ffd(samp, CURATION_CAP,
                                 length_col="_n_toks",
                                 n_shards=CURATION_SHARDS, seed=42)
    nq = _quality.normalize_scores(
        samp.select("doc_id", "lang", F.col("_q").alias("q")),
        "q", id_col="doc_id", group_col="lang", out_col="nq_lang"
    ).select("doc_id", "nq_lang")
    sc = samp.select("doc_id", "lang",
                     F.col("_q").cast("double").alias("q"))
    tf = _sampling.select_top_fraction(sc, "q", 0.35) \
        .select("doc_id", F.lit(True).alias("tf_keep"))
    gid = F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") % 50) \
        .otherwise(F.col("doc_id") + 1000000)
    groups = sc.select("doc_id", gid.alias("group_id")).withColumn(
        "group_size", F.count(F.lit(1)).over(
            Window.partitionBy("group_id")))
    kb = _dedup.keep_best(sc, groups, "q") \
        .select("doc_id", F.lit(True).alias("kb_keep"))
    cs = _sampling.cap_stratum_share(sc, 0.3, "lang", "q") \
        .select("doc_id", F.lit(True).alias("cs_keep"))
    acc = out.join(
        bins.select(
            "doc_id", F.col("bin_id").alias("ffd_bin"),
            F.col("oversize").alias("ffd_oversize")),
        "doc_id",
    ).join(nq, "doc_id") \
     .join(tf, "doc_id", "left").join(kb, "doc_id", "left") \
     .join(cs, "doc_id", "left")
    # the split label is a pure function of doc_id (md5 _hash48 window),
    # so the r14 rider's separate (doc_id, split) frame + inner join was
    # a join for a map-only column — apply the SAME library call to the
    # joined frame instead (r15; values identical, one exchange fewer).
    # The dropped inner join filtered nothing: every packed chunk's
    # doc_id comes from samp.
    return _sampling.split_train_eval(acc, 0.25, "doc_id", seed=7) \
     .select("shard", "chunk_id", "doc_id", "lang", "n_pii",
             "n_toks", "start_tok", "chunk_tok_start",
             "chunk_tok_end", "ffd_bin", "ffd_oversize",
             "nq_lang", "split",
             F.coalesce("tf_keep", F.lit(False)).alias("tf_keep"),
             F.coalesce("kb_keep", F.lit(False)).alias("kb_keep"),
             F.coalesce("cs_keep", F.lit(False)).alias("cs_keep"))


# (q_lsh_topk retired round 9 for q_quality_checks: the hyperplane-LSH
# machinery — signatures, band buckets, candidate equi-join — stays
# slot-attested through emb_dedup_groups/emb_pipeline (same seed-7
# config), and the top-k ranking window through cosine_topk/ivf_topk;
# lsh_topk keeps full DuckDB parity in tests/test_functions.py.)


IVF_SAMPLE_N = 256   # quantizer training sample: vec_id < IVF_SAMPLE_N
IVF_CLUSTERS = 8
IVF_PROBE = 3
PQ_M = 8             # product-quantization subspaces (64-dim → 8 x 8)
PQ_K = 16            # centroids per subspace (codes fit in 4 bits)
IVFPQ_REFINE = 10    # quantized-refine lane: re-rank top-10 ADC candidates


def _ivf_centroids(rows) -> list[list[float]]:
    """Shared centroid fit for query + oracle: deterministic NumPy Lloyd
    over the vec_id-sorted sample (similarity.train_ivf_centroids)."""
    import numpy as np
    rows = sorted(rows, key=lambda r: r[0])
    return similarity.train_ivf_centroids(
        np.asarray([r[1] for r in rows], dtype=np.float64), IVF_CLUSTERS)


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k. The coarse quantizer trains on a bounded,
    deterministic SAMPLE (vec_id < IVF_SAMPLE_N) collected to the driver —
    the standard scale shape: the index model is tiny and broadcasts as
    plan literals; only the sample, never the corpus, leaves the executors.
    The DuckDB oracle reruns the identical NumPy fit on the same sample."""
    e = _embs(spark, sf_dir)
    sample = e.where(F.col("vec_id") < IVF_SAMPLE_N) \
        .select("vec_id", "embedding").collect()
    cents = _ivf_centroids([(r["vec_id"], r["embedding"]) for r in sample])
    out = similarity.ivf_topk(
        e, e.where(F.col("vec_id") < 20), id_col="vec_id",
        vec_col="embedding", query_id_col="vec_id", k=TOPK,
        n_clusters=IVF_CLUSTERS, n_probe=IVF_PROBE, centroids=cents)
    return _round6(out.withColumn("rnk", F.col("rnk").cast("long")), "cos_sim")


def q_skew_median(spark, sf_dir):
    """Exact per-key median under heavy key skew: lineitem has only 3
    l_returnflag groups, so sort-based exact percentile buffers a third of
    the table per task; the counting rewrite (operators/skew.py) shuffles
    by (key, value) and selects by cumulative rank — per-task state is the
    distinct-value count, not the row count."""
    from anomalyzer_spark.operators.skew import skewsafe_median
    li = load_table(spark, sf_dir, "lineitem")
    return skewsafe_median(li, ["l_returnflag"], "l_quantity",
                           out_col="median_qty")


def q_sketch_stats(spark, sf_dir):
    """Approximate sketches (SURVEY §2.7): HyperLogLog distinct counting +
    GK-sketch percentile per order priority. Cross-engine contract: the HLL
    estimate is engine-specific, so the query emits the EXACT distinct
    count plus a boolean asserting the sketch landed within 4x its
    documented rsd (0.05) — deterministic for fixed data; the GK percentile
    is run with accuracy >= group size, where the sketch returns an exact
    data element that DuckDB's quantile_disc reproduces.
    (functions-local import below, the house convention for slot-scoped
    dependencies.)

    Round-12c riders (the audio_subfp precedent — value-hash attest the
    MERGEABLE sketch stack, functions/sketch.py, which unlike the
    builtins is engine-portable BY CONSTRUCTION): ``hll_reg_fold`` /
    ``hll_occupied`` fold the o_custkey HLL register frame (p=12,
    md5-derived 60-bit hash, integer-exact smear rank) into an
    order-independent integer — DuckDB recomputes every register and
    the same fold, so one flipped bit in any register misses the hash;
    ``mg_fold`` replays the o_orderpriority Misra–Gries summary (k=3:
    exact counts, (k+1)-th-largest threshold with the value-asc
    tiebreak, subtraction, survivors + off + n) as a canonical string
    md5. Riders are constant per row; ``materialize=False`` keeps the
    slot lazy (the checkpoint default exists for corpus-scale counts
    frames, not a 5-key column).

    Round-13 rider: ``kll_fold`` + ``kll_p50``/``kll_p99`` attest the
    mergeable KLL quantile profile (sketch.kll_profile, k=32, over
    o_totalprice): the DuckDB twin replays the whole batch build —
    distinct-value cumulative ranks, j = ceil(log2(ceil(n/k))), the
    md5-coin stride offset, modular survivor counts — then folds the
    survivor rows (item in exact cents) + (n, err) into a canonical
    md5 and re-derives the p50/p99 elements from ITS replayed profile,
    so one wrong survivor count or a drifted coin misses the hash.

    Round-13 second rider: ``bk_fold`` attests the bottom-k (KMV)
    coordinated sample (sketch.bottomk_profile, k=16, over o_custkey) —
    the DuckDB twin recomputes every member's 60-bit "bk|" hash and the
    k-smallest cut, folded to a canonical md5 of "h=key" pairs.

    Round-14 rider: ``ks2_stat``/``ks2_bound`` attest the KS-from-
    profiles drift comparator (drift.ks_from_profiles — two kilobyte
    KLL profiles, never corpora): o_totalprice profiled per o_orderkey
    parity half (k=32), the per-item pre-aggregated ECDF fold and the
    deterministic error radius replayed end-to-end in DuckDB (two full
    batch-build replays + the cumulative |d| max), so a tie-handling or
    bound regression misses the hash."""
    from anomalyzer_spark.functions import drift as _drift
    from anomalyzer_spark.functions import sketch

    o = load_table(spark, sf_dir, "orders")
    # two aggregations joined on the tiny key, NOT one: mixing
    # count_distinct with non-distinct sketches triggers the expand-based
    # distinct rewrite, which builds the percentile sketch once per
    # (key, custkey) pre-group — measured 20x slower than two passes.
    sk = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.approx_count_distinct("o_custkey").alias("_apx"),
        F.percentile_approx("o_totalprice", 0.5, 100000)
        .alias("p50_totalprice"),
    )
    ex = o.groupBy("o_orderpriority").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_cust_exact"))
    hll_row = (sketch.hll_profile(o.select("o_custkey"), ["o_custkey"],
                                  p=12)
               .agg(F.sum(F.col("reg") * F.lit(1000003) + F.col("rho"))
                    .cast("long").alias("hll_reg_fold"),
                    F.count(F.lit(1)).alias("hll_occupied")))
    mg_row = (sketch.mg_profile(o, ["o_orderpriority"], k=3,
                                materialize=False)
              .agg(F.md5(F.concat_ws(
                  "|",
                  F.concat_ws(",", F.sort_array(F.collect_list(
                      F.when(F.col("key").isNotNull(), F.concat_ws(
                          "=", F.col("key"), F.col("cnt")))))),
                  F.max("off"), F.max("n")).cast("binary"))
                  .alias("mg_fold")))
    kprof = sketch.kll_profile(
        o.select("o_totalprice"), ["o_totalprice"], k=32)
    kll_row = kprof.agg(
        F.md5(F.concat_ws(
            "|",
            F.concat_ws(",", F.sort_array(F.collect_list(
                F.when(F.col("item").isNotNull(), F.concat_ws(
                    "=", F.col("level"),
                    F.round(F.col("item") * 100).cast("long"),
                    F.col("cnt")))))),
            F.max("n"), F.max("err")).cast("binary")).alias("kll_fold"))
    kq_row = sketch.kll_quantiles(kprof, [0.5, 0.99]).agg(
        F.max(F.when(F.col("q") == 0.5, F.col("value"))).alias("kll_p50"),
        F.max(F.when(F.col("q") == 0.99, F.col("value"))).alias("kll_p99"))
    bk_row = (sketch.bottomk_profile(o.select("o_custkey"), ["o_custkey"],
                                     k=16)
              .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(
                  F.concat_ws("=", F.col("h"), F.col("key")))))
                  .cast("binary")).alias("bk_fold")))
    pa = sketch.kll_profile(
        o.where(F.col("o_orderkey") % 2 == 0).select("o_totalprice"),
        ["o_totalprice"], k=32)
    pb = sketch.kll_profile(
        o.where(F.col("o_orderkey") % 2 == 1).select("o_totalprice"),
        ["o_totalprice"], k=32)
    ks_row = _drift.ks_from_profiles(pa, pb).select(
        F.col("ks_stat").alias("ks2_stat"),
        F.col("ks_bound").alias("ks2_bound"))
    return (sk.join(ex, "o_orderpriority")
            .crossJoin(F.broadcast(hll_row))
            .crossJoin(F.broadcast(mg_row))
            .crossJoin(F.broadcast(kll_row))
            .crossJoin(F.broadcast(kq_row))
            .crossJoin(F.broadcast(bk_row))
            .crossJoin(F.broadcast(ks_row))
            .select(
                "o_orderpriority", "n_orders", "n_cust_exact",
                (F.abs(F.col("_apx") - F.col("n_cust_exact"))
                 / F.col("n_cust_exact") <= 0.2).alias("hll_within_bound"),
                "p50_totalprice",
                "hll_reg_fold", "hll_occupied", "mg_fold",
                "kll_fold", "kll_p50", "kll_p99", "bk_fold",
                "ks2_stat", "ks2_bound",
            ))


def _pq_codebooks(rows) -> list[list[list[float]]]:
    """Shared PQ codebook fit for query + oracle (vec_id-sorted sample,
    deterministic per-subspace NumPy Lloyd)."""
    import numpy as np
    rows = sorted(rows, key=lambda r: r[0])
    return similarity.train_pq_codebooks(
        np.asarray([r[1] for r in rows], dtype=np.float64), m=PQ_M, k=PQ_K)


PCA_K = 4


def _pca_model(rows) -> dict:
    """Shared PCA fit for query + oracle (same vec_id-sorted bounded
    sample as the IVF/PQ models; projection.train_pca is bit-deterministic
    so both engines compile identical 6-decimal literals)."""
    import numpy as np

    from anomalyzer_spark.functions import projection
    rows = sorted(rows, key=lambda r: r[0])
    return projection.train_pca(
        np.asarray([r[1] for r in rows], dtype=np.float64), PCA_K)


def q_dedup_paragraphs(spark, sf_dir):
    """Paragraph-level boilerplate removal (dedup.dedup_paragraphs): every
    fixture document gains its SOURCE's footer sentence (fixture sentences
    are unique across documents, so without the plant the pass would match
    trivially with zero drops), then any '. '-separated span appearing in
    >= 2 distinct documents is stripped and each document is rebuilt from
    its surviving spans in original order. The oracle replays the whole
    pass in DuckDB (explode → md5-keyed document-frequency → rebuild), so
    the value hash attests reconstructed BYTES, not just counts. Registry
    slot freed by retiring pq_topk: the PQ model — same bounded-sample
    codebook fit, map-only encode, ADC lookup-table scoring — is hashed
    end-to-end inside ivfpq_topk's composed oracle, and the exact-scan
    baseline it differed by is cosine_topk; only the 'PQ without IVF
    pruning' plan shape was unique, which tests/test_plans.py still pins.

    r16: the doc spread is input-size-derived (sources.spread_partitions)
    instead of the core count — this slot's per-byte map work (explode +
    md5) is cheap, and 32 micro-tasks over 0.7 MB measured 40 cpu_s/lap
    of concurrency overhead vs 8 on byte-sized partitions, identical
    results (the CPU-heavy doc consumers keep the core-count spread —
    fewer partitions would idle cores on real kernel work)."""
    d = load_table(spark, sf_dir, "documents",
                   repartition=spread_partitions(
                       spark, f"{sf_dir}/documents.parquet"))
    planted = d.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(". footer for "), F.col("source"),
                 F.lit(" site")).alias("text"))
    return dedup.dedup_paragraphs(planted, max_df=2, sep=". ")


def q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composed production index (similarity.ivfpq_topk): IVF cell
    pruning decides WHICH rows are scored (each query probes its
    IVF_PROBE nearest coarse cells), PQ codes decide WHAT is scored (ADC
    lookup tables over m-byte codes — floats never touched at search
    time), through ONE cell equi-join. Both models fit on the same
    bounded vec_id-sorted sample as ivf_topk/pq_topk; the DuckDB oracle
    re-fits them identically and replays cell assignment + encoding +
    ADC scoring, so the composed index is value-hash checked end to end.
    Registry slot freed by retiring detect_det (fully shadowed by
    detect_bytest_det's per-test prob/weight hashes over the same conf
    and key).

    Round 7: the query runs the FULL production path, not the one-shot
    recompute — the corpus is STREAM-ingested into the cell-partitioned
    store with the frozen models (ann_index.ingest_ivfpq_stream,
    per-batch idempotent overwrite), compacted into the canonical
    ``cell=C`` layout (compact_ingested_index), and searched with the
    partition-pruned ``cell IN`` probe scan (search_ivfpq_index). The
    oracle is unchanged (cell assignment + PQ encode + ADC scoring are
    functions of models + vectors only), so a green hash attests
    ingest → compact → search end to end, not just the math.

    Round 13: the index is now ingested WITH the int8 storage tier
    (quantized_refine=True — absmax scale + tinyint codes of the full
    vector ride each index row through ingest and compaction), and a
    second lane searches it with ``refine_source="quantized"``: the
    top-10 ADC candidates re-rank by exact cosine over vectors
    DEQUANTIZED FROM THE PRUNED INDEX (no float-corpus access at serve
    time). The lane full-outer-joins onto the ADC lane as
    ``q_cos_sim``/``q_rnk``, and the oracle replays quantize →
    dequantize → cosine → re-rank — the whole serving tier sits under
    the driver value hash."""
    from anomalyzer_spark.functions.ann_index import (
        compact_ingested_index, ingest_ivfpq_stream, search_ivfpq_index)
    e = _embs(spark, sf_dir)
    sample = e.where(F.col("vec_id") < IVF_SAMPLE_N) \
        .select("vec_id", "embedding").collect()
    rows = [(r["vec_id"], r["embedding"]) for r in sample]
    cents = _ivf_centroids(rows)
    books = _pq_codebooks(rows)
    tmp = _query_tmp("ivfpq_ingest")
    corpus = e.select("vec_id", "embedding")
    corpus.repartition(3).write.mode("overwrite").parquet(f"{tmp}/corpus")
    cstream = (spark.readStream.schema(corpus.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/corpus"))
    ingest = ingest_ivfpq_stream(
        spark, cstream, f"{tmp}/ingested", cents, books, f"{tmp}/ckpt",
        quantized_refine=True)
    ingest.awaitTermination()
    compact_ingested_index(spark, f"{tmp}/ingested", f"{tmp}/index")
    qset = e.where(F.col("vec_id") < 20)
    out = search_ivfpq_index(
        spark, f"{tmp}/index", qset, cents, books,
        vec_col="embedding", query_id_col="vec_id", k=TOPK,
        n_probe=IVF_PROBE)
    qlane = search_ivfpq_index(
        spark, f"{tmp}/index", qset, cents, books,
        vec_col="embedding", query_id_col="vec_id", k=TOPK,
        n_probe=IVF_PROBE, refine=IVFPQ_REFINE,
        refine_source="quantized").select(
        "query_id", "neighbor_id",
        F.col("cos_sim").alias("q_cos_sim"),
        F.col("rnk").cast("long").alias("q_rnk"))
    both = (out.withColumn("rnk", F.col("rnk").cast("long"))
            .join(qlane, ["query_id", "neighbor_id"], "full_outer"))
    return _round6(both, "pq_dist", "q_cos_sim")


def q_emb_pipeline(spark, sf_dir):
    """Composed embedding-curation pipeline: LSH near-dup pairs (cos >=
    0.9) → keep-first dedup (drop the higher id of every pair — id_a <
    id_b, so each clique keeps its smallest id) → per-label corpus stats
    over survivors. One declarative plan: bucketed candidate join, an
    anti-join keep-list, and a decimal-exact aggregate."""
    from anomalyzer_spark.functions import projection

    e = _embs(spark, sf_dir)
    pairs = similarity.cosine_pairs(
        e, id_col="vec_id", vec_col="embedding", threshold=0.9,
        use_lsh=True, n_planes=16, bands=4, dim=64, seed=7)
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    # NOT checkpointed (unlike text/data_pipeline's multi-leg frames):
    # measured no win at sf0.1 — the cost here is the LSH verify, whose
    # signature frames cosine_pairs already materializes internally
    surv = e.join(dropped, "vec_id", "left_anti")
    norm = F.sqrt(F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x * x))
    base = (
        surv.select("label", norm.alias("_n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("_n").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)), 6).alias("avg_norm"),
        )
    )
    # round-7 stage: first-principal-coordinate mean per label over the
    # survivors (literal PCA model off the shared bounded sample) — puts
    # projection.train_pca/project_embeddings under this slot's value
    # hash without a new registry slot.
    pca = _pca_model([
        (r["vec_id"], r["embedding"]) for r in
        e.where(F.col("vec_id") < IVF_SAMPLE_N)
        .select("vec_id", "embedding").collect()])
    pc = (
        projection.project_embeddings(
            surv, pca, vec_col="embedding", id_col="vec_id",
            keep_cols=["label"])
        .select("label", F.element_at("proj", 1).alias("_p"))
        .groupBy("label")
        .agg(F.round(
            F.sum(F.col("_p").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)), 6).alias("avg_pc1"))
    )
    return (
        base.join(pc, "label")
        .withColumn("label", F.col("label").cast("long"))
    )


def _dec(c: str, p: int = 18, s: int = 2) -> F.Column:
    return F.col(c).cast(f"decimal({p},{s})")


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (engine-general agg coverage)."""
    # l_shipdate is parquet timestamp[ms]; session TZ is pinned to UTC so
    # this literal matches DuckDB's naive TIMESTAMP '2000-12-01'
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,4)")
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              * (1 + F.col("l_tax"))).cast("decimal(24,6)")
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
                ).alias("avg_qty"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6
                ).alias("avg_price"),
        F.round(F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6
                ).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out


def q_top_customers(spark, sf_dir):
    """Broadcast-join star query: revenue per customer with nation/region."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    out = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("c_custkey", "c_name", "n_name", "r_name")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
    return out


def q_orders_rollup(spark, sf_dir):
    """ROLLUP aggregation (grouping-sets coverage)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "sum_price", "n")
    )


def q_running_totals(spark, sf_dir):
    """Window functions: running revenue + in-customer order rank."""
    from pyspark.sql.window import Window
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wr = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey", "o_custkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.row_number().over(wr).cast("long").alias("price_rank"),
    )


def q_events_json(spark, sf_dir):
    """JSON prop extraction + keyed aggregation over the events stream table."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", (k % 5).alias("k_mod"), "value")
        .groupBy("event_type", "k_mod")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
             .alias("sum_value"))
    )


def q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL coverage over user cohorts."""
    ev = load_table(spark, sf_dir, "events")
    high = ev.where(F.col("value") > 300).select("user_id").distinct()
    err = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    both = high.intersect(err).select("user_id", F.lit("both").alias("tag"))
    only_high = high.exceptAll(err).select(
        "user_id", F.lit("only_high").alias("tag"))
    return both.unionAll(only_high)


def q_asof_join(spark, sf_dir):
    """As-of enrichment: each order picks the latest event of its user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_custkey") % 150).alias("user_key"),
        F.col("o_orderdate"))
    out = asof_join(
        o, ev.withColumnRenamed("user_id", "user_key"),
        on="user_key", left_ts="o_orderdate", right_ts="ts",
        payload_cols=["event_id", "value"], tiebreak="event_id")
    return _round6(
        out.select("o_orderkey", "user_key",
                   F.col("asof_event_id").alias("event_id"),
                   F.col("asof_value").alias("last_value")),
        "last_value")


def q_decontam(spark, sf_dir):
    """Benchmark decontamination report (decontam.contamination): eval set
    = every 97th fixture document (guaranteed hits — each eval document is
    verbatim in the corpus), 8-word-gram overlap, broadcast-eval plan. The
    oracle recomputes normalization, distinct word 8-grams, the gram join,
    and the per-document hit aggregate in DuckDB, so contamination ratios
    are value-hash attested. Registry slot freed by retiring ks_stat: the
    grid-interpolated KS statistic is the deterministic core of the MC ks
    method, whose KS-derived probabilities are already hashed by the
    detect_default / detect_multi_mc / detect_stream_mc oracles over the
    same kernel and windows — the standalone column query added no
    coverage beyond them (tests/test_columnar.py still pins ks_stat_col
    against the NumPy oracle point-wise).

    Round-13 rider (the changelog -> snapshot_diff precedent): the same
    report is computed a SECOND time through the split-block Bloom
    prefilter path (functions/bloom.py — filter build over the eval
    grams, broadcast block-join probe of the corpus gram stream, exact
    confirm join) and full-outer-joined onto the plain lane as bl_*
    columns. The two lanes are exact-equal by construction (the filter
    only prunes; the confirm join settles false positives), so the
    oracle simply emits its columns twice — a false NEGATIVE in the
    filter (hash/mask bug) or a broken confirm join desyncs the lanes
    and breaks rows/hash. num_bits is pinned (2^19) rather than sized
    from a member count so the query builds without an eager count
    action; at the fixture eval-gram counts that over-provisions fill,
    which affects prefilter efficiency only, never results. (Sharing
    the corpus word arrays between the lanes via an eager
    train_words_col checkpoint was measured 5% SLOWER at fixture scale
    — per-repeat checkpoint materialization costs more than the one
    regex pass it saves; both lanes shingle from text.)

    Round-14 rider: the MULTI-SUITE lane (eval_suite_col — K benchmark
    suites screened in ONE corpus pass, the per-suite report) joins in
    as ``ms_{a,b}_*`` columns: the eval set is split into two suites
    by doc_id parity of the eval index (% 194 = suite A), the
    per-(doc, suite) rows pivoted to columns, so the suite-tagged gram
    join and per-suite aggregation sit under the value hash (pytest
    already pins per-(doc,suite) ≡ K separate calls; this hashes it).
    The suite lane re-shingles the corpus (third pass) — the same
    documented attestation price class as the Bloom lane.

    Round-15 rider: the FUZZY lane (decontam.fuzzy_contamination — the
    recall layer over paraphrase/edit contamination) joins in as
    ``fz_hits``/``fz_best`` per training document: word-3-gram MinHash
    band buckets (32 hashes / 8 bands — the dedup-stack Carter-Wegman
    spec), eval = the same every-97th docs, exact shingle-set Jaccard
    over bucket-colliding candidates, threshold 0.3. The oracle
    replays signatures, banding, the candidate join, and the Jaccard
    verify in SQL (the minhash_lsh replay adapted to word shingles),
    so the near-dup flag set and best-Jaccard values sit under the
    value hash — a wrong band key or a drifting Jaccard desyncs the
    lane. Fourth corpus shingle pass: the documented attestation
    price class."""
    from anomalyzer_spark.functions import bloom as bloom_mod
    from anomalyzer_spark.functions import decontam
    from anomalyzer_spark.functions.decontam import _grams
    from anomalyzer_spark.functions.dedup import normalized_words
    d = _docs(spark, sf_dir)
    # round-15 optimization: the four lanes used to re-run the regex
    # normalization over the corpus independently (plain / bloom / multi-
    # suite 8-gram shingles + the fuzzy lane's 3-gram signatures AND its
    # candidate re-shingle — five normalization passes in one plan).
    # Materialize (doc_id, text, words) ONCE per lap (eager
    # localCheckpoint, inside the timed region); the word arrays feed
    # the fuzzy lane (train_words_col) and the shared gram frame below
    # — identical output by construction (parity-pinned); sharing TWO
    # lanes' words was measured 5% slower in r13, but at five passes
    # the trade flips (measured: see OPTIMIZATION_r15.md).
    dw = d.select("doc_id", "text",
                  normalized_words(F.col("text")).alias("words")) \
        .localCheckpoint(eager=True)
    # round-16 optimization (guide §1.2 — don't compute things twice):
    # the three exact-gram lanes each re-derived the corpus 8-gram frame
    # from the word arrays (three staged zip_with shingle trees + three
    # explodes per lap — the derivation, not the joins, was the lanes'
    # CPU: isolated, deriving+materializing the gram frame costs 0.32 s
    # while the plain lane alone spent 1.21 s). Materialize _grams ONCE
    # per lap (eager compact checkpoint, inside the timed region) and
    # feed all three lanes the SAME frame via train_grams= — identical
    # by construction (the frame IS each lane's derivation), and each
    # lane keeps its own prefilter/join/aggregate, so the oracle still
    # attests them independently. compact_checkpoint: the gram frame is
    # join/agg fodder (light per-row work downstream), so its partition
    # count derives from its measured bytes, not the corpus scan's
    # split count (VERDICT r15 item 5).
    tg = compact_checkpoint(
        _grams(dw, "text", "doc_id", 8, "doc_id", words_col="words"))
    ev = dw.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    plain = decontam.contamination(dw, ev, n=8, train_grams=tg)
    fl = bloom_mod.build_bloom(
        _grams(ev, "text", "doc_id", 8, "_eval_id").select("gram"),
        "gram", num_bits=1 << 19, num_hashes=5, persist=False)
    bl = decontam.contamination(dw, ev, n=8, eval_bloom=fl,
                                train_grams=tg)
    bl = bl.select(
        "doc_id",
        *[F.col(c).alias(f"bl_{c}")
          for c in ("n_grams", "n_hit_grams", "n_eval_docs",
                    "contamination")])
    ev2 = ev.withColumn(
        "suite", F.when(F.col("doc_id") % 194 == 0, F.lit("sA"))
        .otherwise(F.lit("sB")))
    ms = decontam.contamination(dw, ev2, n=8, eval_suite_col="suite",
                                train_grams=tg)
    ms_p = ms.groupBy("doc_id").agg(*[
        F.max(F.when(F.col("suite") == s, F.col(c))).alias(
            f"ms_{s[1].lower()}_{a}")
        for s in ("sA", "sB")
        for c, a in (("n_hit_grams", "hits"), ("n_eval_docs", "docs"),
                     ("contamination", "cont"))])
    # fuzzy lane: the eval side is a PLANTED near-duplicate of each
    # eval document — its first 6 + doc_id % 25 normalized words — so
    # the exact-Jaccard verify sees a diverse sub-1.0 value spread and
    # the 0.3 threshold genuinely filters (truncations of LONG docs
    # fall below it). Joining normalized words is normalization-
    # idempotent, so the oracle rebuilds the same truncated shingle
    # sets from its norm CTE. The slice reads the persisted word arrays
    # (same expression input as normalized_words(text) — identical).
    k_trunc = (F.lit(6) + F.pmod(F.col("doc_id"), F.lit(25))).cast("int")
    ev_fz = dw.where(F.col("doc_id") % 97 == 0).select(
        "doc_id",
        F.array_join(
            F.slice(F.col("words"), 1, k_trunc),
            " ").alias("text"))
    fz = decontam.fuzzy_contamination(
        dw, ev_fz, k=3, num_hashes=32, bands=8, threshold=0.3,
        train_words_col="words")
    fz_p = fz.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("fz_hits"),
        F.max("jaccard").alias("fz_best"))
    return plain.join(bl, "doc_id", "full_outer") \
        .join(ms_p, "doc_id", "full_outer") \
        .join(fz_p, "doc_id", "full_outer")


def q_detect_multi_mc(spark, sf_dir):
    """Multivariate detection with the DEFAULT (Monte-Carlo) method set —
    exercises the multi-column key ('event_type|metric') permutation-hash
    preimage end to end against the SQL oracle."""
    from anomalyzer_spark.operators.detect import detect_multi
    ev = load_table(spark, sf_dir, "events")
    out = detect_multi(
        ev, ["event_type"], "ts",
        {"value": F.col("value"), "log1p": F.log(F.lit(1.0) + F.col("value"))},
        DEFAULT_CONF, tiebreak_cols=["event_id"])
    return _round6(out.select("event_type", "metric", "n_points", "prob"),
                   "prob")


def q_detect_rolling(spark, sf_dir):
    """Per-point anomaly probs over the full history (one window pass).

    chunk_rows=2048: the events table has 5 keys — an unchunked per-key
    window caps at 5-way parallelism (and AQE byte-coalescing ran it on 2
    tasks, idle wall ~1.8s); the prelude-replay chunk path (rolling.py
    module docstring) spreads each key across ~10 chunks with
    bit-identical output (tests/test_rolling_chunked.py) — idle wall
    ~0.92s, under the old 5-task floor."""
    from anomalyzer_spark.operators.rolling import detect_rolling
    ev = load_table(spark, sf_dir, "events")
    out = detect_rolling(ev, ["event_type"], "ts", "value", DET_CONF,
                         tiebreak_cols=["event_id"], chunk_rows=2048)
    return _round6(out.select("event_type", "event_id", "n_points", "prob"),
                   "prob")


def q_quality_checks(spark, sf_dir):
    """Declarative data-quality gate (functions/checks.py): 8 checks —
    completeness, exact uniqueness, range/set/regex conformance, mean
    bound, row count, a cross-column predicate — computed in ONE
    aggregate pass (single scan, map-side partial agg, 1-row exchange,
    report unpivoted via explode). Rotated in round 9 for lsh_topk,
    whose surfaces stay attested: hyperplane-LSH bucketing through
    emb_dedup_groups/emb_pipeline (same seed-7 config), the top-k
    window through cosine_topk/ivf_topk, and the retired slot's oracle
    itself now lives verbatim in
    tests/test_functions.py::test_lsh_topk_duckdb_parity."""
    from anomalyzer_spark.functions import checks as C
    orders = load_table(spark, sf_dir, "orders")
    rep = C.verify_checks(orders, [
        C.completeness("o_custkey"),
        C.uniqueness("o_orderkey", exact=True),
        C.in_range("o_totalprice", lo=1000, hi=450000, min_ratio=0.9),
        C.in_set("o_orderstatus", ["O", "F", "P"]),
        C.matches("o_orderpriority", r"[1-5]-[A-Z]+"),
        C.mean_between("o_totalprice", 100.0, 500000.0),
        C.row_count(min_rows=1),
        C.satisfies("o_totalprice > 0", "price_positive"),
        # round-11 rider: the heavy-hitters / frequency-skew gate (share
        # of the 2 most frequent priorities), putting the top_share kind's
        # grouped-count + ranked-cut path under the driver value hash
        C.top_share("o_orderpriority", 0.9, k=2),
    ])
    return _round6(rep, "value")


def q_drift_psi(spark, sf_dir):
    """Snapshot distribution drift (functions/drift.py): PSI between the
    orders table and a deterministically drifted copy (+20% price scale,
    every 5th custkey nulled) over equi-width histogram profiles — 10
    bins + the NULL bucket, bounds from the OLD snapshot, Laplace
    α=0.5 smoothing, PSI rounded to 6. o_orderkey is the no-drift
    control lane (psi exactly 0). A fourth, CATEGORICAL lane
    (psi_cat_drift on o_orderstatus: old top-3 vocabulary, forced
    OTHER-bucket drift) rides the same output schema, so
    category_profile's vocab/OTHER/NULL bucketing sits under the value
    hash too. Rotated in round 9 for
    detect_resampled, whose unique surfaces stay value-attested:
    batch-resample bucket arithmetic through resample_stream's oracle
    (every emitted bucket ≡ the batch bucket, tz-coverage moved with
    it in tests/test_timezone.py) and the detect combiner through the
    12 remaining detect slots."""
    from anomalyzer_spark.functions.drift import psi_cat_drift, psi_drift
    # (probed round 9: the range_join local-split adapter does NOT help
    # here — the cell cost is job-count overhead [bounds derive + two
    # tiny-shuffle profiles], not per-row compute, so the extra exchange
    # was scale-negative for zero local win and was reverted)
    orders = load_table(spark, sf_dir, "orders")
    drifted = (
        orders
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.2)
        .withColumn("o_custkey", F.when(
            F.col("o_orderkey") % 5 == 0, F.lit(None)
        ).otherwise(F.col("o_custkey")))
        .withColumn("o_orderstatus", F.when(
            F.col("o_orderkey") % 4 == 0, F.lit("Z")
        ).otherwise(F.col("o_orderstatus")))
    )
    num = psi_drift(orders, drifted,
                    ["o_totalprice", "o_custkey", "o_orderkey"])
    cat = psi_cat_drift(orders, drifted, ["o_orderstatus"], top_k=3)
    return num.unionByName(cat)


def q_detect_stream(spark, sf_dir):
    """Structured Streaming detect drained over the events table
    (availableNow); must equal batch detect → same SQL oracle."""
    from anomalyzer_spark.streaming import run_stream_on_dir
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    res = run_stream_on_dir(
        spark, f"{sf_dir}/events*.parquet", schema, ["event_type"],
        "ts", "value", DET_CONF, "event_id",
        query_name="q_detect_stream_mem")
    return _round6(res.select("event_type", "n_points", "prob"), "prob")


def q_detect_stream_mc(spark, sf_dir):
    """Streaming detect with the reference's DEFAULT (Monte-Carlo) method
    set: the stateful per-key window in the stream must reproduce batch
    detect bit-for-bit, including the hash-permutation MC tests — so the
    streaming path shares the full MC SQL oracle."""
    from anomalyzer_spark.streaming import run_stream_on_dir
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    res = run_stream_on_dir(
        spark, f"{sf_dir}/events*.parquet", schema, ["event_type"],
        "ts", "value", DEFAULT_CONF, "event_id",
        query_name="q_detect_stream_mc_mem")
    return _round6(res.select("event_type", "n_points", "prob"), "prob")


def q_snapshot_diff(spark, sf_dir):
    """Corpus snapshot delta (dedup.snapshot_diff) — the incremental-
    reprocessing primitive whose added+changed slice drives 100 TB
    re-runs. old = the fixture documents; new = the same corpus minus
    every 7th doc (removed), every remaining 5th doc's text rewritten
    (changed), plus id-shifted copies of doc_id<10 (added). Each side
    reduces to (id, md5) map-side off a pruned two-column scan, then ONE
    full-outer equi-join on the id. Unchanged rows dropped (the default),
    so the hashed contract covers the status classification AND the raw-
    byte md5 content identities on both sides.

    RIDER — changelog.apply_changes under the same value hash: the new
    snapshot is REBUILT from the old one plus a multi-version CDC
    changelog (a DECOY version at seq 1 superseded by the real text at
    seq 2, deletes at seq 3 — so the max_by latest-wins fold is what the
    hash attests, not just the union), and each diff row carries
    ``rebuilt_hash`` = md5 of the rebuilt row's text (NULL for removed
    ids). By construction rebuilt == new, so rebuilt_hash must equal
    new_hash on added/changed rows — and the DuckDB oracle recomputes
    the whole MERGE independently (row_number latest-wins).

    Rider cost discipline (BASELINE round-12b has the sweep): the fold
    and its consumers carry md5 HASHES, not text — the latest-wins
    choice is equally attested (decoy/real/delete hash differently) at
    1% of the shuffle volume; the delete branch and the broadcast
    attach are id+hash only. The snapshot STITCHING (anti-join + union
    passthrough of apply_changes) is deliberately not re-run here — it
    is DuckDB-parity-pinned in tests/test_changelog.py; the slot hash
    covers the part with semantic teeth. And the documents frame is
    read RAW (no _docs spread-repartition): the rider references the
    corpus from six subtrees, and six spread shuffles — not the rider
    logic — were 3x the query (2.1s vs 0.61s measured). The spread
    exists for slots with HEAVY per-row kernels; here the per-row work
    is one md5 over a 5k-row table, far cheaper than the exchanges
    that would "parallelize" it."""
    from anomalyzer_spark.functions import changelog as chlog
    from anomalyzer_spark.functions import dedup
    from anomalyzer_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")).alias("text"))
        .unionAll(docs.where(F.col("doc_id") < 10)
                  .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          "text")))
    diff = dedup.snapshot_diff(old, new, "text", "doc_id")
    # the changelog and the rebuilt snapshot carry md5 HASHES, not text:
    # the fold must still pick the right VERSION (decoy/real/delete have
    # distinct hashes), so the latest-wins semantics stay fully under
    # the value hash while the fold/anti-join subtrees move 32-char
    # strings instead of document bodies
    h = F.md5(F.col("text").cast("binary"))
    old_h = docs.select("doc_id", h.alias("h"))
    upsert_h = (
        docs.where((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 == 0))
        .select("doc_id",
                F.md5(F.concat(F.col("text"), F.lit(" v2"))
                      .cast("binary")).alias("h"))
        .unionAll(docs.where(F.col("doc_id") < 10)
                  .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          h.alias("h"))))
    changes = (
        upsert_h.select("doc_id", F.md5(F.lit("DECOY").cast("binary"))
                        .alias("h"),
                        F.lit(1).alias("seq"), F.lit("upsert").alias("op"))
        .unionAll(upsert_h.select(
            "doc_id", "h",
            F.lit(2).alias("seq"), F.lit("upsert").alias("op")))
        .unionAll(docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id", F.md5(F.lit("").cast("binary")).alias("h"),
            F.lit(3).alias("seq"), F.lit("delete").alias("op"))))
    lat = chlog.latest_changes(changes, ["doc_id"], "seq")
    rb = (lat.where(F.col("op") != "delete")
          .select("doc_id", F.col("h").alias("rebuilt_hash")))
    # round-15 rider — scd2_history under the same value hash: the
    # changelog gains a V1 upsert for every to-be-deleted doc, so the
    # type-2 fold exercises BOTH version closure paths (a newer upsert
    # closing the decoy at seq 2, and a DELETE closing V1 at seq 3 with
    # no current version left). Collapsed per doc: version count, open
    # count, last valid_from, max valid_to — the lead-window interval
    # arithmetic and the delete-closure all sit under the hash.
    changes2 = changes.unionAll(
        docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id", F.md5(F.lit("V1").cast("binary")).alias("h"),
            F.lit(1).alias("seq"), F.lit("upsert").alias("op")))
    scd_src = chlog.scd2_history(changes2, ["doc_id"], "seq", op_col="op")
    scd = scd_src.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("scd2_versions"),
        F.sum(F.col("is_current").cast("long")).alias("scd2_open"),
        F.max("valid_from").cast("long").alias("scd2_last_from"),
        F.max("valid_to").cast("long").alias("scd2_max_to"))
    return diff.join(F.broadcast(rb), "doc_id", "left") \
        .join(F.broadcast(scd), "doc_id", "left")


def q_resample_stream(spark, sf_dir):
    """Watermarked streaming resample (tumbling event-time windows, append
    mode, availableNow drain). Every emitted bucket equals the batch
    resample bucket exactly; buckets whose window end passes the FINAL
    watermark (max event time - 1h) are withheld — the oracle encodes the
    same cutoff, so the late-data path is value-hash checked."""
    from anomalyzer_spark.streaming import run_resample_stream_on_dir
    res = run_resample_stream_on_dir(
        spark, f"{sf_dir}/events*.parquet", ["event_type"], "ts", "value",
        every_seconds=86400, watermark="1 hour",
        query_name="q_resample_stream_mem")
    return _round6(
        res.select("event_type", "bucket", "bucket_ts", "value", "n_raw"),
        "value")


def q_multimodal(spark, sf_dir):
    """Multimodal payload pipeline in ONE pass: binary-column metadata
    (size/md5/magic — pure column expressions, computed JVM-side on the way
    into the Arrow stage) fused with the mapInPandas byte-feature extraction
    (the decode-shaped path), so the payload crosses Arrow exactly once and
    the merged result needs no join/exchange. Replaces the round-2/3
    multimodal_meta + multimodal_features queries (50-query driver gate;
    both operators' columns hash-checked here). Rounding happens JVM-side
    (F.round == DuckDB round, half-away) — not in the Python kernel, whose
    banker's round() flips exact .xxxxxx5 means.

    Round-11 rider ``dhash9x8``: the perceptual image signature — a
    deterministic synthetic PGM payload (multimodal.pgm_payload_col,
    md5-derived pixel bytes so DuckDB can rebuild them) pushed through the
    REAL library-free decoder (decode_image_raw, one mapInPandas Arrow
    pass) and the 64-bit dHash column expression (dhash64_col). Puts the
    whole image-dedup signature path — decode, center-sample resize
    identity, gradient bits, signed bit-63 — under the driver value hash;
    the pair join over these signatures is tests/test_image_dedup.py.

    Round-11 second rider ``lang_pred_model`` + ``prob_<lang>``: the
    trained language-ID scoring path (functions/langid.py) with the
    embedded literal model ``_LANG_MODEL`` (bit-equal to refitting on
    ``_LANG_POOLS`` — pinned), so the script fractions, gram bucket hash,
    per-class weight fold, and softmax/argmax are all value-hashed against
    ``langid.lang_scoring_sql``'s DuckDB twin.

    Round-12 riders close the attestation gap on the last two dedup
    modalities (multimodal.py audio/video were pytest-only):

    - ``audio_subfp0/1``: the REAL RIFF/WAVE decode + Haitsma-Kalker
      subfingerprint path (``audio_fingerprint`` — Hann window, rfft,
      log-band energies, double-difference sign bits) over a
      deterministic synthetic WAV (``wav_payload_col``, md5-derived
      int16 PCM), at oracle-tractable sizing (128 samples, frame=64,
      hop=32, n_bands=5 → two 4-bit subfingerprints). The DuckDB twin
      recomputes the DFT per bin from the same samples — the whole FFT
      fingerprint path lands under the driver value hash.
    - ``vframe_dh0/1/2``: the REAL RIFF/AVI container demux
      (``frame_sample`` → ``_avi_video_frames``) + per-frame decode +
      dHash over a deterministic 3-frame synthetic AVI
      (``avi_payload_col``); only a correct ``movi`` walk recovers the
      per-frame pixel streams the oracle rebuilds. Frame ids pack as
      doc_id*4+frame_idx (the ``video_matches`` packing, unpacked after
      signing); the pair-join composition over these signatures stays
      pinned in tests/test_video_dedup.py / test_audio_dedup.py.

    Round-13 riders put the two newest pytest-only families under the
    driver value hash (regex/URL-parsing dialects differ across engines
    — exactly what value hashes catch; the fixture text is verified
    free of ``< > &``/VT/FF so the planted inputs are fully controlled):

    - ``norm_url``/``url_host``/``url_domain`` + ``vis_text`` and the
      ``markup_stats`` fields (functions/web.py): four planted URL
      shapes per doc_id (www+default port+tracking params+fragment;
      trailing slashes; non-default port; malformed → NULLs) through
      normalize_url/host_of/registrable_domain, and a planted HTML
      payload (script/style/comment/block tags/entities around the
      document text) through extract_text/markup_stats. The oracle
      re-parses the URLs with regexes and replays the extraction spec
      step-by-step (two-pass script/style removal — equivalent to
      Spark's backreference pass on the controlled payload; Java ``\\s``
      written as its explicit ASCII class, which RE2's ``\\s`` is not).
    Round-14 riders (same planted-input pattern): ``lic_*``
    (code.with_license_info — five rotating license headers incl. a
    compound SPDX expression and a no-license fail-closed row, plus a
    %7 noai opt-out marker; the oracle replays the SPDX extract, the
    phrase CASE and the allowlist) and ``pii_*`` (text.redact_pii's
    Luhn-gated credit_card + ssn kinds — a constant valid card, an ssn,
    and a doc-id-derived 16-digit run whose checksum validity varies by
    doc; the oracle recomputes the digit fold and the literal replace
    left-fold, hashing the redacted bytes as md5).

    - ``code_*`` (functions/code.py with_code_stats): planted code text
      (comment header, indented line, the document text, a doc_id-length
      token run, an @generated marker every 7th doc) through the eight
      line-shape signals, replayed with DuckDB list/regex functions."""
    from anomalyzer_spark.functions import code as code_mod
    from anomalyzer_spark.functions import langid, multimodal, web
    d = _docs(spark, sf_dir)
    with_payload = multimodal.attach_payload(d, "text", "doc_id")
    prof = multimodal.payload_profile(with_payload, "content", "doc_id")
    img = d.select("doc_id",
                   multimodal.pgm_payload_col(F.col("text")).alias("content"))
    dh = multimodal.dhash_image(img).select(
        "doc_id", F.col("dhash64").alias("dhash9x8"))
    lang = langid.score_lang(d, _LANG_MODEL, "text", "doc_id")
    wav = d.select("doc_id",
                   multimodal.wav_payload_col(F.col("text")).alias("content"))
    afp = multimodal.audio_fingerprint(
        wav, frame=64, hop=32, n_bands=5).select(
        "doc_id",
        F.element_at("subfps", 1).alias("audio_subfp0"),
        F.element_at("subfps", 2).alias("audio_subfp1"))
    avi = d.select("doc_id",
                   multimodal.avi_payload_col(F.col("text")).alias("content"))
    fid = multimodal.frame_sample(avi, n_frames=3).select(
        (F.col("doc_id") * 4 + F.col("frame_idx")).alias("doc_id"),
        F.col("frame").alias("content"))
    vsig = multimodal.dhash_image(fid).select(
        F.shiftrightunsigned("doc_id", 2).alias("doc_id"),
        F.col("doc_id").bitwiseAND(F.lit(3)).alias("_fidx"),
        "dhash64")
    vdh = vsig.groupBy("doc_id").agg(*[
        F.max(F.when(F.col("_fidx") == fi, F.col("dhash64")))
        .alias(f"vframe_dh{fi}") for fi in range(3)])
    did, d23, m4 = F.col("doc_id"), F.col("doc_id") % 23, F.col("doc_id") % 4
    url = (
        F.when(m4 == 0, F.concat(
            F.lit("https://WWW.News"), d23, F.lit(".Example.CO.UK:443/a/b"),
            did, F.lit("//?utm_campaign=c&b=2&a=1#frag")))
        .when(m4 == 1, F.concat(
            F.lit("http://Sub.Blog"), d23, F.lit(".Example.COM:80/Path/"),
            did, F.lit("/")))
        .when(m4 == 2, F.concat(
            F.lit("https://shop"), d23, F.lit(".example.com:8443/buy"),
            F.lit("?gclid=g&q="), did))
        .otherwise(F.lit("not a url")))
    html = F.concat(
        F.lit('<!DOCTYPE html><HTML><Body class="c"><h1>T'), did,
        F.lit('</h1><script type="t">var j="</div>";</script><p> '),
        F.substring(F.col("text"), 1, 90),
        F.lit(' A&amp;B &lt;ok&gt;&nbsp;q</p><!-- note -->'
              '<ul><li>i1</li><li>i2</li></ul><STYLE>.c{x}</STYLE>'
              '<div>tail</div></Body></HTML>'))
    ms = web.markup_stats(F.col("_html"))
    webr = d.select("doc_id", url.alias("_url"), html.alias("_html")).select(
        "doc_id",
        web.normalize_url(F.col("_url")).alias("norm_url"),
        web.host_of(F.col("_url")).alias("url_host"),
        web.registrable_domain(F.col("_url")).alias("url_domain"),
        web.extract_text(F.col("_html")).alias("vis_text"),
        ms["n_tags"].alias("n_tags"),
        ms["tag_density"].alias("tag_density"),
        ms["visible_ratio"].alias("visible_ratio"),
        ms["is_html"].alias("is_html"),
        # round-14: the domain-list membership core (host_suffixes —
        # filter_by_domains' hit test with subdomain inheritance) as a
        # boolean lane: the m4==0 URLs' host chain contains
        # example.co.uk, every other shape misses
        F.arrays_overlap(
            web.host_suffixes(F.col("_url")),
            F.array(F.lit("example.co.uk"), F.lit("blockedhost.test")))
        .alias("url_blocked"))
    codes = d.select(
        "doc_id",
        F.concat(
            F.lit("# hdr\n\tindent = 1\n"),
            F.substring(F.col("text"), 1, 120), F.lit("\n"),
            F.expr("repeat('B', cast(doc_id % 40 + 5 as int))"),
            F.when(did % 7 == 0, F.lit("\n// @generated do not edit"))
            .otherwise(F.lit(""))).alias("code"))
    cst = code_mod.with_code_stats(codes, "code").select(
        "doc_id", *[F.col(c).alias(f"code_{c}")
                    for c in code_mod.CODE_STAT_COLS])
    # round-14 riders: the license/opt-out gate (code.with_license_info)
    # and the Luhn-gated PII kinds (text.redact_pii credit_card/ssn) —
    # this round's new pytest-only families — over planted deterministic
    # inputs the oracle reconstructs byte-for-byte: five rotating
    # license headers (SPDX single/compound, Apache/GPL phrases, none)
    # + a %7 opt-out marker; a constant VALID card + ssn + a
    # doc-id-derived 16-digit run whose Luhn validity VARIES by doc, so
    # both checksum branches sit under the value hash.
    m5 = did % 5
    lic_hdr = (
        F.when(m5 == 0, F.lit("// SPDX-License-Identifier: MIT\n"))
        .when(m5 == 1,
              F.lit("// SPDX-License-Identifier: MIT OR Apache-2.0\n"))
        .when(m5 == 2, F.lit("/* Licensed under the Apache License, "
                             "Version 2.0 */\n"))
        .when(m5 == 3, F.lit("/* GNU General Public License */\n"))
        .otherwise(F.lit("")))
    lic_in = d.select("doc_id", F.concat(
        lic_hdr, F.substring(F.col("text"), 1, 80),
        F.when(did % 7 == 0, F.lit("\nnoai")).otherwise(F.lit("")))
        .alias("text"))
    lic = code_mod.with_license_info(lic_in).select(
        "doc_id", F.col("spdx_id").alias("lic_spdx"),
        F.col("license_detected").alias("lic_detected"),
        F.col("license_permissive").alias("lic_permissive"),
        F.col("license_opt_out").alias("lic_optout"))
    # the " 99" tail makes the greedy candidate an 18-digit span whose
    # valid 16-digit PREFIX must still redact (the r14 review's
    # swallowed-token leak, now under the value hash)
    dd = F.lpad((did % 10000).cast("string"), 4, "0")
    pii_in = d.select("doc_id", F.concat(
        F.substring(F.col("text"), 1, 60),
        F.lit(" 4539 1488 0343 6467 99 ssn 123-45-6789 x "),
        F.concat_ws(" ", dd, dd, dd, dd)).alias("text"))
    pii = text.redact_pii(
        pii_in, kinds=("credit_card", "ssn"), with_counts=True).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("pii_md5"),
        F.col("n_credit_card").alias("pii_n_card"),
        F.col("n_ssn").alias("pii_n_ssn"))
    # round-15 riders (closing the last text-extras attestation gaps):
    # srp_* — strip_repeated_paragraphs over planted intra-doc
    # repetition (the doc's first sentence appended twice; '. '
    # separator), hashing the rebuilt bytes + both counters; he_* —
    # hash_embeddings (dim 16, L2-normalized) collapsed to a
    # position-weighted checksum + nonzero-bucket count, so the bucket
    # hash, count assembly, and normalization sit under the value hash.
    srp_in = d.select("doc_id", F.concat(
        F.col("text"), F.lit(". "),
        F.split(F.col("text"), r"\. ")[0], F.lit(". "),
        F.split(F.col("text"), r"\. ")[0]).alias("text"))
    srp = dedup.strip_repeated_paragraphs(srp_in, sep=". ").select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("srp_md5"),
        F.col("n_paragraphs").alias("srp_paras"),
        F.col("n_repeats_dropped").alias("srp_dropped"))
    he_chk = F.round(F.aggregate(
        F.zip_with(F.col("embedding"),
                   F.sequence(F.lit(1), F.lit(16)),
                   lambda x, i: x * i.cast("double")),
        F.lit(0.0), lambda a, x: a + x), 6)
    he = text.hash_embeddings(d, dim=16).select(
        "doc_id", he_chk.alias("he_chk"),
        F.size(F.filter("embedding", lambda x: x != 0.0))
        .cast("long").alias("he_nnz"))
    return _round6(prof.join(dh, "doc_id").join(lang, "doc_id")
                   .join(afp, "doc_id").join(vdh, "doc_id")
                   .join(webr, "doc_id").join(cst, "doc_id")
                   .join(lic, "doc_id").join(pii, "doc_id")
                   .join(srp, "doc_id").join(he, "doc_id"),
                   "byte_mean", "byte_std", "byte_entropy")


def q_sessions_stream(spark, sf_dir):
    """Native session_window streaming aggregation (watermarked, append
    mode, availableNow drain). Every emitted session equals a batch islands
    session; sessions whose window end (last event + gap) has not passed
    the FINAL watermark (max event time - 1h, ms-truncated) are withheld —
    the oracle encodes the same cutoff, so the merging-session state path
    is value-hash checked."""
    from anomalyzer_spark.streaming import run_session_stream_on_dir
    res = run_session_stream_on_dir(
        spark, f"{sf_dir}/events*.parquet", ["user_id"], "ts",
        gap_seconds=1800, watermark="1 hour",
        query_name="q_sessions_stream_mem")
    return res


def q_dedup_stream(spark, sf_dir):
    """Incremental exact dedup over a document stream: stateful
    groupBy(content_hash) in Update mode; the final per-hash state (count +
    min doc id) must equal the batch exact_dedup groups exactly — the
    streaming dedup surface shares the batch oracle.

    Round 15: drains a FIXED multi-micro-batch split (repartition +
    maxFilesPerTrigger=1, the q_minhash_stream shape) instead of one
    all-files trigger, so the cross-batch state-update path does real
    work — and the slot doubles as the bench's streaming drill (26th
    headline cell with its own floor): final state is split-invariant,
    so the oracle is untouched. Cost-model note: the drain runs EAGERLY
    at query-construction time; the returned frame is the memory-sink
    final-state read.

    Round 16 (r15 verdict item 4): the split is TWO batches, not three —
    each data micro-batch past the first costs a full trigger of fixed
    overhead (measured ~0.5 s: addBatch job + offset/WAL commits) while
    attesting the same thing (state created in batch 1, updated across
    the batch boundary in batch 2); the drill also skips the trailing
    no-data micro-batch (Update mode, no watermark — it emits nothing;
    see drain_available_now(no_data_batch=)). Final state — and the
    oracle — identical by split invariance."""
    from anomalyzer_spark.streaming import run_dedup_stream_on_dir
    tmp = _query_tmp("dedup_stream")
    # r15 optimization: the input split used to be
    # _docs(...).repartition(N) — TWO keyless round-robin exchanges
    # (each paying sortBeforeRepartition's local sort of full text
    # rows) just to land the split files. One repartition over the
    # plain table read writes the same rows through a single exchange
    # while still guaranteeing non-empty balanced files at every sf (a
    # coalesce would collapse to the scan's split count on
    # single-row-group fixtures); the final state is split-invariant,
    # so the result (and the oracle) is untouched. r16: N=2 (see
    # docstring).
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.repartition(2).write.mode("overwrite").parquet(f"{tmp}/in")
    return run_dedup_stream_on_dir(
        spark, f"{tmp}/in", "text", "doc_id",
        query_name="q_dedup_stream_mem", max_files_per_trigger=1)


#: detect_horizon cutoff: anchor - horizon. The fixtures span 2024-01; an
#: 8-day horizon from the Feb 1 anchor keeps events from Jan 24 onward
#: (the pushed-predicate literal pinned in tests/test_plans.py).
HORIZON_ANCHOR = "2024-02-01 00:00:00"
HORIZON_DAYS = 8


def q_detect_horizon(spark, sf_dir):
    """detect() with the scan-pushdown horizon pre-filter — the load-bearing
    100 TB path (SURVEY §4.3): rows older than anchor - horizon are dropped
    by a LITERAL ts predicate that reaches the parquet scan (PushedFilters;
    plan-pinned in tests/test_plans.py), so the exchange only ever sees the
    recent slice regardless of history depth."""
    ev = load_table(spark, sf_dir, "events")
    out = detect(
        ev, ["event_type"], "ts", "value", DET_CONF,
        tiebreak_cols=["event_id"],
        horizon=F.expr(f"INTERVAL {HORIZON_DAYS} DAYS"),
        horizon_anchor=F.expr(f"TIMESTAMP_NTZ'{HORIZON_ANCHOR}'"))
    return _round6(out.select("event_type", "n_points", "prob"), "prob")


def q_kafka_parse(spark, sf_dir):
    """The Kafka value-parsing contract, oracle-checked without the
    connector JAR: synthesize Kafka-wire JSON values (with a deterministic
    malformed-record subset) from the events table, run them through a file
    STREAM into sources.kafka.parse_json_values — the exact stage
    read_kafka_json_stream applies after the source — and drain
    availableNow. PERMISSIVE malformed handling (all-NULL struct) is part
    of the checked contract."""
    from anomalyzer_spark.sources.kafka import parse_json_values
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    # wire values via to_json (correct escaping of quotes/backslashes and
    # NULL handling — a hand-concatenated JSON string desyncs from the
    # oracle the moment a regenerated fixture ships a NULL or a quote)
    wire = stream.select(
        F.when(F.col("event_id") % 97 == 0, F.lit("not-json"))
        .otherwise(F.to_json(F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        ))).cast("binary").alias("value"),
        F.col("event_id").alias("kafka_key"),
    )
    parsed = parse_json_values(
        wire, "event_id long, event_type string, k long")
    q = (
        parsed.writeStream.format("memory")
        .queryName("q_kafka_parse_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("q_kafka_parse_mem")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # HARD CONSTRAINT: the driver's correctness gate records at most the
    # FIRST 50 entries (rounds 2/3 each silently dropped the 51st). Keep
    # this registry at EXACTLY 50 — to add a query, merge or retire one
    # first (tests/test_entry_oracle.py pins the count).
    return {
        "detect_det_onesided": q_detect_det_onesided,
        "text_pipeline": q_text_pipeline,
        "detect_bytest_det": q_detect_bytest_det,
        "detect_bytest_full": q_detect_bytest_full,
        "detect_wide": q_detect_wide,
        "detect_default": q_detect_default,
        "detect_full": q_detect_full,
        "detect_full_users": q_detect_full_users,
        "detect_multi_mc": q_detect_multi_mc,
        "text_profile": q_text_profile,
        "winnow": q_winnow,
        "bm25": q_bm25,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "minhash_stream": q_minhash_stream,
        "dedup_groups": q_dedup_groups,
        "semantic_pairs": q_semantic_pairs,
        "cdc_dedup": q_cdc_dedup,
        "data_pipeline": q_data_pipeline,
        "cosine_topk": q_cosine_topk,
        "emb_dedup_groups": q_emb_dedup_groups,
        "range_join": q_range_join,
        "curation_pipeline": q_curation_pipeline,
        "emb_pipeline": q_emb_pipeline,
        "quality_checks": q_quality_checks,
        "ivf_topk": q_ivf_topk,
        "dedup_paragraphs": q_dedup_paragraphs,
        "ivfpq_topk": q_ivfpq_topk,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "orders_rollup": q_orders_rollup,
        "dup_spans": q_dup_spans,
        "running_totals": q_running_totals,
        "events_json": q_events_json,
        "sketch_stats": q_sketch_stats,
        "skew_median": q_skew_median,
        "set_ops": q_set_ops,
        "asof_join": q_asof_join,
        "decontam": q_decontam,
        "drift_psi": q_drift_psi,
        "detect_rolling": q_detect_rolling,
        "detect_horizon": q_detect_horizon,
        "detect_stream": q_detect_stream,
        "detect_stream_mc": q_detect_stream_mc,
        "resample_stream": q_resample_stream,
        "snapshot_diff": q_snapshot_diff,
        "sessions_stream": q_sessions_stream,
        "dedup_stream": q_dedup_stream,
        "kafka_parse": q_kafka_parse,
        "multimodal": q_multimodal,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_NORM = ("trim(regexp_replace(regexp_replace(lower(text),"
         "'[^a-z0-9]+',' ','g'),'\\s+',' ','g'))")

_STOPWORDS = ("'the','and','of','to','is','in','that','it','was','for',"
              "'a','an','on','at','by','be','as','are','with','this'")


#: short SQL column suffix per combiner entry
_ENT = {"magnitude": "mag", "fence": "fence", "cdf": "cdf",
        "rank": "rank", "diff": "diff", "ks": "ks"}
_MC_METHODS = ("highrank", "lowrank", "diff", "ks")
#: permutation hash-stream ids — MUST equal oracle._TEST_ID
_TID = {"diff": 1, "highrank": 2, "lowrank": 3, "ks": 4}


def _perms_sql(tid: int, perm_count: int) -> str:
    """List of `perm_count` permutations of positions 0..n-1; permutation
    `rep` = argsort of md5(kpre || tid|rep|j) over j — the engine-portable
    shuffle spec of oracle.perm_matrix (identical in NumPy and here)."""
    return (
        f"list_transform(range(0, {perm_count}), rep -> "
        f"list_transform(list_sort(list_transform(range(0, n), j -> "
        f"struct_pack(h := md5(kpre || '{tid}|' || rep::VARCHAR || '|' || "
        f"j::VARCHAR), j := j))), s -> s.j))")


def _ks_sql(w: str) -> str:
    """Grid-interpolated two-sample KS over bound list var ``w`` whose first
    ref_n entries are the reference and last act_n the active window
    (oracle.ks_stat / algorithms.go:255-288)."""
    return (
        f"list_transform([struct_pack(mn := list_aggregate({w}, 'min'), "
        f"st := (list_aggregate({w}, 'max') - list_aggregate({w}, 'min')) "
        f"/ (act_n + ref_n - 1))], m -> "
        f"list_aggregate(list_transform(range(0, act_n + ref_n), i -> "
        f"abs(len(list_filter({w}[ref_n + 1 : ref_n + act_n], "
        f"x -> x <= m.mn + m.st * i))::DOUBLE / act_n "
        f"- len(list_filter({w}[1 : ref_n], "
        f"x -> x <= m.mn + m.st * i))::DOUBLE / ref_n)), 'max'))[1]")


def _detect_sql(key: str, conf: AnomalyzerConf, bytest: bool = False,
                src: str = "events",
                order_cols: tuple = ("ts", "event_id")) -> str:
    """DuckDB SQL implementing detect() for ANY method set — deterministic
    (magnitude, fence, cdf; mirrors operators/columnar.py) AND Monte-Carlo
    (highrank, lowrank, diff, ks; mirrors oracle.perm_matrix + the kernel —
    the hash-based permutation spec makes the MC tests SQL-expressible).

    ``key`` may be a single column or a comma-separated list; ``src`` a
    table name or parenthesized subquery; ``order_cols`` the event-time
    ordering (+ unique tiebreak) inside each key.

    Caveat (diff test only): a zero value inside a window makes the NumPy
    rel-diff ±inf but DuckDB's float division NULL — sf0.01 (the driver
    gate) has no zero values; don't hand-run the MC oracle at sf0.1.
    """
    methods = conf.methods
    a, r = conf.active_size, conf.reference_size
    n_win, sens, P = conf.window_size, conf.sensitivity, conf.perm_count
    entries = []  # combiner entries in probmap (= conf.methods) order
    for m in methods:
        e = "rank" if m in ("highrank", "lowrank") else m
        if e not in entries:
            entries.append(e)
    mc = [m for m in methods if m in _MC_METHODS]
    order_desc = ", ".join(f"{c} DESC" for c in order_cols)
    key_cols = [c.strip() for c in key.split(",")]

    # ---- observed-stats columns (emit only what the method set needs)
    sliced_cols, dfeat_cols = [], []
    if {"fence", "magnitude"} & set(methods):
        sliced_cols += [
            "list_sum(vec[n - act_n + 1 : n]) / act_n AS act_mean",
            "CASE WHEN ref_n > 0 THEN "
            "list_sum(vec[n - act_n - ref_n + 1 : n - act_n]) / ref_n "
            "END AS ref_mean"]
    if "cdf" in methods:
        sliced_cols.append(
            "list_transform(range(2, n + 1), i -> abs(vec[i] - vec[i-1])) "
            "AS adiffs")
    if "diff" in methods:
        sliced_cols.append(
            "list_transform(range(2, n + 1), i -> "
            "abs((vec[i] - vec[i-1]) / vec[i-1])) AS rdiffs")
    if {"highrank", "lowrank"} & set(methods):
        sliced_cols.append(
            "list_transform(vec, x -> len(list_filter(vec, y -> y < x))) "
            "AS rks")
    if {"cdf", "diff"} & set(methods):
        dfeat_cols += [
            "n - 1 AS nd",
            f"least({a}, n - 1) AS dact_n",
            f"least({r - 1}, n - 1 - least({a}, n - 1)) AS dref_n"]
    if {"highrank", "lowrank"} & set(methods):
        dfeat_cols.append(
            "list_sum(rks[n - act_n + 1 : n]) AS obs_rank_sum")
    if "ks" in methods:
        dfeat_cols.append(
            f"CASE WHEN ref_n < {a} OR ref_n % act_n != 0 THEN NULL "
            f"ELSE list_transform([vec], w -> {_ks_sql('w')})[1] "
            f"END AS obs_ks")
    obs_diff = (  # rank of each active |reldiff| within ALL |reldiff|s
        "list_sum(list_transform(rdiffs[nd - dact_n + 1 : nd], "
        "x -> len(list_filter(rdiffs, y -> y < x))))")

    # ---- per-test raw probabilities
    praw_cols = []
    if "fence" in methods:
        if conf.lower_bound is None:  # one-sided (reference NA LowerBound)
            dist = f"act_mean / {conf.upper_bound}"
        else:
            half = (conf.upper_bound - conf.lower_bound) / 2.0
            mid = conf.lower_bound + half
            dist = f"abs(act_mean - {mid}) / {half}"
        praw_cols.append(
            f"(pow(10, greatest(least({dist}, 1.0), 0.0)) - 1) / 9 "
            "AS p_fence_raw")
    if "magnitude" in methods:
        praw_cols.append(
            "CASE WHEN ref_n < 1 THEN NULL "
            "WHEN ref_mean = 0 THEN "
            "(CASE WHEN act_mean = 0 THEN 0.0 ELSE 1.0 END) "
            "ELSE abs(act_mean - ref_mean) / ref_mean END AS p_mag_raw")
    if "cdf" in methods:
        praw_cols.append(f"""CASE WHEN dref_n < {a} THEN NULL
         ELSE 2 * abs(0.5 - (
            len(list_filter(adiffs[nd - dact_n - dref_n + 1 : nd - dact_n],
                x -> x <= (list_sum(adiffs[nd - dact_n + 1 : nd]) / dact_n
                     - list_sum(adiffs[nd - dact_n - dref_n + 1 : nd - dact_n])
                       / dref_n)))::DOUBLE / dref_n))
    END AS p_cdf_raw""")
    for m, cmp_op in (("highrank", "<"), ("lowrank", ">")):
        if m in methods:
            praw_cols.append(
                f"CASE WHEN ref_n < {a} THEN NULL ELSE "
                f"len(list_filter(list_transform({_perms_sql(_TID[m], P)}, "
                f"p -> list_sum(list_transform(p[n - act_n + 1 : n], "
                f"jj -> rks[jj + 1]))), s -> s {cmp_op} obs_rank_sum))::DOUBLE "
                f"/ {P} END AS p_{'hr' if m == 'highrank' else 'lr'}_raw")
    if "diff" in methods:
        praw_cols.append(
            f"CASE WHEN dref_n < {a} THEN NULL ELSE "
            f"len(list_filter(list_transform({_perms_sql(_TID['diff'], P)}, "
            f"p -> list_transform([list_transform(range(2, n + 1), i -> "
            f"abs((vec[p[i] + 1] - vec[p[i - 1] + 1]) / vec[p[i - 1] + 1]))], "
            f"d -> list_sum(list_transform(d[nd - dact_n + 1 : nd], "
            f"x -> len(list_filter(d, y -> y < x)))))[1]), "
            f"s -> s < {obs_diff}))::DOUBLE / {P} END AS p_diff_raw")
    if "ks" in methods:
        praw_cols.append(
            f"CASE WHEN obs_ks IS NULL THEN NULL ELSE "
            f"len(list_filter(list_transform({_perms_sql(_TID['ks'], P)}, "
            f"p -> list_transform([list_transform(p, jj -> vec[jj + 1])], "
            f"w -> {_ks_sql('w')})[1]), kk -> kk < obs_ks))::DOUBLE "
            f"/ {P} END AS p_ks_raw")

    # ---- cap [0,1] (NULL = NA passes through), fold highrank/lowrank
    raw_names = [c.rsplit(" AS ", 1)[1].strip() for c in praw_cols]
    capped_cols = [
        f"CASE WHEN {rn} IS NULL THEN NULL "
        f"ELSE greatest(least({rn}, 1.0), 0.0) END AS {rn[:-4]}"
        for rn in raw_names]
    merged_cols = []  # only 'rank' needs folding; other p_* already exist
    if "rank" in entries:
        pair = [f"p_{'hr' if m == 'highrank' else 'lr'}"
                for m in ("highrank", "lowrank") if m in methods]
        # DuckDB greatest skips NULLs (like Spark) = "NA dropped / max"
        expr = pair[0] if len(pair) == 1 else f"greatest({pair[0]}, {pair[1]})"
        merged_cols.append(f"{expr} AS p_rank")

    # ---- dynamic weights + weighted mean in probmap order
    weight = {e: (f"(CASE WHEN p_{_ENT[e]} > 0.8 THEN 5.0 ELSE 0.5 "
                  "END)::DOUBLE")
              if e in ("magnitude", "fence") else "0.5" for e in entries}
    weighted_cols = [f"{weight[e]} AS w_{_ENT[e]}" for e in entries
                     if e in ("magnitude", "fence")]
    wref = {e: f"w_{_ENT[e]}" if e in ("magnitude", "fence") else "0.5"
            for e in entries}
    num = " + ".join(f"coalesce(p_{_ENT[e]} * {wref[e]}, 0)" for e in entries)
    den = " + ".join(
        f"(CASE WHEN p_{_ENT[e]} IS NOT NULL THEN {wref[e]} ELSE 0 END)"
        for e in entries)

    gate = (f"WHEN p_mag IS NOT NULL AND p_mag < {sens} THEN 0.0 "
            if "magnitude" in methods else "")
    delay = (f"WHEN n_points < {n_win} THEN 0.0 " if conf.delay else "")
    per_test = "\n" + "\n".join(
        f"  round(p_{_ENT[e]}, 6) AS prob_{e},"
        f"  (CASE WHEN p_{_ENT[e]} IS NOT NULL THEN {wref[e]} "
        f"END)::DOUBLE AS weight_{e}," for e in entries)

    # NULL key components → 'None' sentinel, matching kernel.key_str_col
    # and the streaming path's str(None). Documented collision: a literal
    # string key 'None' draws the same permutation stream as a NULL key
    # (see key_str_col docstring).
    kpre = (f", '{conf.seed}|' || concat_ws('|', "
            + ", ".join(f"coalesce({c}::VARCHAR, 'None')" for c in key_cols)
            + ") || '|' AS kpre" if mc else "")
    nl = ",\n    "
    return f"""
WITH ranked AS (
  SELECT {key}, value,
         row_number() OVER (PARTITION BY {key}
                            ORDER BY {order_desc}) AS rn
  FROM {src}
),
tails AS (
  SELECT {key}, list(value ORDER BY rn DESC) AS vec, count(*) AS n_points
  FROM ranked WHERE rn <= {n_win} GROUP BY {key}
),
feat AS (
  SELECT {key}, n_points, vec, len(vec) AS n,
         least({a}, len(vec)) AS act_n,
         least({r}, len(vec) - least({a}, len(vec))) AS ref_n{kpre}
  FROM tails
),
sliced AS (
  SELECT *{nl if sliced_cols else ''}{nl.join(sliced_cols)}
  FROM feat
),
dfeat AS (
  SELECT *{nl if dfeat_cols else ''}{nl.join(dfeat_cols)}
  FROM sliced
),
praw AS (
  SELECT *{nl if praw_cols else ''}{nl.join(praw_cols)}
  FROM dfeat
),
capped AS (
  SELECT *{nl if capped_cols else ''}{nl.join(capped_cols)}
  FROM praw
),
merged AS (
  SELECT *{nl if merged_cols else ''}{nl.join(merged_cols)}
  FROM capped
),
weighted AS (
  SELECT *{nl if weighted_cols else ''}{nl.join(weighted_cols)}
  FROM merged
),
combined AS (
  SELECT *,
    {num} AS num,
    {den} AS den
  FROM weighted
)
SELECT {key}, n_points,{per_test if bytest else ''}
  round(CASE {delay}{gate}WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS prob
FROM combined"""


def _rolling_sql(key: str, conf: AnomalyzerConf) -> str:
    """DuckDB SQL for detect_rolling (per-row window-frame eval)."""
    a, r = conf.active_size, conf.reference_size
    half = (conf.upper_bound - conf.lower_bound) / 2.0
    mid = conf.lower_bound + half
    sens = conf.sensitivity
    part = f"PARTITION BY {key} ORDER BY ts, event_id"
    return f"""
WITH d AS (
  SELECT {key}, event_id, ts, value,
    abs(value - lag(value) OVER ({part})) AS dv
  FROM events),
wagg AS (
  SELECT {key}, event_id,
    count(value) OVER wall AS n_points,
    avg(value) OVER wact AS act_mean,
    avg(value) OVER wref AS ref_mean,
    count(value) OVER wref AS ref_n,
    avg(dv) OVER wact AS dact_mean,
    avg(dv) OVER wdref AS dref_mean,
    count(dv) OVER wdref AS dref_n,
    list(dv) OVER wdref AS dref_arr
  FROM d
  WINDOW
    wall AS ({part} ROWS BETWEEN {a + r - 1} PRECEDING AND CURRENT ROW),
    wact AS ({part} ROWS BETWEEN {a - 1} PRECEDING AND CURRENT ROW),
    wref AS ({part} ROWS BETWEEN {a + r - 1} PRECEDING AND {a} PRECEDING),
    wdref AS ({part} ROWS BETWEEN {a + r - 2} PRECEDING AND {a} PRECEDING)
),
praw AS (
  SELECT {key}, event_id, n_points,
    (pow(10, greatest(least(abs(act_mean - {mid}) / {half}, 1.0), 0.0)) - 1) / 9
      AS p_fence_raw,
    CASE WHEN ref_n < 1 THEN NULL
         WHEN ref_mean = 0 THEN (CASE WHEN act_mean = 0 THEN 0.0 ELSE 1.0 END)
         ELSE abs(act_mean - ref_mean) / ref_mean END AS p_mag_raw,
    CASE WHEN dref_n < {a} THEN NULL
         ELSE 2 * abs(0.5 - (len(list_filter(dref_arr,
              x -> x <= (dact_mean - dref_mean)))::DOUBLE / dref_n))
    END AS p_cdf_raw
  FROM wagg),
capped AS (
  SELECT {key}, event_id, n_points,
    CASE WHEN p_fence_raw IS NULL THEN NULL
         ELSE greatest(least(p_fence_raw, 1.0), 0.0) END AS p_fence,
    CASE WHEN p_mag_raw IS NULL THEN NULL
         ELSE greatest(least(p_mag_raw, 1.0), 0.0) END AS p_mag,
    CASE WHEN p_cdf_raw IS NULL THEN NULL
         ELSE greatest(least(p_cdf_raw, 1.0), 0.0) END AS p_cdf
  FROM praw),
weighted AS (
  SELECT *,
    (CASE WHEN p_fence > 0.8 THEN 5.0 ELSE 0.5 END)::DOUBLE AS w_fence,
    (CASE WHEN p_mag > 0.8 THEN 5.0 ELSE 0.5 END)::DOUBLE AS w_mag
  FROM capped),
combined AS (
  SELECT *,
    coalesce(p_mag * w_mag, 0) + coalesce(p_fence * w_fence, 0)
      + coalesce(p_cdf * 0.5, 0) AS num,
    (CASE WHEN p_mag IS NOT NULL THEN w_mag ELSE 0 END)
      + (CASE WHEN p_fence IS NOT NULL THEN w_fence ELSE 0 END)
      + (CASE WHEN p_cdf IS NOT NULL THEN 0.5 ELSE 0 END) AS den
  FROM weighted)
SELECT {key}, event_id, n_points,
  round(CASE WHEN p_mag IS NOT NULL AND p_mag < {sens} THEN 0.0
             WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS prob
FROM combined"""


_SHINGLES = f"""
docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
w AS (SELECT doc_id, string_split(norm, ' ') AS w FROM docs),
sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                       i -> array_to_string(w[i:i+2], ' '))) AS shingles
       FROM w)"""


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB oracle SQL per query name.

    ``sf_dir`` fits the data-dependent model literals (ivf/pq quantizers)
    on that scale factor's embeddings; default is the
    SPARK_GRAFT_ORACLE_SF_DIR env var, then sf0.01 (the driver's
    correctness gate). Callers comparing at another sf MUST pass it.
    """
    sql: dict[str, str] = {}

    sql["detect_det_onesided"] = _detect_sql("event_type", ONESIDED_CONF)
    sql["detect_bytest_det"] = _detect_sql("event_type", DET_CONF, bytest=True)
    sql["detect_wide"] = _detect_sql("event_type", WIDE_CONF)
    multi_src = """(
  SELECT event_type, 'value' AS metric, ts, event_id, value FROM events
  UNION ALL
  SELECT event_type, 'log1p' AS metric, ts, event_id, ln(1 + value) AS value
  FROM events)"""
    sql["detect_multi_mc"] = _detect_sql("event_type, metric", DEFAULT_CONF,
                                         src=multi_src)
    # the streaming paths must converge to the same answer as batch detect
    sql["detect_stream"] = _detect_sql("event_type", DET_CONF)
    sql["detect_stream_mc"] = _detect_sql("event_type", DEFAULT_CONF)
    sql["detect_rolling"] = _rolling_sql("event_type", DET_CONF)

    day_us = 86400 * 1_000_000
    resample_src = f"""(
  SELECT event_type, (epoch_us(ts) // {day_us})::BIGINT AS bucket,
         sum(value::DECIMAL(28,6))::DOUBLE / count(value) AS value,
         count(*) AS n_raw
  FROM events GROUP BY 1, 2)"""
    # quality-checks oracle: the identical 8 metrics in one aggregate CTE,
    # unpivoted by UNION ALL; thresholds cast ::DOUBLE (DuckDB decimal
    # literals otherwise), mean passed coalesced false on empty.
    sql["quality_checks"] = """
WITH m AS (SELECT
  count(o_custkey)::DOUBLE / count(*) AS m0,
  count(DISTINCT o_orderkey)::DOUBLE / count(o_orderkey) AS m1,
  count(CASE WHEN o_totalprice BETWEEN 1000 AND 450000 THEN 1
        END)::DOUBLE / count(o_totalprice) AS m2,
  count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)::DOUBLE
    / count(o_orderstatus) AS m3,
  count(CASE WHEN regexp_full_match(o_orderpriority, '[1-5]-[A-Z]+')
        THEN 1 END)::DOUBLE / count(o_orderpriority) AS m4,
  avg(o_totalprice) AS m5,
  count(*)::DOUBLE AS m6,
  count(CASE WHEN o_totalprice > 0 THEN 1 END)::DOUBLE / count(*) AS m7
  FROM orders)
SELECT '0:completeness' AS check, 'o_custkey' AS "column",
       'non_null_ratio' AS metric, round(m0, 6) AS value,
       1.0::DOUBLE AS threshold, m0 >= 1.0 AS passed FROM m
UNION ALL SELECT '1:uniqueness', 'o_orderkey', 'distinct_ratio',
       round(m1, 6), 1.0::DOUBLE, m1 >= 1.0 FROM m
UNION ALL SELECT '2:in_range', 'o_totalprice', 'in_range_ratio',
       round(m2, 6), 0.9::DOUBLE, m2 >= 0.9 FROM m
UNION ALL SELECT '3:in_set', 'o_orderstatus', 'in_set_ratio',
       round(m3, 6), 1.0::DOUBLE, m3 >= 1.0 FROM m
UNION ALL SELECT '4:matches', 'o_orderpriority', 'match_ratio',
       round(m4, 6), 1.0::DOUBLE, m4 >= 1.0 FROM m
UNION ALL SELECT '5:mean_between', 'o_totalprice', 'mean', round(m5, 6),
       NULL::DOUBLE, coalesce(m5 BETWEEN 100.0 AND 500000.0, false) FROM m
UNION ALL SELECT '6:row_count', NULL, 'rows', round(m6, 6),
       NULL::DOUBLE, m6 >= 1 FROM m
UNION ALL SELECT '7:satisfies', 'price_positive', 'satisfied_ratio',
       round(m7, 6), 1.0::DOUBLE, m7 >= 1.0 FROM m
UNION ALL SELECT '8:top_share', 'o_orderpriority', 'top2_share',
       round(m8, 6), NULL::DOUBLE, m8 <= 0.9 FROM (
  WITH cnts AS (SELECT o_orderpriority AS v, count(*)::BIGINT AS c
                FROM orders WHERE o_orderpriority IS NOT NULL
                GROUP BY o_orderpriority),
  rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, v ASC) AS rn
         FROM cnts)
  SELECT sum(CASE WHEN rn <= 2 THEN c END)::DOUBLE / sum(c) AS m8
  FROM rk)"""

    # drift oracle: per-column CTE block (bounds from OLD, 10 equi-width
    # bins + NULL bucket -1, edge clamp, Laplace alpha=0.5 over B=11,
    # PSI rounded 6); row counts ::BIGINT (DuckDB sum -> HUGEINT).
    def _psi_block(col: str, newv: str) -> str:
        bucket = (
            "CASE WHEN {v} IS NULL THEN -1 "
            "WHEN (SELECT hi FROM b) <= (SELECT lo FROM b) THEN 0 "
            "ELSE least(9, greatest(0, floor(({v} - (SELECT lo FROM b)) / "
            "(((SELECT hi FROM b) - (SELECT lo FROM b)) / 10))::INT)) END")
        return f"""(
WITH b AS (SELECT min({col}::DOUBLE) AS lo, max({col}::DOUBLE) AS hi
           FROM orders),
o AS (SELECT {bucket.format(v=f'{col}::DOUBLE')} AS bucket, count(*) cnt
      FROM orders GROUP BY 1),
n AS (SELECT {bucket.format(v='v')} AS bucket, count(*) cnt
      FROM (SELECT {newv} AS v FROM orders) GROUP BY 1),
j AS (SELECT coalesce(o.bucket, n.bucket) AS bucket,
             coalesce(o.cnt, 0) AS oc, coalesce(n.cnt, 0) AS nc
      FROM o FULL OUTER JOIN n ON o.bucket = n.bucket),
t AS (SELECT sum(oc) AS ot, sum(nc) AS nt FROM j)
SELECT '{col}' AS "column", round(sum((p - q) * ln(p / q)), 6) AS psi,
       (SELECT ot FROM t)::BIGINT AS old_rows,
       (SELECT nt FROM t)::BIGINT AS new_rows
FROM (SELECT (oc + 0.5) / ((SELECT ot FROM t) + 5.5) AS p,
             (nc + 0.5) / ((SELECT nt FROM t) + 5.5) AS q FROM j))"""

    # categorical lane: old top-3 vocabulary (count desc, value asc),
    # __OTHER__/__NULL__ buckets, Laplace over B = top_k + 2 = 5
    cat_psi = """(
WITH vocab AS (SELECT o_orderstatus AS v FROM orders
               WHERE o_orderstatus IS NOT NULL
               GROUP BY 1 ORDER BY count(*) DESC, v ASC LIMIT 3),
o AS (SELECT CASE WHEN o_orderstatus IS NULL THEN '__NULL__'
        WHEN o_orderstatus IN (SELECT v FROM vocab) THEN o_orderstatus
        ELSE '__OTHER__' END AS bucket, count(*) cnt
      FROM orders GROUP BY 1),
n AS (SELECT CASE WHEN v IS NULL THEN '__NULL__'
        WHEN v IN (SELECT v FROM vocab) THEN v
        ELSE '__OTHER__' END AS bucket, count(*) cnt
      FROM (SELECT CASE WHEN o_orderkey % 4 = 0 THEN 'Z'
                   ELSE o_orderstatus END AS v FROM orders) GROUP BY 1),
j AS (SELECT coalesce(o.bucket, n.bucket) AS bucket,
             coalesce(o.cnt, 0) AS oc, coalesce(n.cnt, 0) AS nc
      FROM o FULL OUTER JOIN n ON o.bucket = n.bucket),
t AS (SELECT sum(oc) AS ot, sum(nc) AS nt FROM j)
SELECT 'o_orderstatus' AS "column",
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       (SELECT ot FROM t)::BIGINT AS old_rows,
       (SELECT nt FROM t)::BIGINT AS new_rows
FROM (SELECT (oc + 0.5) / ((SELECT ot FROM t) + 2.5) AS p,
             (nc + 0.5) / ((SELECT nt FROM t) + 2.5) AS q FROM j))"""

    sql["drift_psi"] = (
        _psi_block("o_totalprice", "o_totalprice::DOUBLE * 1.2")
        + "\nUNION ALL\n"
        + _psi_block("o_custkey",
                     "CASE WHEN o_orderkey % 5 = 0 THEN NULL "
                     "ELSE o_custkey::DOUBLE END")
        + "\nUNION ALL\n"
        + _psi_block("o_orderkey", "o_orderkey::DOUBLE")
        + "\nUNION ALL\n" + cat_psi)
    # sessionization oracle: identical islands formulation (lag + running
    # sum of gap-breaks) over µs event time with the event_id tiebreak.
    # snapshot delta: same old/new derivation as the Spark side, md5 over
    # the raw text bytes, one FULL OUTER join, unchanged rows dropped.
    sql["snapshot_diff"] = """
WITH old AS (SELECT doc_id, md5(text) AS old_hash FROM documents),
new_base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0),
added AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id < 10),
new AS (SELECT doc_id, md5(text) AS new_hash
        FROM (SELECT * FROM new_base UNION ALL SELECT * FROM added)),
j AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id, old_hash,
             new_hash, old.doc_id IS NOT NULL AS in_old,
             new.doc_id IS NOT NULL AS in_new
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id),
cls AS (
  SELECT doc_id, old_hash, new_hash,
         CASE WHEN NOT in_old THEN 'added'
              WHEN NOT in_new THEN 'removed'
              WHEN old_hash IS NOT DISTINCT FROM new_hash THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM j),
upsert_h AS (
  SELECT doc_id, md5(text || ' v2') AS h FROM documents
  WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(text) AS h FROM documents
  WHERE doc_id < 10),
changes AS (
  SELECT doc_id, md5('DECOY') AS h, 1 AS seq, 'upsert' AS op FROM upsert_h
  UNION ALL SELECT doc_id, h, 2 AS seq, 'upsert' AS op FROM upsert_h
  UNION ALL SELECT doc_id, md5('') AS h, 3 AS seq, 'delete' AS op
            FROM documents WHERE doc_id % 7 = 0),
latest AS (
  SELECT doc_id, h, op FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) rn
    FROM changes) WHERE rn = 1),
changes2 AS (
  SELECT * FROM changes
  UNION ALL SELECT doc_id, md5('V1') AS h, 1 AS seq, 'upsert' AS op
            FROM documents WHERE doc_id % 7 = 0),
scd AS (
  SELECT doc_id, count(*)::BIGINT AS scd2_versions,
         sum(is_current::INT)::BIGINT AS scd2_open,
         max(valid_from)::BIGINT AS scd2_last_from,
         max(valid_to)::BIGINT AS scd2_max_to
  FROM (
    SELECT * FROM (
      SELECT doc_id, op, seq AS valid_from,
             lead(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to,
             (lead(seq) OVER (PARTITION BY doc_id ORDER BY seq) IS NULL
              AND op <> 'delete') AS is_current
      FROM changes2)
    WHERE op <> 'delete')
  GROUP BY doc_id)
SELECT cls.doc_id, status, old_hash, new_hash, r.rebuilt_hash,
       scd.scd2_versions, scd.scd2_open, scd.scd2_last_from,
       scd.scd2_max_to
FROM cls LEFT JOIN (SELECT doc_id, h AS rebuilt_hash FROM latest
                    WHERE op <> 'delete') r ON cls.doc_id = r.doc_id
LEFT JOIN scd ON cls.doc_id = scd.doc_id
WHERE status <> 'unchanged'"""

    # streaming watermarked resample: emitted = batch buckets whose window
    # END has passed the final watermark (max event time - 1h). Spark
    # tracks watermarks in ms-truncated event time (EventTimeStatsAccum),
    # so the oracle truncates max(epoch_us) to ms before subtracting the
    # delay — without this, a max timestamp with a sub-ms component could
    # make the oracle emit a bucket Spark withholds.
    sql["resample_stream"] = f"""
SELECT event_type, bucket, (bucket * 86400)::BIGINT AS bucket_ts,
       round(value, 6) AS value, n_raw
FROM {resample_src} t
WHERE (bucket + 1) * 86400000000 <=
      (SELECT (max(epoch_us(ts)) // 1000) * 1000 - 3600000000 FROM events)"""
    sql["multimodal_meta"] = """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5, 'unknown' AS format
FROM documents"""
    # byte-level features over the UTF-8 payload: mirrors
    # multimodal.byte_features exactly (integer byte sums, order-free
    # mean/std, entropy over ascending byte values — list_histogram keys
    # come back sorted).
    sql["multimodal_features"] = """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text))::BIGINT AS n_bytes
  FROM documents),
bs AS (
  SELECT doc_id, n_bytes,
    list_transform(range(0, n_bytes::INT), i ->
      ('0x' || substr(hx, (2*i + 1)::INT, 2))::BIGINT) AS bytes
  FROM b),
feat AS (
  SELECT doc_id, n_bytes,
    list_sum(bytes)::DOUBLE AS s1,
    list_sum(list_transform(bytes, x -> x * x))::DOUBLE AS s2,
    list_transform(map_values(list_histogram(bytes)), c -> c::DOUBLE) AS cnts
  FROM bs)
SELECT doc_id, n_bytes,
  CASE WHEN n_bytes = 0 THEN 0.0
       ELSE round(s1 / n_bytes, 6) END AS byte_mean,
  CASE WHEN n_bytes = 0 THEN 0.0
       ELSE round(sqrt(greatest(
              s2 / n_bytes - (s1 / n_bytes) * (s1 / n_bytes), 0.0)), 6)
  END AS byte_std,
  CASE WHEN n_bytes = 0 THEN 0.0
       ELSE round(-list_sum(list_transform(cnts, c ->
              (c / n_bytes) * log2(c / n_bytes))), 6)
  END AS byte_entropy
FROM feat"""
    # Monte-Carlo detect queries: the hash-based permutation spec
    # (oracle.perm_matrix) is plain md5 + argsort, so the MC tests — the
    # reference's DEFAULT method set (anomalyze.go:33-36) — get full DuckDB
    # oracles too.
    sql["detect_default"] = _detect_sql("event_type", DEFAULT_CONF)
    sql["detect_full"] = _detect_sql("event_type", FULL_CONF)
    sql["detect_full_users"] = _detect_sql("user_id", FULL_CONF)
    sql["detect_bytest_full"] = _detect_sql("event_type", FULL_CONF,
                                            bytest=True)

    sql["text_stats"] = f"""
WITH base AS (
  SELECT doc_id, text,
    length(text)::DOUBLE AS nc,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::DOUBLE AS ntok,
    len(regexp_extract_all(lower(text), '[a-z]+'))::DOUBLE AS nwords,
    length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE AS word_chars,
    len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS punct,
    len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS digits,
    len(regexp_extract_all(text, '[A-Z]'))::DOUBLE AS uppers,
    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
        x -> x IN ({_STOPWORDS})))::DOUBLE AS stops
  FROM documents
),
ratios AS (
  SELECT doc_id, nc, ntok, nwords, word_chars,
    coalesce(stops / nullif(ntok, 0), 0.0) AS stopword_ratio,
    coalesce(punct / nullif(nc, 0), 0.0) AS punct_ratio,
    coalesce(digits / nullif(nc, 0), 0.0) AS digit_ratio,
    coalesce(uppers / nullif(nc, 0), 0.0) AS upper_ratio,
    coalesce(word_chars / nullif(nwords, 0), 0.0) AS avg_word_len,
    coalesce(word_chars / nullif(nc, 0), 0.0) AS alpha_ratio
  FROM base
)
SELECT doc_id, nc::BIGINT AS n_chars, ntok::BIGINT AS n_tokens,
  nwords::BIGINT AS n_words,
  round(avg_word_len, 6) AS avg_word_len,
  round(punct_ratio, 6) AS punct_ratio,
  round(digit_ratio, 6) AS digit_ratio,
  round(upper_ratio, 6) AS upper_ratio,
  round(stopword_ratio, 6) AS stopword_ratio,
  round(greatest(least(
      0.4 * least(nc / 500.0, 1.0) + 0.4 * alpha_ratio
      + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0)), 1.0), 0.0), 6)
    AS quality_score
FROM ratios"""

    langs = {
        "de": "der|die|und|das|ist|nicht|ein|mit|auf|den",
        "en": "the|and|of|to|is|in|that|it|was|for",
        "es": "el|la|de|que|los|las|una|por|con|del",
        "fr": "le|les|des|est|une|dans|pour|qui|pas|sur",
    }
    score_cols = ",\n    ".join(
        f"len(regexp_extract_all(lower(text), '\\b({pat})\\b'))::BIGINT AS score_{lang}"
        for lang, pat in langs.items()
    )
    order = ["de", "en", "es", "fr", "zh"]
    branches = "\n    ".join(
        "WHEN " + " AND ".join(
            f"score_{l} >= score_{o}" for o in order if o != l
        ) + f" THEN '{l}'"
        for l in order[:-1]
    )
    sql["lang_id"] = f"""
WITH scores AS (
  SELECT doc_id,
    {score_cols},
    len(regexp_extract_all(text, '[一-鿿]'))::BIGINT AS score_zh
  FROM documents
)
SELECT doc_id,
  CASE
    {branches}
    ELSE 'zh' END AS lang_pred,
  score_de, score_en, score_es, score_fr, score_zh
FROM scores"""

    sql["fingerprint"] = f"""
SELECT doc_id, md5({_NORM}) AS fingerprint, length({_NORM}) AS norm_len
FROM documents"""

    sql["token_count"] = """
SELECT doc_id,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
    AS lex_tokens
FROM documents"""

    sql["winnow"] = f"""
WITH docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
g AS (SELECT doc_id, norm, greatest(length(norm) - 7, 0) AS ngrams FROM docs),
h AS (SELECT doc_id,
  CASE WHEN ngrams > 0 THEN
    list_transform(range(1, ngrams + 1), i ->
      ('0x' || substr(md5(substr(norm, i::INT, 8)), 1, 8))::BIGINT)
  ELSE [] END AS hashes FROM g),
m AS (SELECT doc_id, len(hashes) AS n_grams,
  CASE WHEN len(hashes) > 0 THEN
    list_transform(range(1, greatest(len(hashes) - 3, 1) + 1), i ->
      list_aggregate(hashes[i : i + 3], 'min'))
  ELSE [] END AS mins FROM h),
fmex AS (SELECT doc_id, len(list_distinct(mins)) AS nfp,
         unnest(list_distinct(mins)) AS fp2 FROM m),
fmp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          count(*)::BIGINT AS shared,
          round(count(*)::DOUBLE / least(min(a.nfp), min(b.nfp)), 6)
            AS overlap
        FROM fmex a JOIN fmex b ON a.fp2 = b.fp2 AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
fmd AS (SELECT doc_id, count(*)::BIGINT AS fm_pairs,
          max(overlap) AS fm_best
        FROM (SELECT id_a AS doc_id, overlap FROM fmp
              UNION ALL SELECT id_b AS doc_id, overlap FROM fmp)
        GROUP BY doc_id)
SELECT m.doc_id, n_grams, unnest(list_distinct(mins)) AS fp,
       fmd.fm_pairs, fmd.fm_best
FROM m LEFT JOIN fmd ON m.doc_id = fmd.doc_id"""

    # bm25: full replay — word_tokens lexical spec, distinct query terms,
    # Lucene idf, tf/length normalization, per-query top-k with the
    # (score DESC, doc_id) tiebreak. Queries inlined from BM25_QUERIES.
    _bm25_q = ", ".join(f"({i}, '{s}')" for i, s in BM25_QUERIES)
    _tokx = "regexp_extract_all(lower({0}), '[a-z]+|[0-9]+|[^a-z0-9\\s]')"
    sql["bm25"] = f"""
WITH queries(query_id, query) AS (VALUES {_bm25_q}),
q AS (
  SELECT query_id, unnest(list_distinct({_tokx.format('query')})) AS token
  FROM queries),
dtok AS (
  SELECT doc_id, len({_tokx.format('text')}) AS dl,
         unnest({_tokx.format('text')}) AS token
  FROM documents),
post AS (
  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
  FROM dtok WHERE token IN (SELECT DISTINCT token FROM q)
  GROUP BY 1, 2),
stats AS (
  SELECT count(*) AS n, avg(len({_tokx.format('text')})) AS avgdl
  FROM documents),
ts AS (
  SELECT p.doc_id, p.token,
         ln(1 + (s.n - f.doc_freq + 0.5) / (f.doc_freq + 0.5))
           * p.tf * 2.2
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)) AS tsc
  FROM post p
  JOIN (SELECT token, count(*) AS doc_freq FROM post GROUP BY 1) f
    USING (token)
  CROSS JOIN stats s),
sc AS (
  SELECT q.query_id, t.doc_id, round(sum(t.tsc), 6) AS score
  FROM ts t JOIN q USING (token) GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM sc),
lex AS (SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= {BM25_K}),
cq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < {len(BM25_QUERIES)}),
cc AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv
       FROM embeddings),
cs AS (SELECT query_id, doc_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(cv, cv))) AS cos_sim
       FROM cq CROSS JOIN cc),
cr AS (SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, doc_id) AS rnk
       FROM cs WHERE cos_sim IS NOT NULL),
contrib AS (
  SELECT query_id, doc_id, 1.0 / (60 + rnk) AS c FROM lex
  UNION ALL
  SELECT query_id, doc_id, 0.7 / (60 + rnk) AS c
  FROM cr WHERE rnk <= {BM25_K}),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score
  FROM contrib GROUP BY 1, 2),
frk AS (
  SELECT query_id, doc_id, rrf_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id) AS hybrid_rnk
  FROM fused)
SELECT l.query_id, l.doc_id, l.score, l.rnk, f.rrf_score, f.hybrid_rnk
FROM lex l LEFT JOIN (SELECT * FROM frk WHERE hybrid_rnk <= {BM25_K}) f
  USING (query_id, doc_id)"""

    # decontam: replays word_shingles' normalized DISTINCT 8-grams for
    # both sides (eval = every 97th document), the gram join, and the
    # per-document hit aggregate (mirrors tests/test_decontam.py).
    sql["decontam"] = f"""
WITH norm AS (SELECT doc_id, {_NORM} AS norm FROM documents),
w AS (SELECT doc_id, string_split(norm, ' ') AS w FROM norm),
g AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(w) - 7, 1) + 1),
          i -> array_to_string(w[i:i+7], ' '))) AS grams
      FROM w),
tr AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM g),
ev AS (SELECT doc_id AS eval_id, unnest(grams) AS gram FROM g
       WHERE doc_id % 97 = 0),
hits AS (
  SELECT tr.doc_id, any_value(n_grams) AS n_grams,
         count(DISTINCT gram) AS n_hit_grams,
         count(DISTINCT eval_id) AS n_eval_docs
  FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id),
mshits AS (
  SELECT tr.doc_id,
         CASE WHEN eval_id % 194 = 0 THEN 'sA' ELSE 'sB' END AS suite,
         any_value(n_grams) AS n_grams,
         count(DISTINCT gram) AS hit,
         count(DISTINCT eval_id) AS ed
  FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id, suite),
msp AS (
  SELECT doc_id,
    max(CASE WHEN suite = 'sA' THEN hit END)::BIGINT AS ms_a_hits,
    max(CASE WHEN suite = 'sA' THEN ed END)::BIGINT AS ms_a_docs,
    max(CASE WHEN suite = 'sA' THEN round(hit / n_grams, 6) END)
      AS ms_a_cont,
    max(CASE WHEN suite = 'sB' THEN hit END)::BIGINT AS ms_b_hits,
    max(CASE WHEN suite = 'sB' THEN ed END)::BIGINT AS ms_b_docs,
    max(CASE WHEN suite = 'sB' THEN round(hit / n_grams, 6) END)
      AS ms_b_cont
  FROM mshits WHERE hit >= 1 GROUP BY doc_id),
fzw AS (SELECT doc_id, w FROM w
        WHERE len(list_filter(w, x -> x != '')) > 0),
fzsh AS (SELECT doc_id,
           list_distinct(list_transform(
             range(1, greatest(len(w) - 2, 1) + 1),
             i -> array_to_string(w[i:i+2], ' '))) AS shingles
         FROM fzw),
fzcw AS (SELECT doc_id, shingles,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS h1s,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 9, 8))::BIGINT) AS h2s
  FROM fzsh),
fzsig AS (SELECT doc_id,
    list_transform(range(0, 32), i ->
      list_aggregate(list_transform(range(1, len(h1s) + 1),
                     j -> (h1s[j] + i * h2s[j]) % 4294967296), 'min'))
      AS sig
  FROM fzcw),
fztb AS (SELECT doc_id,
    unnest(list_transform(range(0, 8), b ->
      md5(b::VARCHAR || '|' ||
          array_to_string(list_transform(sig[b * 4 + 1 : b * 4 + 4],
                          v -> v::VARCHAR), ',')))) AS bucket
  FROM fzsig),
fzesh AS (SELECT eval_id,
    list_distinct(list_transform(
      range(1, greatest(len(tw) - 2, 1) + 1),
      i -> array_to_string(tw[i:i+2], ' '))) AS shingles
  FROM (SELECT doc_id AS eval_id, w[1 : (6 + doc_id % 25)::INT] AS tw
        FROM fzw WHERE doc_id % 97 = 0)),
fzecw AS (SELECT eval_id, shingles,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS h1s,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 9, 8))::BIGINT) AS h2s
  FROM fzesh),
fzesig AS (SELECT eval_id,
    list_transform(range(0, 32), i ->
      list_aggregate(list_transform(range(1, len(h1s) + 1),
                     j -> (h1s[j] + i * h2s[j]) % 4294967296), 'min'))
      AS sig
  FROM fzecw),
fzeb AS (SELECT eval_id,
    unnest(list_transform(range(0, 8), b ->
      md5(b::VARCHAR || '|' ||
          array_to_string(list_transform(sig[b * 4 + 1 : b * 4 + 4],
                          v -> v::VARCHAR), ',')))) AS bucket
  FROM fzesig),
fzcand AS (SELECT DISTINCT t.doc_id, e.eval_id
           FROM fztb t JOIN fzeb e USING (bucket)),
fzver AS (SELECT c.doc_id, c.eval_id,
    round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
          (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))), 6) AS j
  FROM fzcand c
  JOIN fzsh sa ON sa.doc_id = c.doc_id
  JOIN fzesh sb ON sb.eval_id = c.eval_id),
fz AS (SELECT doc_id, count(*)::BIGINT AS fz_hits, max(j) AS fz_best
       FROM fzver WHERE j >= 0.3 GROUP BY doc_id),
exact AS (
  SELECT doc_id, n_grams, n_hit_grams, n_eval_docs,
         round(n_hit_grams / n_grams, 6) AS contamination,
         n_grams AS bl_n_grams, n_hit_grams AS bl_n_hit_grams,
         n_eval_docs AS bl_n_eval_docs,
         round(n_hit_grams / n_grams, 6) AS bl_contamination,
         msp.ms_a_hits, msp.ms_a_docs, msp.ms_a_cont,
         msp.ms_b_hits, msp.ms_b_docs, msp.ms_b_cont
  FROM hits JOIN msp USING (doc_id) WHERE n_hit_grams >= 1)
SELECT coalesce(e.doc_id, fz.doc_id) AS doc_id,
       e.n_grams, e.n_hit_grams, e.n_eval_docs, e.contamination,
       e.bl_n_grams, e.bl_n_hit_grams, e.bl_n_eval_docs,
       e.bl_contamination,
       e.ms_a_hits, e.ms_a_docs, e.ms_a_cont,
       e.ms_b_hits, e.ms_b_docs, e.ms_b_cont,
       fz.fz_hits, fz.fz_best
FROM exact e FULL JOIN fz ON e.doc_id = fz.doc_id"""

    # text_pipeline: replays normalize_text (strip C0/C1 + NFC over the
    # planted decomposed accents) -> chunk_windows (size 24 / stride 12)
    # -> tfidf_terms (top-3, min_doc_freq=2) stage by stage; one row per
    # document, so NFC bytes, chunk arithmetic, and tf-idf ranking all
    # sit under the value hash.
    from anomalyzer_spark.functions.text import CONTROL_CHARS_RE as _CTRL
    sql["text_pipeline"] = f"""
WITH planted AS (
  SELECT doc_id,
         'cafe' || chr(769) || ' ' || chr(1) || text
           || ' A' || chr(778) || ' fin' || chr(127) AS text
  FROM documents),
norm AS (SELECT doc_id,
           nfc_normalize(regexp_replace(text, '{_CTRL}', '', 'g')) AS text
         FROM planted),
tk AS (SELECT doc_id,
         regexp_extract_all(lower(text),
                            '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS toks
       FROM norm),
ch AS (SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks), 0), 12)) AS s
       FROM tk WHERE len(toks) > 0),
chstats AS (
  SELECT doc_id, count(*) AS n_chunks,
         sum(len(toks[s + 1 : s + 24]))::BIGINT AS sum_chunk_toks
  FROM ch GROUP BY doc_id),
tok AS (SELECT doc_id, unnest(toks) AS token FROM tk),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (
  SELECT token, count(*) AS doc_freq FROM (
    SELECT DISTINCT doc_id, token FROM tok)
  GROUP BY token HAVING count(*) >= 2),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token, tf, doc_freq,
         round(tf * (ln((n_docs + 1) / (doc_freq + 1.0)) + 1), 6) AS tfidf
  FROM tf JOIN dfreq USING (token), nd),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, token ASC) AS rnk FROM scored),
top AS (
  SELECT doc_id,
         string_agg(token, ' ' ORDER BY rnk) AS top_terms,
         round(max(CASE WHEN rnk = 1 THEN tfidf END), 6) AS top_tfidf
  FROM r WHERE rnk <= 3 GROUP BY doc_id)
SELECT doc_id, n_chunks, sum_chunk_toks, top_terms, top_tfidf
FROM chstats JOIN top USING (doc_id)"""

    # dedup_paragraphs: per-source footer plant, '. '-literal split,
    # md5-keyed paragraph document-frequency, rebuild of surviving spans
    # in original order (mirrors tests/test_functions.py parity test).
    sql["dedup_paragraphs"] = """
WITH d AS (SELECT doc_id,
             text || '. footer for ' || source || ' site' AS text
           FROM documents),
ex AS (
  SELECT doc_id, u.pos, u.para,
         CASE WHEN u.para <> '' THEN md5(u.para) END AS h
  FROM (SELECT doc_id, string_split(text, '. ') AS ps FROM d),
       unnest(list_transform(range(1, len(ps) + 1),
              i -> struct_pack(pos := i, para := ps[i]))) AS t(u)),
freq AS (
  SELECT h, count(*) AS df FROM (
    SELECT DISTINCT doc_id, h FROM ex WHERE h IS NOT NULL)
  GROUP BY h HAVING count(*) >= 2),
m AS (SELECT ex.*, freq.df FROM ex LEFT JOIN freq USING (h))
SELECT doc_id,
  coalesce(array_to_string(list_transform(
    list_sort(list(struct_pack(pos := pos, para := para))
              FILTER (WHERE df IS NULL)),
    s -> s.para), '. '), '') AS text,
  count(*) FILTER (WHERE h IS NOT NULL) AS n_paragraphs,
  count(*) FILTER (WHERE df IS NOT NULL) AS n_dropped
FROM m GROUP BY doc_id"""

    sql["repetition"] = f"""
WITH docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
w AS (SELECT doc_id,
        CASE WHEN norm = '' THEN []::VARCHAR[]
             ELSE string_split(norm, ' ') END AS w
      FROM docs),
ws AS (SELECT doc_id, len(w) AS n_words,
         len(list_distinct(w)) AS n_uniq_words,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(1, len(w)),
                                  i -> w[i::INT] || ' ' || w[(i+1)::INT])
              ELSE []::VARCHAR[] END AS grams
       FROM w),
g AS (SELECT doc_id, unnest(grams) AS gram FROM ws),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
ga AS (SELECT doc_id, sum(c)::BIGINT AS ng, count(*)::BIGINT AS ug,
              max(c)::BIGINT AS top
       FROM gc GROUP BY doc_id)
SELECT ws.doc_id, n_words::BIGINT AS n_words,
  coalesce(ng, 0) AS n_grams,
  round(CASE WHEN n_words > 0
             THEN 1 - n_uniq_words::DOUBLE / n_words ELSE 0.0 END, 6)
    AS dup_word_frac,
  round(CASE WHEN ng > 0 THEN 1 - ug::DOUBLE / ng ELSE 0.0 END, 6)
    AS dup_gram_frac,
  round(CASE WHEN ng > 0 THEN top::DOUBLE / ng ELSE 0.0 END, 6)
    AS top_gram_share
FROM ws LEFT JOIN ga USING (doc_id)"""

    sql["ngram_jaccard"] = f"""
WITH {_SHINGLES},
ex0 AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
hot AS (SELECT shingle FROM ex0 GROUP BY shingle
        HAVING count(*) > {MAX_SHINGLE_FREQ}),
ex AS (SELECT * FROM ex0 ANTI JOIN hot USING (shingle)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         count(*) AS n_common
  FROM ex a JOIN ex b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, n_common, n_a, n_b,
       round(n_common / (n_a + n_b - n_common), 6) AS jaccard
FROM pairs
WHERE round(n_common / (n_a + n_b - n_common), 6) >= {JACCARD_THRESHOLD}"""

    nh, nb = 128, 32
    rpb = nh // nb
    mod32 = 1 << 32
    sql["minhash_lsh"] = f"""
WITH {_SHINGLES},
hs AS (
  SELECT doc_id, shingles,
    list_transform(shingles, s -> md5(s)) AS hx
  FROM sh),
cw AS (
  SELECT doc_id, shingles,
    list_transform(hx, h -> ('0x' || substr(h, 1, 8))::BIGINT) AS h1s,
    list_transform(hx, h -> ('0x' || substr(h, 9, 8))::BIGINT) AS h2s
  FROM hs),
sigs AS (
  SELECT doc_id,
    list_transform(range(0, {nh}), i ->
      list_aggregate(list_transform(range(1, len(h1s) + 1),
                     j -> (h1s[j] + i * h2s[j]) % {mod32}), 'min')) AS sig
  FROM cw),
buckets AS (
  SELECT doc_id,
    unnest(list_transform(range(0, {nb}), b ->
      md5(b::VARCHAR || '|' ||
          array_to_string(list_transform(sig[b * {rpb} + 1 : b * {rpb} + {rpb}],
                          v -> v::VARCHAR), ',')))) AS bucket
  FROM sigs),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM buckets x JOIN buckets y USING (bucket)
  WHERE x.doc_id < y.doc_id),
verified AS (
  SELECT id_a, id_b,
    round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
          (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = id_a
  JOIN sh sb ON sb.doc_id = id_b)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}"""
    # the streaming pipeline's final state equals the batch operator
    # exactly (shared bucket/verify code) — same oracle
    sql["minhash_stream"] = sql["minhash_lsh"]

    # components over the SAME minhash pair set, via recursive reachability
    sql["dedup_groups"] = f"""
WITH RECURSIVE pairs AS ({sql['minhash_lsh']}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.id),
lbl AS (SELECT id, min(l) AS group_id FROM reach GROUP BY id),
sz AS (SELECT group_id, count(*) AS group_size FROM lbl GROUP BY group_id)
SELECT l.id AS doc_id, l.group_id, s.group_size
FROM lbl l JOIN sz s USING (group_id)
WHERE s.group_size > 1"""

    # retired slot `simhash` (rotated out round 10 for semantic_pairs):
    # the signature now rides the text_profile oracle as `simhash32`
    # below (same engine-portable md5-nibble construction); the retired
    # per-slot oracle — including its n_words column — lives verbatim in
    # tests/test_functions.py::test_simhash_duckdb_parity.
    simhash32_sql = f"""
WITH sdocs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
sw AS (SELECT doc_id, string_split(norm, ' ') AS words FROM sdocs),
sh0 AS (SELECT doc_id, list_transform(words, x -> md5(x)) AS hs FROM sw),
sbits AS (
  SELECT doc_id,
    list_transform(range(0, 32), j ->
      CASE WHEN list_sum(list_transform(hs, hx ->
             CASE WHEN substr(hx, j + 1, 1) IN
                  ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) > 0
           THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS terms
  FROM sh0)
SELECT doc_id, list_sum(terms)::BIGINT AS simhash32 FROM sbits"""

    # lsh_topk oracle: the seeded hyperplanes are deterministic literals —
    # inline them so DuckDB reproduces signatures, buckets, candidates, and
    # the exact cosine re-rank (dot-product folds are bit-identical across
    # the engines, verified).
    planes = similarity.hyperplanes(64, 16, seed=7)
    rows_per_band = 16 // 4
    plane_sql = ", ".join(
        "[" + ", ".join(repr(x) for x in p) + "]" for p in planes)
    band_exprs = []
    for b in range(4):
        bits = " || ".join(
            f"(CASE WHEN list_dot_product(v, pl[{b * rows_per_band + j + 1}]) >= 0 "
            "THEN 1 ELSE 0 END)::VARCHAR"
            for j in range(rows_per_band))
        band_exprs.append(f"struct_pack(band := {b}, bucket := {bits})")
    # (lsh_topk oracle retired with its slot, round 9 — see q_quality_checks;
    # plane_sql/band_exprs stay: emb_dedup_groups/emb_pipeline oracles use
    # them below.)

    # composed pipeline: reuse the per-operator oracle SQL as CTEs
    # mq_* rider: the pinned literal model compiled to arithmetic —
    # SAME literals, same accumulation order as score_quality's column
    # expression (z = bias, then += w * ((f - mean) / std) in FEATURES
    # order); features are the round-6 stats columns on both sides.
    _mq_feats_sql = ["ln(1 + s.n_chars)", "s.avg_word_len",
                     "s.punct_ratio", "s.digit_ratio", "s.upper_ratio",
                     "s.stopword_ratio"]
    _mq_z = repr(float(MQ_MODEL["bias"])) + "".join(
        f" + {w!r} * (({f} - {m!r}) / {sd!r})"
        for f, m, sd, w in zip(_mq_feats_sql, MQ_MODEL["mean"],
                               MQ_MODEL["std"], MQ_MODEL["weights"]))
    _bpe_vocab_sql = "[" + ", ".join(f"'{t}'" for t in BPE_VOCAB) + "]"

    sql["data_pipeline"] = f"""
WITH keep AS (
  SELECT doc_id FROM (
    WITH hashed AS (SELECT doc_id, md5({_NORM}) AS h FROM documents),
    g AS (SELECT h, min(doc_id) AS canon FROM hashed GROUP BY h)
    SELECT h.doc_id FROM hashed h JOIN g USING (h) WHERE h.doc_id = g.canon)),
stats AS (__STATS__),
langs AS (__LANGS__),
surv AS (
  SELECT d.doc_id, d.text, l.lang_pred, s.quality_score, s.n_tokens
  FROM documents d
  JOIN keep USING (doc_id)
  JOIN stats s USING (doc_id)
  JOIN langs l USING (doc_id)
  WHERE s.quality_score >= 0.4),
per_lang AS (
  SELECT lang_pred, count(*) AS n_docs,
    sum(n_tokens)::BIGINT AS total_tokens,
    round(sum(quality_score::DECIMAL(10,6))::DOUBLE / count(*), 6)
      AS avg_quality
  FROM surv GROUP BY lang_pred),
samp AS (
  -- hash_sample(rate=0.5, seed=42): md5-derived 48-bit acceptance window
  SELECT * FROM surv
  WHERE ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 12))::BIGINT
        < 140737488355328),
samp_counts AS (
  SELECT lang_pred, count(*) AS n_sample_docs FROM samp GROUP BY lang_pred),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text),
         '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS token
  FROM samp),
voc AS (
  SELECT token, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
  FROM toks GROUP BY token HAVING count(*) >= 2),
vstats AS (
  SELECT count(*) AS sample_vocab_size, sum(doc_freq)::BIGINT AS sample_df_sum
  FROM voc),
vtop AS (
  SELECT token AS sample_top_token, term_freq AS sample_top_tf
  FROM voc ORDER BY term_freq DESC, token ASC LIMIT 1),
bgt AS (
  SELECT doc_id, regexp_extract_all(lower(text),
         '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS t
  FROM samp),
bg AS (SELECT doc_id, t[i] AS ctx, t[i + 1] AS w
       FROM bgt, unnest(range(1, greatest(len(t), 1))) AS u(i)),
refbg AS (SELECT ctx, w, count(*) AS c_bi FROM bg GROUP BY 1, 2),
refctx AS (SELECT ctx, sum(c_bi) AS c_ctx FROM refbg GROUP BY ctx),
vv AS (SELECT count(*) + 1 AS v1 FROM refctx),
scd AS (
  SELECT bg.doc_id,
         -ln((coalesce(c_bi, 0) + 0.1) /
             (coalesce(c_ctx, 0) + 0.1 * v1)) AS nlp
  FROM bg LEFT JOIN refbg USING (ctx, w)
          LEFT JOIN refctx USING (ctx), vv),
dppl AS (SELECT doc_id, round(exp(round(avg(nlp), 6)), 6) AS ppl
         FROM scd GROUP BY doc_id),
lang_ppl AS (
  SELECT lang_pred,
         round(sum(ppl::DECIMAL(18,6))::DOUBLE / count(*), 6)
           AS avg_sample_ppl
  FROM dppl JOIN samp USING (doc_id) GROUP BY lang_pred),
-- round-9 mixture stage: mixture_plan(alpha=0.3, token space, default
-- budget) epochs + apply_mixture_plan realized counts (epoch
-- replication; fractional epoch through the '#'-salted md5 window,
-- floor() = Spark's truncating long cast)
mpl AS (
  SELECT lang_pred, count(*) AS mn_rows, sum(n_tokens) AS mn_tok
  FROM surv GROUP BY 1),
mw AS (SELECT *, pow(mn_tok / sum(mn_tok) OVER (), 0.3) AS w FROM mpl),
mep AS (
  SELECT lang_pred, mn_tok,
         round(least(4.0, (w / sum(w) OVER ()) * sum(mn_tok) OVER ()
                          / mn_tok), 6) AS mix_epochs
  FROM mw),
mpt AS (
  SELECT lang_pred, mix_epochs,
         round(mix_epochs * mn_tok, 0)::BIGINT AS mix_planned_tokens
  FROM mep),
mcand AS (
  SELECT s.doc_id, s.lang_pred, e.mix_epochs,
         floor(e.mix_epochs)::INT AS fe, gs.epoch
  FROM surv s
  JOIN mep e USING (lang_pred)
  JOIN (SELECT unnest(range(0, 8)) AS epoch) gs
    ON gs.epoch < ceil(e.mix_epochs)::INT),
mmix AS (
  SELECT lang_pred, count(*) AS n_mixed_rows FROM mcand
  WHERE epoch < fe
     OR ('0x' || substr(md5('42|' || doc_id::VARCHAR || '#' ||
           fe::VARCHAR), 1, 12))::BIGINT
        < floor((mix_epochs - fe) * 281474976710656)::BIGINT
  GROUP BY 1),
mqs AS (
  SELECT s.doc_id, v.lang_pred,
         1.0 / (1.0 + exp(-({_mq_z}))) AS msc
  FROM stats s JOIN surv v USING (doc_id)),
mql AS (
  SELECT lang_pred,
    round(sum(round(msc, 6)::DECIMAL(18,6))::DOUBLE / count(*), 6)
      AS mq_avg,
    sum(CASE WHEN round(msc, 6) >= 0.5 THEN 1 ELSE 0 END)::BIGINT
      AS mq_hi
  FROM mqs GROUP BY lang_pred),
btok AS (
  SELECT doc_id,
    flatten(list_transform(
      regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'),
      w -> list_append(
        list_transform(
          regexp_extract_all(
            replace(replace(replace(replace(
              CASE WHEN length(w) > 1 THEN substr(w, 1, length(w) - 1)
                   ELSE '' END,
              'th', chr(17)), 'er', chr(18)), 'in', chr(19)),
              chr(17) || 'e', chr(20)),
            '.'),
          c -> CASE c WHEN chr(17) THEN 'th' WHEN chr(18) THEN 'er'
                      WHEN chr(19) THEN 'in' WHEN chr(20) THEN 'the'
                      ELSE c END),
        substr(w, length(w), 1) || '</w>'))) AS toks
  FROM samp),
bids AS (
  SELECT doc_id,
    list_transform(toks, t ->
      coalesce(list_position({_bpe_vocab_sql}, t) - 1, -1)) AS ids
  FROM btok),
ptk AS (
  SELECT doc_id, ids, len(ids)::BIGINT AS n_ids,
    ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 12))::BIGINT % 8
      AS shard,
    ('0x' || substr(md5('43|' || doc_id::VARCHAR), 1, 12))::BIGINT
      AS ord
  FROM bids WHERE len(ids) > 0),
psp AS (
  SELECT shard, doc_id, ids, n_ids,
    (sum(n_ids) OVER (PARTITION BY shard ORDER BY ord, doc_id
                      ROWS UNBOUNDED PRECEDING) - n_ids)::BIGINT
      AS start_tok
  FROM ptk),
psg AS (
  SELECT shard, doc_id, ids, n_ids, start_tok,
    unnest(generate_series((start_tok // {PT_CAP})::BIGINT,
                           ((start_tok + n_ids - 1) // {PT_CAP})::BIGINT))
      AS chunk_id
  FROM psp),
ppc AS (
  SELECT shard, chunk_id, doc_id,
    greatest(chunk_id * {PT_CAP}, start_tok) - chunk_id * {PT_CAP}
      AS pos,
    ids[(greatest(chunk_id * {PT_CAP}, start_tok) - start_tok + 1)::INT
        : (least((chunk_id + 1) * {PT_CAP}, start_tok + n_ids)
           - start_tok)::INT] AS piece
  FROM psg),
pch AS (
  SELECT shard, chunk_id,
    flatten(list(piece ORDER BY pos)) AS input_ids,
    count(*) AS n_docs
  FROM ppc GROUP BY shard, chunk_id),
pts AS (
  SELECT count(*)::BIGINT AS pt_chunks,
    sum(len(input_ids))::BIGINT AS pt_ids,
    sum(n_docs)::BIGINT AS pt_docs,
    sum(list_aggregate(list_transform(range(1, len(input_ids) + 1),
        j -> input_ids[j] * j), 'sum'))::BIGINT AS pt_pos_sum,
    sum(len(list_filter(input_ids, x -> x = -1)))::BIGINT AS pt_oov
  FROM pch),
prt AS (
  SELECT count(*)::BIGINT AS pt_rt_bad FROM (
    SELECT t.doc_id, any_value(t.n_ids) AS n_ids,
           sum(len(piece))::BIGINT AS sl
    FROM ppc p JOIN ptk t USING (doc_id) GROUP BY t.doc_id)
  WHERE n_ids != sl),
cctop AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang
          ORDER BY n DESC, lang ASC LIMIT 1),
ccdup AS (
  SELECT round(avg((doc_id <> mn)::INT::DOUBLE), 6) AS cc_dup_rate
  FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS mn
        FROM (SELECT doc_id, md5({_NORM}) AS h FROM documents))),
cc AS (
  SELECT count(*)::BIGINT AS cc_n_docs,
    sum(n_tokens)::BIGINT AS cc_n_tokens,
    sum(n_chars)::BIGINT AS cc_n_chars,
    (SELECT cc_dup_rate FROM ccdup) AS cc_dup_rate,
    (SELECT lang FROM cctop) AS cc_top_lang,
    round((SELECT n FROM cctop) / count(*)::DOUBLE, 6)
      AS cc_top_lang_share,
    round(sum(quality_score::DECIMAL(10,6))::DOUBLE / count(*), 6)
      AS cc_avg_quality,
    quantile_cont(n_chars, 0.5) AS cc_p50_chars,
    quantile_cont(n_chars, 0.9) AS cc_p90_chars
  FROM stats)
SELECT p.lang_pred, p.n_docs, p.total_tokens, p.avg_quality,
  coalesce(sc.n_sample_docs, 0)::BIGINT AS n_sample_docs,
  lp.avg_sample_ppl,
  m.mix_epochs, m.mix_planned_tokens,
  coalesce(mm.n_mixed_rows, 0)::BIGINT AS n_mixed_rows,
  q.mq_avg, q.mq_hi,
  v.sample_vocab_size, v.sample_df_sum, t.sample_top_token, t.sample_top_tf,
  pt.pt_chunks, pt.pt_ids, pt.pt_docs, pt.pt_pos_sum, pt.pt_oov,
  pr.pt_rt_bad,
  cc.cc_n_docs, cc.cc_n_tokens, cc.cc_n_chars, cc.cc_dup_rate,
  cc.cc_top_lang, cc.cc_top_lang_share, cc.cc_avg_quality,
  cc.cc_p50_chars, cc.cc_p90_chars
FROM per_lang p
LEFT JOIN samp_counts sc USING (lang_pred)
LEFT JOIN lang_ppl lp USING (lang_pred)
LEFT JOIN mpt m USING (lang_pred)
LEFT JOIN mmix mm USING (lang_pred)
LEFT JOIN mql q USING (lang_pred)
CROSS JOIN vstats v CROSS JOIN vtop t
CROSS JOIN pts pt CROSS JOIN prt pr CROSS JOIN cc""".replace(
        "__STATS__", sql["text_stats"].strip()).replace(
        "__LANGS__", sql["lang_id"].strip())

    cos = ("list_dot_product(qv, cv) / "
           "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))")
    sql["cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT query_id, neighbor_id, {cos} AS cos_sim FROM q CROSS JOIN c),
r AS (SELECT query_id, neighbor_id, cos_sim,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM s WHERE cos_sim IS NOT NULL)
SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rnk
FROM r WHERE rnk <= {TOPK}"""

    # ivf_topk / pq_topk oracles: rerun the IDENTICAL deterministic NumPy
    # quantizer fits on the same vec_id-sorted sample (read straight from
    # parquet — no Spark needed), inline the model literals, and mirror the
    # search. The sample MUST come from the sf under comparison (pass
    # ``sf_dir`` or set SPARK_GRAFT_ORACLE_SF_DIR — tools/check_correctness
    # does); when the parquet is absent (no testdata on this machine) these
    # two entries are simply omitted instead of crashing every caller who
    # wanted an unrelated oracle — the driver then records a rows-only
    # check for them, which cannot happen where testdata exists.
    import os

    import duckdb as _duck
    ivf_sf = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                                      "/root/testdata/sf0.01")
    sample_rows = None
    if not os.path.exists(f"{ivf_sf}/embeddings.parquet"):
        import warnings

        warnings.warn(
            f"{ivf_sf}/embeddings.parquet not found — omitting the "
            "ivf_topk/pq_topk oracles (correctness degrades to a rows-only "
            "check for them). If testdata exists, the sf_dir/"
            "SPARK_GRAFT_ORACLE_SF_DIR configuration is wrong.",
            stacklevel=2)
    else:
        sample_rows = _duck.connect().execute(
            f"SELECT vec_id, embedding::DOUBLE[] FROM "
            f"'{ivf_sf}/embeddings.parquet' WHERE vec_id < {IVF_SAMPLE_N} "
            f"ORDER BY vec_id").fetchall()
    if sample_rows is not None:
        cent_sql = ", ".join(
            "[" + ", ".join(repr(x) for x in c) + "]"
            for c in _ivf_centroids(sample_rows))
        sql["ivf_topk"] = f"""
WITH ce AS (SELECT [{cent_sql}]::DOUBLE[][] AS cents),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cellified AS (
  SELECT vec_id, v,
    list_transform(list_sort(list_transform(range(1, {IVF_CLUSTERS + 1}), i ->
      struct_pack(neg := -(list_dot_product(v, cents[i]) /
                  (sqrt(list_dot_product(v, v)) *
                   sqrt(list_dot_product(cents[i], cents[i])))),
                  cid := i - 1))), s -> s.cid) AS cells
  FROM e, ce),
corpus_c AS (SELECT vec_id AS neighbor_id, v AS cv, cells[1] AS cell
             FROM cellified),
query_c AS (SELECT vec_id AS query_id, v AS qv,
                   unnest(cells[1:{IVF_PROBE}]) AS cell
            FROM cellified WHERE vec_id < 20),
s AS (SELECT query_id, neighbor_id,
        list_dot_product(qv, cv) /
        (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
          AS cos_sim
      FROM corpus_c JOIN query_c USING (cell)),
r AS (SELECT query_id, neighbor_id, cos_sim,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM s WHERE cos_sim IS NOT NULL)
SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rnk
FROM r WHERE rnk <= {TOPK}"""

        # semantic_pairs oracle: the SAME literal centroid model as
        # ivf_topk (shared sample + fit, by construction in the Spark
        # slot too), single-cell assignment by best cosine, within-cell
        # exact pairs at the threshold, then a WITH RECURSIVE transitive
        # closure resolves components — implementation-independent check
        # of the distributed label-propagation loop, the
        # emb_dedup_groups precedent.
        sql["semantic_pairs"] = f"""
WITH RECURSIVE
ce AS (SELECT [{cent_sql}]::DOUBLE[][] AS cents),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cellified AS (
  SELECT vec_id, v,
    list_sort(list_transform(range(1, {IVF_CLUSTERS + 1}), i ->
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
      WHERE a.vec_id < b.vec_id),
pf AS (SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
       FROM p WHERE cos_sim >= {SEM_THRESHOLD}),
edges AS (SELECT id_a AS a, id_b AS b FROM pf
          UNION SELECT id_b, id_a FROM pf),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS group_id
         FROM reach GROUP BY a),
sizes AS (SELECT group_id, count(*) AS group_size FROM comp GROUP BY group_id)
SELECT pf.id_a, pf.id_b, pf.cos_sim, c.group_id, s.group_size
FROM pf JOIN comp c ON pf.id_a = c.vec_id JOIN sizes s USING (group_id)"""

    # content-defined chunking: boundary iff first 8 md5-hex chars of the
    # 16-char gram, as an int, ≡ 63 (mod 64); chunk spans prev-cut+1..cut.
    sql["cdc_dedup"] = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
cuts AS (
  SELECT doc_id, list_sort(list(p + 15)) AS cuts
  FROM d, unnest(range(1, greatest(n - 15, 0) + 1)) AS t(p)
  WHERE ('0x' || substr(md5(substr(text, p::INT, 16)), 1, 8))::BIGINT
        % 64 = 63
  GROUP BY doc_id),
withe AS (
  SELECT d.doc_id, text, n,
    list_concat(list_filter(coalesce(cuts, []::BIGINT[]), c -> c < n),
                [n::BIGINT]) AS ends
  FROM d LEFT JOIN cuts USING (doc_id)),
chunks AS (
  SELECT doc_id, text,
    CASE WHEN i = 1 THEN 1 ELSE ends[(i - 1)::INT] + 1 END AS s,
    ends[i::INT] AS e
  FROM withe, unnest(range(1, len(ends) + 1)) AS t(i)),
hashed AS (
  SELECT doc_id, (e - s + 1)::BIGINT AS chunk_len,
         md5(substr(text, s::INT, (e - s + 1)::INT)) AS chunk_md5
  FROM chunks),
occ AS (SELECT chunk_md5, count(*) AS n_occ FROM hashed GROUP BY chunk_md5)
SELECT doc_id,
  count(*) AS n_chunks,
  sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
  sum(chunk_len)::BIGINT AS n_chars,
  round(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
    AS dup_ratio
FROM hashed JOIN occ USING (chunk_md5)
GROUP BY doc_id"""

    # composed embedding pipeline: reuse the LSH pair CTEs at the 0.9
    # near-dup threshold, keep-first anti-join, decimal-exact stats.
    sql["emb_pipeline"] = f"""
WITH pl AS (SELECT [{plane_sql}]::DOUBLE[][] AS pl),
e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT vec_id, v, unnest([{', '.join(band_exprs)}]) AS bb
       FROM e, pl),
eb AS (SELECT vec_id, v, bb.band AS band, bb.bucket AS bucket FROM cb),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b, x.v AS va, y.v AS vb
  FROM eb x JOIN eb y USING (band, bucket) WHERE x.vec_id < y.vec_id),
p AS (SELECT id_a, id_b,
        list_dot_product(va, vb) /
        (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
          AS cos_sim
      FROM cand),
dropped AS (SELECT DISTINCT id_b AS vec_id FROM p WHERE cos_sim >= 0.9),
surv AS (SELECT * FROM e ANTI JOIN dropped USING (vec_id))
SELECT label::BIGINT AS label, count(*) AS n_vecs,
  round(sum(sqrt(list_dot_product(v, v))::DECIMAL(28,12))::DOUBLE
        / count(*), 6) AS avg_norm
FROM surv GROUP BY label"""

    # pq_topk oracle: identical sample-fit codebooks inlined; encode =
    # per-subspace argmin of the same sequential L2 folds; ADC = LUT per
    # query + m lookups per candidate (mirrors similarity.pq_topk). Reuses
    # the ivf sample (same vec_id-sorted SELECT); gated like ivf_topk.
    if sample_rows is None:
        # emb_pipeline's avg_pc1 column needs the sample-fit PCA literals;
        # without testdata the oracle would column-mismatch — downgrade to
        # the driver's rows-only check instead (same policy as ivf/pq).
        sql.pop("emb_pipeline", None)
    else:
        pca = _pca_model(sample_rows)
        d_ = len(pca["mean"])
        mean_sql = ", ".join(repr(float(v)) for v in pca["mean"])
        c1_sql = ", ".join(repr(float(v)) for v in pca["components"][0])
        pc1 = (f"list_sum(list_transform(range(1, {d_} + 1), i -> "
               f"(v[i] - [{mean_sql}][i]) * [{c1_sql}][i]))")
        sql["emb_pipeline"] = sql["emb_pipeline"].replace(
            "        / count(*), 6) AS avg_norm\nFROM surv GROUP BY label",
            f"""        / count(*), 6) AS avg_norm,
  round(sum(round({pc1}, 6)::DECIMAL(18,6))::DOUBLE / count(*), 6)
    AS avg_pc1
FROM surv GROUP BY label""")
        assert "avg_pc1" in sql["emb_pipeline"]

    if sample_rows is not None:
        books = _pq_codebooks(sample_rows)
        book_sql = ", ".join(
            "[" + ", ".join("[" + ", ".join(repr(x) for x in c) + "]"
                            for c in book) + "]"
            for book in books)
        pd_ = len(books[0][0])
        l2 = (f"list_sum(list_transform(range(1, {pd_ + 1}), t -> "
              f"(v[(s - 1) * {pd_} + t] - pq[s][j][t]) * "
              f"(v[(s - 1) * {pd_} + t] - pq[s][j][t])))")

        # ivfpq_topk oracle: composes the two models above verbatim —
        # cell assignment (ivf_topk's cellified CTE) restricts WHICH rows
        # are scored, codes + per-query ADC LUTs (pq_topk's CTEs) decide
        # HOW, through the same cell equi-join similarity.ivfpq_topk runs.
        sql["ivfpq_topk"] = f"""
WITH ce AS (SELECT [{cent_sql}]::DOUBLE[][] AS cents),
pqb AS (SELECT [{book_sql}]::DOUBLE[][][] AS pq),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cellified AS (
  SELECT vec_id, v,
    list_transform(list_sort(list_transform(range(1, {IVF_CLUSTERS + 1}), i ->
      struct_pack(neg := -(list_dot_product(v, cents[i]) /
                  (sqrt(list_dot_product(v, v)) *
                   sqrt(list_dot_product(cents[i], cents[i])))),
                  cid := i - 1))), c0 -> c0.cid) AS cells
  FROM e, ce),
codes AS (
  SELECT vec_id AS neighbor_id, cells[1] AS cell,
    list_transform(range(1, {PQ_M + 1}), s ->
      list_sort(list_transform(range(1, {PQ_K + 1}), j ->
        struct_pack(d := {l2}, cid := j - 1)))[1].cid) AS codes
  FROM cellified, pqb),
luts AS (
  SELECT vec_id AS query_id,
    list_transform(range(1, {PQ_M + 1}), s ->
      list_transform(range(1, {PQ_K + 1}), j -> {l2})) AS lut,
    unnest(cells[1:{IVF_PROBE}]) AS cell
  FROM cellified, pqb WHERE vec_id < 20),
sc AS (
  SELECT query_id, neighbor_id,
    list_sum(list_transform(range(1, {PQ_M + 1}), s2 ->
      lut[s2][codes[s2] + 1])) AS pq_dist
  FROM codes JOIN luts USING (cell)),
r AS (SELECT query_id, neighbor_id, pq_dist,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY pq_dist ASC, neighbor_id) AS rnk
      FROM sc),
-- quantized-refine lane: absmax int8 quantize/dequantize of the
-- candidate vectors (round half-away, zero-scale guard — the
-- similarity.quantize_embeddings scheme), exact cosine re-rank of the
-- top-{IVFPQ_REFINE} ADC candidates per query
deq AS (
  SELECT vec_id AS neighbor_id,
    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
         THEN list_transform(v, x -> 0.0)
         ELSE list_transform(v, x ->
           round(x / (list_max(list_transform(v, y -> abs(y))) / 127.0))
           * (list_max(list_transform(v, y -> abs(y))) / 127.0)) END AS dv
  FROM e),
qcand AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= {IVFPQ_REFINE}),
qv AS (SELECT vec_id AS query_id, v AS qvec FROM e WHERE vec_id < 20),
resc AS (
  SELECT query_id, neighbor_id,
    list_dot_product(qvec, dv) /
    (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(dv, dv)))
      AS q_cos_sim
  FROM qcand JOIN deq USING (neighbor_id) JOIN qv USING (query_id)),
rr AS (SELECT query_id, neighbor_id, q_cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY q_cos_sim DESC, neighbor_id) AS q_rnk
       FROM resc)
SELECT query_id, neighbor_id, round(pq_dist, 6) AS pq_dist, rnk,
       round(q_cos_sim, 6) AS q_cos_sim, q_rnk
FROM (SELECT * FROM r WHERE rnk <= {TOPK}) a
FULL OUTER JOIN (SELECT * FROM rr WHERE q_rnk <= {TOPK}) b
USING (query_id, neighbor_id)"""

    # emb_dedup_groups oracle: the LSH-bucketed pair generation mirrors
    # the Spark path exactly (same seed-7 plane literals as lsh_topk:
    # candidates = pairs sharing >=1 band bucket, exact cosine on
    # candidates only — this WAS the round-6 cosine_pairs oracle), then a
    # WITH RECURSIVE transitive closure over the symmetric edge set
    # resolves components: group_id = min reachable id, multi-member
    # groups only — an implementation-independent check of the
    # distributed label-propagation loop (dedup.duplicate_groups).
    sql["emb_dedup_groups"] = f"""
WITH RECURSIVE
pl AS (SELECT [{plane_sql}]::DOUBLE[][] AS pl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT vec_id, v, unnest([{', '.join(band_exprs)}]) AS bb
       FROM e, pl),
eb AS (SELECT vec_id, v, bb.band AS band, bb.bucket AS bucket FROM cb),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b, x.v AS va, y.v AS vb
  FROM eb x JOIN eb y USING (band, bucket) WHERE x.vec_id < y.vec_id),
p AS (SELECT id_a, id_b
      FROM cand
      WHERE list_dot_product(va, vb) /
        (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
        >= {COSINE_THRESHOLD}),
edges AS (SELECT id_a AS a, id_b AS b FROM p
          UNION SELECT id_b, id_a FROM p),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS group_id
         FROM reach GROUP BY a),
sizes AS (SELECT group_id, count(*) AS group_size FROM comp GROUP BY group_id)
SELECT c.vec_id, c.group_id, s.group_size
FROM comp c JOIN sizes s USING (group_id)
WHERE s.group_size > 1"""

    # range_join oracle: the plain theta join the bucket-quantized
    # equi-join must reproduce verbatim (DuckDB runs it fine at sf0.01;
    # Spark would pick a cartesian product for the same predicate, which
    # is exactly what operators/range_join.py exists to avoid).
    sql["range_join"] = """
WITH pts AS (SELECT l_orderkey * 10 + l_linenumber AS pt,
                    l_orderkey, l_linenumber FROM lineitem),
iv AS (SELECT o_orderkey, o_orderkey * 9 AS s,
              o_orderkey * 9 + o_orderkey % 40 + 5 AS e FROM orders)
SELECT l_orderkey, l_linenumber, o_orderkey, pt, s, e
FROM pts JOIN iv ON pt >= s AND pt < e"""

    # curation_pipeline oracle: every stage recomputed in SQL — the
    # doc_id-derived PII enrichment, the ordered regexp_replace chain and
    # per-kind counts (PII_PATTERNS order is the spec), the temperature
    # rates (pow/least on per-language counts; trunc() mirrors Spark's
    # toward-zero long cast of rate * 2^48), the md5 shard/order hashes,
    # the per-shard running token sum, and the chunk segmentation.
    _pii = text.PII_PATTERNS
    _red_expr = "text"
    for _k in ("email", "url", "ipv4", "phone"):
        _lit = _pii[_k].replace("'", "''")
        _red_expr = (f"regexp_replace({_red_expr}, '{_lit}', "
                     f"'[{_k.upper()}]', 'g')")
    _cnt_exprs = ", ".join(
        f"len(regexp_extract_all(text, '{_pii[_k].replace(chr(39), chr(39) * 2)}'))::BIGINT"
        f" AS n_{_k}" for _k in ("email", "url", "ipv4", "phone"))
    # curation_pipeline's FFD rider: first-fit-decreasing is inherently
    # sequential, so the oracle replays the per-shard kernel with a
    # recursive CTE whose state is the bin-fill LIST — one recursion
    # step per (shard, rank), first-fit = first list position whose fill
    # accepts the doc (list_position returns 0-not-NULL on miss in
    # DuckDB, hence the coalesce guard).
    _ffd_fit = ("coalesce(list_position(list_transform(f.fills, "
                f"x -> x + o.n_toks <= {CURATION_CAP}), true), 0)")
    sql["curation_pipeline"] = f"""
WITH RECURSIVE enr AS (
  SELECT doc_id, lang,
    concat_ws(' ', text,
      'user' || doc_id::VARCHAR || '@mail' || (doc_id % 5)::VARCHAR || '.com',
      'http://s' || (doc_id % 7)::VARCHAR || '.example/p/' || doc_id::VARCHAR,
      (doc_id % 200)::VARCHAR || '.' || ((doc_id * 3) % 200)::VARCHAR
        || '.8.24') AS text
  FROM documents),
red AS (
  SELECT doc_id, lang, {_red_expr} AS rtext, {_cnt_exprs}
  FROM enr),
cnt AS (SELECT lang AS d, count(*)::DOUBLE AS n FROM red GROUP BY lang),
tot AS (SELECT sum(n) AS total FROM cnt),
wt AS (SELECT d, n, pow(n / total, {CURATION_ALPHA}) AS w FROM cnt, tot),
zz AS (SELECT sum(w) AS z FROM wt),
rates AS (SELECT d, least(1.0, (w / z) * total / n) AS rate
          FROM wt, zz, tot),
samp AS (
  SELECT r.doc_id, r.lang, r.rtext,
         r.n_email + r.n_url + r.n_ipv4 + r.n_phone AS n_pii
  FROM red r JOIN rates ON r.lang IS NOT DISTINCT FROM rates.d
  WHERE ('0x' || substr(md5('42|' || r.doc_id::VARCHAR), 1, 12))::BIGINT
        < trunc(rate * 281474976710656.0)::BIGINT),
toks AS (
  SELECT doc_id, lang, n_pii,
    len(regexp_extract_all(lower(rtext),
        '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS n_toks,
    ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 12))::BIGINT
      % {CURATION_SHARDS} AS shard,
    ('0x' || substr(md5('43|' || doc_id::VARCHAR), 1, 12))::BIGINT AS ord
  FROM samp),
spans AS (
  SELECT shard, doc_id, lang, n_pii, n_toks,
    (sum(n_toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                       ROWS UNBOUNDED PRECEDING) - n_toks)::BIGINT
      AS start_tok
  FROM toks WHERE n_toks > 0),
seg AS (
  SELECT shard, doc_id, lang, n_pii, n_toks, start_tok,
    unnest(generate_series((start_tok // {CURATION_CAP})::BIGINT,
                           ((start_tok + n_toks - 1) // {CURATION_CAP})::BIGINT))
      AS chunk_id
  FROM spans),
orddocs AS (
  SELECT shard, doc_id, n_toks,
    row_number() OVER (PARTITION BY shard ORDER BY n_toks DESC, doc_id) AS rn
  FROM toks WHERE n_toks > 0),
ffd(shard, rn, doc_id, bin_id, fills) AS (
  SELECT shard, rn, doc_id, 0::BIGINT, [n_toks]
  FROM orddocs WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id,
    CASE WHEN o.n_toks <= {CURATION_CAP} AND {_ffd_fit} > 0
      THEN ({_ffd_fit} - 1)::BIGINT
      ELSE len(f.fills)::BIGINT END,
    CASE WHEN o.n_toks <= {CURATION_CAP} AND {_ffd_fit} > 0
      THEN list_transform(f.fills, (x, i) ->
           CASE WHEN i = {_ffd_fit} THEN x + o.n_toks ELSE x END)
      ELSE list_append(f.fills, o.n_toks) END
  FROM ffd f JOIN orddocs o ON o.shard = f.shard AND o.rn = f.rn + 1),
fassign AS (SELECT doc_id, bin_id AS ffd_bin FROM ffd),
nq AS (
  SELECT doc_id,
         percent_rank() OVER (PARTITION BY lang ORDER BY length(rtext))
           AS nq_lang
  FROM samp),
spl AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5('7|' || doc_id::VARCHAR), 1, 12))
                   ::BIGINT < {int(0.25 * (1 << 48))}
              THEN 'eval' ELSE 'train' END AS split
  FROM samp),
sc2 AS (SELECT doc_id, lang, length(rtext)::DOUBLE AS q FROM samp),
tfh AS (SELECT round(q, 6) AS v, count(*)::BIGINT AS c FROM sc2 GROUP BY 1),
tft AS (SELECT sum(c)::BIGINT AS total FROM tfh),
tfc AS (SELECT v, c,
          (sum(c) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
           - c)::BIGINT AS run
        FROM tfh),
tfthr AS (SELECT v AS thr, c AS at_thr, run FROM tfc, tft
          WHERE run + c >= 0.35 * total ORDER BY v DESC LIMIT 1),
tfsel AS (
  SELECT s.doc_id FROM sc2 s, tfthr t, tft
  WHERE round(s.q, 6) > t.thr
     OR (round(s.q, 6) = t.thr
         AND ('0x' || substr(md5('42|' || s.doc_id::VARCHAR), 1, 12))
             ::BIGINT
             < trunc(greatest(0.0, least(1.0,
                 (0.35 * total - t.run) / t.at_thr))
                 * 281474976710656.0)::BIGINT)),
kbw AS (
  SELECT doc_id,
    count(*) OVER (PARTITION BY gid) AS gsz,
    row_number() OVER (PARTITION BY gid ORDER BY q DESC, doc_id) AS rn
  FROM (SELECT doc_id, q,
          CASE WHEN doc_id % 2 = 0 THEN doc_id % 50
               ELSE 1000000 + doc_id END AS gid
        FROM sc2)),
cst AS (SELECT trunc(0.3 * sum(q))::BIGINT AS budget FROM sc2),
csr AS (
  SELECT doc_id,
    sum(q) OVER (PARTITION BY lang ORDER BY hk, doc_id
                 ROWS UNBOUNDED PRECEDING) AS run
  FROM (SELECT doc_id, lang, q,
          ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 12))::BIGINT
            AS hk
        FROM sc2 WHERE q IS NOT NULL)),
cssel AS (SELECT doc_id FROM csr, cst WHERE run <= budget)
SELECT shard::INT AS shard, chunk_id, seg.doc_id, lang, n_pii, n_toks,
  start_tok,
  greatest(chunk_id * {CURATION_CAP}, start_tok) - start_tok
    AS chunk_tok_start,
  least((chunk_id + 1) * {CURATION_CAP}, start_tok + n_toks) - start_tok
    AS chunk_tok_end,
  ffd_bin, n_toks > {CURATION_CAP} AS ffd_oversize,
  nq.nq_lang, spl.split,
  tfsel.doc_id IS NOT NULL AS tf_keep,
  (kbw.gsz = 1 OR kbw.rn = 1) AS kb_keep,
  cssel.doc_id IS NOT NULL AS cs_keep
FROM seg JOIN fassign ON seg.doc_id = fassign.doc_id
JOIN nq ON seg.doc_id = nq.doc_id
JOIN spl ON seg.doc_id = spl.doc_id
JOIN kbw ON seg.doc_id = kbw.doc_id
LEFT JOIN tfsel ON seg.doc_id = tfsel.doc_id
LEFT JOIN cssel ON seg.doc_id = cssel.doc_id"""

    sql["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
  sum((l_extendedprice * (1 - l_discount))::DECIMAL(20,4))::DOUBLE
    AS sum_disc_price,
  sum((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(24,6))::DOUBLE
    AS sum_charge,
  round(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_qty,
  round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_price,
  round(sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus"""

    sql["top_customers"] = """
SELECT c_custkey, c_name, n_name, r_name,
  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY c_custkey, c_name, n_name, r_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20"""

    sql["orders_rollup"] = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_price,
  count(*) AS n
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""

    # duplicate_spans replay: RE2 has no lookbehind, so the whitespace-
    # exact tokenizer is replayed as regexp_extract_all('\s*\S+') — the
    # identical word-with-preceding-separator representation (the trailing
    # pure-whitespace element Spark excludes via its m-adjustment simply
    # never matches). Gram keys, canonical min-struct, and the lag/run-sum
    # interval merge mirror dedup.duplicate_spans one-to-one.
    sql["dup_spans"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\s*\\S+') AS tk,
         len(regexp_extract_all(text, '\\s*\\S+')) AS m
  FROM documents),
grams AS (
  SELECT doc_id, j - 1 AS pos,
         md5(regexp_replace(tk[j], '^\\s+', '') ||
             array_to_string(tk[j + 1 : j + {DUP_SPAN_LEN} - 1], '')) AS gh
  FROM toks, unnest(generate_series(1, m - {DUP_SPAN_LEN} + 1)) AS t(j)
  WHERE m >= {DUP_SPAN_LEN}),
occ AS (
  SELECT doc_id, pos,
    min(doc_id) OVER (PARTITION BY gh) AS min_id,
    max(doc_id) OVER (PARTITION BY gh) AS max_id,
    min(struct_pack(i := doc_id, p := pos)) OVER (PARTITION BY gh) AS canon
  FROM grams),
marked AS (
  SELECT doc_id, pos,
    CASE WHEN canon.i = doc_id AND canon.p = pos
         THEN 'keep' ELSE 'remove' END AS kind
  FROM occ WHERE min_id <> max_id),
runs AS (
  SELECT doc_id, kind, pos,
    sum(CASE WHEN prev IS NULL OR pos - prev > {DUP_SPAN_LEN}
        THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id, kind ORDER BY pos) AS run
  FROM (SELECT *, lag(pos) OVER (PARTITION BY doc_id, kind ORDER BY pos)
          AS prev FROM marked) z)
SELECT doc_id, kind,
  min(pos)::BIGINT AS span_start,
  (max(pos) + {DUP_SPAN_LEN} - 1)::BIGINT AS span_end,
  count(*)::BIGINT AS n_grams,
  (max(pos) - min(pos) + {DUP_SPAN_LEN})::BIGINT AS n_tokens
FROM runs GROUP BY doc_id, kind, run"""

    sql["running_totals"] = """
SELECT o_orderkey, o_custkey,
  (sum(o_totalprice::DECIMAL(18,2)) OVER (
     PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
    AS running_total,
  row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
FROM orders"""

    sql["events_json"] = """
SELECT event_type,
  json_extract_string(props, '$.k')::BIGINT % 5 AS k_mod,
  count(*) AS n,
  sum(value::DECIMAL(12,2))::DOUBLE AS sum_value
FROM events
GROUP BY event_type, k_mod"""

    # approx sketches: exact distinct + within-bound bool (HLL estimates
    # are engine-specific — see q_sketch_stats docstring); the GK
    # percentile is exact-element at this accuracy and matches
    # quantile_disc.
    sql["skew_median"] = """
SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS median_qty
FROM lineitem GROUP BY l_returnflag"""

    # the hll_reg_fold/hll_occupied/mg_fold riders replay the portable
    # sketch stack register-for-register: p=12 -> 48 rank bits (mask
    # 2^48-1), rho via the same integer smear; MG k=3 with the
    # cnt-desc/key-asc tiebreak and the canonical sorted "key=cnt" fold
    # ks2 rider: one KLL batch-build replay per o_orderkey parity half
    # (the kcnt..ksurv pipeline below, parameterized by predicate), then
    # the per-item pre-aggregated two-ECDF fold of drift.ks_from_profiles
    def _kll_half_sql(pred: str) -> str:
        return f"""
  SELECT * FROM (
    SELECT j AS level, item,
      ((start + cnt - o + m - 1) // m) - ((start - o + m - 1) // m) AS kc,
      n, m - 1 AS err
    FROM (
      SELECT *, (1::BIGINT << j) AS m,
        CASE WHEN j = 0 THEN 0 ELSE
          list_sum(list_transform(range(0, j), l ->
            (('0x' || substr(md5('kll|o_totalprice|' || l || '|0'), 1, 15))
             ::BIGINT % 2) * (1::BIGINT << l::INT)))
        END AS o
      FROM (
        SELECT *, CASE WHEN (n + 31) // 32 <= 1 THEN 0
          ELSE ceil(log2((n + 31) // 32))::INT END AS j
        FROM (
          SELECT item, cnt,
            coalesce(sum(cnt) OVER (ORDER BY item
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start,
            sum(cnt) OVER () AS n
          FROM (SELECT o_totalprice::DOUBLE AS item, count(*) AS cnt
                FROM orders
                WHERE o_totalprice IS NOT NULL AND {pred}
                GROUP BY 1))))) WHERE kc > 0"""

    ks2_ctes = f"""
ksa AS ({_kll_half_sql('o_orderkey % 2 = 0')}),
ksb AS ({_kll_half_sql('o_orderkey % 2 = 1')}),
ksu AS (
  SELECT item,
    sum(CASE WHEN side = 0 THEN kc * (1::BIGINT << level::INT)
             ELSE 0 END) AS wa,
    sum(CASE WHEN side = 1 THEN kc * (1::BIGINT << level::INT)
             ELSE 0 END) AS wb
  FROM (SELECT 0 AS side, * FROM ksa UNION ALL SELECT 1 AS side, * FROM ksb)
  GROUP BY item),
kscum AS (
  SELECT sum(wa) OVER (ORDER BY item) AS ca,
         sum(wb) OVER (ORDER BY item) AS cb
  FROM ksu),
ksm AS (
  SELECT (SELECT max(n) FROM ksa) AS n_a, (SELECT max(n) FROM ksb) AS n_b,
         (SELECT max(err) FROM ksa) AS e_a,
         (SELECT max(err) FROM ksb) AS e_b,
         (SELECT max(1::BIGINT << level::INT) FROM ksa) AS twa,
         (SELECT max(1::BIGINT << level::INT) FROM ksb) AS twb),
ksr AS (
  SELECT round(max(abs(ca / ksm.n_a - cb / ksm.n_b)), 6) AS ks2_stat,
         round((ksm.e_a + ksm.twa) / ksm.n_a
               + (ksm.e_b + ksm.twb) / ksm.n_b, 6) AS ks2_bound
  FROM kscum CROSS JOIN ksm
  GROUP BY ksm.n_a, ksm.n_b, ksm.e_a, ksm.e_b, ksm.twa, ksm.twb)"""

    sql["sketch_stats"] = f"""
WITH {ks2_ctes.strip()},
base AS (
  SELECT o_orderpriority, count(*) AS n_orders,
    count(DISTINCT o_custkey)::BIGINT AS n_cust_exact,
    true AS hll_within_bound,
    quantile_disc(o_totalprice, 0.5) AS p50_totalprice
  FROM orders GROUP BY o_orderpriority),
hraw AS (
  SELECT ('0x' || substr(md5('hll|' || o_custkey::VARCHAR), 1, 15))::BIGINT
         AS h
  FROM orders WHERE o_custkey IS NOT NULL),
hbits AS (SELECT h >> 48 AS reg, h & 281474976710655 AS s FROM hraw),
h1 AS (SELECT reg, s | (s >> 1) AS s FROM hbits),
h2 AS (SELECT reg, s | (s >> 2) AS s FROM h1),
h3 AS (SELECT reg, s | (s >> 4) AS s FROM h2),
h4 AS (SELECT reg, s | (s >> 8) AS s FROM h3),
h5 AS (SELECT reg, s | (s >> 16) AS s FROM h4),
h6 AS (SELECT reg, s | (s >> 32) AS s FROM h5),
hreg AS (SELECT reg, max(49 - bit_count(s)) AS rho FROM h6 GROUP BY 1),
hfold AS (SELECT sum(reg * 1000003 + rho)::BIGINT AS hll_reg_fold,
                 count(*)::BIGINT AS hll_occupied FROM hreg),
mcnt AS (SELECT o_orderpriority::VARCHAR AS key, count(*) AS cnt
         FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
mrk AS (SELECT key, cnt,
          row_number() OVER (ORDER BY cnt DESC, key ASC) AS rn FROM mcnt),
mthr AS (SELECT coalesce(max(CASE WHEN rn = 4 THEN cnt END), 0) AS t
         FROM mrk WHERE rn <= 4),
mn AS (SELECT sum(cnt)::BIGINT AS n FROM mcnt),
msurv AS (SELECT key, c.cnt - t.t AS cnt
          FROM mcnt c CROSS JOIN mthr t WHERE c.cnt - t.t > 0),
mfold AS (
  SELECT md5(coalesce((SELECT string_agg(key || '=' || cnt, ','
                                         ORDER BY key || '=' || cnt)
                       FROM msurv), '')
             || '|' || t.t || '|' || n.n) AS mg_fold
  FROM mthr t CROSS JOIN mn n),
kcnt AS (SELECT o_totalprice::DOUBLE AS item, count(*) AS cnt
         FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
krk AS (SELECT item, cnt,
          coalesce(sum(cnt) OVER (ORDER BY item
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start,
          sum(cnt) OVER () AS n
        FROM kcnt),
kpar AS (
  SELECT *, CASE WHEN (n + 31) // 32 <= 1 THEN 0
    ELSE ceil(log2((n + 31) // 32))::INT END AS j
  FROM krk),
koc AS (
  SELECT *, (1::BIGINT << j) AS m,
    CASE WHEN j = 0 THEN 0 ELSE
      list_sum(list_transform(range(0, j), l ->
        (('0x' || substr(md5('kll|o_totalprice|' || l || '|0'), 1, 15))
         ::BIGINT % 2) * (1::BIGINT << l::INT)))
    END AS o
  FROM kpar),
ksurv AS (
  SELECT * FROM (
    SELECT j AS level, item,
      ((start + cnt - o + m - 1) // m) - ((start - o + m - 1) // m) AS kc,
      n, m - 1 AS err
    FROM koc) WHERE kc > 0),
kfold AS (
  SELECT md5(coalesce((SELECT string_agg(
             level || '=' || round(item * 100)::BIGINT || '=' || kc, ','
             ORDER BY level || '=' || round(item * 100)::BIGINT
                      || '=' || kc)
           FROM ksurv), '')
           || '|' || max(n) || '|' || max(err)) AS kll_fold
  FROM ksurv),
kcum AS (SELECT item,
           sum(kc * (1::BIGINT << level::INT)) OVER (ORDER BY item) AS cum,
           n
         FROM ksurv),
ktot AS (SELECT max(cum) AS tot FROM kcum),
kq AS (
  -- target capped at the survivors' total estimated weight (mirrors
  -- kll_quantiles: compaction can leave tot < n, and an uncapped
  -- ceil(q*n) target would silently drop near-1 quantiles)
  SELECT
    (SELECT min(item) FROM kcum, ktot
      WHERE cum >= greatest(1, least(ceil(0.5 * n), tot))) AS kll_p50,
    (SELECT min(item) FROM kcum, ktot
      WHERE cum >= greatest(1, least(ceil(0.99 * n), tot))) AS kll_p99),
bkh AS (
  SELECT DISTINCT o_custkey::VARCHAR AS key,
    ('0x' || substr(md5('bk|' || o_custkey::VARCHAR), 1, 15))::BIGINT AS h
  FROM orders WHERE o_custkey IS NOT NULL),
bkr AS (SELECT h, key, row_number() OVER (ORDER BY h) AS rnk FROM bkh),
bkf AS (
  SELECT md5((SELECT string_agg(h || '=' || key, ',' ORDER BY h || '=' || key)
              FROM bkr WHERE rnk <= 16)) AS bk_fold)
SELECT b.*, hfold.hll_reg_fold, hfold.hll_occupied, mfold.mg_fold,
       kfold.kll_fold, kq.kll_p50, kq.kll_p99, bkf.bk_fold,
       ksr.ks2_stat, ksr.ks2_bound
FROM base b CROSS JOIN hfold CROSS JOIN mfold CROSS JOIN kfold
     CROSS JOIN kq CROSS JOIN bkf CROSS JOIN ksr"""

    sql["set_ops"] = """
WITH high AS (SELECT DISTINCT user_id FROM events WHERE value > 300),
err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT user_id, 'both' AS tag FROM (SELECT * FROM high INTERSECT SELECT * FROM err)
UNION ALL
SELECT user_id, 'only_high' AS tag FROM (SELECT * FROM high EXCEPT SELECT * FROM err)"""

    # row-atomic carry: ONE struct per right row (matches operators/asof.py)
    # so every payload field comes from the same latest right row even when
    # individual payload values are NULL.
    sql["asof_join"] = """
WITH comb AS (
  SELECT user_id AS user_key, ts, 0 AS tag,
         struct_pack(event_id := event_id, value := value) AS pay,
         event_id AS tb, NULL::BIGINT AS o_orderkey
  FROM events
  UNION ALL
  SELECT o_custkey % 150 AS user_key, o_orderdate AS ts, 1 AS tag,
         NULL::STRUCT(event_id BIGINT, value DOUBLE) AS pay,
         NULL::BIGINT AS tb, o_orderkey
  FROM orders
),
carried AS (
  SELECT user_key, tag, o_orderkey,
    last_value(pay IGNORE NULLS) OVER (
      PARTITION BY user_key ORDER BY ts ASC, tag ASC, tb ASC NULLS FIRST
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prow
  FROM comb
)
SELECT o_orderkey, user_key, prow.event_id AS event_id,
       round(prow.value, 6) AS last_value
FROM carried WHERE tag = 1"""

    # ---- round-4 registry consolidation (driver gate records at most 50
    # queries): the five per-document text queries and the two multimodal
    # queries merge into text_profile / multimodal; their SQL blocks above
    # become CTE building blocks here and the standalone keys are retired.
    # round-14 rider CTEs: the Gopher rule metrics + gate and the C4
    # line cleaner, replayed rule-for-rule (the pytest-parity SQL from
    # tests/test_gopher_rules.py / test_c4_clean.py over `documents`)
    gopher_sql = r"""
  SELECT doc_id,
    len(w)::BIGINT AS gph_n_words,
    round(list_sum(list_transform(w, x -> length(x)))::DOUBLE
          / greatest(len(w), 1), 6) AS gph_mean_word_len,
    round(nsym / greatest(len(w), 1), 6) AS gph_symbol_word_ratio,
    round(len(list_filter(l, x -> regexp_matches(x,
      '^[ \t]*(•|\*|-)')))::DOUBLE / greatest(len(l), 1), 6)
      AS gph_bullet_line_ratio,
    round(len(list_filter(l, x -> regexp_matches(x,
      '(\.\.\.|…)[ \t]*$')))::DOUBLE / greatest(len(l), 1), 6)
      AS gph_ellipsis_line_ratio,
    round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
          / greatest(len(w), 1), 6) AS gph_alpha_word_ratio,
    len(list_intersect(list_transform(w, x -> lower(x)),
        ['the','be','to','of','and','that','have','with']))::INT
      AS gph_n_stop_words
  FROM (
    SELECT doc_id,
      string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS w,
      string_split(text, chr(10)) AS l,
      coalesce(len(regexp_extract_all(text, '#|\.\.\.')), 0) AS nsym
    FROM documents)"""
    c4_sql = r"""
  SELECT doc_id,
    md5(coalesce(array_to_string(kept, chr(10)), '')) AS c4_text_md5,
    len(kept)::BIGINT AS c4_lines_kept,
    (nl - len(kept))::BIGINT AS c4_lines_dropped,
    coalesce(len(regexp_extract_all(
      coalesce(array_to_string(kept, chr(10)), ''), '[.!?"]')), 0)::BIGINT
      AS c4_sentences,
    coalesce(len(regexp_extract_all(
      coalesce(array_to_string(kept, chr(10)), ''), '[.!?"]')), 0) >= 5
      AND NOT contains(lower(coalesce(raw, '')), 'lorem ipsum')
      AND NOT contains(lower(coalesce(raw, '')), '{') AS c4_keep
  FROM (
    SELECT doc_id, text AS raw, len(l) AS nl,
      list_transform(list_filter(l, x ->
        regexp_matches(trim(x), '[.!?"]$')
        AND len(string_split_regex(trim(x), '[ \t]+')) >= 3
        AND NOT contains(lower(trim(x)), 'javascript')),
        x -> trim(x)) AS kept
    FROM (SELECT doc_id, text,
            CASE WHEN text IS NULL THEN []::VARCHAR[]
                 ELSE string_split(text, chr(10)) END AS l
          FROM documents))"""
    sql["text_profile"] = f"""
WITH stats AS ({sql['text_stats']}),
langs AS ({sql['lang_id']}),
fp AS ({sql['fingerprint']}),
tok AS ({sql['token_count']}),
rep AS (SELECT doc_id, n_words AS norm_words, n_grams AS norm_grams,
               dup_word_frac, dup_gram_frac, top_gram_share
        FROM ({sql['repetition']})),
sh AS ({simhash32_sql}),
gph AS ({gopher_sql}),
c4 AS ({c4_sql})
SELECT stats.*, langs.lang_pred, langs.score_de, langs.score_en,
       langs.score_es, langs.score_fr, langs.score_zh,
       fp.fingerprint, fp.norm_len, tok.ws_tokens, tok.lex_tokens,
       rep.norm_words, rep.norm_grams, rep.dup_word_frac,
       rep.dup_gram_frac, rep.top_gram_share, sh.simhash32,
       gph.gph_n_words, gph.gph_mean_word_len, gph.gph_symbol_word_ratio,
       gph.gph_bullet_line_ratio, gph.gph_ellipsis_line_ratio,
       gph.gph_alpha_word_ratio, gph.gph_n_stop_words,
       gph.gph_n_words BETWEEN 50 AND 100000
         AND gph.gph_mean_word_len BETWEEN 3.0 AND 10.0
         AND gph.gph_symbol_word_ratio <= 0.1
         AND gph.gph_bullet_line_ratio <= 0.9
         AND gph.gph_ellipsis_line_ratio <= 0.3
         AND gph.gph_alpha_word_ratio >= 0.8
         AND gph.gph_n_stop_words >= 2 AS gph_pass,
       c4.c4_text_md5, c4.c4_lines_kept, c4.c4_lines_dropped,
       c4.c4_sentences, c4.c4_keep
FROM stats
JOIN langs USING (doc_id) JOIN fp USING (doc_id)
JOIN tok USING (doc_id) JOIN rep USING (doc_id) JOIN sh USING (doc_id)
JOIN gph USING (doc_id) JOIN c4 USING (doc_id)"""

    # dhash9x8 rider: rebuild the synthetic PGM pixel bytes (md5 stream,
    # pgm_payload_col spec), then the 64 dHash gradient bits. Pixel
    # comparison on raw bytes == comparison on byte/255.0 grayscale
    # (division by a positive constant is monotone), and bit 63 rides in
    # as the signed minimum instead of 1<<63 so the BIGINT sum cannot
    # overflow — same two's-complement pattern Spark's bitwiseOR builds.
    sql["multimodal_dhash"] = """
WITH hx AS (
  SELECT doc_id,
         md5(text) || md5(text || '1') || md5(text || '2') ||
         md5(text || '3') || md5(text || '4') AS h
  FROM documents),
px AS (
  SELECT doc_id,
    list_transform(range(0, 72),
                   i -> ('0x' || substr(h, (2*i + 1)::INT, 2))::BIGINT) AS p
  FROM hx)
SELECT doc_id,
  (list_sum(list_transform(range(0, 63), k ->
     CASE WHEN p[((k // 8) * 9 + (k % 8) + 2)::INT]
             > p[((k // 8) * 9 + (k % 8) + 1)::INT]
          THEN (1::BIGINT << k::INT) ELSE 0 END))
   + CASE WHEN p[72] > p[71]
          THEN (-9223372036854775807 - 1)::BIGINT ELSE 0 END)::BIGINT
  AS dhash9x8
FROM px"""
    # audio_subfp rider: rebuild the synthetic WAV's int16 LE samples from
    # the md5 stream (wav_payload_col spec), then the Haitsma-Kalker
    # subfingerprints by RECOMPUTING THE DFT per (frame, bin) as the
    # literal trig sum NumPy's rfft evaluates (|X|² is sign-free, so the
    # e^{-iθ} convention cancels). Hann = 0.5 - 0.5·cos(2πt/63); band of
    # bin k = count of log-spaced edges <= 125k Hz (searchsorted-right);
    # bits compare the double-difference of band energies — float noise
    # between the trig sum and the FFT butterfly is ~1e-12 relative,
    # orders below any realized sign margin on md5-random samples.
    _wav_md5s = " || ".join(f"md5(text || 'a{j}')" for j in range(16))
    sql["multimodal_audio"] = f"""
WITH ahx AS (
  SELECT doc_id, {_wav_md5s} AS h FROM documents),
smp AS (
  SELECT doc_id,
    list_transform(
      list_transform(range(0, 128), i ->
        ('0x' || substr(h, (4*i + 3)::INT, 2))::BIGINT * 256
        + ('0x' || substr(h, (4*i + 1)::INT, 2))::BIGINT),
      v -> (CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) / 32768.0)
    AS x
  FROM ahx),
bins AS (
  SELECT doc_id, f, k,
         sum(x[(f*32 + t + 1)::INT] * (0.5 - 0.5*cos(2*pi()*t/63.0))
             * cos(2*pi()*k*t/64.0)) AS re,
         sum(x[(f*32 + t + 1)::INT] * (0.5 - 0.5*cos(2*pi()*t/63.0))
             * sin(2*pi()*k*t/64.0)) AS im
  FROM smp, range(0,3) r1(f), range(0,33) r2(k), range(0,64) r3(t)
  GROUP BY doc_id, f, k),
bandk AS (
  SELECT k, (SELECT count(*) FROM range(0,6) r(m)
             WHERE 300.0*pow(10.0, m/5.0) <= 125.0*k) AS band
  FROM range(0,33) r(k)),
eb AS (
  SELECT doc_id, f, band AS m, sum(re*re + im*im) AS e
  FROM bins JOIN bandk USING (k) WHERE band BETWEEN 1 AND 5
  GROUP BY doc_id, f, band),
dd AS (
  SELECT a.doc_id, a.f, a.m, a.e - b.e AS d
  FROM eb a JOIN eb b ON a.doc_id = b.doc_id AND a.f = b.f
                      AND b.m = a.m + 1),
sub AS (
  SELECT d2.doc_id, (d2.f - 1) AS fb,
         sum(CASE WHEN d2.d - d1.d > 0
                  THEN (1::BIGINT << (d2.m - 1)::INT) ELSE 0 END)::BIGINT
         AS s
  FROM dd d2 JOIN dd d1 ON d1.doc_id = d2.doc_id AND d1.m = d2.m
                        AND d1.f = d2.f - 1
  GROUP BY d2.doc_id, d2.f)
SELECT doc_id,
  max(CASE WHEN fb = 0 THEN s END)::BIGINT AS audio_subfp0,
  max(CASE WHEN fb = 1 THEN s END)::BIGINT AS audio_subfp1
FROM sub GROUP BY doc_id"""

    # vframe_dh rider: per-frame pixel streams from the avi_payload_col
    # md5 spec (the oracle never parses the container — ONLY a correct
    # movi walk on the Spark side recovers the same bytes), then the same
    # dHash bit fold as dhash9x8, per frame.
    def _vframe_dh_sql(fi: int) -> str:
        md5s = " || ".join(f"md5(text || 'v{fi}_{j}')" for j in range(5))
        return f"""
SELECT doc_id,
  (list_sum(list_transform(range(0, 63), k ->
     CASE WHEN p[((k // 8) * 9 + (k % 8) + 2)::INT]
             > p[((k // 8) * 9 + (k % 8) + 1)::INT]
          THEN (1::BIGINT << k::INT) ELSE 0 END))
   + CASE WHEN p[72] > p[71]
          THEN (-9223372036854775807 - 1)::BIGINT ELSE 0 END)::BIGINT
  AS vframe_dh{fi}
FROM (
  SELECT doc_id,
    list_transform(range(0, 72),
                   i -> ('0x' || substr(h, (2*i + 1)::INT, 2))::BIGINT) AS p
  FROM (SELECT doc_id, {md5s} AS h FROM documents))"""

    # web rider: the planted URLs re-parsed with regexes (scheme /
    # authority / path / query), then the normalize_url spec (default
    # ports, trailing slashes, tracking-param drop + byte sort, www
    # strip) and registrable_domain's label heuristic replayed in SQL;
    # the planted HTML runs the extract_text spec step-by-step —
    # script/style removed in TWO passes (no backreferences in RE2;
    # equivalent on the controlled payload), Java \s written as its
    # explicit ASCII class (RE2's \s lacks \x0B), entities via literal
    # replace in the same order, then the whitespace collapse chain.
    _ws = r" \t\n\x0B\f\r"
    _blk = ("p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section"
            "|article|header|footer|pre|form|hr")
    sql["multimodal_web"] = f"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'https://WWW.News' || (doc_id % 23) ||
                  '.Example.CO.UK:443/a/b' || doc_id ||
                  '//?utm_campaign=c&b=2&a=1#frag'
      WHEN 1 THEN 'http://Sub.Blog' || (doc_id % 23) ||
                  '.Example.COM:80/Path/' || doc_id || '/'
      WHEN 2 THEN 'https://shop' || (doc_id % 23) ||
                  '.example.com:8443/buy?gclid=g&q=' || doc_id
      ELSE 'not a url' END AS url,
    '<!DOCTYPE html><HTML><Body class="c"><h1>T' || doc_id ||
    '</h1><script type="t">var j="</div>";</script><p> ' ||
    substr(text, 1, 90) ||
    ' A&amp;B &lt;ok&gt;&nbsp;q</p><!-- note --><ul><li>i1</li>' ||
    '<li>i2</li></ul><STYLE>.c{{x}}</STYLE><div>tail</div></Body></HTML>'
    AS h
  FROM documents),
parts AS (
  SELECT doc_id, h,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      AS scheme,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
      AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u),
hostp AS (
  SELECT doc_id, h, scheme, path, query,
    nullif(regexp_replace(regexp_replace(
      lower(regexp_replace(auth, ':[0-9]+$', '')),
      '\\.+$', ''), '^www\\.', ''), '') AS host,
    regexp_extract(auth, ':([0-9]+)$', 1) AS port
  FROM parts),
normed AS (
  SELECT doc_id, h, scheme, host,
    CASE WHEN (scheme = 'http' AND port = '80')
           OR (scheme = 'https' AND port = '443')
         THEN '' ELSE port END AS port2,
    regexp_replace(path, '/+$', '') AS path2,
    coalesce(array_to_string(
      list_sort(list_filter(string_split(query, '&'),
        x -> x <> '' AND NOT regexp_matches(lower(split_part(x, '=', 1)),
          '^(utm_.*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)$'))),
      '&'), '') AS qs
  FROM hostp),
urlcols AS (
  SELECT doc_id, h, host AS url_host,
    CASE WHEN host IS NULL OR scheme = '' THEN NULL
         ELSE scheme || '://' || host ||
              CASE WHEN port2 = '' THEN '' ELSE ':' || port2 END ||
              path2 || CASE WHEN qs = '' THEN '' ELSE '?' || qs END
    END AS norm_url,
    CASE WHEN host IS NULL THEN NULL
         WHEN len(string_split(host, '.')) <= 2 THEN host
         WHEN list_contains(
                ['com','net','org','co','ac','gov','edu','mil','sch'],
                string_split(host, '.')[-2])
              AND length(string_split(host, '.')[-1]) = 2
           THEN string_split(host, '.')[-3] || '.' ||
                string_split(host, '.')[-2] || '.' ||
                string_split(host, '.')[-1]
         ELSE string_split(host, '.')[-2] || '.' ||
              string_split(host, '.')[-1]
    END AS url_domain
  FROM normed),
ex AS (
  SELECT doc_id, h, url_host, norm_url, url_domain,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      h, '(?is)<script\\b[^>]*>.*?</script[{_ws}]*>', '', 'g'),
         '(?is)<style\\b[^>]*>.*?</style[{_ws}]*>', '', 'g'),
         '(?is)<script\\b[^>]*>.*', '', 'g'),
         '(?is)<style\\b[^>]*>.*', '', 'g') AS v1
  FROM urlcols),
ex2 AS (
  SELECT doc_id, h, url_host, norm_url, url_domain,
    regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(v1, '(?s)<!--.*?-->', '', 'g'),
      '(?i)</?({_blk})\\b[^>]*>', chr(10), 'g'),
      '(?s)<[^>]*>', ' ', 'g'),
      '&nbsp;', ' ', 'g') AS v2
  FROM ex),
ex3 AS (
  SELECT doc_id, h, url_host, norm_url, url_domain,
    replace(replace(replace(replace(replace(replace(
      v2, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      '&#39;', chr(39)), '&apos;', chr(39)), '&amp;', '&') AS v3
  FROM ex2),
ex4 AS (
  SELECT doc_id, h, url_host, norm_url, url_domain,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      v3, '[ \\t\\x0B\\f\\r]+', ' ', 'g'),
      ' ?\\n ?', chr(10), 'g'),
      '\\n{{2,}}', chr(10), 'g'),
      '^[{_ws}]+|[{_ws}]+$', '', 'g') AS vis_text
  FROM ex3),
mstat AS (
  SELECT doc_id, url_host, norm_url, url_domain, vis_text,
    len(regexp_extract_all(h, '(?s)<[^>]*>')) AS n_tags,
    round(len(regexp_extract_all(h, '(?s)<[^>]*>')) * 100.0
          / greatest(length(h), 1), 4) AS tag_density,
    round(length(vis_text) / greatest(length(h), 1), 4) AS visible_ratio,
    regexp_matches(h,
      '(?is)<!doctype[{_ws}]+html|<html[{_ws}>]|<body[{_ws}>]' ||
      '|<div[{_ws}>]|<p[{_ws}>]') AS structural
  FROM ex4),
ublk AS (
  SELECT doc_id,
    coalesce(len(list_intersect(
      list_transform(range(1, len(string_split(host, '.')) + 1),
        i -> array_to_string(string_split(host, '.')[i:], '.')),
      ['example.co.uk', 'blockedhost.test'])) > 0, false) AS url_blocked
  FROM hostp)
SELECT m.doc_id, norm_url, url_host, url_domain, vis_text,
       n_tags, tag_density, visible_ratio,
       (structural AND tag_density > 0.2) AS is_html,
       ublk.url_blocked
FROM mstat m JOIN ublk ON m.doc_id = ublk.doc_id"""

    # code rider: with_code_stats' eight line-shape signals replayed
    # with DuckDB list/regex functions over the same planted code text.
    sql["multimodal_code"] = f"""
WITH c0 AS (
  SELECT doc_id,
    '# hdr' || chr(10) || chr(9) || 'indent = 1' || chr(10) ||
    substr(text, 1, 120) || chr(10) ||
    repeat('B', (doc_id % 40 + 5)::INT) ||
    CASE WHEN doc_id % 7 = 0
         THEN chr(10) || '// @generated do not edit' ELSE '' END AS code
  FROM documents),
t AS (SELECT doc_id, code, string_split(code, chr(10)) AS lines,
             len(string_split(code, chr(10))) AS n_lines
      FROM c0)
SELECT doc_id,
  n_lines AS code_n_lines,
  list_max(list_transform(lines, x -> length(x))) AS code_max_line_len,
  round(list_sum(list_transform(lines, x -> length(x)))
        / greatest(n_lines, 1), 4) AS code_avg_line_len,
  round(length(regexp_replace(code, '[^A-Za-z0-9]', '', 'g'))
        / greatest(length(code), 1), 4) AS code_alnum_ratio,
  round(len(list_filter(lines,
          x -> regexp_matches(x, '^[ \\t]*(#|//|/\\*|\\*|--|;)')))
        / greatest(n_lines, 1), 4) AS code_comment_line_ratio,
  round(len(list_filter(lines, x -> regexp_matches(x, '^[ \\t]')))
        / greatest(n_lines, 1), 4) AS code_indent_ratio,
  list_max(list_transform(
    string_split_regex(trim(code), '[ \\t\\n\\x0B\\f\\r]+'),
    x -> length(x))) AS code_max_token_len,
  regexp_matches(code, '(?i)(auto[- ]?generated|do not edit|generated by'
    || '|@generated|this file was generated)') AS code_is_autogen
FROM t"""

    # round-14 lic_* rider: rebuild the planted rotating license header
    # + %7 opt-out marker, then replay the SPDX extract, the
    # header-phrase CASE (list order = priority) and the fail-closed
    # permissive allowlist of code.with_license_info
    _lic_perm = ", ".join(f"'{p}'" for p in (
        "MIT", "Apache-2.0", "BSD-2-Clause", "BSD-3-Clause", "0BSD",
        "ISC", "Unlicense", "Zlib", "CC0-1.0"))
    sql["multimodal_lic"] = rf"""
WITH l0 AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN '// SPDX-License-Identifier: MIT' || chr(10)
      WHEN 1 THEN '// SPDX-License-Identifier: MIT OR Apache-2.0'
                  || chr(10)
      WHEN 2 THEN '/* Licensed under the Apache License, Version 2.0 */'
                  || chr(10)
      WHEN 3 THEN '/* GNU General Public License */' || chr(10)
      ELSE '' END
    || substr(text, 1, 80)
    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'noai' ELSE '' END AS t
  FROM documents),
l1 AS (
  SELECT doc_id, t, substring(t, 1, 2048) AS head,
    nullif(trim(regexp_extract(substring(t, 1, 2048),
      'SPDX-License-Identifier:[ \t]*([A-Za-z0-9 .+()-]+)', 1)), '')
      AS lic_spdx
  FROM l0),
l2 AS (
  SELECT *, CASE
    WHEN regexp_matches(head, '(?i)Apache License,? Version 2\.0'
         || '|apache\.org/licenses/LICENSE-2\.0') THEN 'Apache-2.0'
    WHEN regexp_matches(head,
         '(?i)GNU (General|Lesser|Affero) Public License') THEN 'GPL'
    WHEN regexp_matches(head, '(?i)Mozilla Public License')
         THEN 'MPL-2.0'
    WHEN regexp_matches(head, '(?i)\bMIT License\b'
         || '|Permission is hereby granted, free of charge') THEN 'MIT'
    WHEN regexp_matches(head,
         '(?i)Redistribution and use in source and binary forms')
         THEN 'BSD'
    WHEN regexp_matches(head, '(?i)\bISC License\b') THEN 'ISC'
    WHEN regexp_matches(head,
         '(?i)This is free and unencumbered software') THEN 'Unlicense'
    END AS phrase
  FROM l1)
SELECT doc_id, lic_spdx,
  coalesce(lic_spdx, phrase) AS lic_detected,
  coalesce(CASE WHEN lic_spdx IS NOT NULL THEN lic_spdx IN ({_lic_perm})
                ELSE phrase IN ('Apache-2.0','MIT','BSD','ISC',
                                'Unlicense') END,
           false) AS lic_permissive,
  coalesce(regexp_matches(t, '(?i)\b(noai|noimageai|noml)\b'
    || '|do not (use|include)[^\n]{{0,60}}(training|dataset)'
    || '|opt[ -]?out[^\n]{{0,30}}(ai|ml) training'), false) AS lic_optout
FROM l2"""

    # round-14 pii_* rider: rebuild the planted text (constant VALID
    # card + a swallowed ' 99' tail + ssn + a doc-id-derived 16-digit
    # run), replay the Luhn prefix-window sub-span walk per candidate,
    # the word-bounded replace left-fold, and the ssn chain — hashing
    # the redacted bytes
    def _pii_luhn_ok(expr: str) -> str:
        dgt = f"regexp_replace({expr}, '[^0-9]', '', 'g')"
        a = f"ascii(substring(reverse({dgt}), (i+1)::INT, 1)) - 48"
        return (
            f"(length({dgt}) BETWEEN 13 AND 19 AND "
            f"list_sum(list_transform(range(0, length({dgt})), i -> "
            f"CASE WHEN i % 2 = 1 THEN "
            f"CASE WHEN 2 * ({a}) > 9 THEN 2 * ({a}) - 9 "
            f"ELSE 2 * ({a}) END ELSE {a} END)) % 10 = 0)")

    def _pii_prefix(k: int) -> str:
        return rf"regexp_extract(s, '^\d(?:[ -]?\d){{{k - 1}}}', 0)"

    _pii_sub = "CASE " + " ".join(
        f"WHEN {_pii_prefix(k)} <> '' AND {_pii_luhn_ok(_pii_prefix(k))} "
        f"THEN {_pii_prefix(k)}"
        for k in range(19, 12, -1)) + " ELSE NULL END"
    sql["multimodal_pii"] = rf"""
WITH p0 AS (
  SELECT doc_id,
    substr(text, 1, 60) || ' 4539 1488 0343 6467 99 ssn 123-45-6789 x '
      || dd || ' ' || dd || ' ' || dd || ' ' || dd AS t
  FROM (SELECT doc_id, text,
          lpad((doc_id % 10000)::VARCHAR, 4, '0') AS dd
        FROM documents)),
p1 AS (
  SELECT doc_id, t,
    list_filter(list_transform(
      regexp_extract_all(t, '\b\d(?:[ -]?\d){{12,18}}\b'),
      s -> {_pii_sub}), x -> x IS NOT NULL) AS valid
  FROM p0)
SELECT doc_id,
  md5(regexp_replace(
    list_reduce(list_prepend(t, valid),
                (acc, x) -> regexp_replace(acc, '\b' || x || '\b',
                                           '[CREDIT_CARD]', 'g')),
    '\b\d{{3}}-\d{{2}}-\d{{4}}\b', '[SSN]', 'g')) AS pii_md5,
  len(valid)::INT AS pii_n_card,
  coalesce(len(regexp_extract_all(t, '\b\d{{3}}-\d{{2}}-\d{{4}}\b')),
           0)::INT AS pii_n_ssn
FROM p1"""

    # the language rider's oracle is langid's own SQL twin, built from the
    # same embedded literal model the Spark side scores with
    from anomalyzer_spark.functions import langid as _langid
    lang_cols = ", ".join(
        ["lng.lang_pred_model"]
        + [f"lng.prob_{lg}" for lg in _LANG_MODEL["langs"]])
    # r15: strip_repeated_paragraphs over the planted first-sentence
    # repetition (tests/test_text_extras.py replay, collapsed to md5 of
    # the rebuilt bytes + the two counters)
    sql["multimodal_srp"] = """
WITH srpd AS (SELECT doc_id,
             text || '. ' || regexp_split_to_array(text, '\\. ')[1]
                  || '. ' || regexp_split_to_array(text, '\\. ')[1] AS text
           FROM documents),
srpex AS (
  SELECT doc_id, u.pos, u.para,
         CASE WHEN u.para <> '' THEN md5(u.para) END AS h
  FROM (SELECT doc_id, string_split(text, '. ') AS ps FROM srpd),
       unnest(list_transform(range(1, len(ps) + 1),
              i -> struct_pack(pos := i, para := ps[i]))) AS t(u)),
srpm AS (SELECT *, CASE WHEN h IS NOT NULL THEN
        row_number() OVER (PARTITION BY doc_id, h ORDER BY pos) END AS occ
      FROM srpex)
SELECT doc_id,
  md5(coalesce(array_to_string(list_transform(
    list_sort(list(struct_pack(pos := pos, para := para))
              FILTER (WHERE h IS NULL OR occ = 1)),
    s -> s.para), '. '), '')) AS srp_md5,
  (count(*) FILTER (WHERE h IS NOT NULL))::BIGINT AS srp_paras,
  (count(*) FILTER (WHERE occ > 1))::BIGINT AS srp_dropped
FROM srpm GROUP BY doc_id"""

    # r15: hash_embeddings (dim 16, L2-normalized) — the
    # tests/test_text_extras.py replay collapsed to the
    # position-weighted checksum + nonzero-bucket count
    sql["multimodal_he"] = """
WITH hetok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text),
         '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS t
  FROM documents),
heb AS (SELECT doc_id,
        ('0x' || substr(md5(t), 1, 8))::BIGINT % 16 AS b
      FROM hetok),
hec AS (SELECT doc_id, b, count(*)::DOUBLE AS c FROM heb GROUP BY 1, 2),
hem AS (SELECT doc_id, map_from_entries(list(struct_pack(k := b, v := c)))
        AS m FROM hec GROUP BY doc_id),
hev AS (SELECT d.doc_id,
        list_transform(range(0, 16),
                       i -> coalesce(hem.m[i][1], 0.0::DOUBLE)) AS raw
      FROM (SELECT doc_id FROM documents) d LEFT JOIN hem USING (doc_id)),
hen AS (SELECT doc_id,
        CASE WHEN raw IS NULL
             THEN list_transform(range(0, 16), i -> 0.0::DOUBLE)
             ELSE raw END AS raw FROM hev),
hef AS (SELECT doc_id, raw,
        sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm FROM hen),
hee AS (SELECT doc_id,
  CASE WHEN nrm > 0 THEN list_transform(raw, x -> round(x / nrm, 6))
       ELSE raw END AS emb
  FROM hef)
SELECT doc_id,
  round(list_sum(list_transform(range(1, 17), i -> emb[i] * i)), 6)
    AS he_chk,
  len(list_filter(emb, x -> x != 0.0))::BIGINT AS he_nnz
FROM hee"""

    sql["multimodal"] = f"""
WITH meta AS ({sql['multimodal_meta']}),
feat AS ({sql['multimodal_features']}),
dh AS ({sql['multimodal_dhash']}),
lng AS ({_langid.lang_scoring_sql(_LANG_MODEL)}),
afp AS ({sql['multimodal_audio']}),
vd0 AS ({_vframe_dh_sql(0)}),
vd1 AS ({_vframe_dh_sql(1)}),
vd2 AS ({_vframe_dh_sql(2)}),
wb AS ({sql['multimodal_web']}),
cd AS ({sql['multimodal_code']}),
lic AS ({sql['multimodal_lic']}),
pii AS ({sql['multimodal_pii']}),
srp AS ({sql['multimodal_srp']}),
he AS ({sql['multimodal_he']})
SELECT meta.doc_id, meta.n_bytes, meta.content_md5, meta.format,
       feat.byte_mean, feat.byte_std, feat.byte_entropy, dh.dhash9x8,
       {lang_cols},
       afp.audio_subfp0, afp.audio_subfp1,
       vd0.vframe_dh0, vd1.vframe_dh1, vd2.vframe_dh2,
       wb.norm_url, wb.url_host, wb.url_domain, wb.vis_text,
       wb.n_tags, wb.tag_density, wb.visible_ratio, wb.is_html,
       wb.url_blocked,
       cd.code_n_lines, cd.code_max_line_len, cd.code_avg_line_len,
       cd.code_alnum_ratio, cd.code_comment_line_ratio,
       cd.code_indent_ratio, cd.code_max_token_len, cd.code_is_autogen,
       lic.lic_spdx, lic.lic_detected, lic.lic_permissive,
       lic.lic_optout,
       pii.pii_md5, pii.pii_n_card, pii.pii_n_ssn,
       srp.srp_md5, srp.srp_paras, srp.srp_dropped,
       he.he_chk, he.he_nnz
FROM meta JOIN feat USING (doc_id) JOIN dh USING (doc_id)
     JOIN lng ON lng.doc_id = meta.doc_id
     JOIN afp ON afp.doc_id = meta.doc_id
     JOIN vd0 ON vd0.doc_id = meta.doc_id
     JOIN vd1 ON vd1.doc_id = meta.doc_id
     JOIN vd2 ON vd2.doc_id = meta.doc_id
     JOIN wb ON wb.doc_id = meta.doc_id
     JOIN cd ON cd.doc_id = meta.doc_id
     JOIN lic ON lic.doc_id = meta.doc_id
     JOIN pii ON pii.doc_id = meta.doc_id
     JOIN srp ON srp.doc_id = meta.doc_id
     JOIN he ON he.doc_id = meta.doc_id"""
    del sql["multimodal_dhash"]
    del sql["multimodal_audio"]
    del sql["multimodal_web"]
    del sql["multimodal_code"]
    del sql["multimodal_lic"]
    del sql["multimodal_pii"]
    del sql["multimodal_srp"]
    del sql["multimodal_he"]

    for retired in ("text_stats", "lang_id", "fingerprint", "token_count",
                    "repetition", "multimodal_meta", "multimodal_features"):
        del sql[retired]

    # streaming session windows: batch islands sessions whose window end
    # (last event + gap) has passed the final watermark (max event time
    # - 1h, ms-truncated like resample_stream's — Spark's watermark
    # bookkeeping is EventTimeStatsAccum in milliseconds).
    sql["sessions_stream"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
flagged AS (
  SELECT user_id, us, event_id,
    CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
assigned AS (
  SELECT user_id, us,
    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_idx
  FROM flagged),
sess AS (
  SELECT user_id, min(us) AS start_us, max(us) AS end_us,
         count(*) AS n_events
  FROM assigned GROUP BY user_id, session_idx)
SELECT user_id, start_us, end_us, n_events
FROM sess
WHERE end_us + 1800000000 <=
      (SELECT (max(epoch_us(ts)) // 1000) * 1000 - 3600000000 FROM events)"""

    # streaming exact dedup: the final per-hash state must equal the batch
    # groups (count + min id) — shared with exact_dedup's formulation.
    sql["dedup_stream"] = f"""
WITH hashed AS (SELECT doc_id, md5({_NORM}) AS content_hash FROM documents)
SELECT content_hash, count(*) AS group_size, min(doc_id) AS canonical_id
FROM hashed GROUP BY content_hash"""

    # detect with the scan-pushdown horizon pre-filter: identical detect
    # oracle over the pre-filtered source slice.
    horizon_src = (
        "(SELECT event_type, ts, event_id, value FROM events "
        f"WHERE ts >= TIMESTAMP '{HORIZON_ANCHOR}' "
        f"- INTERVAL {HORIZON_DAYS} DAYS)")
    sql["detect_horizon"] = _detect_sql("event_type", DET_CONF,
                                        src=horizon_src)

    # Kafka value-parse contract: same wire synthesis, same PERMISSIVE
    # malformed policy (all parsed fields NULL for the corrupted subset).
    sql["kafka_parse"] = """
SELECT event_id AS kafka_key,
  CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END AS event_id,
  CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_type END AS event_type,
  CASE WHEN event_id % 97 = 0 THEN NULL
       ELSE json_extract_string(props, '$.k')::BIGINT END AS k
FROM events"""

    return sql
