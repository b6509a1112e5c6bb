"""Round-7 text/delta operators: tfidf_terms, chunk_windows,
snapshot_diff — DuckDB value parity over the driver fixtures plus
hand-built semantic pins and plan-shape checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import dedup, text

_TOK_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con


# ---------------------------------------------------------------------------
# tfidf_terms
# ---------------------------------------------------------------------------

def test_tfidf_terms_duckdb_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["token"], r["tf"], r["doc_freq"], r["tfidf"],
         r["rnk"])
        for r in text.tfidf_terms(docs, k=3, min_doc_freq=2).collect())
    want = _duck(sf_dir).execute(f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK_RE}'))
         AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (
  SELECT token, count(*) AS doc_freq FROM (
    SELECT DISTINCT doc_id, token FROM tok)
  GROUP BY token HAVING count(*) >= 2),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token, tf, doc_freq,
         round(tf * (ln((n_docs + 1) / (doc_freq + 1.0)) + 1), 6) AS tfidf
  FROM tf JOIN dfreq USING (token), n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, token ASC) AS rnk FROM scored)
SELECT doc_id, token, tf, doc_freq, tfidf, rnk FROM r WHERE rnk <= 3
ORDER BY doc_id, rnk""").fetchall()
    assert len(got) > 0
    assert got == sorted(tuple(w) for w in want)


def test_tfidf_terms_semantics(spark):
    # doc 0: 'common' tf=2 * idf ln(4/4)+1 = 2.0 still beats 'rare'
    # tf=1 * ln(4/2)+1 ≈ 1.693 — but at equal tf=1 (doc 1) the
    # document-unique term outranks the corpus-wide one.
    df = spark.createDataFrame(
        [(0, "rare common common"), (1, "common alpha"), (2, "common beta")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["rnk"]): r
           for r in text.tfidf_terms(df, k=2).collect()}
    assert out[(0, 1)]["token"] == "common"
    assert out[(0, 1)]["tfidf"] == pytest.approx(2.0)
    assert out[(0, 2)]["token"] == "rare"
    assert out[(0, 2)]["tfidf"] == pytest.approx(
        round(__import__("math").log(2.0) + 1, 6))
    assert out[(1, 1)]["token"] == "alpha"     # unique beats ubiquitous
    assert out[(1, 2)]["token"] == "common"
    assert out[(0, 2)]["doc_freq"] == 1
    assert out[(0, 1)]["doc_freq"] == 3
    with pytest.raises(ValueError):
        text.tfidf_terms(df, k=0)
    with pytest.raises(ValueError):
        text.tfidf_terms(df, min_doc_freq=0)


# ---------------------------------------------------------------------------
# chunk_windows
# ---------------------------------------------------------------------------

def test_chunk_windows_duckdb_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["tok_start"], r["n_chunk_toks"],
         r["chunk_text"], r["lang"])
        for r in text.chunk_windows(
            docs, size=16, stride=8, carry_cols=["lang"]).collect())
    want = _duck(sf_dir).execute(f"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '{_TOK_RE}') AS toks
  FROM documents),
s AS (SELECT doc_id, lang, toks, len(toks) AS n,
        unnest(range(0, greatest(len(toks), 0), 8)) AS tok_start
      FROM t WHERE len(toks) > 0)
SELECT doc_id, (tok_start // 8)::INT AS chunk_idx, tok_start,
       len(toks[tok_start + 1 : tok_start + 16]) AS n_chunk_toks,
       array_to_string(toks[tok_start + 1 : tok_start + 16], ' ')
         AS chunk_text,
       lang
FROM s ORDER BY doc_id, chunk_idx""").fetchall()
    assert len(got) > 0
    assert got == sorted(tuple(w) for w in want)


def test_chunk_windows_semantics(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a"), (2, ""), (3, None)],
        "doc_id long, text string")
    rows = text.chunk_windows(df, size=3, stride=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts 0,2,4 → 'a b c', 'c d e', 'e'
    texts = [r["chunk_text"] for r in sorted(by[0],
                                             key=lambda r: r["chunk_idx"])]
    assert texts == ["a b c", "c d e", "e"]
    assert [r["tok_start"] for r in sorted(by[0],
            key=lambda r: r["chunk_idx"])] == [0, 2, 4]
    assert by[1][0]["chunk_text"] == "a" and by[1][0]["n_chunk_toks"] == 1
    assert 2 not in by and 3 not in by  # empty/NULL docs emit zero rows
    # full coverage: every token index falls in >= 1 window
    assert sum(r["n_chunk_toks"] for r in by[0]) >= 5
    with pytest.raises(ValueError):
        text.chunk_windows(df, size=0)
    with pytest.raises(ValueError):
        text.chunk_windows(df, size=3, stride=0)


def test_chunk_windows_plan_is_shuffle_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = text.chunk_windows(
        docs, size=32, stride=16)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_duckdb_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # new snapshot: drop ids % 7 == 0 (removed), rewrite ids % 5 == 0
    # (changed), append shifted copies (added)
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
                          "text"))
    )
    got = sorted(
        (r["doc_id"], r["status"], r["old_hash"], r["new_hash"])
        for r in dedup.snapshot_diff(old, new).collect())
    want = _duck(sf_dir).execute("""
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
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
SELECT doc_id,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN old_hash IS NOT DISTINCT FROM new_hash THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_hash, new_hash
FROM j
WHERE CASE WHEN NOT in_old THEN 'added'
           WHEN NOT in_new THEN 'removed'
           WHEN old_hash IS NOT DISTINCT FROM new_hash THEN 'unchanged'
           ELSE 'changed' END <> 'unchanged'
ORDER BY doc_id""").fetchall()
    assert len(got) > 0
    assert got == sorted(tuple(w) for w in want)
    statuses = {g[1] for g in got}
    assert statuses == {"added", "removed", "changed"}


def test_snapshot_diff_null_text_semantics(spark):
    old = spark.createDataFrame([(0, None), (1, "x"), (2, None)],
                                "doc_id long, text string")
    new = spark.createDataFrame([(0, None), (1, None), (2, "y")],
                                "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in dedup.snapshot_diff(
               old, new, include_unchanged=True).collect()}
    # NULL == NULL is unchanged; NULL vs text is changed (both directions)
    assert got == {0: "unchanged", 1: "changed", 2: "changed"}


# ---------------------------------------------------------------------------
# normalize_text
# ---------------------------------------------------------------------------

def test_normalize_text_duckdb_parity_nfc(spark, sf_dir):
    """Planted decomposed accents + control bytes over the fixture text,
    normalized by both engines (DuckDB nfc_normalize + regexp_replace)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("cafe\u0301 \x01"), F.col("text"),
                 F.lit(" A\u030a end\x7f")).alias("text"))
    got = sorted(
        (r["doc_id"], r["text"])
        for r in text.normalize_text(docs).collect())
    want = _duck(sf_dir).execute("""
SELECT doc_id,
       nfc_normalize(regexp_replace(
         'cafe' || chr(769) || ' ' || chr(1) || text || ' A' || chr(778)
           || ' end' || chr(127),
         '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]', '', 'g')) AS t
FROM documents ORDER BY doc_id""").fetchall()
    assert len(got) == len(want) > 0
    assert got == [tuple(w) for w in want]
    # the plant did real work: NFC composed the accents
    assert all("café" in t for _, t in got)
    assert all("\u0301" not in t and "\x01" not in t and "\x7f" not in t
               for _, t in got)


def test_normalize_text_semantics(spark):
    df = spark.createDataFrame(
        [(0, "cafe\u0301"), (1, "a\x00b\tc\nd"), (2, None),
         (3, "  x   y  ")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in text.normalize_text(df, collapse_ws=True).collect()}
    assert out[0] == "caf\u00e9"          # NFC composed e+U+0301
    assert out[1] == "ab c d"             # \x00 stripped, \t\n kept→collapsed
    assert out[2] is None                 # NULL passes through
    assert out[3] == "x y"
    # skip stages independently
    raw = {r["doc_id"]: r["text"]
           for r in text.normalize_text(
               df, form=None, strip_control=False).collect()}
    assert raw[0] == "cafe\u0301"   # form=None leaves it decomposed
    with pytest.raises(ValueError):
        text.normalize_text(df, form="NFX")


def test_normalize_text_plan_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = text.normalize_text(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan       # the one documented Arrow stage


# ---------------------------------------------------------------------------
# property pins (hypothesis): chunk coverage + diff identity
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_WORDS = st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "7"]),
                  min_size=0, max_size=12)


@settings(max_examples=12, deadline=None)
@given(words=_WORDS, size=st.integers(1, 5), stride=st.integers(1, 5))
def test_chunk_windows_property_coverage(spark, words, size, stride):
    """Every token position is covered by >= 1 window; with stride==size
    the windows are disjoint and concatenate back to the token stream."""
    txt = " ".join(words)
    df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
    rows = sorted(text.chunk_windows(df, size=size, stride=stride).collect(),
                  key=lambda r: r["chunk_idx"])
    n = len(words)
    if n == 0:
        assert rows == []
        return
    covered = set()
    for r in rows:
        covered |= set(range(r["tok_start"],
                             r["tok_start"] + r["n_chunk_toks"]))
    if stride <= size:
        # dense chunking: every token position in >= 1 window
        assert covered == set(range(n))
    else:
        # sparse sampling (stride > size): gaps are the contract; the
        # sampled positions are exactly the per-start size-capped spans
        want = set()
        for s in range(0, n, stride):
            want |= set(range(s, min(s + size, n)))
        assert covered == want
    if stride == size:
        rebuilt = " ".join(r["chunk_text"] for r in rows)
        assert rebuilt == " ".join(words)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(
    st.one_of(st.none(), st.text(alphabet="ab x", max_size=8)),
    min_size=1, max_size=6))
@pytest.mark.slow
def test_snapshot_diff_identity_property(spark, texts):
    """diff(x, x) is empty without include_unchanged and all-unchanged
    with it — regardless of NULLs and duplicated contents."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.snapshot_diff(df, df).count() == 0
    full = dedup.snapshot_diff(df, df, include_unchanged=True).collect()
    assert len(full) == len(rows)
    assert all(r["status"] == "unchanged" for r in full)


# ---------------------------------------------------------------------------
# hash_embeddings (feature hashing)
# ---------------------------------------------------------------------------

def test_hash_embeddings_duckdb_parity(spark, sf_dir):
    DIM = 16
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted((r["doc_id"], tuple(r["embedding"]))
                 for r in text.hash_embeddings(docs, dim=DIM).collect())
    want = _duck(sf_dir).execute(f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK_RE}')) AS t
  FROM documents),
b AS (SELECT doc_id,
        ('0x' || substr(md5(t), 1, 8))::BIGINT % {DIM} AS b
      FROM tok),
c AS (SELECT doc_id, b, count(*)::DOUBLE AS c FROM b GROUP BY 1, 2),
m AS (SELECT doc_id, map_from_entries(list(struct_pack(k := b, v := c)))
        AS m FROM c GROUP BY doc_id),
v AS (SELECT d.doc_id,
        list_transform(range(0, {DIM}),
                       i -> coalesce(m.m[i][1], 0.0::DOUBLE)) AS raw
      FROM (SELECT doc_id FROM documents) d LEFT JOIN m USING (doc_id)),
n AS (SELECT doc_id,
        CASE WHEN raw IS NULL THEN list_transform(range(0,{DIM}), i -> 0.0::DOUBLE)
             ELSE raw END AS raw FROM v),
f AS (SELECT doc_id, raw,
        sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm FROM n)
SELECT doc_id,
  CASE WHEN nrm > 0 THEN list_transform(raw, x -> round(x / nrm, 6))
       ELSE raw END AS embedding
FROM f ORDER BY doc_id""").fetchall()
    assert len(got) == len(want) > 0
    for (gid, gv), (wid, wv) in zip(got, want):
        assert gid == wid and gv == tuple(wv)


def test_hash_embeddings_semantics(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, ""), (2, None), (3, "a b a")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["embedding"]
           for r in text.hash_embeddings(df, dim=8).collect()}
    assert len(out) == 4                       # total over input
    assert out[1] == [0.0] * 8 and out[2] == [0.0] * 8
    assert out[0] == out[3]                    # content-determined
    import math
    assert math.isclose(sum(x * x for x in out[0]), 1.0, rel_tol=1e-4)
    raw = {r["doc_id"]: r["embedding"] for r in
           text.hash_embeddings(df, dim=8, normalize=False).collect()}
    assert sum(raw[0]) == 3.0                  # token mass preserved
    with pytest.raises(ValueError):
        text.hash_embeddings(df, dim=0)


def test_hash_embeddings_feed_the_vector_stack(spark, sf_dir):
    """The bridge works end-to-end: text → hashed vectors → exact cosine
    top-1 self-match."""
    from anomalyzer_spark.functions import similarity
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    emb = text.hash_embeddings(docs, dim=32).withColumnRenamed(
        "doc_id", "vec_id")
    out = similarity.cosine_topk(
        emb, emb.where(F.col("vec_id") < 3), id_col="vec_id",
        vec_col="embedding", query_id_col="vec_id", k=1)
    top = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert all(q == n for q, n in top.items())


# ---------------------------------------------------------------------------
# corpus_card
# ---------------------------------------------------------------------------

def test_corpus_card_duckdb_parity(spark, sf_dir):
    """One-row datasheet replayed in DuckDB: volumes, exact-dup rate via
    the normalized content hash, dominant language via the trusted lang
    column, decimal-exact avg quality, exact percentiles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = text.corpus_card(docs, lang_col="lang").collect()
    assert len(got) == 1
    g = got[0].asDict()

    w = _duck(sf_dir).execute("""
WITH stats AS (
  SELECT doc_id, lang, length(text) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
    greatest(least(
      0.4 * least(length(text) / 500.0, 1.0)
      + 0.4 * coalesce(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
              / nullif(length(text), 0)::DOUBLE, 0.0)
      + 0.2 * (1.0 - least(coalesce(
          len(regexp_extract_all(text, '[.,;:!?]'))
          / nullif(length(text), 0)::DOUBLE, 0.0) * 5.0, 1.0)),
      1.0), 0.0) AS q
  FROM documents),
hashed AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')))
             AS h FROM documents),
dupr AS (
  SELECT round(avg((doc_id <> mn)::INT::DOUBLE), 6) AS dup_rate FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS mn FROM hashed)),
top AS (SELECT lang, count(*) AS n FROM stats GROUP BY lang
        ORDER BY n DESC, lang ASC LIMIT 1)
SELECT count(*) AS n_docs, sum(n_tokens) AS n_tokens,
  sum(n_chars) AS n_chars,
  (SELECT dup_rate FROM dupr) AS dup_rate,
  (SELECT lang FROM top) AS top_lang,
  round((SELECT n FROM top) / count(*)::DOUBLE, 6) AS top_lang_share,
  round(sum(round(q, 6)::DECIMAL(10,6))::DOUBLE / count(*), 6)
    AS avg_quality,
  quantile_cont(n_chars, 0.5) AS p50_chars,
  quantile_cont(n_chars, 0.9) AS p90_chars
FROM stats""").fetchall()[0]
    keys = ["n_docs", "n_tokens", "n_chars", "dup_rate", "top_lang",
            "top_lang_share", "avg_quality", "p50_chars", "p90_chars"]
    for k, v in zip(keys, w):
        assert g[k] == v, (k, g[k], v)


def test_corpus_card_predicted_lang_and_shapes(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog was here for it"),
         (1, "el perro y el gato de la casa por la"),
         (2, "the fox and the hen of the farm it was"),
         (3, "the fox and the hen of the farm it was")],  # exact dup
        "doc_id long, text string")
    g = text.corpus_card(df).collect()[0]
    assert g["n_docs"] == 4 and g["top_lang"] == "en"
    assert g["top_lang_share"] == 0.75
    assert g["dup_rate"] == 0.25


# ---------------------------------------------------------------------------
# strip_repeated_paragraphs (within-doc)
# ---------------------------------------------------------------------------

def test_strip_repeated_paragraphs_duckdb_parity(spark, sf_dir):
    """Planted intra-doc repetition (every doc's first sentence appended
    twice at the end) replayed in DuckDB: first occurrence kept in
    place, appended repeats dropped, byte-identical rebuilds."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(". "),
                 F.split(F.col("text"), r"\. ")[0], F.lit(". "),
                 F.split(F.col("text"), r"\. ")[0]).alias("text"))
    got = sorted(
        (r["doc_id"], r["text"], r["n_paragraphs"], r["n_repeats_dropped"])
        for r in dedup.strip_repeated_paragraphs(
            docs, sep=". ").collect())
    want = _duck(sf_dir).execute(r"""
WITH d AS (SELECT doc_id,
             text || '. ' || regexp_split_to_array(text, '\. ')[1]
                  || '. ' || regexp_split_to_array(text, '\. ')[1] AS text
           FROM documents),
ex AS (
  SELECT doc_id, u.pos, u.para,
         CASE WHEN u.para <> '' THEN md5(u.para) END AS h
  FROM (SELECT doc_id, string_split(text, '. ') AS ps FROM d),
       unnest(list_transform(range(1, len(ps) + 1),
              i -> struct_pack(pos := i, para := ps[i]))) AS t(u)),
m AS (SELECT *, CASE WHEN h IS NOT NULL THEN
        row_number() OVER (PARTITION BY doc_id, h ORDER BY pos) END AS occ
      FROM ex)
SELECT doc_id,
  coalesce(array_to_string(list_transform(
    list_sort(list(struct_pack(pos := pos, para := para))
              FILTER (WHERE h IS NULL OR occ = 1)),
    s -> s.para), '. '), '') AS text,
  count(*) FILTER (WHERE h IS NOT NULL) AS n_paragraphs,
  count(*) FILTER (WHERE occ > 1) AS n_repeats_dropped
FROM m GROUP BY doc_id ORDER BY doc_id""").fetchall()
    assert len(got) == len(want) > 0
    assert got == [tuple(w) for w in want]
    assert all(g[3] >= 2 for g in got)   # the plant dropped both repeats


def test_strip_repeated_paragraphs_semantics(spark):
    df = spark.createDataFrame(
        [(0, "a\nb\na\nc\na"), (1, "x\ny"), (2, ""), (3, None),
         (4, "p\n\np")],   # empty span between repeats stays
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.strip_repeated_paragraphs(df).collect()}
    assert out[0]["text"] == "a\nb\nc"
    assert out[0]["n_repeats_dropped"] == 2
    assert out[1]["text"] == "x\ny" and out[1]["n_repeats_dropped"] == 0
    assert out[2]["text"] == "" and out[2]["n_paragraphs"] == 0
    assert out[3]["text"] == "" and out[3]["n_paragraphs"] == 0
    assert out[4]["text"] == "p\n" and out[4]["n_repeats_dropped"] == 1
