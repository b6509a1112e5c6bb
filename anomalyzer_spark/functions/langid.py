"""Trainable language identification — hashed character-n-gram softmax.

The heuristic ``text.lang_id`` (marker-word counts) stays as the zero-setup
fallback; this is the model-based upgrade for short / mixed-script
documents, built on the repo's train/score split (quality.py pattern):

* **featurize**: character 2-grams of the first ``max_chars`` chars of the
  whitespace-collapsed lowercased text, feature-hashed into ``n_buckets``
  relative-frequency buckets. The hash is md5-derived (first 8 hex digits
  mod buckets) — engine-portable, so DuckDB reproduces every feature
  exactly (``lang_scoring_sql``). The gram→bucket array is STAGED in its
  own projection and the per-bucket counts bind it as a plain attribute —
  interpreted higher-order lambdas re-evaluate closed-over subtrees per
  element (the text.py staged-projection lesson), so an unstaged version
  would re-hash every gram ``n_buckets`` times.
* **train**: bounded deterministic hash-ordered sample per language,
  full-batch softmax regression in NumPy — fixed iterations, zero init,
  no RNG: same corpus + seed ⇒ same model on any cluster. Driver memory
  holds ``sample_rows`` × ``n_buckets`` doubles per language, never text.
* **score**: the learned weights compile to PURE column arithmetic over
  the staged features — map-only, zero shuffles, whole-stage codegen for
  everything but the bucket fold itself.

At 100 TB: scoring is a projection riding any scan (compose into
``text_profile`` via its ``extra=`` hook if desired); training cost is
bounded by ``sample_rows`` per language regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: feature-spec defaults — part of the model dict, so a model trained with
#: one spec refuses to score with another
N_BUCKETS = 32
MAX_CHARS = 128

#: script-range fraction features (name, char-class body in BOTH Java and
#: RE2 syntax): hashed grams discriminate WITHIN a script, but an unseen
#: script's grams hash to arbitrary buckets — pure-noise features — so a
#: CJK document with no training-vocabulary overlap scores randomly
#: without these. Fractions of codepoints per major script generalize to
#: unseen text by construction.
SCRIPTS: tuple[tuple[str, str, str], ...] = (
    ("latin", "a-z", "a-z"),
    ("latin_ext", "À-ɏ", "\\x{00C0}-\\x{024F}"),
    ("cjk", "一-鿿", "\\x{4E00}-\\x{9FFF}"),
    ("kana", "぀-ヿ", "\\x{3040}-\\x{30FF}"),
    ("hangul", "가-힯", "\\x{AC00}-\\x{D7AF}"),
    ("cyrillic", "Ѐ-ӿ", "\\x{0400}-\\x{04FF}"),
    ("arabic", "؀-ۿ", "\\x{0600}-\\x{06FF}"),
    ("greek", "Ͱ-Ͽ", "\\x{0370}-\\x{03FF}"),
)


def _bucket_array(text_col: str, *, n_buckets: int, max_chars: int) -> Column:
    """array<bigint> of hashed-2-gram bucket ids (empty for len < 2).

    Grams are taken over the LATIN STREAM only (non-latin runs collapse to
    one space): hashed grams discriminate among latin-script languages,
    while a script the training set never covered would otherwise hash its
    grams into arbitrary buckets — pure noise that a linear model cannot
    gate on the script features (observed: held-out zh scored es at 0.999
    through chance bucket/weight alignment). Stripping makes every
    non-latin document — trained OR unseen — share the same empty-gram
    signature, so the script fractions decide and gram noise cannot
    outvote them."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   "[^a-zß-ɏ0-9]+", " "))
    t = F.substring(norm, 1, max_chars)
    n = F.length(t)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda k: F.pmod(
            F.conv(F.substring(
                F.md5(t.substr(k, F.lit(2)).cast("binary")), 1, 8),
                16, 10).cast("long"),
            F.lit(n_buckets)))


def _feature_cols(n_buckets: int) -> list[Column]:
    """Relative-frequency features over a staged ``_b`` bucket array."""
    denom = F.greatest(F.size(F.col("_b")), F.lit(1)).cast("double")

    def _eq(d: int):
        # a closure, NOT a `lambda x, d=d:` default-arg — a two-parameter
        # lambda makes F.filter bind its (element, index) form and the
        # index silently overrides the default (every count came out 0)
        return lambda x: x == F.lit(d)

    return [
        (F.size(F.filter(F.col("_b"), _eq(d))) / denom).alias(f"f{d}")
        for d in range(n_buckets)
    ]


def _script_cols(text_col: str, max_chars: int) -> list[Column]:
    """Per-script codepoint fractions over the truncated lowered text."""
    t = F.substring(F.lower(F.col(text_col)), 1, max_chars)
    denom = F.greatest(F.length(t), F.lit(1)).cast("double")
    return [
        (F.regexp_count(t, F.lit(f"[{java}]")) / denom).alias(f"s{i}")
        for i, (_, java, _re2) in enumerate(SCRIPTS)
    ]


def _feature_names(n_buckets: int) -> list[str]:
    return [f"s{i}" for i in range(len(SCRIPTS))] \
        + [f"f{d}" for d in range(n_buckets)]


def _featurize(df: DataFrame, text_col: str, keep: list[str], *,
               n_buckets: int, max_chars: int) -> DataFrame:
    staged = df.select(
        *keep,
        *_script_cols(text_col, max_chars),
        _bucket_array(text_col, n_buckets=n_buckets,
                      max_chars=max_chars).alias("_b"))
    return staged.select(*keep,
                         *[f"s{i}" for i in range(len(SCRIPTS))],
                         *_feature_cols(n_buckets))


def train_lang_model(
    labeled: dict[str, DataFrame],
    text_col: str = "text",
    *,
    sample_rows: int = 2_000,
    n_buckets: int = N_BUCKETS,
    max_chars: int = MAX_CHARS,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
    seed: int = 42,
) -> dict:
    """Fit the classifier from {language: DataFrame of example texts}.
    Returns {langs, n_buckets, max_chars, mean, std, weights, bias} for
    ``score_lang`` / ``lang_scoring_sql``."""
    if len(labeled) < 2:
        raise ValueError("need at least two language classes")
    langs = sorted(labeled)
    mats = []
    for lang in langs:
        df = labeled[lang]
        # hash-ordered bounded sample, keyed on the text itself (labeled
        # example sets need no id column); md5 tiebreak keeps the order
        # total under hash collisions
        h = F.md5(F.concat_ws("|", F.lit(str(seed)),
                              F.col(text_col)).cast("binary"))
        feats = (
            _featurize(df.select(F.col(text_col), h.alias("_h")),
                       text_col, ["_h"],
                       n_buckets=n_buckets, max_chars=max_chars)
            .orderBy("_h").limit(sample_rows)
            .select(*_feature_names(n_buckets)).collect()
        )
        if not feats:
            raise ValueError(f"language {lang!r} sampled zero rows")
        mats.append(np.array([list(r) for r in feats], dtype=np.float64))

    x = np.vstack(mats)
    y = np.concatenate([np.full(len(m), i) for i, m in enumerate(mats)])
    # CONSTANT feature scaling, not data-driven standardization: dividing
    # by per-bucket stds amplifies exactly the out-of-distribution buckets
    # — an unseen-script document's grams hash to buckets the training
    # data barely touched (std ~ 0.005), turning hash noise into +-20 z
    # terms that drowned the script features (observed: held-out zh -> es).
    # Gram features become DEVIATION FROM UNIFORM — (freq - 1/nb) / (1/nb)
    # — so a document whose grams spread ~uniformly over the buckets (the
    # unseen-script signature) contributes ~zero through the gram weights
    # and the script fractions decide; script fractions are already O(1).
    mean = np.concatenate([np.zeros(len(SCRIPTS)),
                           np.full(n_buckets, 1.0 / n_buckets)])
    std = np.concatenate([np.ones(len(SCRIPTS)),
                          np.full(n_buckets, 1.0 / n_buckets)])
    xs = (x - mean) / std
    n, d, c = len(y), x.shape[1], len(langs)
    w = np.zeros((c, d))
    b = np.zeros(c)
    onehot = np.eye(c)[y.astype(int)]
    for _ in range(iters):
        z = xs @ w.T + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot).T @ xs / n + l2 * w
        gb = (p - onehot).mean(axis=0)
        w -= lr * g
        b -= lr * gb
    return {
        "langs": langs,
        "scripts": [name for name, _j, _r in SCRIPTS],
        "n_buckets": n_buckets,
        "max_chars": max_chars,
        "mean": mean.tolist(),
        "std": std.tolist(),
        "weights": w.tolist(),
        "bias": b.tolist(),
    }


def _check_spec(model: dict) -> None:
    if model.get("scripts") != [name for name, _j, _r in SCRIPTS]:
        raise ValueError(
            f"model script features {model.get('scripts')} do not match "
            f"this version's {[n for n, _j, _r in SCRIPTS]}")


def score_lang(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    out_col: str = "lang_pred_model",
) -> DataFrame:
    """(id, lang_pred_model, prob_<lang>...) — softmax of the learned
    weights over the hashed-gram features, as column arithmetic. Argmax
    tie-break: first language in sorted order (matches the heuristic's
    convention). Documents with no 2-grams get the bias-only prior.

    Filtering downstream: materialize-then-filter (or filter on a
    probability column compared to a literal) rather than
    ``.where(F.col(out_col) == ...)`` alone — consuming ONLY the argmax
    column lets CollapseProject re-merge the staged softmax projections
    into one ~10k-node expression that Catalyst optimizes for minutes
    (the staging exists exactly to prevent that; see the comment below)."""
    _check_spec(model)
    langs = model["langs"]
    nb, mc = model["n_buckets"], model["max_chars"]
    n_s = len(SCRIPTS)
    # Algebraic reformulation of the trained linear form, built for
    # whole-stage codegen (the literal _featurize shape — a bucket-array
    # HOF plus n_buckets interpreted filter scans — measured 242 docs/s
    # FLAT at every scale, ~4.3 ms/doc of interpreted per-element
    # evaluation):
    #
    #   z_c = const_c + Σ_scripts (w/s)·s_i
    #         + (Σ_grams w'_c[bucket(g)]) / max(n_grams, 1)
    #   const_c = bias_c − Σ_j (w_cj/s_j)·m_j ,  w'_cd = w_c,(S+d)/s_(S+d)
    #
    # so scoring explodes the gram INDEX (a generator — codegen), hashes
    # each gram natively (md5/conv/pmod — codegen), looks the bucket up
    # in a literal per-class weight array, and partial-aggregates one row
    # per document map-side: ONE exchange carrying n_docs rows, no HOF
    # anywhere, no join (script fractions ride the explode and come back
    # through first()). Training still collects the literal features —
    # bounded sample, identical math.
    W, B = model["weights"], model["bias"]
    M, S_ = model["mean"], model["std"]
    const = [
        float(B[ci]) - sum(float(W[ci][j]) / float(S_[j]) * float(M[j])
                           for j in range(n_s + nb))
        for ci in range(len(langs))]
    warr = [F.array(*[F.lit(float(W[ci][n_s + d]) / float(S_[n_s + d]))
                      for d in range(nb)])
            for ci in range(len(langs))]

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   "[^a-zß-ɏ0-9]+", " "))
    t = F.substring(norm, 1, mc)
    # `_t` (and the script regexps) must be STAGED BELOW the generator:
    # projecting them in the same select as the explode re-evaluates the
    # whole regexp tree once per OUTPUT row — measured 21.3s vs 0.35s at
    # 5k docs for an identical result (the generate-side cousin of the
    # text.py staged-projection lesson)
    staged = df.select(F.col(id_col), *_script_cols(text_col, mc),
                       t.alias("_t"))
    n = F.length(F.col("_t"))
    base = staged.select(
        F.col(id_col),
        *[F.col(f"s{i}") for i in range(n_s)],
        F.col("_t"),
        # explode_outer keeps gram-less documents (bias + scripts only)
        F.explode_outer(
            F.when(n >= 2, F.sequence(F.lit(1), n - 1))).alias("_k"))
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.col("_t").substr(F.col("_k"), F.lit(2))
                  .cast("binary")), 1, 8), 16, 10).cast("long"),
        F.lit(nb)).cast("int")
    # explicit null guard: element_at(literal_array, NULL index) came back
    # as the LAST array element here, not NULL (observed on the
    # explode_outer placeholder row — a gram-less document scored the
    # whole bucket-31 weight), so the placeholder must be gated by hand
    exploded = base.select(
        F.col(id_col),
        *[F.col(f"s{i}") for i in range(n_s)],
        F.col("_k"),
        *[F.when(F.col("_k").isNotNull(),
                 F.element_at(w, bucket + 1)).alias(f"_gw{ci}")
          for ci, w in enumerate(warr)])
    agg = exploded.groupBy(id_col).agg(
        *[F.first(f"s{i}").alias(f"s{i}") for i in range(n_s)],
        F.count("_k").alias("_ng"),
        *[F.sum(f"_gw{ci}").alias(f"_gs{ci}")
          for ci in range(len(langs))])
    denom = F.greatest(F.col("_ng"), F.lit(1)).cast("double")
    zdf = agg.select(
        F.col(id_col),
        *[(F.lit(const[ci])
           + sum((F.lit(float(W[ci][i]) / float(S_[i])) * F.col(f"s{i}")
                  for i in range(1, n_s)),
                 F.lit(float(W[ci][0]) / float(S_[0])) * F.col("s0"))
           + F.coalesce(F.col(f"_gs{ci}"), F.lit(0.0)) / denom)
          .alias(f"_z{ci}")
          for ci in range(len(langs))])
    # STAGED selects from here down, one per softmax layer: inlining probs
    # over the raw z expressions duplicates every z ~12x through zmax/tot
    # — a >10k-node tree Catalyst spends tens of seconds optimizing
    # (measured 20-56s per query). Each stage binds the previous stage's
    # aliases as plain attributes; the aliased trees are non-trivial, so
    # CollapseProject leaves the stages alone.
    z_attrs = [F.col(f"_z{ci}") for ci in range(len(langs))]
    zmax = F.greatest(*z_attrs) if len(langs) > 1 else z_attrs[0]
    edf = zdf.select(
        F.col(id_col),
        *[F.exp(z - zmax).alias(f"_e{ci}") for ci, z in enumerate(z_attrs)])
    e_attrs = [F.col(f"_e{ci}") for ci in range(len(langs))]
    tot = sum(e_attrs[1:], e_attrs[0])
    pairs = F.array(*[
        F.struct((e / tot).alias("p"), F.lit(lang).alias("l"))
        for lang, e in zip(langs, e_attrs)])
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1.0).alias("p"), F.lit("").alias("l")),
        lambda acc, x: F.when(x["p"] > acc["p"], x).otherwise(acc),
    )
    return edf.select(
        F.col(id_col),
        best["l"].alias(out_col),
        *[F.round(e / tot, 6).alias(f"prob_{lang}")
          for lang, e in zip(langs, e_attrs)],
    )


def lang_scoring_sql(model: dict, table: str = "documents",
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    """ANSI/DuckDB SQL reproducing ``score_lang`` — the oracle for the
    scoring path (same md5 bucket hash, same softmax, same sorted-first
    tie-break). Equality contract: probabilities agree to the rounded 6
    decimals; the two sides associate the z-sum differently (Spark scores
    via the partial-aggregated gram-sum reformulation, whose order is
    additionally partition-dependent), so agreement is to float tolerance
    ~1e-12 relative, not bitwise — a document whose probability lands
    EXACTLY on a rounding boundary, or whose top-two z tie within ulps,
    could in principle differ. The same caveat applies to every
    float-aggregating oracle in the repo; _round6 absorbs it in
    practice."""
    _check_spec(model)
    nb, mc = model["n_buckets"], model["max_chars"]
    langs = model["langs"]
    names = _feature_names(nb)
    zs = []
    for ci in range(len(langs)):
        terms = [repr(float(model["bias"][ci]))]
        for j, name in enumerate(names):
            w = float(model["weights"][ci][j])
            m, s = float(model["mean"][j]), float(model["std"][j])
            terms.append(f"({w!r}) * (({name} - ({m!r})) / ({s!r}))")
        zs.append(" + ".join(terms))
    z_cols = ",\n    ".join(f"({z}) AS z{ci}" for ci, z in enumerate(zs))
    zmax = f"greatest({', '.join(f'z{ci}' for ci in range(len(langs)))})"
    exp_cols = ",\n    ".join(
        f"exp(z{ci} - zm) AS e{ci}" for ci in range(len(langs)))
    tot = " + ".join(f"e{ci}" for ci in range(len(langs)))
    # argmax, sorted-first tie-break: strict > against running best
    pred = "CASE "
    for ci in range(len(langs) - 1):
        conds = [f"e{ci} >= e{cj}" if cj > ci else f"e{ci} > e{cj}"
                 for cj in range(len(langs)) if cj != ci]
        pred += f"WHEN {' AND '.join(conds)} THEN '{langs[ci]}' "
    pred += f"ELSE '{langs[-1]}' END"
    feat_cols = ",\n    ".join(
        f"len(list_filter(b, x -> x = {d}))::DOUBLE / nd AS f{d}"
        for d in range(nb))
    script_cols = ",\n    ".join(
        f"len(regexp_extract_all(t2, '[{re2}]'))::DOUBLE"
        f" / greatest(length(t2), 1) AS s{i}"
        for i, (_name, _java, re2) in enumerate(SCRIPTS))
    prob_cols = ",\n  ".join(
        f"round(e{ci} / ({tot}), 6) AS prob_{lang}"
        for ci, lang in enumerate(langs))
    return f"""
WITH nrm AS (
  SELECT {id_col},
         substr(trim(regexp_replace(lower({text_col}),
                '[^a-z\\x{{00DF}}-\\x{{024F}}0-9]+', ' ', 'g')),
                1, {mc}) AS t,
         substr(lower({text_col}), 1, {mc}) AS t2
  FROM {table}),
bk AS (
  SELECT {id_col}, t2,
    CASE WHEN length(t) >= 2 THEN
      list_transform(range(1, length(t)::INT),
        k -> ('0x' || substr(md5(substr(t, k::INT, 2)), 1, 8))::BIGINT
             % {nb})
    ELSE [] END AS b
  FROM nrm),
ft AS (
  SELECT {id_col},
    {script_cols},
    {feat_cols}
  FROM (SELECT {id_col}, t2, b,
               greatest(len(b), 1)::DOUBLE AS nd FROM bk)),
zz AS (
  SELECT {id_col},
    {z_cols}
  FROM ft),
ee AS (
  SELECT {id_col},
    {exp_cols}
  FROM (SELECT *, {zmax} AS zm FROM zz))
SELECT {id_col},
  {pred} AS lang_pred_model,
  {prob_cols}
FROM ee"""
