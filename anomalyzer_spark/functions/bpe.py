"""Byte-pair-encoding tokenizer — train on a bounded sample, apply map-only.

Real token counts (not the whitespace/regex proxies in ``text.py``) need a
learned subword vocabulary. The scale pattern here is the one the ANN
stack already uses for IVF/PQ model fits: the MODEL trains on a bounded,
deterministic sample (tokenizer training needs a representative corpus
slice, not the corpus — this is how production tokenizers are trained
too), and the APPLY side is a literals-compiled map-only pass over
the full 100 TB with no shuffle.

Algorithm: classic word-level BPE (Sennrich et al. 2016, public spec) —
words from the ``text.word_tokens`` lexer, each word a char sequence with
an end-of-word marker; repeatedly merge the most frequent adjacent symbol
pair. Deterministic: ties break lexicographically, the sample is
hash-ordered, so the same corpus + seed gives the same merge table on any
cluster.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

from .sampling import _hash48
from .text import word_tokens

#: end-of-word marker (appended to each word's final symbol so merges
#: can't cross word boundaries and word-final units stay distinct)
EOW = "</w>"


def _word_freqs(texts: list[str]) -> Counter:
    import re

    lex = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    freqs: Counter = Counter()
    for t in texts:
        if t:
            freqs.update(lex.findall(t.lower()))
    return freqs


def train_bpe(
    df: DataFrame,
    n_merges: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sample_rows: int = 10_000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a deterministic ``sample_rows``
    hash-ordered sample of the corpus. Returns the ordered merge table
    (the model — pass it to ``bpe_encode``). Driver memory holds the
    SAMPLE's word-frequency table, never the corpus."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if sample_rows < 1:
        raise ValueError("sample_rows must be >= 1")
    sample = (
        df.select(F.col(text_col), _hash48(F.col(id_col), seed).alias("_o"))
        .orderBy("_o", text_col).limit(sample_rows).collect()
    )
    freqs = _word_freqs([r[text_col] for r in sample])
    words = {w: tuple(w[:-1]) + (w[-1] + EOW,) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max by (count, lexicographic) — deterministic tie-break
        best = max(pairs, key=lambda p: (pairs[p], p[0], p[1]))
        merges.append(best)
        a, b = best
        merged = a + b
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


_ENCODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("tokens", ArrayType(StringType())),
    StructField("n_tokens", LongType()),
])


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a trained merge table: (id, tokens, n_tokens), one
    Arrow ``mapInPandas`` pass, zero shuffle. Merge application follows
    the standard lowest-rank-first rule, with a per-batch word cache
    (corpus word frequency is Zipfian — most words hit the cache)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        lex = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in lex.findall(txt.lower()) if txt else []:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                rows.append((int(did), toks, len(toks)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _ENCODE_SCHEMA])

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, _ENCODE_SCHEMA)


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The merge table's produced units, in creation order (base chars are
    data-dependent and implicit; this is the LEARNED part of the vocab)."""
    return [a + b for a, b in merges]


def bpe_ids(
    enc: DataFrame,
    vocab: list[str],
    tokens_col: str = "tokens",
    *,
    out_col: str = "token_ids",
    oov_id: int = -1,
) -> DataFrame:
    """Map ``bpe_encode`` string tokens to integer ids: id = position in
    ``vocab`` (0-based), unknown tokens → ``oov_id``. The vocab rides the
    plan as a literal map (bounded — a tokenizer vocab is 10k-100k
    entries, model-config-sized, not data-sized), so the lookup is a pure
    map-only expression with no join. Compose with
    ``packing.pack_token_ids`` for training-ready fixed-length sequences."""
    if len(set(vocab)) != len(vocab):
        raise ValueError("vocab entries must be unique")
    m = F.map_from_arrays(
        F.array(*[F.lit(t) for t in vocab]),
        F.array(*[F.lit(i) for i in range(len(vocab))]))
    return enc.withColumn(
        out_col,
        F.transform(F.col(tokens_col),
                    lambda t: F.coalesce(F.element_at(m, t),
                                         F.lit(oov_id))))
