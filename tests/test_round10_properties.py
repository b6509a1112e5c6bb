"""Generative property pins for the round-10 batch paths: the
store-driven span dedup (duplicate_spans_from_gram_stats) and the
per-source token budget (cap_stratum_tokens), each checked against an
independent plain-Python formulation on random inputs. Spark runs per
example, so example counts stay small — shrinking still gives minimal
counterexamples when a contract breaks."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomalyzer_spark.functions import dedup, sampling

# small vocabulary forces cross-doc duplicated grams often
_WORDS = ["alpha", "beta", "gamma", "delta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
    min_size=2, max_size=8)


@given(docs_strategy)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_gram_stats_path_equals_window_path_random(spark, word_docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = __import__(
        "anomalyzer_spark.streaming.span_stream",
        fromlist=["span_gram_stream"]).span_gram_stream(
            df, "text", "doc_id", min_len=3)
    got = sorted(map(tuple, dedup.duplicate_spans_from_gram_stats(
        df, stats, min_len=3).collect()))
    want = sorted(map(tuple, dedup.duplicate_spans(
        df, min_len=3).collect()))
    assert got == want


def _hash48_py(doc_id: int, seed: int = 42) -> int:
    return int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:12], 16)


weights_strategy = st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]),
              st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=25)


@given(weights_strategy, st.integers(min_value=0, max_value=120))
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_cap_stratum_tokens_equals_python_reference(spark, rows, budget):
    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, src string, w long")
    got = sorted(r["doc_id"] for r in sampling.cap_stratum_tokens(
        df, budget, "src", "w").collect())
    # independent reference: greedy prefix in (md5-hash, id) order
    want = []
    by_src: dict = {}
    for i, s, w in data:
        by_src.setdefault(s, []).append((_hash48_py(i), i, w))
    for s, members in by_src.items():
        run = 0
        for _, i, w in sorted(members):
            run += w
            if run <= budget:
                want.append(i)
            else:
                break
    assert got == sorted(want)
