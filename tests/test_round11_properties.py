"""Property pins for the round-11 machinery, against plain-Python models.

* hamming_blocks pigeonhole: signatures within Hamming d ALWAYS share at
  least one of the d+1 blocks (the guarantee hamming_pairs' recall rests
  on) — checked in pure Python over the same block spec, then end-to-end
  on Spark against brute force.
* pack_token_ids conservation under hypothesis-generated corpora: every
  token appears exactly once across chunks, in document order, for
  arbitrary capacities including capacity 1 and oversize documents.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomalyzer_spark.functions import packing
from anomalyzer_spark.functions.dedup import hamming_pairs


def _blocks(sig: int, bits: int = 64, d: int = 3) -> set:
    width = bits // (d + 1)
    mask = (1 << width) - 1
    u = sig & ((1 << bits) - 1)
    return {(bid, (u >> (bid * width)) & mask) for bid in range(d + 1)}


@given(st.integers(0, 2**64 - 1),
       st.sets(st.integers(0, 63), min_size=0, max_size=3))
@settings(max_examples=300, deadline=None)
def test_pigeonhole_within_d_shares_a_block(sig, flip_bits):
    other = sig
    for b in flip_bits:
        other ^= 1 << b
    assert _blocks(sig) & _blocks(other), "pigeonhole violated"


def test_hamming_pairs_equals_bruteforce_random(spark):
    rng = np.random.default_rng(17)
    # signed-long signatures spanning the full 64-bit space incl. bit 63
    sigs = [(i, int(np.int64(rng.integers(0, 2**63) * rng.choice([1, -1]))))
            for i in range(40)]
    # plant close pairs
    for src, dst, flips in ((0, 100, 1), (1, 101, 3), (2, 102, 4)):
        s = sigs[src][1]
        for b in rng.choice(64, size=flips, replace=False):
            s ^= 1 << int(b)
            s = s - (1 << 64) if s >= 1 << 63 else s
        sigs.append((dst, s))
    want = set()
    for i, (ia, sa) in enumerate(sigs):
        for ib, sb in sigs[i + 1:]:
            h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want.add((min(ia, ib), max(ia, ib), h))
    assert want, "fixture must plant in-range pairs"
    df = spark.createDataFrame(sigs, "doc_id long, sig long")
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in hamming_pairs(df, "sig", "doc_id", bits=64,
                                  max_hamming=3).collect()}
    assert got == want


@given(st.lists(st.lists(st.integers(0, 999), min_size=1, max_size=30),
                min_size=1, max_size=15),
       st.sampled_from([1, 3, 8, 64]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_pack_token_ids_conserves_every_token(spark, docs, capacity):
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<bigint>")
    packed = packing.pack_token_ids(df, capacity, n_shards=2).collect()
    got: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["chunk_id"])):
        assert len(r["input_ids"]) <= capacity
        pos = 0
        for s in r["doc_spans"]:
            assert s["start"] == pos
            pos = s["end"]
            got.setdefault(s["doc_id"], []).extend(
                r["input_ids"][s["start"]:s["end"]])
        assert pos == len(r["input_ids"])
    for i, toks in rows:
        assert got.get(i, []) == toks, f"doc {i} not conserved"
