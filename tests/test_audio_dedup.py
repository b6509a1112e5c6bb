"""Audio fingerprint + matching: the audio cell of the dedup matrix.

Synthetic 16-bit PCM WAVs (sine mixtures) pin the published robustness
properties of the Haitsma/Kalker construction: exact-copy identity,
volume-scaling invariance (band-energy DIFFERENCES keep their sign under
uniform gain), whole-hop time-shift alignment, discrimination between
unrelated clips, per-row error capture, and the no-cartesian join shape.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import multimodal


def _wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def _clip(seed: int, seconds: float = 2.0, rate: int = 8000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate)) / rate
    x = np.zeros_like(t)
    for _ in range(6):
        f = rng.uniform(300, 2800)
        x += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t
                                            + rng.uniform(0, 2 * np.pi))
    # broadband floor: pure sine mixtures leave most log bands holding
    # only FFT leakage, whose difference signs are numerical noise — real
    # audio is broadband, and the fingerprint's robustness contract
    # assumes bands carry genuine energy
    x += 0.1 * rng.standard_normal(len(t))
    return x / np.abs(x).max() * 0.8


def _df(spark, clips: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in clips.items()],
        "doc_id long, content binary")


def _fps(spark, clips):
    return {r["doc_id"]: r for r in
            multimodal.audio_fingerprint(_df(spark, clips)).collect()}


def test_identity_and_volume_robustness(spark):
    x = _clip(1)
    out = _fps(spark, {1: _wav(x), 2: _wav(x), 3: _wav(x * 0.25)})
    assert out[1]["err"] is None
    assert out[1]["subfps"] == out[2]["subfps"]
    # uniform gain scales energies by c^2 so difference signs survive —
    # up to 16-bit PCM re-quantization noise flipping near-zero
    # differences: high overlap, not bit equality
    a, b = set(out[1]["subfps"]), set(out[3]["subfps"])
    assert len(a & b) / min(len(a), len(b)) > 0.8
    assert out[1]["n_frames"] == len(out[1]["subfps"]) > 10


def test_hop_shift_alignment_and_discrimination(spark):
    x = _clip(2, seconds=3.0)
    hop = 1024
    out = _fps(spark, {1: _wav(x), 2: _wav(x[2 * hop:]), 3: _wav(_clip(9, 3.0))})
    a, b = set(out[1]["subfps"]), set(out[2]["subfps"])
    shifted_overlap = len(a & b) / min(len(a), len(b))
    c = set(out[3]["subfps"])
    unrelated_overlap = len(a & c) / min(len(a), len(c))
    # a 2-hop shift realigns frames exactly; an unrelated clip shares
    # only chance collisions in the 2^24 subfingerprint space
    assert shifted_overlap > 0.9, shifted_overlap
    assert unrelated_overlap < 0.2, unrelated_overlap


def test_matches_find_planted_dups(spark):
    clips = {i: _wav(_clip(i)) for i in range(5)}
    clips[100] = _wav(_clip(0) * 0.5)          # volume-scaled copy of 0
    clips[999] = b"RIFF junk not a wav"        # corrupt: skipped, not fatal
    pairs = {(r["id_a"], r["id_b"]): r for r in
             multimodal.audio_matches(_df(spark, clips),
                                      min_shared=5).collect()}
    assert (0, 100) in pairs
    assert pairs[(0, 100)]["overlap"] > 0.9
    assert not any(999 in p for p in pairs)


def test_too_short_clip_errs(spark):
    out = _fps(spark, {1: _wav(np.zeros(100))})
    assert out[1]["subfps"] is None and "short" in out[1]["err"]


def test_no_cartesian_and_validation(spark):
    df = _df(spark, {1: _wav(_clip(1))})
    plan = multimodal.audio_matches(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError, match="min_shared"):
        multimodal.audio_matches(df, min_shared=0)
    with pytest.raises(ValueError, match="hop"):
        multimodal.audio_fingerprint(df, frame=512, hop=1024).collect()


def test_wav_payload_col_decodes_to_md5_spec_samples(spark):
    """wav_payload_col (the oracle-reproducible synthetic clip) must
    round-trip through the REAL RIFF/WAVE decode into exactly the
    little-endian int16 samples the SQL oracle rebuilds, and fingerprint
    deterministically at the rider sizing (128 samples, frame=64, hop=32,
    n_bands=5 -> two subfingerprints)."""
    import hashlib

    from pyspark.sql import functions as F
    df = spark.createDataFrame([(3, "abc")], "doc_id long, text string")
    wav = df.select("doc_id",
                    multimodal.wav_payload_col(F.col("text")).alias("content"))
    raw = bytes(wav.collect()[0]["content"])
    x, rate = multimodal._wav_decode(raw)
    assert rate == 8000 and x.shape == (128, 1)
    h = b"".join(hashlib.md5(f"abca{j}".encode()).digest() for j in range(16))
    want = np.frombuffer(h[:256], "<i2").astype(np.float64) / 32768.0
    assert np.array_equal(x[:, 0], want)
    r1 = multimodal.audio_fingerprint(
        wav, frame=64, hop=32, n_bands=5).collect()[0]
    r2 = multimodal.audio_fingerprint(
        wav, frame=64, hop=32, n_bands=5).collect()[0]
    assert r1["err"] is None and len(r1["subfps"]) == 2
    assert r1["subfps"] == r2["subfps"]
