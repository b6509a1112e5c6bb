"""Perceptual image dedup: dHash signatures + Hamming-banded pairs.

The image cell of the dedup matrix (SURVEY §2): library-free PGM/BMP
decode (multimodal.decode_image_raw) → 9x8 grayscale → 64-bit dHash as a
pure column expression → the same banded self-join text SimHash uses
(dedup.hamming_pairs). Parity here is against an independent NumPy
brute-force; the pair join is pinned no-cartesian.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import multimodal
from anomalyzer_spark.functions.dedup import hamming_pairs


def _pgm(px: np.ndarray) -> bytes:
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def _ref_dhash(px9x8: np.ndarray) -> int:
    """Independent brute-force dHash over a 9x8 uint8 raster."""
    sig = 0
    for r in range(8):
        for c in range(8):
            if px9x8[r, c + 1] > px9x8[r, c]:
                sig |= 1 << (r * 8 + c)
    # bit 63 set makes the signed-long representation negative
    return sig - (1 << 64) if sig >= 1 << 63 else sig


def _img_df(spark, imgs: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in imgs.items()],
        "doc_id long, content binary")


def _rand_raster(rng) -> np.ndarray:
    return rng.integers(0, 256, size=(8, 9), dtype=np.uint8)


def test_dhash_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    rasters = {i: _rand_raster(rng) for i in range(20)}
    df = _img_df(spark, {i: _pgm(px) for i, px in rasters.items()})
    out = {r["doc_id"]: r["dhash64"]
           for r in multimodal.dhash_image(df).collect()}
    for i, px in rasters.items():
        assert out[i] == _ref_dhash(px), f"doc {i}"


def test_dhash_larger_image_resized(spark):
    # a 36x32 image must decode + nearest-resize to 9x8 before hashing;
    # replicate the operator's integer resample independently
    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, size=(32, 36), dtype=np.uint8)
    # the decoder's documented center-sample convention:
    # src index = floor((i + 0.5) * src / dst)
    rows = ((2 * np.arange(8) + 1) * 32) // 16
    cols = ((2 * np.arange(9) + 1) * 36) // 18
    small = big[np.ix_(rows, cols)]
    df = _img_df(spark, {1: _pgm(big)})
    row = multimodal.dhash_image(df).collect()[0]
    assert (row["width"], row["height"]) == (36, 32)
    assert row["dhash64"] == _ref_dhash(small)


def test_corrupt_payload_yields_null_not_failure(spark):
    rng = np.random.default_rng(3)
    df = _img_df(spark, {1: _pgm(_rand_raster(rng)), 2: b"\x89PNG not real",
                         3: b""})
    rows = {r["doc_id"]: r for r in multimodal.dhash_image(df).collect()}
    assert rows[1]["dhash64"] is not None and rows[1]["err"] is None
    assert rows[2]["dhash64"] is None and rows[2]["err"]
    assert rows[3]["dhash64"] is None and rows[3]["err"]


def test_dhash_pairs_bruteforce_parity(spark):
    # 30 random rasters + planted near-dups: copies with 0-3 single-pixel
    # nudges stay within Hamming 3 of their source with high margin
    rng = np.random.default_rng(23)
    rasters = {i: _rand_raster(rng) for i in range(30)}
    for src, dst, flips in ((0, 100, 0), (1, 101, 1), (2, 102, 2)):
        px = rasters[src].copy()
        for _ in range(flips):
            r, c = rng.integers(0, 8), rng.integers(0, 9)
            px[r, c] = 255 - px[r, c]
        rasters[dst] = px
    sigs = {i: _ref_dhash(px) % (1 << 64) for i, px in rasters.items()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert want, "fixture must plant at least one near-dup pair"
    df = _img_df(spark, {i: _pgm(px) for i, px in rasters.items()})
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in multimodal.dhash_pairs(df, max_hamming=3).collect()}
    assert got == want


def test_hamming_pairs_no_cartesian(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 2654435761 % (1 << 62)).alias("sig"))
    pairs = hamming_pairs(df, "sig", "doc_id", bits=64, max_hamming=3,
                          materialize=False)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hamming_pairs_rejects_untileable_bits(spark):
    df = spark.range(2).select(F.col("id").alias("doc_id"),
                               F.col("id").alias("sig"))
    with pytest.raises(ValueError, match="equal"):
        hamming_pairs(df, "sig", "doc_id", bits=64, max_hamming=4)


def test_pgm_payload_col_decodes_and_matches_python(spark):
    # the synthetic md5-stream payload must round-trip the REAL decoder and
    # equal an independent Python construction of the same spec
    import hashlib
    texts = [(1, "hello world"), (2, "zweiter text"), (3, "")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    payload = df.select("doc_id",
                        multimodal.pgm_payload_col(F.col("text"))
                        .alias("content"))
    rows = {r["doc_id"]: r for r in multimodal.dhash_image(payload).collect()}
    for did, txt in texts:
        hx = "".join(
            hashlib.md5((txt + (str(i) if i else "")).encode()).hexdigest()
            for i in range(5))
        px = np.frombuffer(bytes.fromhex(hx[:144]), np.uint8).reshape(8, 9)
        assert rows[did]["err"] is None
        assert rows[did]["dhash64"] == _ref_dhash(px), f"doc {did}"
