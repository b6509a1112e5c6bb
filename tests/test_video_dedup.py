"""Video near-dup matching: frame demux → frame dHash → clip pairs.

AVI fixtures whose frames are real binary PGMs exercise every stage for
real: the RIFF walk, the raster decode, the Hamming banding, and the
clip-pair aggregation. A clip sharing most frames with another must pair
with high overlap; unrelated clips must not; codec-payload frames (not
decodable rasters) drop out row-wise without failing the job.
"""

from __future__ import annotations

import numpy as np
import pytest

from anomalyzer_spark.functions import multimodal


def _pgm(px: np.ndarray) -> bytes:
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def _avi(frames: list[bytes]) -> bytes:
    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\0" if len(body) & 1 else b"")

    hdrl = b"LIST" + (4).to_bytes(4, "little") + b"hdrl"
    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    movi = b"LIST" + len(movi_body).to_bytes(4, "little") + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _rand_frames(rng, n):
    return [_pgm(rng.integers(0, 256, size=(8, 9), dtype=np.uint8))
            for _ in range(n)]


def test_video_matches_shared_frames(spark):
    rng = np.random.default_rng(41)
    a = _rand_frames(rng, 8)
    b = a[:6] + _rand_frames(rng, 2)       # 6/8 frames shared with a
    c = _rand_frames(rng, 8)               # unrelated
    d = [bytes([i]) * 33 for i in range(8)]  # codec-ish junk frames
    df = spark.createDataFrame(
        [(1, bytearray(_avi(a))), (2, bytearray(_avi(b))),
         (3, bytearray(_avi(c))), (4, bytearray(_avi(d)))],
        "doc_id long, content binary")
    pairs = {(r["id_a"], r["id_b"]): r for r in
             multimodal.video_matches(df, n_frames=8,
                                      min_shared=2).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["shared_frames"] >= 5
    assert pairs[(1, 2)]["overlap"] >= 0.6
    assert not any(3 in p or 4 in p for p in pairs)


def test_exact_copy_full_overlap_and_validation(spark):
    rng = np.random.default_rng(5)
    a = _rand_frames(rng, 6)
    df = spark.createDataFrame(
        [(1, bytearray(_avi(a))), (2, bytearray(_avi(list(a))))],
        "doc_id long, content binary")
    rows = multimodal.video_matches(df, n_frames=6, min_shared=2).collect()
    assert len(rows) == 1
    assert rows[0]["overlap"] == 1.0
    assert rows[0]["shared_frames"] >= 6
    with pytest.raises(ValueError, match="min_shared"):
        multimodal.video_matches(df, min_shared=0)


def test_out_of_range_clip_id_raises(spark):
    # packing contract: clip ids outside [0, 2^32) would alias into other
    # clips' fid ranges — they must RAISE, not silently mis-attribute
    rng = np.random.default_rng(6)
    a = _rand_frames(rng, 4)
    df = spark.createDataFrame(
        [(-1, bytearray(_avi(a))), (5, bytearray(_avi(a)))],
        "doc_id long, content binary")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="out of packable range"):
        multimodal.video_matches(df, n_frames=4, min_shared=1).collect()


def test_avi_payload_col_demuxes_to_md5_spec_frames(spark):
    """avi_payload_col (the oracle-reproducible synthetic video) must
    round-trip through the REAL container walk into exactly the
    md5-stream PGM frames the SQL oracle rebuilds."""
    import hashlib

    from pyspark.sql import functions as F
    df = spark.createDataFrame([(7, "some text")], "doc_id long, text string")
    payload = bytes(df.select(
        multimodal.avi_payload_col(F.col("text")).alias("c"))
        .collect()[0]["c"])
    frames = multimodal._avi_video_frames(payload)
    assert len(frames) == 3
    for fi, fr in enumerate(frames):
        px = b"".join(hashlib.md5(f"some textv{fi}_{j}".encode()).digest()
                      for j in range(5))[:72]
        assert fr == b"P5\n9 8\n255\n" + px
