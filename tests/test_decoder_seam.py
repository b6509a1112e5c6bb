"""Pluggable compressed-codec decoder seam (multimodal fallback_decoder /
fallback_demuxer): real crawl data is JPEG/MP3/MP4, whose decode needs
libraries this environment doesn't ship — users inject a callable instead
of forking the operators. Pins: injected decoders run INSIDE the Arrow
kernels under the per-row error contract (their exceptions land in `err`
for that row only), their output flows through the identical
luma/resize/dHash and fingerprint stages, native formats keep decoding
natively, and a broken demuxer degrades to the byte-window stub."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from anomalyzer_spark.functions import multimodal


# ---- fake compressed formats ----
# "image": b"FAKEIMG:" + h + w + h*w grayscale bytes
# "audio": b"FAKEAUD:" + n + n int16 LE samples at 8000 Hz
# "video": b"FAKEVID:" + k frames, each len-prefixed

def _fake_img(px: np.ndarray) -> bytes:
    h, w = px.shape
    return b"FAKEIMG:" + bytes([h, w]) + px.astype(np.uint8).tobytes()


# decoder factories return CLOSURES: a module-top-level function would be
# cloudpickled by reference, and executors cannot import a pytest module
def _make_img_decoder():
    def decode(b: bytes) -> np.ndarray:
        if not b.startswith(b"FAKEIMG:"):
            raise ValueError("not a FAKEIMG payload")
        h, w = b[8], b[9]
        return np.frombuffer(b[10:10 + h * w], np.uint8).reshape(h, w)
    return decode


def _fake_aud(pcm16: np.ndarray) -> bytes:
    pcm = pcm16.astype("<i2").tobytes()
    return b"FAKEAUD:" + struct.pack("<I", len(pcm16)) + pcm


def _make_aud_decoder():
    def decode(b: bytes):
        import struct as s
        if not b.startswith(b"FAKEAUD:"):
            raise ValueError("not a FAKEAUD payload")
        n = s.unpack("<I", b[8:12])[0]
        x = np.frombuffer(b[12:12 + 2 * n], "<i2").astype(np.float64) \
            / 32768.0
        return x, 8000
    return decode


def _fake_vid(frames: list[bytes]) -> bytes:
    out = b"FAKEVID:" + struct.pack("<I", len(frames))
    for fr in frames:
        out += struct.pack("<I", len(fr)) + fr
    return out


def _make_vid_demuxer():
    def demux(b: bytes) -> list[bytes]:
        import struct as s
        if not b.startswith(b"FAKEVID:"):
            raise ValueError("not a FAKEVID payload")
        k = s.unpack("<I", b[8:12])[0]
        frames, i = [], 12
        for _ in range(k):
            n = s.unpack("<I", b[i:i + 4])[0]
            frames.append(b[i + 4:i + 4 + n])
            i += 4 + n
        return frames
    return demux


def _pgm(px: np.ndarray) -> bytes:
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def test_image_seam_same_pixels_as_native_and_per_row_errors(spark):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_fake_img(px))),   # routed through the seam
         (2, bytearray(_pgm(px))),        # native path, same pixels
         (3, bytearray(b"FAKEIMG:\x08"))],  # truncated: decoder raises
        "doc_id long, content binary")
    rows = {r["doc_id"]: r for r in multimodal.decode_image_raw(
        df, size=(9, 8), fallback_decoder=_make_img_decoder()).collect()}
    assert rows[1]["err"] is None and rows[2]["err"] is None
    # identical raster in -> identical decoded output across decode paths
    assert rows[1]["pixels"] == rows[2]["pixels"]
    assert (rows[1]["width"], rows[1]["height"]) == (9, 8)
    # the broken row is captured, not fatal, and names the seam
    assert rows[3]["pixels"] is None
    assert "fallback decoder" in rows[3]["err"]
    # ...and the dHash signature path composes through the same seam
    sigs = {r["doc_id"]: r["dhash64"] for r in multimodal.dhash_image(
        df, fallback_decoder=_make_img_decoder()).collect()}
    assert sigs[1] == sigs[2] and sigs[1] is not None
    assert sigs[3] is None


def test_image_seam_output_contract_enforced(spark):
    df = spark.createDataFrame([(1, bytearray(b"FAKEIMG:..."))],
                               "doc_id long, content binary")
    bad = multimodal.decode_image_raw(
        df, fallback_decoder=lambda b: np.zeros((4, 4))).collect()[0]
    assert bad["pixels"] is None and "uint8" in bad["err"]
    # without a decoder the unsupported row points at the seam
    none = multimodal.decode_image_raw(df).collect()[0]
    assert none["pixels"] is None and "fallback_decoder" in none["err"]


def test_audio_seam_features_and_fingerprints(spark):
    rng = np.random.default_rng(5)
    t = np.arange(8000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(8000)
    pcm16 = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    wav = (b"RIFF" + struct.pack("<I", 36 + 16000) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 16000) + pcm16.tobytes())
    # the fake payload carries the SAME int16 PCM the WAV row decodes,
    # so every downstream number must agree across decode paths
    df = spark.createDataFrame(
        [(1, bytearray(_fake_aud(pcm16))), (2, bytearray(wav)),
         (3, bytearray(b"FAKEAUD:zzz"))],
        "doc_id long, content binary")
    feats = {r["doc_id"]: r for r in multimodal.decode_audio_features(
        df, fallback_decoder=_make_aud_decoder()).collect()}
    assert feats[1]["err"] is None and feats[2]["err"] is None
    assert feats[1]["rms"] == feats[2]["rms"]
    assert feats[1]["sample_rate"] == 8000
    assert feats[3]["rms"] is None and "fallback decoder" in feats[3]["err"]
    fps = {r["doc_id"]: r for r in multimodal.audio_fingerprint(
        df, fallback_decoder=_make_aud_decoder()).collect()}
    assert fps[1]["subfps"] == fps[2]["subfps"]
    assert fps[3]["subfps"] is None


def test_video_demux_seam_and_degradation(spark):
    rng = np.random.default_rng(9)
    frames = [_pgm(rng.integers(0, 256, size=(8, 9), dtype=np.uint8))
              for _ in range(6)]
    df = spark.createDataFrame(
        [(1, bytearray(_fake_vid(frames))),
         (2, bytearray(b"NOTAVIDEO" * 4))],
        "doc_id long, content binary")
    got = multimodal.frame_sample(
        df, n_frames=3, fallback_demuxer=_make_vid_demuxer()).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # demuxed: true in-video indexes, evenly spaced over 6 frames
    idx = sorted(r["frame_idx"] for r in by_doc[1])
    assert idx == [1, 3, 5]
    for r in by_doc[1]:
        assert bytes(r["frame"]) == frames[r["frame_idx"]]
    # non-matching payload: the demuxer raises, sampling degrades to the
    # byte-window stub instead of failing
    assert len(by_doc[2]) == 3
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 1, 2]
