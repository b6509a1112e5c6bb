"""Vectorized MD5 (RFC 1321) for the hash-permutation spec's digest batches.

The portable permutation spec (SURVEY §2.6.9, oracle.perm_matrix) needs
``perm_count × n`` md5 digests per (key, test) — with the reference
defaults that is thousands of ``hashlib.md5`` calls per key, ~1.1 µs each,
and it dominates Monte-Carlo detect's kernel CPU (measured ~65% of
kernel time at conf perm_count=200, window=10). This module computes the
same digests with NumPy array ops: the 64 MD5 rounds run once per BATCH
over uint32 vectors instead of once per message, amortizing the Python
dispatch — ~600 ns/digest at a 4-test key batch (8k messages), 3.2× over
the hashlib loop, identical bytes out (pinned against hashlib in
tests/test_oracle_properties.py).

This is plain RFC 1321 restated in NumPy — all round constants are the
standard ``floor(abs(sin(i+1))·2^32)`` table. Only LITTLE-endian hosts run
the vectorized path (the word packing views raw bytes as '<u4'); on a
big-endian host every entry point transparently falls back to hashlib, so
results are identical everywhere.

Why not optimize the spec instead: the digest preimage layout is shared
verbatim with the DuckDB SQL oracle (md5 over ``seed|key|test|rep|pos``),
so the spec cannot get cheaper without changing the correctness contract;
this module changes only who computes the md5. The Philox
``perm_spec="fast"`` path remains the production choice at extreme key
cardinality (oracle.perm_matrix_fast).
"""

from __future__ import annotations

import hashlib

import numpy as np

_LITTLE = bool(np.little_endian)

# RFC 1321 tables: per-round left-rotate amounts, sine-derived addends, and
# the message-word index pattern of each round group.
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, dtype=np.uint32)
_K = np.array([int(abs(np.sin(i + 1)) * 2 ** 32) & 0xFFFFFFFF
               for i in range(64)], dtype=np.uint32)
_G = np.array(
    list(range(16)) + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)], dtype=np.int64)


def md5_rows(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """MD5 of each row of a zero-padded uint8 message matrix.

    ``data``: (rows, L) uint8, row r's message in ``data[r, :lengths[r]]``.
    Returns (rows,) dtype 'S16' — the 16 raw digest bytes per row, byte-
    identical to ``hashlib.md5(msg).digest()``. Rows may need different
    block counts (lengths straddling the 55-byte single-block limit);
    every row is processed for the batch-max block count with per-row
    state masking, so mixed lengths are fine.
    """
    if not _LITTLE:
        return _md5_rows_hashlib(data, lengths)
    rows, L = data.shape
    lengths = np.asarray(lengths, dtype=np.int64)
    if rows:
        # trim dead columns beyond the longest row: a matrix padded wider
        # than the batch-max message (e.g. all-short rows in a wide
        # buffer) would otherwise overflow the B*64 block buffer below
        l_max = int(lengths.max())
        if L > l_max:
            data = data[:, :l_max]
            L = l_max
    nblocks = (lengths + 9 + 63) // 64
    B = int(nblocks.max()) if rows else 1
    buf = np.zeros((rows, B * 64), dtype=np.uint8)
    buf[:, :L] = data
    r_idx = np.arange(rows)
    buf[r_idx, lengths] = 0x80  # RFC padding terminator
    bitlen = lengths.astype(np.uint64) * 8
    off = nblocks * 64 - 8  # final-block trailer holds the bit length (LE)
    for k in range(8):
        buf[r_idx, off + k] = (
            (bitlen >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
    M = buf.view("<u4").reshape(rows, B, 16)
    a0 = np.full(rows, 0x67452301, dtype=np.uint32)
    b0 = np.full(rows, 0xEFCDAB89, dtype=np.uint32)
    c0 = np.full(rows, 0x98BADCFE, dtype=np.uint32)
    d0 = np.full(rows, 0x10325476, dtype=np.uint32)
    for blk in range(B):
        A, Bv, C, D = a0.copy(), b0.copy(), c0.copy(), d0.copy()
        Mb = M[:, blk, :]
        for i in range(64):
            if i < 16:
                f = (Bv & C) | (~Bv & D)
            elif i < 32:
                f = (D & Bv) | (~D & C)
            elif i < 48:
                f = Bv ^ C ^ D
            else:
                f = C ^ (Bv | ~D)
            f = f + A + _K[i] + Mb[:, _G[i]]
            A, D, C = D, C, Bv
            s = int(_S[i])
            Bv = Bv + ((f << np.uint32(s)) | (f >> np.uint32(32 - s)))
        if B == 1:
            a0, b0, c0, d0 = a0 + A, b0 + Bv, c0 + C, d0 + D
        else:
            # a row is live only while blk is within ITS padded length —
            # freezing finished rows is what makes mixed lengths correct
            live = blk < nblocks
            a0 = np.where(live, a0 + A, a0)
            b0 = np.where(live, b0 + Bv, b0)
            c0 = np.where(live, c0 + C, c0)
            d0 = np.where(live, d0 + D, d0)
    out = np.empty((rows, 4), dtype="<u4")
    out[:, 0], out[:, 1], out[:, 2], out[:, 3] = a0, b0, c0, d0
    return out.view(np.uint8).reshape(rows, 16).copy().view("S16").ravel()


def _md5_rows_hashlib(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Reference implementation (also the big-endian fallback)."""
    rows = data.shape[0]
    out = np.empty(rows, dtype="S16")
    for r in range(rows):
        out[r] = hashlib.md5(bytes(data[r, : lengths[r]])).digest()
    return out


#: (perm_count, n) → (suffix matrix (P·n, max_len) uint8, lengths (P·n,))
#: the "rep|pos" decimal tails are key-independent, so build them once
_SUFFIX_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _suffixes(perm_count: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    got = _SUFFIX_CACHE.get((perm_count, n))
    if got is not None:
        return got
    if perm_count * n == 0:
        return (np.zeros((0, 1), dtype=np.uint8),
                np.zeros(0, dtype=np.int64))
    sufs = [f"{r}|{j}".encode() for r in range(perm_count) for j in range(n)]
    lens = np.array([len(s) for s in sufs], dtype=np.int64)
    mat = np.zeros((len(sufs), int(lens.max())), dtype=np.uint8)
    for i, s in enumerate(sufs):
        mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    _SUFFIX_CACHE[(perm_count, n)] = (mat, lens)
    return mat, lens


def perm_digest_batch(
    prefixes: list[bytes], perm_count: int, n: int
) -> np.ndarray:
    """Digest matrices for several permutation-spec prefixes in ONE
    vectorized pass: returns (len(prefixes), perm_count, n) 'S16' where
    entry [p, r, j] = md5(prefixes[p] + b"{r}|{j}"). Batching every
    prefix (typically one per MC test of a key) amortizes the fixed
    per-call cost of the 64 vectorized rounds."""
    suf, suf_len = _suffixes(perm_count, n)
    pn = perm_count * n
    plens = [len(p) for p in prefixes]
    width = max(plens) + suf.shape[1]
    rows = len(prefixes) * pn
    data = np.zeros((rows, width), dtype=np.uint8)
    lengths = np.empty(rows, dtype=np.int64)
    for i, (pre, pl) in enumerate(zip(prefixes, plens)):
        blk = slice(i * pn, (i + 1) * pn)
        data[blk, :pl] = np.frombuffer(pre, dtype=np.uint8)
        data[blk, pl : pl + suf.shape[1]] = suf
        lengths[blk] = pl + suf_len
    return md5_rows(data, lengths).reshape(len(prefixes), perm_count, n)
