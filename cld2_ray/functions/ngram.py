"""Exact n-gram hash functions, vectorized over numpy byte windows.

Bit-for-bit reimplementations of the reference's hashes
(reference: internal/cldutil_shared.cc):

* ``quad_hash``  — QuadHashV2 / QuadHashV2Mix (:167-202): 1..12 bytes,
  little-endian 32-bit windows combined with mask/shift/add, plus
  pre/post-space indicator bits,
* ``octa_hash40`` — OctaHash40 / OctaHash40Mix (:234-358): 1..24 bytes,
  40-bit result with a shifted byte-sum in the high 8 bits,
* ``pair_hash`` — PairHash (:383-387): rotate(A,13)+B,
* ``bi_hash``   — BiHashV2 (:107-122) for CJK bigrams.

All functions take an (n, W) uint8 window matrix plus per-row byte
counts, so a whole span's n-grams hash in a handful of numpy kernels
(uint32/uint64 ops only; Python ints never touch the hash path).
"""

from __future__ import annotations

import numpy as np

PRE_SPACE = np.uint32(0x00004444)
POST_SPACE = np.uint32(0x44440000)

# kWordMask0: mask for the trailing partial 32-bit word, by bytecount & 3
_WORD_MASK = np.array([0xFFFFFFFF, 0x000000FF, 0x0000FFFF, 0x00FFFFFF],
                      dtype=np.uint32)


def _le32(win: np.ndarray, word_idx: int) -> np.ndarray:
    """Little-endian uint32 load of bytes [4*word_idx : 4*word_idx+4)."""
    b = win[:, 4 * word_idx: 4 * word_idx + 4].astype(np.uint32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def quad_hash(windows: np.ndarray, bytecounts: np.ndarray,
              pre_space: np.ndarray, post_space: np.ndarray) -> np.ndarray:
    """QuadHashV2 over n rows. windows: (n, 12) uint8 (zero-padded past
    bytecount is NOT required — masking is exact for the last partial
    word, and full middle words must contain the real bytes).
    bytecounts: 1..12. pre/post_space: bool arrays."""
    n = len(bytecounts)
    bc = bytecounts.astype(np.int64)
    mask = _WORD_MASK[bc & 3]
    prepost = np.where(pre_space, PRE_SPACE, np.uint32(0)) | \
        np.where(post_space, POST_SPACE, np.uint32(0))

    w0 = _le32(windows, 0)
    w1 = _le32(windows, 1)
    w2 = _le32(windows, 2)

    out = np.empty(n, dtype=np.uint32)

    le4 = bc <= 4
    le8 = (bc > 4) & (bc <= 8)
    gt8 = bc > 8

    # 1..4 bytes: word0 masked, ^ (>>3), ^ prepost
    a = (w0 & mask)
    a = a ^ (a >> 3)
    out[le4] = (a ^ prepost)[le4]

    # 5..8 bytes
    a = w0 ^ (w0 >> 3)
    b = w1 & mask
    b = b ^ (b << 4)
    out[le8] = ((a ^ prepost) + b)[le8]

    # 9..12 bytes
    c = w2 & mask
    c = c ^ (c << 2)
    out[gt8] = ((a ^ prepost) + (w1 ^ (w1 << 4)) + c)[gt8]
    return out


def octa_hash40(windows: np.ndarray, bytecounts: np.ndarray,
                pre_space: np.ndarray, post_space: np.ndarray) -> np.ndarray:
    """OctaHash40 over n rows. windows: (n, 24) uint8, bytecounts 1..24.
    Returns uint64 40-bit hashes."""
    bc = bytecounts.astype(np.int64)
    mask = _WORD_MASK[bc & 3]
    prepost = (np.where(pre_space, PRE_SPACE, np.uint32(0)) |
               np.where(post_space, POST_SPACE, np.uint32(0))).astype(np.uint64)

    words = [_le32(windows, k) for k in range(6)]
    ncase = np.minimum((bc - 1) >> 2, 5)  # 0..5; >24 bytes ignored like the ref
    # per-word xor-shift mix, applied when the word participates.
    # C++ does the whole accumulation in uint64 with no truncation, so the
    # left shifts are NOT wrapped at 32 bits.
    shifts = [("r", 3), ("l", 4), ("l", 2), ("r", 8), ("r", 4), ("r", 6)]

    word0 = np.zeros(len(bc), dtype=np.uint64)
    summ = np.zeros(len(bc), dtype=np.uint64)
    for k in range(6):
        is_last = ncase == k
        active = ncase >= k
        wk = np.where(is_last, words[k] & mask, words[k]).astype(np.uint64)
        wk = np.where(active, wk, np.uint64(0))
        summ += wk
        d, s = shifts[k]
        mixed = wk ^ ((wk >> np.uint64(s)) if d == "r" else (wk << np.uint64(s)))
        word0 += np.where(active, mixed, np.uint64(0))

    summ += summ >> np.uint64(17)
    summ += summ >> np.uint64(9)
    summ = (summ & np.uint64(0xFF)) << np.uint64(32)
    return (word0 ^ prepost) + summ


def bi_hash(windows: np.ndarray, bytecounts: np.ndarray) -> np.ndarray:
    """BiHashV2 over n rows. windows: (n, 8) uint8, bytecounts 1..8."""
    bc = bytecounts.astype(np.int64)
    mask = _WORD_MASK[bc & 3]
    w0 = _le32(windows, 0)
    w1 = _le32(windows, 1)
    out = np.empty(len(bc), dtype=np.uint32)
    le4 = bc <= 4
    a = w0 & mask
    a = a ^ (a >> 3)
    out[le4] = a[le4]
    a = w0 ^ (w0 >> 3)
    b = w1 & mask
    b = b ^ ((b << 18) & np.uint32(0xFFFFFFFF))
    out[~le4] = (a + b)[~le4]
    return out


def pair_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """PairHash(rot13(A)) + B over uint64 arrays."""
    a = a.astype(np.uint64)
    return (((a >> np.uint64(13)) | (a << np.uint64(51))) + b.astype(np.uint64))


def gather_windows(buf: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Gather (n, width) byte windows from a uint8 buffer; reads past the
    end are satisfied from zero padding (callers pad the buffer by
    ``width`` spaces, mirroring the reference's span tail framing)."""
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    return buf[idx]
