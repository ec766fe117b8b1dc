"""N-gram hit candidate extraction from script spans.

Reimplements the reference's sampling walks:

* ``quad_candidates`` — GetQuadHits (reference: internal/cldutil.cc:
  315-405): groups of up to 4 letters not crossing spaces, advancing 2
  letters (or to the next word), skipping one ASCII vowel mid-word
  (kAdvanceOneCharSpaceVowel, cldutil_shared.h:476-486), with pre/post
  space indicators; repeats filtered with a last-2 ring,
* ``octa_candidates`` — GetOctaHits (cldutil.cc:416-533): one hash per
  word (up to 24 bytes) with OctaHash40,
* ``cjk_candidates`` — GetUniHits/GetBiHits (cldutil.cc:201-310):
  per-char unigram keys plus adjacent-pair bigram keys.

Windows are hashed in bulk by cld2_ray.functions.ngram; only the
data-dependent position walk is a Python loop (a handful of steps per
word over precomputed numpy-derived lists).
"""

from __future__ import annotations

import numpy as np

from . import ngram

_VOWELS = frozenset(b"aeiouAEIOU")


def _char_structure(b: bytes):
    """Byte-level char starts + per-char space/vowel flags for a
    space-framed span byte string."""
    arr = np.frombuffer(b, dtype=np.uint8)
    is_start = (arr & 0xC0) != 0x80
    cstart = np.flatnonzero(is_start)
    first = arr[cstart]
    is_space = first == 0x20
    return arr, cstart, is_space, first


def quad_candidates(span_bytes: bytes):
    """Return (starts, bytecounts, pre, post) byte positions of quadgram
    candidates in a space-framed span (b" w1 w2 ")."""
    arr, cstart, is_space, first = _char_structure(span_bytes)
    n = len(cstart)
    if n == 0:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, bool),) * 2

    # next space char-index at or after each char
    space_pos = np.flatnonzero(is_space)
    nxt = np.searchsorted(space_pos, np.arange(n))
    nxt = np.clip(nxt, 0, len(space_pos) - 1)
    next_space = space_pos[nxt]  # for trailing chars: last space (frame)

    cstart_l = cstart.tolist()
    next_space_l = next_space.tolist()
    is_vowel = np.isin(first, np.frombuffer(b"aeiouAEIOU", np.uint8))
    is_vowel_l = is_vowel.tolist()
    is_space_l = is_space.tolist()

    starts: list[int] = []
    bcs: list[int] = []
    limit = n - 1  # last char is frame space
    i = 1 if is_space_l[0] else 0
    while i < limit:
        w_end = next_space_l[i]
        e = min(i + 4, w_end)
        mid = min(i + 2, w_end)
        sb = cstart_l[i]
        bc = cstart_l[e] - sb
        if bc > 0:
            starts.append(sb)
            bcs.append(min(bc, 12))
        if e == w_end:
            i = w_end + 1  # skip the space to next word start
        else:
            i = mid
            if i < limit and is_vowel_l[i]:
                i += 1
    if not starts:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, bool),) * 2
    s = np.array(starts, dtype=np.int64)
    c = np.array(bcs, dtype=np.int64)
    pre = arr[s - 1] == 0x20
    post = arr[np.minimum(s + c, len(arr) - 1)] == 0x20
    return s, c, pre, post


def quad_hits_dense(span_bytes: bytes, span_bounds=None):
    """Quadgram hashes at EVERY letter alignment, fully vectorized
    (no Python walk). Returns (hashes uint64, byte offsets).

    ``span_bounds``: sorted end offsets of concatenated spans — the
    dedupe ring is then applied per span, making batch scoring of a
    concatenation identical to span-by-span scoring.

    This engine samples densely both in training and at runtime: the
    reference's stride-2 + vowel-skip walk (GetQuadHits advance rules)
    is a speed optimization for its large trained tables; with small
    seed-trained tables, dense sampling doubles per-document evidence
    and is *cheaper* here because it removes the per-word Python loop.
    ``quad_candidates`` keeps the faithful walk for parity experiments.
    """
    arr, cstart, is_space, first = _char_structure(span_bytes)
    n = len(cstart)
    if n < 3:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    space_pos = np.flatnonzero(is_space)
    nxt = np.searchsorted(space_pos, np.arange(n))
    nxt = np.clip(nxt, 0, len(space_pos) - 1)
    next_space = space_pos[nxt]
    letters = np.flatnonzero(~is_space[:n - 1])
    if len(letters) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    e = np.minimum(letters + 4, next_space[letters])
    # drop 1-2 letter word-TAIL fragments (the reference's walk never
    # emits them — they alias with short whole words and add noise);
    # keep whole short words (letter preceded by a space)
    word_start = is_space[np.maximum(letters - 1, 0)]
    ok = ((e - letters) >= 3) | word_start
    letters, e = letters[ok], e[ok]
    s = cstart[letters]
    c = np.minimum(cstart[e] - s, 12)
    ok = c > 0
    s, c = s[ok], c[ok]
    buf = np.frombuffer(span_bytes + b" " * 16, dtype=np.uint8)
    wins = ngram.gather_windows(buf, s, 12)
    pre = arr[s - 1] == 0x20
    post = arr[np.minimum(s + c, len(arr) - 1)] == 0x20
    h = ngram.quad_hash(wins, c, pre, post).astype(np.uint64)
    if span_bounds is not None:
        sid = np.searchsorted(span_bounds, s, side="right")
        keep = dedupe_ring2(h, sid)
    else:
        keep = dedupe_ring2(h)
    return h[keep], s[keep]


def dedupe_ring2(hashes: np.ndarray,
                 span_ids: np.ndarray | None = None) -> np.ndarray:
    """Boolean keep-mask dropping candidates equal to either of the two
    previous candidates (the reference's last-2 repeat ring,
    cldutil.cc:334-335 — applied to the candidate stream). With
    ``span_ids``, the ring never crosses a span boundary, so scoring a
    concatenation of spans is bit-identical to scoring them one by one."""
    keep = np.ones(len(hashes), dtype=bool)
    if len(hashes) > 1:
        same = hashes[1:] == hashes[:-1]
        if span_ids is not None:
            same &= span_ids[1:] == span_ids[:-1]
        keep[1:] &= ~same
    if len(hashes) > 2:
        same = hashes[2:] == hashes[:-2]
        if span_ids is not None:
            same &= span_ids[2:] == span_ids[:-2]
        keep[2:] &= ~same
    return keep


def quad_hits(span_bytes: bytes):
    """(hashes uint32->uint64, byte offsets) of deduped quad candidates."""
    s, c, pre, post = quad_candidates(span_bytes)
    if len(s) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    buf = np.frombuffer(span_bytes + b" " * 16, dtype=np.uint8)
    wins = ngram.gather_windows(buf, s, 12)
    h = ngram.quad_hash(wins, c, pre, post)
    keep = dedupe_ring2(h)
    return h[keep].astype(np.uint64), s[keep]


def octa_candidates(span_bytes: bytes, max_bytes: int | None = None):
    """One candidate per word (OctaHash40 wordgram)."""
    arr, cstart, is_space, _ = _char_structure(span_bytes)
    space_byte = cstart[is_space]
    if len(space_byte) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    w_start = space_byte[:-1] + 1
    w_end = space_byte[1:]
    ok = w_end > w_start
    if max_bytes is not None:
        ok &= w_start < max_bytes
    w_start, w_end = w_start[ok], w_end[ok]
    return w_start.astype(np.int64), np.minimum(w_end - w_start, 24).astype(np.int64)


def octa_hits(span_bytes: bytes, max_bytes: int | None = None,
              span_bounds=None):
    """(hashes uint64, byte offsets) of deduped word hits."""
    s, c = octa_candidates(span_bytes, max_bytes)
    if len(s) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    buf = np.frombuffer(span_bytes + b" " * 28, dtype=np.uint8)
    wins = ngram.gather_windows(buf, s, 24)
    pre = np.ones(len(s), dtype=bool)   # words are always space-delimited
    post = np.ones(len(s), dtype=bool)
    h = ngram.octa_hash40(wins, c, pre, post)
    if span_bounds is not None:
        sid = np.searchsorted(span_bounds, s, side="right")
        keep = dedupe_ring2(h, sid)
    else:
        keep = dedupe_ring2(h)
    return h[keep], s[keep]


def cjk_candidates(span_text: str):
    """(uni_keys, uni_pos, bi_keys, bi_pos) for a HANI span string.

    Unigram key = codepoint. Bigram key = cp1 << 21 | cp2 for adjacent
    (no intervening space) char pairs. Positions are char indices.
    """
    cps = np.frombuffer(span_text.encode("utf-32-le"), dtype="<u4")
    is_char = cps != 32
    pos = np.flatnonzero(is_char)
    uni = cps[pos].astype(np.uint64)
    keep = dedupe_ring2(uni)
    adj = np.flatnonzero((pos[1:] - pos[:-1]) == 1) if len(pos) > 1 else np.empty(0, np.int64)
    bi = ((cps[pos[adj]].astype(np.uint64) << np.uint64(21))
          | cps[pos[adj] + 1].astype(np.uint64))
    bkeep = dedupe_ring2(bi)
    return uni[keep], pos[keep], bi[bkeep], pos[adj][bkeep]
