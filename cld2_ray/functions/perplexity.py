"""KenLM-style character n-gram perplexity scoring (north rule).

A per-language backoff character trigram LM trained deterministically
from the seed corpora (no network => no real KenLM binaries; the
mechanism — per-language LM, per-document perplexity, threshold on the
language's own calibration — is the deliverable).

log P(c3 | c1 c2) with add-0.1 smoothing, backoff to the character
unigram distribution. Perplexity = 2^(mean negative log2 prob).
Thresholds are calibrated split-half per language at train time.

Scoring is fully vectorized: all languages' trigram/bigram counts live
in one open-addressed numpy table keyed (lang, ngram); a document is
one hash + two lookups + one log, no per-char Python loop.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from . import langs

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "state", "artifacts", "perplexity.npz")

_V = 4096          # hashed character vocabulary
_VV = _V * _V


def _chars(text: str) -> np.ndarray:
    cps = np.frombuffer((" " + text.lower() + " ").encode("utf-32-le"),
                        dtype="<u4").astype(np.int64)
    return (cps * 2654435761) % _V


def _keys_tri(lang_id: int, c: np.ndarray) -> np.ndarray:
    b = c[:-2] * _V + c[1:-1]
    t = b * _V + c[2:]
    base = np.uint64(lang_id) << np.uint64(40)
    return base | t.astype(np.uint64), base | b.astype(np.uint64)


class _PplModel:
    def __init__(self, table, uni, thresholds):
        self.table = table          # HashTable: (lang,ngram) -> count
        self.uni = uni              # (NUM_LANGS, V) float unigram probs
        self.thresholds = thresholds

    def bits_per_char(self, text: str, lang_id: int) -> float:
        c = _chars(text)
        if len(c) < 3:
            return float(np.log2(_V))
        tri_k, bi_k = _keys_tri(lang_id, c)
        # bigram keys live in a disjoint keyspace: flag bit 39
        bi_k = bi_k | np.uint64(1 << 39)
        ct = self.table.lookup(tri_k).astype(np.float64)
        cb = self.table.lookup(bi_k).astype(np.float64)
        uni_p = self.uni[lang_id][c[2:]]
        p = np.where(cb > 0, (ct + 0.1) / (cb + 0.1 * 64), uni_p * 0.1)
        return float(-np.log2(p).mean())


def _train_counts(text: str, lang_id: int, acc: dict) -> None:
    c = _chars(" ".join(text.split()))
    if len(c) < 3:
        return
    tri_k, bi_k = _keys_tri(lang_id, c)
    bi_k = bi_k | np.uint64(1 << 39)
    for arr in (tri_k, bi_k):
        u, n = np.unique(arr, return_counts=True)
        for k, v in zip(u.tolist(), n.tolist()):
            acc[k] = acc.get(k, 0) + v


@lru_cache(maxsize=1)
def models() -> _PplModel:
    if os.path.exists(ARTIFACT):
        from cld2_ray.state.model import HashTable
        from cld2_ray.state import mmapcache
        z = mmapcache.load_shared(ARTIFACT)  # one copy per node, not per actor
        keys = z["keys"]
        table = HashTable(keys, z["vals"], np.uint64(len(keys) - 1))
        return _PplModel(table, z["uni"], z["thresholds"])
    return _train()


def save_artifact() -> None:
    m = _train()
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    np.savez_compressed(ARTIFACT, keys=m.table.keys, vals=m.table.vals,
                        uni=m.uni, thresholds=m.thresholds)


def _train() -> _PplModel:
    from cld2_ray.data.seeds import SEEDS
    from cld2_ray.data.seeds_extra import EXTRA
    from cld2_ray.state.model import HashTable
    seeds = {c: t + " " + EXTRA.get(c, "") for c, t in SEEDS.items()}

    uni = np.full((langs.NUM_LANGS, _V), 1.0 / _V)
    thresholds = np.full(langs.NUM_LANGS, np.inf)

    # split-half calibration first (tables from half A, scored on half B)
    acc_a: dict[int, int] = {}
    halves_b = {}
    for code, text in sorted(seeds.items()):
        lid = langs.lang_id(code)
        words = text.split()
        _train_counts(" ".join(words[: len(words) // 2]), lid, acc_a)
        halves_b[code] = " ".join(words[len(words) // 2:])
    half = _PplModel(HashTable.build(acc_a), uni, thresholds)
    # full tables
    acc: dict[int, int] = {}
    for code, text in sorted(seeds.items()):
        lid = langs.lang_id(code)
        _train_counts(text, lid, acc)
        c = _chars(" ".join(text.split()))
        u = np.full(_V, 0.1)
        np.add.at(u, c, 1.0)
        uni[lid] = u / u.sum()
    for code, text_b in sorted(halves_b.items()):
        lid = langs.lang_id(code)
        bits = half.bits_per_char(text_b, lid)
        thresholds[lid] = 2.0 ** bits * 2.0
    return _PplModel(HashTable.build(acc), uni, thresholds)


def score(text: str, lang_code: str) -> tuple[float, bool]:
    """(perplexity under lang's LM, is_gibberish flag)."""
    m = models()
    lid = langs.lang_id(lang_code)
    if lid == langs.UNKNOWN or not np.isfinite(m.thresholds[lid]):
        return 0.0, False
    ppl = 2.0 ** m.bits_per_char(text, lid)
    return float(ppl), bool(ppl > m.thresholds[lid])


def score_batch(texts, lang_codes) -> tuple[list[float], list[bool]]:
    """Whole-batch vectorization: one concatenated key array, one table
    lookup, per-document means via bincount segments. With the C
    kernel (cld2_ray/native.ppl_score) the whole walk — UTF-8 decode,
    char hashing, trigram/bigram lookups, log-prob accumulation — is
    one pass with no intermediate arrays."""
    from cld2_ray import native
    m = models()
    n = len(texts)
    if native.AVAILABLE:
        lids = np.full(n, -1, dtype=np.int64)
        framed = []
        for i, (t, lc) in enumerate(zip(texts, lang_codes)):
            lid = langs.lang_id(lc)
            if lid != langs.UNKNOWN and np.isfinite(m.thresholds[lid]):
                lids[i] = lid
                framed.append((" " + (t or "").lower() + " ")
                              .encode("utf-8"))
            else:
                framed.append(b"")
        bounds = np.cumsum([len(b) for b in framed]).astype(np.int64)
        bits, cnt = native.ppl_score(b"".join(framed), bounds, lids,
                                     m.table, m.uni)
        ok = cnt > 0
        means = np.where(ok, bits / np.maximum(cnt, 1), 0.0)
        ppl = np.where(ok, 2.0 ** means, 0.0)
        thr = np.where((lids >= 0) & np.isfinite(m.thresholds
                                                 [np.maximum(lids, 0)]),
                       m.thresholds[np.maximum(lids, 0)], np.inf)
        flags = (ppl > thr) & ok
        return [float(x) for x in ppl], [bool(x) for x in flags]
    doc_tri: list[np.ndarray] = []
    doc_bi: list[np.ndarray] = []
    doc_uni: list[np.ndarray] = []
    seg: list[int] = []
    lids = np.zeros(n, dtype=np.int64)
    for i, (t, lc) in enumerate(zip(texts, lang_codes)):
        lid = langs.lang_id(lc)
        lids[i] = lid
        if lid == langs.UNKNOWN or not np.isfinite(m.thresholds[lid]):
            seg.append(0)
            continue
        c = _chars(t or "")
        if len(c) < 3:
            seg.append(0)
            continue
        tri_k, bi_k = _keys_tri(lid, c)
        doc_tri.append(tri_k)
        doc_bi.append(bi_k | np.uint64(1 << 39))
        doc_uni.append(m.uni[lid][c[2:]])
        seg.append(len(tri_k))

    if not doc_tri:
        return [0.0] * n, [False] * n
    tri = np.concatenate(doc_tri)
    bi = np.concatenate(doc_bi)
    uni_p = np.concatenate(doc_uni)
    ct = m.table.lookup(tri).astype(np.float64)
    cb = m.table.lookup(bi).astype(np.float64)
    p = np.where(cb > 0, (ct + 0.1) / (cb + 0.1 * 64), uni_p * 0.1)
    bits = -np.log2(p)
    seg_arr = np.asarray(seg)
    doc_of = np.repeat(np.arange(n), seg_arr)
    sums = np.bincount(doc_of, weights=bits, minlength=n)
    means = sums / np.maximum(seg_arr, 1)
    ppl = np.where(seg_arr > 0, 2.0 ** means, 0.0)
    thr = np.where(np.isfinite(m.thresholds[lids]), m.thresholds[lids],
                   np.inf)
    flags = (ppl > thr) & (seg_arr > 0)
    return [float(x) for x in ppl], [bool(x) for x in flags]
