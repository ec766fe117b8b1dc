"""KenLM-style character n-gram perplexity scoring (north rule).

A per-language backoff character trigram LM trained deterministically
from the seed corpora (no network => no real KenLM binaries; the
mechanism — per-language LM, per-document perplexity, threshold on the
language's own calibration — is the deliverable).

log P(c3 | c1 c2) with add-0.1 smoothing, backoff to the character
unigram distribution. Perplexity = 2^(mean negative log2 prob).
Thresholds are calibrated split-half per language at train time:
documents with ppl above ``threshold(lang)`` are flagged as gibberish
relative to that language.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import langs

_V = 4096  # hashed character vocabulary


def _chars(text: str) -> np.ndarray:
    cps = np.frombuffer((" " + text.lower() + " ").encode("utf-32-le"),
                        dtype="<u4").astype(np.int64)
    return (cps * 2654435761) % _V


class CharLM:
    def __init__(self, tri: dict, bi: dict, uni: np.ndarray):
        self.tri = tri
        self.bi = bi
        self.uni = uni

    @classmethod
    def train(cls, text: str) -> "CharLM":
        c = _chars(" ".join(text.split()))
        uni = np.full(_V, 0.1)
        np.add.at(uni, c, 1.0)
        uni /= uni.sum()
        bi: dict[int, float] = {}
        tri: dict[int, float] = {}
        for i in range(len(c) - 2):
            b = int(c[i] * _V + c[i + 1])
            t = int(b * _V + c[i + 2])
            bi[b] = bi.get(b, 0.0) + 1.0
            tri[t] = tri.get(t, 0.0) + 1.0
        return cls(tri, bi, uni)

    def logprob_per_char(self, text: str) -> float:
        """Mean log2 P(char | 2-char context), backoff to unigram."""
        c = _chars(text)
        if len(c) < 3:
            return -np.log2(1.0 / _V)
        total = 0.0
        n = 0
        for i in range(len(c) - 2):
            b = int(c[i] * _V + c[i + 1])
            t = int(b * _V + c[i + 2])
            cb = self.bi.get(b, 0.0)
            ct = self.tri.get(t, 0.0)
            if cb > 0:
                p = (ct + 0.1) / (cb + 0.1 * 64)
            else:
                p = float(self.uni[c[i + 2]]) * 0.1
            total += np.log2(p)
            n += 1
        return -total / max(n, 1)


@lru_cache(maxsize=1)
def models() -> tuple[dict[int, CharLM], np.ndarray]:
    """(per-language LM, perplexity threshold per language)."""
    from cld2_ray.data.seeds import SEEDS
    from cld2_ray.data.seeds_extra import EXTRA
    seeds = {c: t + " " + EXTRA.get(c, "") for c, t in SEEDS.items()}

    lms: dict[int, CharLM] = {}
    thresholds = np.full(langs.NUM_LANGS, np.inf)
    for code, text in sorted(seeds.items()):
        lid = langs.lang_id(code)
        words = text.split()
        half_a = " ".join(words[: len(words) // 2])
        half_b = " ".join(words[len(words) // 2:])
        lm_a = CharLM.train(half_a)
        heldout_bits = lm_a.logprob_per_char(half_b)
        lms[lid] = CharLM.train(text)
        # allow 2x the held-out perplexity before flagging
        thresholds[lid] = 2.0 ** heldout_bits * 2.0
    return lms, thresholds


def score(text: str, lang_code: str) -> tuple[float, bool]:
    """(perplexity under lang's LM, is_gibberish flag)."""
    lms, thr = models()
    lid = langs.lang_id(lang_code)
    lm = lms.get(lid)
    if lm is None:
        return 0.0, False
    ppl = 2.0 ** lm.logprob_per_char(text)
    return float(ppl), bool(ppl > thr[lid])


def score_batch(texts, lang_codes) -> tuple[list[float], list[bool]]:
    ppls, flags = [], []
    for t, lc in zip(texts, lang_codes):
        p, f = score(t or "", lc)
        ppls.append(p)
        flags.append(f)
    return ppls, flags
