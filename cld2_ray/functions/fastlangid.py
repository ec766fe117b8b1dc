"""fastText-style auxiliary language identifier (north rule).

A hashed character-n-gram linear (multinomial Naive Bayes) classifier:
char 2-4-grams hashed into 2^18 buckets, one weight row per language,
trained deterministically from the seed corpora at first use. This is
the standard fastText langid architecture (bag of hashed n-grams ->
linear layer); trained here from authored seeds because the sandbox has
no network for pretrained weights.

Runtime is an actor-pool stage: the weight matrix is built once per
process (lru_cache) / per actor and scored vectorized per batch.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from . import langs

N_BUCKETS = 1 << 18
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _features(text: str) -> np.ndarray:
    """Hashed char 2-4 gram bucket ids for one document."""
    b = (" " + text.lower() + " ").encode("utf-8")
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    feats = []
    with np.errstate(over="ignore"):
        for n in (2, 3, 4):
            if len(arr) < n:
                continue
            h = np.zeros(len(arr) - n + 1, dtype=np.uint64)
            for k in range(n):
                h = h * np.uint64(31) + arr[k: len(arr) - n + 1 + k]
            h = (h * _GOLD) >> np.uint64(46)  # top 18 bits
            feats.append(h)
    if not feats:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(feats).astype(np.int64)


ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "state", "artifacts", "fastlangid.npz")


@lru_cache(maxsize=1)
def weights() -> np.ndarray:
    """Compact bucket->weight table; loads the committed artifact when
    present (actor init fast path), else trains from seeds."""
    if os.path.exists(ARTIFACT):
        z = np.load(ARTIFACT)
        weights.bucket_index = z["bucket_index"]  # type: ignore[attr-defined]
        return z["table"]
    return _train()


def save_artifact() -> None:
    table = _train()
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    np.savez_compressed(ARTIFACT, table=table,
                        bucket_index=weights.bucket_index)


def _train() -> np.ndarray:
    from cld2_ray.data.seeds import SEEDS
    from cld2_ray.data.seeds_extra import EXTRA
    seeds = {c: t + " " + EXTRA.get(c, "") for c, t in SEEDS.items()}

    counts: dict[int, np.ndarray] = {}
    totals = np.full(langs.NUM_LANGS, 1.0)
    for code, text in sorted(seeds.items()):
        lid = langs.lang_id(code)
        f = _features(" ".join(text.split()))
        totals[lid] += len(f)
        for bucket in f.tolist():
            row = counts.get(bucket)
            if row is None:
                row = counts.setdefault(bucket, np.zeros(langs.NUM_LANGS,
                                                         dtype=np.float32))
            row[lid] += 1.0

    # log P(bucket|lang) - log P(bucket|background), smoothed; languages
    # with no training corpus are masked out (they would otherwise win
    # on the smoothing constant alone)
    trained = totals > 1.0
    bucket_ids = np.fromiter(sorted(counts), dtype=np.int64)
    mat = np.stack([counts[b] for b in bucket_ids.tolist()])
    smoothed = (mat + 0.1) / totals[None, :]
    background = smoothed[:, trained].mean(axis=1, keepdims=True)
    w = np.log(smoothed / background).astype(np.float32)
    w[:, ~trained] = -1e9
    full = np.zeros((N_BUCKETS,), dtype=np.int32)  # bucket -> row+1 (0=absent)
    full[bucket_ids] = np.arange(1, len(bucket_ids) + 1)
    table = np.vstack([np.zeros((1, langs.NUM_LANGS), np.float32), w])
    weights.bucket_index = full      # type: ignore[attr-defined]
    return table


def classify(text: str) -> tuple[str, float]:
    """Returns (lang_code, confidence 0..1)."""
    from . import uscript as us
    if not text or not text.strip():
        return "un", 0.0
    # single-language scripts resolve by script alone (no corpus needed)
    cps = us.codepoints(text.lower())
    sc = us.scripts_of(cps)
    nonzero = sc[sc > 0]
    if len(nonzero):
        dominant = int(np.bincount(nonzero).argmax())
        if us.script_rtype(dominant) == us.RTYPE_ONE:
            return langs.lang_code(int(langs.SCRIPT_DEFAULT_LANG[dominant])), 0.95

    w = weights()
    idx = weights.bucket_index  # type: ignore[attr-defined]
    f = _features(text)
    if len(f) == 0:
        return "un", 0.0
    rows = idx[f]
    if rows.max(initial=0) == 0:
        return "un", 0.0  # nothing recognizable
    # counts @ w[uniq] instead of gathering a (n_feats, n_langs) slab
    uniq, counts = np.unique(rows, return_counts=True)
    scores = counts.astype(np.float32) @ w[uniq]
    scores[langs.UNKNOWN] = -np.inf
    order = np.argsort(scores)
    top, second = order[-1], order[-2]
    margin = float(scores[top] - scores[second]) / max(len(f), 1)
    conf = float(1.0 - np.exp(-4.0 * max(margin, 0.0)))
    return langs.lang_code(int(top)), conf


def classify_batch(texts) -> tuple[list[str], list[float]]:
    out_l, out_c = [], []
    for t in texts:
        l, c = classify(t or "")
        out_l.append(l)
        out_c.append(c)
    return out_l, out_c
