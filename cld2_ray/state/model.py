"""The langid scoring model: build, pack, load.

The engine's analogue of the reference's ScoringTables bundle
(reference: internal/scoreonescriptspan.h:100-114) and of the
dynamic-data artifact lifecycle (internal/cld2_dynamic_data*.cc:
serialize once offline, mmap/load once per worker).

Because the reference's trained quadgram tables are absent from this
sandbox (SURVEY.md §0), the tables here are trained from the authored
seed corpora in cld2_ray.data.seeds using the same mechanism: hashed
n-gram -> up to 3 (language, quantized-log-prob) pairs, quantized so
that +1 step is a factor of 3 in likelihood (the reference's qprob
scale, cldutil.cc:540-552), packed into an open-addressed uint64
key/value table looked up vectorized at runtime.

Value layout (uint64):
  lang1 | q1<<8 | lang2<<16 | q2<<24 | lang3<<32 | q3<<40
Key 0 is the empty slot sentinel.

Artifact: ``cld2_ray/state/artifacts/langmodel.npz`` — committed,
deterministic, rebuildable with ``python -m cld2_ray.state.model``.
Actors load it once in ``__init__`` (stateful-stage pattern).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from cld2_ray.functions import hits, langs, spans, uscript as us

ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts", "langmodel.npz")

_GOLD = np.uint64(0x9E3779B97F4A7C15)

MAX_QPROB = 12


def _mix(keys: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # wrapping multiply is intended
        k = keys.astype(np.uint64) * _GOLD
    return k ^ (k >> np.uint64(29))


@dataclass
class HashTable:
    keys: np.ndarray  # uint64, 0 = empty
    vals: np.ndarray  # uint64
    mask: np.uint64

    @classmethod
    def build(cls, kv: dict[int, int]) -> "HashTable":
        # 4x slack -> ~25% load -> almost all lookups resolve in one probe
        n = max(8, 1 << (int(len(kv) * 4 - 1)).bit_length())
        keys = np.zeros(n, dtype=np.uint64)
        vals = np.zeros(n, dtype=np.uint64)
        mask = n - 1
        for k, v in sorted(kv.items()):
            k = k or 1  # remap key 0 (sentinel collision; never occurs in practice)
            idx = int(_mix(np.uint64(k))) & mask
            while keys[idx] != 0:
                idx = (idx + 1) & mask
            keys[idx] = k
            vals[idx] = v
        return cls(keys, vals, np.uint64(mask))

    def lookup(self, queries: np.ndarray) -> np.ndarray:
        """Vectorized open-addressed lookup. Returns uint64 values
        (0 = miss). Uses the C probe loop when available (bit-equal;
        cld2_ray/native)."""
        if len(queries) == 0:
            return np.empty(0, dtype=np.uint64)
        from cld2_ray import native
        if native.AVAILABLE:
            return native.table_lookup(self.keys, self.vals, self.mask,
                                       queries)
        return self.lookup_numpy(queries)

    def lookup_numpy(self, queries: np.ndarray) -> np.ndarray:
        """Pure-numpy probe loop (fallback + cross-check reference)."""
        if len(queries) == 0:
            return np.empty(0, dtype=np.uint64)
        q = queries.astype(np.uint64)
        np.place(q, q == 0, 1)
        idx = (_mix(q) & self.mask).astype(np.int64)
        out = np.zeros(len(q), dtype=np.uint64)
        active = np.arange(len(q))
        for _ in range(64):  # probe bound; tables are <= 50% loaded
            k = self.keys[idx[active]]
            hit = k == q[active]
            out[active[hit]] = self.vals[idx[active[hit]]]
            miss = (k != 0) & ~hit
            if not miss.any():
                break
            active = active[miss]
            idx[active] = (idx[active] + 1) & np.int64(self.mask)
        return out


def pack_langprob(entries: list[tuple[int, int]]) -> int:
    """[(lang_id, qprob 1..12), ...] top-first -> uint64 value."""
    v = 0
    for i, (lid, q) in enumerate(entries[:3]):
        v |= (lid & 0xFF) << (16 * i)
        v |= (min(q, MAX_QPROB) & 0xFF) << (16 * i + 8)
    return v


def unpack_langprobs(vals: np.ndarray):
    """uint64[n] -> (langs int16[n,3], qprobs int32[n,3])."""
    l1 = (vals & np.uint64(0xFF)).astype(np.int16)
    q1 = ((vals >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int32)
    l2 = ((vals >> np.uint64(16)) & np.uint64(0xFF)).astype(np.int16)
    q2 = ((vals >> np.uint64(24)) & np.uint64(0xFF)).astype(np.int32)
    l3 = ((vals >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int16)
    q3 = ((vals >> np.uint64(40)) & np.uint64(0xFF)).astype(np.int32)
    return (np.stack([l1, l2, l3], axis=1), np.stack([q1, q2, q3], axis=1))


@dataclass
class LangModel:
    quad: HashTable
    octa: HashTable
    uni: HashTable
    bi: HashTable
    expected_quad: np.ndarray  # int32[NUM_LANGS] score per 1024 span bytes
    expected_uni: np.ndarray

    def save(self, path: str = ARTIFACT) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arrays = dict(
            quad_keys=self.quad.keys, quad_vals=self.quad.vals,
            octa_keys=self.octa.keys, octa_vals=self.octa.vals,
            uni_keys=self.uni.keys, uni_vals=self.uni.vals,
            bi_keys=self.bi.keys, bi_vals=self.bi.vals,
            expected_quad=self.expected_quad,
            expected_uni=self.expected_uni,
            lang_codes=np.array(langs.CODES),
        )
        # checksum manifest (the verifyDataFile analogue, reference:
        # internal/cld2_dynamic_data.h:220 + cld2_dynamic_data_tool.cc
        # --verify): one digest per array so a corrupted artifact fails
        # loudly at load, not as silently-wrong probe results
        arrays["manifest"] = np.array(
            [f"{k}={_digest(v)}" for k, v in sorted(arrays.items())])
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str = ARTIFACT,
             verify_checksums: bool = True) -> "LangModel":
        # mmap-shared across all worker processes on the node — one
        # physical copy of the probe tables in page cache, not one per
        # actor (see state/mmapcache.py; analogue of the reference's
        # mmap'd dynamic-data file, cld2_dynamic_data_loader.cc)
        from cld2_ray.state import mmapcache
        z = mmapcache.load_shared(path)
        if verify_checksums:
            _verify_arrays(z, path)
        codes = [str(c) for c in z["lang_codes"]]
        if codes != langs.CODES:
            raise ValueError("langmodel artifact does not match the language "
                             "registry — rebuild with python -m cld2_ray.state.model")

        def t(name):
            keys = z[f"{name}_keys"]
            return HashTable(keys, z[f"{name}_vals"], np.uint64(len(keys) - 1))
        return cls(t("quad"), t("octa"), t("uni"), t("bi"),
                   z["expected_quad"], z["expected_uni"])


def _digest(arr: np.ndarray) -> str:
    """blake2b over dtype + shape + raw bytes (shape/dtype are part of
    the contract: a truncated or re-typed array must not pass)."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    h.update(str(arr.dtype).encode())
    h.update(str(arr.shape).encode())
    h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _verify_arrays(z: dict, path: str) -> None:
    """Check every array against the saved manifest; raise on any
    mismatch (the dump->verify->load round trip of
    cld2_unittest.cc:296-401)."""
    if "manifest" not in z:
        raise ValueError(
            f"langmodel artifact {path} has no checksum manifest — "
            "rebuild with python -m cld2_ray.state.model")
    want = dict(str(e).split("=", 1) for e in z["manifest"])
    names = {k for k in z if k != "manifest"}
    if names != set(want):
        raise ValueError(
            f"langmodel artifact {path} manifest names mismatch: "
            f"missing={sorted(set(want) - names)} "
            f"extra={sorted(names - set(want))}")
    bad = [k for k in sorted(names) if _digest(z[k]) != want[k]]
    if bad:
        raise ValueError(
            f"langmodel artifact {path} is corrupted: checksum "
            f"mismatch in {bad}")


def verify_artifact(path: str = ARTIFACT) -> None:
    """Standalone --verify: full checksum pass over the artifact."""
    z = np.load(path, allow_pickle=False)
    _verify_arrays({k: z[k] for k in z.files}, path)


@lru_cache(maxsize=1)
def default_model() -> LangModel:
    return LangModel.load()


# ---------------------------------------------------------------------------
# Training (offline; deterministic; python -m cld2_ray.state.model)
# ---------------------------------------------------------------------------

def _count_table(counts: dict[int, dict[int, int]],
                 totals: dict[int, int]) -> HashTable:
    """counts: key -> {lang_id: count}; totals: lang_id -> corpus hits.

    Quantization follows the reference's qprob scale (+1 step = a
    factor of 3 in likelihood, cldutil.cc:540-552): the gram's top
    language gets a frequency-scaled q, the 2nd/3rd are stepped down
    by their log-odds ratio versus the top — so a gram unique to one
    language carries a real margin, like the reference's
    decreasing-probability langprob rows."""
    # web-minority members of close sets get a one-step prior demotion
    # (the analogue of corpus-frequency priors in the reference's
    # training data; keeps pt/gl, sr/bs, bg/mk, ru/be resolvable with
    # small seed corpora)
    demote = {langs.lang_id(c) for c in ("gl", "bs", "mk", "be")}
    ln3 = math.log(3.0)
    kv: dict[int, int] = {}
    for key, per_lang in counts.items():
        weighted = sorted(
            (((cnt / totals[lid]) / (3.0 if lid in demote else 1.0), lid)
             for lid, cnt in per_lang.items()),
            reverse=True)[:3]
        w_max = weighted[0][0]
        if w_max <= 0:
            continue
        q_max = max(1, min(MAX_QPROB,
                           2 + int(round(math.log(w_max * 1000.0) / ln3))))
        entries = []
        ln2 = math.log(2.0)
        for w, lid in weighted:
            # steep down-step (factor 2 per q unit) so per-gram margins
            # between the top and runner-up languages accumulate —
            # the margin is what ReliabilityDelta measures
            q = q_max - int(round(math.log(w_max / w) / ln2))
            if q >= 1:
                entries.append((lid, q))
        if entries:
            kv[key] = pack_langprob(entries)
    return HashTable.build(kv)


def _build_tables(seed_texts: dict[str, str]):
    quad_counts: dict[int, dict[int, int]] = {}
    octa_counts: dict[int, dict[int, int]] = {}
    uni_counts: dict[int, dict[int, int]] = {}
    bi_counts: dict[int, dict[int, int]] = {}
    quad_totals: dict[int, int] = {}
    octa_totals: dict[int, int] = {}
    uni_totals: dict[int, int] = {}
    bi_totals: dict[int, int] = {}

    def bump(counts, totals, lid, keys):
        totals[lid] = totals.get(lid, 0) + max(len(keys), 1)
        for k in keys.tolist():
            counts.setdefault(k, {})
            counts[k][lid] = counts[k].get(lid, 0) + 1

    for code, text in sorted(seed_texts.items()):
        lid = langs.lang_id(code)
        if lid == langs.UNKNOWN:
            raise ValueError(f"seed corpus for unknown language {code!r}")
        for sp in spans.script_spans(" ".join(text.split())):
            rt = us.script_rtype(sp.script)
            sb = sp.text.encode("utf-8")
            if rt == us.RTYPE_MANY:
                # dense (every-alignment) sampling for table coverage
                bump(quad_counts, quad_totals, lid, hits.quad_hits_dense(sb)[0])
                h, _ = hits.octa_hits(sb)
                bump(octa_counts, octa_totals, lid, h)
            elif rt == us.RTYPE_CJK:
                uni, _, bi, _ = hits.cjk_candidates(sp.text)
                bump(uni_counts, uni_totals, lid, uni)
                bump(bi_counts, bi_totals, lid, bi)

    return (_count_table(quad_counts, quad_totals),
            _count_table(octa_counts, octa_totals),
            _count_table(uni_counts, uni_totals),
            _count_table(bi_counts, bi_totals))


def _score_text_for_lang(model: "LangModel", text: str, lid: int):
    """Score text with the RUNTIME hit walk; return (score, bytes, cjk)."""
    tot_score, tot_bytes, is_cjk = 0, 0, False
    for sp in spans.script_spans(" ".join(text.split())):
        rt = us.script_rtype(sp.script)
        if rt == us.RTYPE_MANY:
            sb = sp.text.encode("utf-8")
            h, _ = hits.quad_hits_dense(sb)
            l3, q3 = unpack_langprobs(model.quad.lookup(h))
            tot_score += int(np.where(l3 == lid, q3, 0).sum())
            ho, _ = hits.octa_hits(sb)
            l3, q3 = unpack_langprobs(model.octa.lookup(ho))
            tot_score += int(np.where(l3 == lid, q3, 0).sum())
            tot_bytes += sp.text_bytes
        elif rt == us.RTYPE_CJK:
            is_cjk = True
            uni, _, bi, _ = hits.cjk_candidates(sp.text)
            for tbl, keys in ((model.uni, uni), (model.bi, bi)):
                l3, q3 = unpack_langprobs(tbl.lookup(keys))
                tot_score += int(np.where(l3 == lid, q3, 0).sum())
            tot_bytes += sp.text_bytes
    return tot_score, tot_bytes, is_cjk


def train(seed_texts: dict[str, str] | None = None) -> LangModel:
    if seed_texts is None:
        from cld2_ray.data.seeds import SEEDS
        from cld2_ray.data.seeds_extra import EXTRA
        seed_texts = {c: t + " " + EXTRA.get(c, "") for c, t in SEEDS.items()}

    quad, octa, uni, bi = _build_tables(seed_texts)
    model = LangModel(
        quad=quad, octa=octa, uni=uni, bi=bi,
        expected_quad=np.zeros(langs.NUM_LANGS, dtype=np.int32),
        expected_uni=np.zeros(langs.NUM_LANGS, dtype=np.int32),
    )

    # Expected score per 1KB per language (the analogue of
    # kAvgDeltaOctaScore, cld_generated_score_quad_octa_*.cc), measured
    # split-half: tables trained on the first half of each corpus score
    # the unseen second half, giving a realistic out-of-vocabulary rate.
    halves_a = {}
    halves_b = {}
    for code, text in seed_texts.items():
        words = text.split()
        halves_a[code] = " ".join(words[: len(words) // 2])
        halves_b[code] = " ".join(words[len(words) // 2:])
    qa, oa, ua, ba = _build_tables(halves_a)
    half_model = LangModel(qa, oa, ua, ba, model.expected_quad,
                           model.expected_uni)
    for code, text_b in sorted(halves_b.items()):
        lid = langs.lang_id(code)
        s, b, is_cjk = _score_text_for_lang(half_model, text_b, lid)
        if b > 0:
            per_kb = (s << 10) // b
            if is_cjk:
                model.expected_uni[lid] = per_kb
            else:
                model.expected_quad[lid] = per_kb
    return model


if __name__ == "__main__":
    import sys
    if "--verify" in sys.argv:
        path = ARTIFACT
        verify_artifact(path)
        print(f"verified {path}: all checksums match")
        raise SystemExit(0)
    m = train()
    m.save()
    nq = int((m.quad.keys != 0).sum())
    no = int((m.octa.keys != 0).sum())
    nu = int((m.uni.keys != 0).sum())
    nb = int((m.bi.keys != 0).sum())
    print(f"saved {ARTIFACT}: quads={nq} octas={no} unis={nu} bis={nb}")
