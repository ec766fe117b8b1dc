"""Document-level language detection — the DetectLanguageSummaryV2
analogue (reference: internal/compact_lang_det_impl.cc:1707-2106).

Chain per document:
  UTF-8 gate -> extract (HTML) -> script spans -> per-span hit
  extraction + table lookup -> chunk scoring -> DocTote -> close-pair
  refinement -> unreliable removal -> top-3 + percents -> summary
  language calculus -> optional second pass with repeat-word removal
  (the Repeats retry, impl.cc:1979-2106).

This is the single-process oracle AND the kernel the Ray actor stage
runs per row — same code, which is what makes pipeline-vs-oracle
equality exact.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import hits, langs, score, spans, uscript as us
from cld2_ray import native
from .extract import extract_text, valid_utf8_prefix
from . import hints as hints_mod
from .hints import hints_from_page
from .repeats import SQUEEZE_TEST_THRESH, remove_repeated_words, squeeze, \
    squeeze_trigger
from cld2_ray.state.model import unpack_langprobs


@dataclass
class Hints:
    tld: str = ""
    content_language: str = ""
    language: str = ""


def _bulk_tote_add(totes: list, doc_of_chunk: np.ndarray,
                   lang1: np.ndarray, cbytes: np.ndarray,
                   s1: np.ndarray, rel: np.ndarray) -> None:
    """Vectorized DocTote fill: chunk streams aggregate per (doc, lang)
    with numpy, then land in each tote in first-seen order. Equivalent
    to per-chunk DocTote.add because add() is pure accumulation until
    the 24-slot cap; any doc whose entry count could reach the cap
    (where eviction order matters) falls back to the sequential loop."""
    m = lang1 != langs.UNKNOWN
    if not m.any():
        return
    doc = doc_of_chunk[m].astype(np.int64)
    lang = lang1[m].astype(np.int64)
    nb = cbytes[m].astype(np.int64)
    sc = s1[m].astype(np.int64)
    rl = rel[m].astype(np.int64)
    rb = rl * nb
    key = doc * np.int64(langs.NUM_LANGS) + lang
    uniq, first_idx, inv = np.unique(key, return_index=True,
                                     return_inverse=True)
    k = len(uniq)
    b_sum = np.zeros(k, np.int64)
    s_sum = np.zeros(k, np.int64)
    r_sum = np.zeros(k, np.int64)
    np.add.at(b_sum, inv, nb)
    np.add.at(s_sum, inv, sc)
    np.add.at(r_sum, inv, rb)
    # first-seen order inside each doc (same dict insertion order as
    # the sequential loop)
    order = np.argsort(first_idx, kind="stable")
    u_doc = (uniq // langs.NUM_LANGS)[order]
    u_lang = (uniq % langs.NUM_LANGS)[order]
    b_sum, s_sum, r_sum = b_sum[order], s_sum[order], r_sum[order]
    n_new = np.bincount(u_doc, minlength=len(totes))
    seq_docs = set()
    for d in np.nonzero(n_new)[0].tolist():
        if len(totes[d].bytes_) + int(n_new[d]) > score.DOC_TOTE_SLOTS:
            seq_docs.add(d)
    if seq_docs:
        for i in range(len(doc)):
            d = int(doc[i])
            if d in seq_docs:
                totes[d].add(int(lang[i]), int(nb[i]), int(sc[i]),
                             int(rl[i]))
    for j in range(k):
        d = int(u_doc[j])
        if d in seq_docs:
            continue
        t = totes[d]
        li = int(u_lang[j])
        t.bytes_[li] = t.bytes_.get(li, 0) + int(b_sum[j])
        t.score[li] = t.score.get(li, 0) + int(s_sum[j])
        t.rel[li] = t.rel.get(li, 0) + int(r_sum[j])


def _one_range(sp, lid: int):
    """Whole-span (start_char, end_char, lid) numpy triple — the
    single-range form non-MANY spans and hitless MANY spans emit."""
    return (np.array([sp.offset], dtype=np.int64),
            np.array([sp.end_offset], dtype=np.int64),
            np.array([lid], dtype=np.int64))


class Detector:
    """Holds the immutable LangModel; one instance per Ray actor
    (stateful-stage pattern, SURVEY.md §2.3)."""

    def __init__(self, model=None, score_as_quads: bool = False,
                 echo: bool = False):
        """score_as_quads: the kCLDFlagScoreAsQuads analogue
        (compact_lang_det.h:342, scoreonescriptspan.cc:1318-1320) —
        scripts normally detected solely by their Unicode script
        (RTypeOne/None) are scored via quadgrams instead (CJK is
        unaffected). echo: the kCLDFlagEcho analogue — write each
        input's first 80 bytes to stderr before scoring."""
        if model is None:
            from cld2_ray.state.model import default_model
            model = default_model()
        self.model = model
        self.score_as_quads = score_as_quads
        self.echo = echo

    @staticmethod
    def _norm_hints(hint_langs):
        """Normalize the public hint argument to per-script-class
        packed payloads (see functions/hints.py payloads):
        - None/empty -> None
        - list[(lang_id, weight)] priors -> payloads(priors)
        - list[int] lang ids (legacy caller hint) -> weight
          LANGUAGE_WEIGHT each (SetCLDLanguageHint,
          hint_code.cc:1503-1506)
        - an already-normalized (latn, othr) tuple passes through."""
        if not hint_langs:
            return None
        if isinstance(hint_langs, tuple) and len(hint_langs) == 2 \
                and all(isinstance(x, list) for x in hint_langs):
            return hint_langs
        if isinstance(hint_langs[0], tuple):
            priors = list(hint_langs)
        else:
            priors = [(int(lid), hints_mod.LANGUAGE_WEIGHT)
                      for lid in hint_langs]
        return hints_mod.payloads(priors)

    def _rtype(self, script: int) -> int:
        rt = us.script_rtype(script)
        if (self.score_as_quads and rt != us.RTYPE_CJK
                and rt != us.RTYPE_MANY):
            return us.RTYPE_MANY
        return rt

    # -- span scoring -------------------------------------------------------

    def _octa_stream(self, cat: bytes, bounds: np.ndarray,
                     latin_of_span: np.ndarray):
        """Word-table hit stream over concatenated MANY spans: the
        GetOctaHits triple per word — distinct-octa word, delta-octa
        word, distinct-octa PairHash at the prior word's offset
        (cldutil.cc:416-533) — decoded per span script class, plus the
        seed-trained word table (model.socta). Emission order at equal
        offsets is [distinct word, delta word, seed word, pair], the
        reference's walk order with the seed stream appended.

        Distinct hits (word + pair) are flagged in the returned mask:
        the chunk scorer re-adds the last <= 4 of them to every
        chunk's tote (the AddDistinctBoost2/ScoreBoosts ring,
        scoreonescriptspan.cc:112-152; ring scoped to the span — the
        reference carries it across a document's scriptspans via
        ScoringContext, a documented deviation)."""
        wh, woff, ph, poff = hits.octa_word_and_pair_hits(
            cat, span_bounds=bounds)
        latw = latin_of_span[np.searchsorted(bounds, woff, side="right")]
        latp = latin_of_span[np.searchsorted(bounds, poff, side="right")]
        xv = self.model.xocta.lookup(wh, latw)
        dv = self.model.docta.lookup(wh, latw)
        sv = self.model.socta.lookup(wh)
        pv = self.model.xocta.lookup(ph, latp)
        vals = np.concatenate([xv, dv, sv, pv])
        offs = np.concatenate([woff, woff, woff, poff])
        rank = np.concatenate([
            np.zeros(len(wh), np.int8), np.ones(len(wh), np.int8),
            np.full(len(wh), 2, np.int8), np.full(len(ph), 3, np.int8)])
        # distinct-octa hits (word + pair) feed the boost ring
        dist = np.concatenate([
            np.ones(len(wh), bool), np.zeros(2 * len(wh), bool),
            np.ones(len(ph), bool)])
        m = vals != 0
        vals, offs, rank, dist = vals[m], offs[m], rank[m], dist[m]
        order = np.lexsort((rank, offs))
        return vals[order], offs[order], dist[order]

    def _many_hits(self, cat: bytes, bounds: np.ndarray,
                   latin_of_span: np.ndarray):
        """Quad+word table hits over concatenated MANY spans, merged by
        offset (quads before word hits at equal offset)."""
        h, off = hits.quad_hits_dense(cat, span_bounds=bounds)
        vals = self.model.quad.lookup(h)
        m = vals != 0
        qv, qo = vals[m], off[m]
        ov, oo, od = self._octa_stream(cat, bounds, latin_of_span)
        all_vals = np.concatenate([qv, ov])
        all_off = np.concatenate([qo, oo])
        all_dist = np.concatenate([np.zeros(len(qv), bool), od])
        order = np.argsort(all_off, kind="stable")
        return all_vals[order], all_off[order], all_dist[order]

    def _score_span(self, sp: spans.ScriptSpan, tote: score.DocTote,
                    hints=None) -> None:
        hints = self._norm_hints(hints)
        rt = self._rtype(sp.script)
        if rt == us.RTYPE_MANY:
            latin = sp.script == us.LATIN
            hp = hints[0 if latin else 1] if hints else None
            sb = sp.text_utf8
            all_vals, all_off, all_dist = self._many_hits(
                sb, np.array([len(sb)], dtype=np.int64),
                np.array([latin]))
            l3, q3 = unpack_langprobs(all_vals)
            c = score.score_chunks(l3, q3, all_off, len(sb),
                                   score.CHUNKSIZE_QUADS,
                                   self.model.expected_quad, hp,
                                   distinct_mask=all_dist,
                                   script4=int(us.LSCRIPT4[sp.script]))
            tote.add_chunks(*c)
        elif rt == us.RTYPE_CJK:
            uni, upos, bi, bpos = hits.cjk_candidates(sp.text)
            uvals = self.model.uni.lookup(uni)
            bvals = self.model.cjkbi.lookup(bi, False)
            all_vals = np.concatenate([uvals[uvals != 0], bvals[bvals != 0]])
            all_pos = np.concatenate([upos[uvals != 0], bpos[bvals != 0]])
            order = np.argsort(all_pos, kind="stable")
            l3, q3 = unpack_langprobs(all_vals[order])
            # positions are char indices; scale to bytes via span length
            c = score.score_chunks(l3, q3, all_pos[order] * 3,
                                   sp.text_bytes, score.CHUNKSIZE_UNIS,
                                   self.model.expected_uni,
                                   hints[1] if hints else None)
            tote.add_chunks(*c)
        elif rt == us.RTYPE_ONE:
            # script implies the language: score = bytes, reliability 100
            # (scoreonescriptspan.cc:1132-1160)
            lid = int(langs.SCRIPT_DEFAULT_LANG[sp.script])
            tote.add(lid, sp.text_bytes, sp.text_bytes, 100)
        # RTYPE_NONE: unsupported script -> ignored

    def _fill_totes(self, doc_spans: list[list[spans.ScriptSpan]],
                    hints_list: list[list[int] | None]) -> list[score.DocTote]:
        """Batch span scorer: all documents' MANY spans score through ONE
        concatenated hit-extraction + table-lookup + chunk pass (same for
        CJK spans). Bit-identical to per-span scoring (the dedupe ring
        and chunking are span-aware), so single-doc detect() routes
        through here too — one code path, oracle == pipeline == batch.
        """
        n_docs = len(doc_spans)
        totes = [score.DocTote() for _ in range(n_docs)]

        many: list[tuple[int, bytes, object, bool]] = []
        cjk: list[tuple[int, spans.ScriptSpan, object]] = []
        hints_list = [self._norm_hints(h) for h in hints_list]
        for di, sl in enumerate(doc_spans):
            hl = hints_list[di]
            for sp in sl:
                rt = self._rtype(sp.script)
                if rt == us.RTYPE_MANY:
                    many.append((di, sp.text_utf8, hl, sp.script))
                elif rt == us.RTYPE_CJK:
                    cjk.append((di, sp, hl))
                elif rt == us.RTYPE_ONE:
                    lid = int(langs.SCRIPT_DEFAULT_LANG[sp.script])
                    totes[di].add(lid, sp.text_bytes, sp.text_bytes, 100)

        if many:
            bufs = [b for _, b, _, _ in many]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            bounds = np.cumsum(lens)
            cat = b"".join(bufs)
            script_of_span = np.array([sc for _, _, _, sc in many],
                                      dtype=np.int64)
            hl_list = [hl[0 if sc == us.LATIN else 1] if hl else None
                       for _, _, hl, sc in many]
            latin_of_span = script_of_span == us.LATIN
            script4_of_span = us.LSCRIPT4[script_of_span]
            if native.AVAILABLE:
                # fused scan + chunk scoring: per-hit arrays never
                # materialize (they are ~1 per 2 text bytes and were
                # the pipeline's dominant memory traffic)
                hint_csr = np.zeros(len(bufs) + 1, dtype=np.int64)
                flat: list[int] = []
                for k, hl in enumerate(hl_list):
                    if hl:
                        flat.extend(hl)
                    hint_csr[k + 1] = len(flat)
                c = native.quad_octa_chunk_score(
                    cat, bounds, self.model.quad, self.model.socta,
                    self.model.docta, self.model.xocta, latin_of_span,
                    score.CHUNKSIZE_QUADS, self.model.expected_quad,
                    langs.CLOSE_SET, hint_csr,
                    np.asarray(flat, dtype=np.int64),
                    script4_of_span)
            else:
                all_vals, all_off, all_dist = self._many_hits(
                    cat, bounds, latin_of_span)
                l3, q3 = unpack_langprobs(all_vals)
                span_of = np.searchsorted(bounds, all_off, side="right")
                c = score.score_chunks_multi(
                    l3, q3, all_off, span_of, starts, lens,
                    np.full(len(bufs), score.CHUNKSIZE_QUADS,
                            dtype=np.int64),
                    self.model.expected_quad, hl_list,
                    distinct_mask=all_dist,
                    script4_of_span=script4_of_span)
            lang1, cbytes, s1, rel, span_of_chunk = c
            docs_of_span = np.array([di for di, _, _, _ in many])
            doc_of_chunk = docs_of_span[span_of_chunk]
            _bulk_tote_add(totes, doc_of_chunk, lang1, cbytes, s1, rel)

        if cjk:
            hl_list = [hl[1] if hl else None for _, _, hl in cjk]
            lens = np.array([sp.text_bytes for _, sp, _ in cjk],
                            dtype=np.int64)
            if native.AVAILABLE:
                bufs = [sp.text_utf8 for _, sp, _ in cjk]
                blens = np.array([len(b) for b in bufs], dtype=np.int64)
                bounds = np.cumsum(blens)
                cat = b"".join(bufs)
                hint_csr = np.zeros(len(bufs) + 1, dtype=np.int64)
                flat: list[int] = []
                for k, hl in enumerate(hl_list):
                    if hl:
                        flat.extend(hl)
                    hint_csr[k + 1] = len(flat)
                c = native.cjk_chunk_score(
                    cat, bounds, lens, self.model.uni, self.model.cjkbi,
                    score.CHUNKSIZE_UNIS, self.model.expected_uni,
                    langs.CLOSE_SET, hint_csr,
                    np.asarray(flat, dtype=np.int64))
            else:
                keys_parts, pos_parts, span_idx_parts = [], [], []
                starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
                for k, (di, sp, hl) in enumerate(cjk):
                    uni, upos, bi, bpos = hits.cjk_candidates(sp.text)
                    uvals = self.model.uni.lookup(uni)
                    bvals = self.model.cjkbi.lookup(bi, False)
                    um, bm = uvals != 0, bvals != 0
                    av = np.concatenate([uvals[um], bvals[bm]])
                    ap = np.concatenate([upos[um], bpos[bm]])
                    o = np.argsort(ap, kind="stable")
                    keys_parts.append(av[o])
                    pos_parts.append(ap[o] * 3 + starts[k])
                    span_idx_parts.append(np.full(len(o), k,
                                                  dtype=np.int64))
                all_vals = np.concatenate(keys_parts)
                all_off = np.concatenate(pos_parts)
                span_of = np.concatenate(span_idx_parts)
                l3, q3 = unpack_langprobs(all_vals)
                c = score.score_chunks_multi(
                    l3, q3, all_off, span_of, starts, lens,
                    np.full(len(cjk), score.CHUNKSIZE_UNIS,
                            dtype=np.int64),
                    self.model.expected_uni, hl_list)
            lang1, cbytes, s1, rel, span_of_chunk = c
            docs_of_span = np.array([di for di, _, _ in cjk])
            doc_of_chunk = docs_of_span[span_of_chunk]
            _bulk_tote_add(totes, doc_of_chunk, lang1, cbytes, s1, rel)
        return totes

    def _fill_totes_ranges(self, doc_spans: list[list[spans.ScriptSpan]],
                           hints_list: list[list[int] | None]):
        """_fill_totes PLUS per-doc raw char ranges from the SAME hit
        scan — the single-pass ResultChunkVector path (the reference
        emits the vector in the same scoring pass it totes,
        scoreonescriptspan.cc:1099-1111, instead of re-detecting).
        Returns (totes, raw_ranges) where raw_ranges[di] is the doc's
        unmerged [(start_char, end_char, code)] list in span order —
        feed through _merge_ranges. Totes are bit-identical to
        _fill_totes (native: same kernel family, first-five outputs
        pinned equal in tests; numpy: the documented span-aware
        score_chunks identity).

        Documented deviation from the standalone detect_ranges API:
        chunk scoring here sees the same per-span hint priors the
        document scoring uses (detect_ranges scores hint-free), so a
        page's chunk vector is consistent with its summary — the
        reference's vector comes from the same hinted pass too."""
        n_docs = len(doc_spans)
        totes = [score.DocTote() for _ in range(n_docs)]
        ranges: list[list] = [[None] * len(sl) for sl in doc_spans]

        many: list[tuple[int, int, spans.ScriptSpan, object]] = []
        cjk: list[tuple[int, int, spans.ScriptSpan, object]] = []
        hints_list = [self._norm_hints(h) for h in hints_list]
        for di, sl in enumerate(doc_spans):
            hl = hints_list[di]
            for pos, sp in enumerate(sl):
                rt = self._rtype(sp.script)
                if rt == us.RTYPE_MANY:
                    many.append((di, pos, sp, hl))
                elif rt == us.RTYPE_CJK:
                    cjk.append((di, pos, sp, hl))
                elif rt == us.RTYPE_ONE:
                    lid = int(langs.SCRIPT_DEFAULT_LANG[sp.script])
                    totes[di].add(lid, sp.text_bytes, sp.text_bytes,
                                  100)
                    ranges[di][pos] = _one_range(sp, lid)
                else:
                    ranges[di][pos] = _one_range(sp, langs.UNKNOWN)

        if many:
            bufs = [sp.text_utf8 for _, _, sp, _ in many]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            bounds = np.cumsum(lens)
            cat = b"".join(bufs)
            script_of_span = np.array([sp.script
                                       for _, _, sp, _ in many],
                                      dtype=np.int64)
            hl_list = [hl[0 if sc == us.LATIN else 1] if hl else None
                       for (_, _, sp, hl), sc
                       in zip(many, script_of_span)]
            latin_of_span = script_of_span == us.LATIN
            script4_of_span = us.LSCRIPT4[script_of_span]
            if native.AVAILABLE:
                hint_csr = np.zeros(len(bufs) + 1, dtype=np.int64)
                flat: list[int] = []
                for k, hl in enumerate(hl_list):
                    if hl:
                        flat.extend(hl)
                    hint_csr[k + 1] = len(flat)
                (lang1, cbytes, s1, rel, span_of_chunk, rel_delta,
                 cstart) = native.quad_octa_chunk_score_ranges(
                    cat, bounds, self.model.quad, self.model.socta,
                    self.model.docta, self.model.xocta, latin_of_span,
                    score.CHUNKSIZE_QUADS, self.model.expected_quad,
                    langs.CLOSE_SET, hint_csr,
                    np.asarray(flat, dtype=np.int64),
                    script4_of_span)
                docs_of_span = np.array([di for di, _, _, _ in many])
                _bulk_tote_add(totes, docs_of_span[span_of_chunk],
                               lang1, cbytes, s1, rel)
                for k, (di, pos, sp, _) in enumerate(many):
                    lo, hi = np.searchsorted(span_of_chunk, [k, k + 1])
                    if lo == hi:
                        ranges[di][pos] = _one_range(sp, langs.UNKNOWN)
                    else:
                        ranges[di][pos] = self._many_span_ranges(
                            sp, lang1[lo:hi], rel_delta[lo:hi],
                            cstart[lo:hi])
            else:
                zeros_exp = np.zeros_like(self.model.expected_quad)
                for k, (di, pos, sp, hl) in enumerate(many):
                    sb = sp.text_utf8
                    hp = hl_list[k]
                    vals, offs, rdist = self._many_hits(
                        sb, np.array([len(sb)], dtype=np.int64),
                        np.array([latin_of_span[k]]))
                    if len(vals) == 0:
                        ranges[di][pos] = _one_range(sp, langs.UNKNOWN)
                        continue
                    l3, q3 = unpack_langprobs(vals)
                    s4 = int(script4_of_span[k])
                    c = score.score_chunks(
                        l3, q3, offs, len(sb), score.CHUNKSIZE_QUADS,
                        self.model.expected_quad, hp,
                        distinct_mask=rdist, script4=s4)
                    totes[di].add_chunks(*c)
                    lang1, _cb, _s1, rel_d = score.score_chunks(
                        l3, q3, offs, len(sb), score.CHUNKSIZE_QUADS,
                        zeros_exp, hp, distinct_mask=rdist,
                        script4=s4)
                    bidx = self._sharpen_boundaries(
                        lang1, l3, q3, score.CHUNKSIZE_QUADS,
                        len(offs))
                    ranges[di][pos] = self._many_span_ranges(
                        sp, lang1, rel_d, offs[bidx])

        if cjk:
            hl_list = [hl[1] if hl else None for _, _, _, hl in cjk]
            lens = np.array([sp.text_bytes for _, _, sp, _ in cjk],
                            dtype=np.int64)
            if native.AVAILABLE:
                bufs = [sp.text_utf8 for _, _, sp, _ in cjk]
                blens = np.array([len(b) for b in bufs],
                                 dtype=np.int64)
                bounds = np.cumsum(blens)
                cat = b"".join(bufs)
                hint_csr = np.zeros(len(bufs) + 1, dtype=np.int64)
                flat2: list[int] = []
                for k, hl in enumerate(hl_list):
                    if hl:
                        flat2.extend(hl)
                    hint_csr[k + 1] = len(flat2)
                c = native.cjk_chunk_score(
                    cat, bounds, lens, self.model.uni,
                    self.model.cjkbi, score.CHUNKSIZE_UNIS,
                    self.model.expected_uni, langs.CLOSE_SET,
                    hint_csr, np.asarray(flat2, dtype=np.int64))
            else:
                keys_parts, pos_parts, span_idx_parts = [], [], []
                starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
                for k, (_, _, sp, _) in enumerate(cjk):
                    uni, upos, bi, bpos = hits.cjk_candidates(sp.text)
                    uvals = self.model.uni.lookup(uni)
                    bvals = self.model.cjkbi.lookup(bi, False)
                    um, bm = uvals != 0, bvals != 0
                    av = np.concatenate([uvals[um], bvals[bm]])
                    ap = np.concatenate([upos[um], bpos[bm]])
                    o = np.argsort(ap, kind="stable")
                    keys_parts.append(av[o])
                    pos_parts.append(ap[o] * 3 + starts[k])
                    span_idx_parts.append(np.full(len(o), k,
                                                  dtype=np.int64))
                all_vals = np.concatenate(keys_parts)
                all_off = np.concatenate(pos_parts)
                span_of = np.concatenate(span_idx_parts)
                l3, q3 = unpack_langprobs(all_vals)
                c = score.score_chunks_multi(
                    l3, q3, all_off, span_of, starts, lens,
                    np.full(len(cjk), score.CHUNKSIZE_UNIS,
                            dtype=np.int64),
                    self.model.expected_uni, hl_list)
            lang1, cbytes, s1, rel, span_of_chunk = c
            docs_of_span = np.array([di for di, _, _, _ in cjk])
            _bulk_tote_add(totes, docs_of_span[span_of_chunk],
                           lang1, cbytes, s1, rel)
            # per-span majority language for the range (detect_ranges'
            # fresh-tote-per-span semantics, exact incl. the 24-slot
            # eviction rule)
            for k, (di, pos, sp, _) in enumerate(cjk):
                lo, hi = np.searchsorted(span_of_chunk, [k, k + 1])
                t = score.DocTote()
                t.add_chunks(lang1[lo:hi], cbytes[lo:hi], s1[lo:hi],
                             rel[lo:hi])
                if t.bytes_:
                    lid = max(t.bytes_,
                              key=lambda x: (t.bytes_[x], -x))
                    rp = t.rel[lid] // max(t.bytes_[lid], 1)
                    lid = lid if rp >= 41 else langs.UNKNOWN
                else:
                    lid = langs.UNKNOWN
                ranges[di][pos] = _one_range(sp, lid)

        return totes, ranges

    def _finalize(self, tote: score.DocTote, total_letter_bytes: int,
                  best_effort: bool,
                  declared=None) -> score.DetectResult:
        score.refine_close_pairs(tote)
        if not best_effort:
            # best-effort skips unreliable-language removal
            # (impl.cc:1998 "if (!FlagBestEffort(flags))")
            score.remove_unreliable(tote)
        language3, percent3, nscore3, total, is_rel = \
            score.extract_lang_etc(tote, total_letter_bytes)
        summary, rel2 = score.calc_summary_lang(language3, percent3, total,
                                                best_effort, declared)
        return score.DetectResult(
            summary_lang=summary,
            language3=tuple(language3),
            percent3=tuple(percent3),
            normalized_score3=tuple(nscore3),
            text_bytes=total,
            is_reliable=is_rel and rel2,
        )

    def _detect_spans(self, span_list: list[spans.ScriptSpan],
                      total_letter_bytes: int,
                      best_effort: bool,
                      hint_langs: list[int] | None = None,
                      declared=None) -> score.DetectResult:
        tote = self._fill_totes([span_list], [hint_langs])[0]
        return self._finalize(tote, total_letter_bytes, best_effort,
                              declared)

    # -- public API ---------------------------------------------------------

    def detect_batch(self, texts: list[str],
                     hints_list: list[list[int] | None] | None = None,
                     best_effort: bool = False,
                     default_to_english: bool = False,
                     declared_list=None, with_ranges: bool = False):
        """Batch detection: one concatenated scoring pass for the whole
        batch (same results as per-document detect()).

        declared_list: per-doc sets of page-declared lang ids (see
        calc_summary_lang); None = reference-exact summaries.

        with_ranges=True additionally returns per-doc language ranges
        [(byte_offset, byte_len, code), ...] computed from the SAME
        scoring pass (results, ranges) — the single-pass
        ResultChunkVector path; results are bit-identical to
        with_ranges=False. Squeeze-triggered docs (rare junk pages)
        fall back to the standalone detect_ranges on the raw text,
        since the main pass scores their squeezed rewrite whose
        offsets don't map back."""
        n = len(texts)
        if hints_list is None:
            hints_list = [None] * n
        if declared_list is None:
            declared_list = [None] * n
        if self.echo:
            import sys
            for t in texts:
                print(f"[cld2_ray echo] {(t or '')[:80]!r}",
                      file=sys.stderr)
        orig_texts = texts
        squeezed = [bool(t and len(t) > SQUEEZE_TEST_THRESH
                         and squeeze_trigger(t)) for t in texts]
        texts = [squeeze(t) if sq else (t or "")
                 for t, sq in zip(texts, squeezed)]
        doc_spans = spans.script_spans_batch(texts)
        totals = [sum(sp.text_bytes for sp in sl) for sl in doc_spans]
        if with_ranges:
            totes, raw_ranges = self._fill_totes_ranges(doc_spans,
                                                        hints_list)
        else:
            totes = self._fill_totes(doc_spans, hints_list)
        out: list[score.DetectResult] = []
        retry: list[int] = []
        for i in range(n):
            res = self._finalize(totes[i], totals[i], best_effort,
                                 declared_list[i])
            good = (totals[i] <= score.SHORT_TEXT_THRESH
                    or (res.is_reliable
                        and res.percent3[0] >= score.GOOD_LANG1_PERCENT)
                    or (res.is_reliable
                        and res.percent3[0] + res.percent3[1]
                        >= score.GOOD_LANG1AND2_PERCENT))
            if not good:
                retry.append(i)
            elif default_to_english and res.summary_lang == langs.UNKNOWN:
                res.summary_lang = langs.ENGLISH
            out.append(res)
        if retry:
            # Repeats retry (impl.cc:1979-2106) for every not-good doc
            # in ONE more batch pass. texts[] is already squeezed, so
            # this equals per-doc detect() — except the rare doc where
            # squeeze_trigger fires AGAIN on its own output; those take
            # the per-doc path to stay bit-identical.
            batched: list[int] = []
            for i in retry:
                t = texts[i] or ""
                if len(t) > SQUEEZE_TEST_THRESH and squeeze_trigger(t):
                    out[i] = self.detect(t, best_effort, hints_list[i],
                                         default_to_english,
                                         declared_list[i])
                else:
                    batched.append(i)
            if batched:
                spans2 = [[spans.ScriptSpan(remove_repeated_words(sp.text),
                                            sp.script, sp.offset,
                                            sp.text_bytes)
                           for sp in doc_spans[i]] for i in batched]
                totals2 = [max(sum(len(sp.text_utf8) for sp in sl), 1)
                           for sl in spans2]
                totes2 = self._fill_totes(
                    spans2, [hints_list[i] for i in batched])
                for k, i in enumerate(batched):
                    res2 = self._finalize(totes2[k], totals2[k],
                                          best_effort, declared_list[i])
                    res = out[i]
                    res = res2 if (res2.summary_lang != langs.UNKNOWN
                                   or res.summary_lang == langs.UNKNOWN) \
                        else res
                    if default_to_english and \
                            res.summary_lang == langs.UNKNOWN:
                        res.summary_lang = langs.ENGLISH
                    out[i] = res
        if with_ranges:
            rng = [self.detect_ranges(orig_texts[i] or "")
                   if squeezed[i]
                   else self._merge_ranges(texts[i], raw_ranges[i])
                   for i in range(n)]
            return out, rng
        return out

    def detect(self, text: str, best_effort: bool = False,
               hint_langs: list[int] | None = None,
               default_to_english: bool = False,
               declared=None) -> score.DetectResult:
        """Detect language(s) of already-extracted plain text.

        hint_langs: language-prior hints (see functions/hints.py).
        default_to_english: the non-Ext entry-point behavior
        (UNKNOWN -> ENGLISH, compact_lang_det.cc:90-94).
        declared: page-declared lang ids (see calc_summary_lang);
        None = reference-exact summary.
        """
        # CheapSqueeze pre-pass (impl.cc:1867-1901): long repetitive
        # documents are squeezed before scoring
        if len(text) > SQUEEZE_TEST_THRESH and squeeze_trigger(text):
            text = squeeze(text)
        span_list = spans.script_spans(text)
        total = sum(sp.text_bytes for sp in span_list)
        res = self._detect_spans(span_list, total, best_effort, hint_langs,
                                 declared)

        # Retry controller (impl.cc:1979-2106): accept if short, or
        # reliable & dominant; else one more pass with repeat-word
        # removal (the Repeats flag path).
        good = (total <= score.SHORT_TEXT_THRESH
                or (res.is_reliable and res.percent3[0] >= score.GOOD_LANG1_PERCENT)
                or (res.is_reliable and res.percent3[0] + res.percent3[1]
                    >= score.GOOD_LANG1AND2_PERCENT))
        if good:
            if default_to_english and res.summary_lang == langs.UNKNOWN:
                res.summary_lang = langs.ENGLISH
            return res
        squeezed = [spans.ScriptSpan(remove_repeated_words(sp.text),
                                     sp.script, sp.offset, sp.text_bytes)
                    for sp in span_list]
        total2 = sum(len(sp.text_utf8) for sp in squeezed)
        res2 = self._detect_spans(squeezed, max(total2, 1), best_effort,
                                  hint_langs, declared)
        # keep the retry result if it reached a conclusion (impl.cc accepts
        # the second-pass answer unconditionally)
        res = res2 if res2.summary_lang != langs.UNKNOWN or \
            res.summary_lang == langs.UNKNOWN else res
        if default_to_english and res.summary_lang == langs.UNKNOWN:
            res.summary_lang = langs.ENGLISH
        return res

    @staticmethod
    def _sharpen_boundaries(lang1: np.ndarray, l3: np.ndarray,
                            q3: np.ndarray, chunk_size: int,
                            nh: int) -> np.ndarray:
        """SharpenBoundaries / BetterBoundary port (reference:
        scoreonescriptspan.cc:671-774 + :781-845): for each chunk whose
        top language differs from the previous chunk's (and is not in
        the same close set), slide an 8-hit window of per-hit
        score(lang0)-score(lang1) differences over
        [prior_start, next_start) and move the boundary to the point
        maximizing (first-4 diffs) - (last-4 diffs), requiring both
        positive and negative diffs in the window.

        Returns the per-chunk boundary HIT index (default k*chunk_size).
        """
        nch = len(lang1)
        bidx = np.minimum(np.arange(nch) * chunk_size, nh - 1)
        prior_linear = 0
        for k in range(1, nch):
            this_linear = k * chunk_size
            next_linear = (k + 1) * chunk_size if k + 1 < nch else nh
            lang0, langk = int(lang1[k - 1]), int(lang1[k])
            if langk == lang0:
                prior_linear = this_linear
                continue
            cs0 = int(langs.CLOSE_SET[lang0])
            if cs0 > 0 and cs0 == int(langs.CLOSE_SET[langk]):
                prior_linear = this_linear
                continue
            linear0, linear2 = prior_linear, next_linear
            if linear2 - linear0 > 8:
                # per-hit score difference lang0 - lang1 from the
                # decoded langprob lanes (GetLangScore analogue)
                sl3 = l3[linear0:linear2]
                sq3 = q3[linear0:linear2]
                d = ((sq3 * (sl3 == lang0)).sum(axis=1)
                     - (sq3 * (sl3 == langk)).sum(axis=1)).astype(np.int64)
                c = np.concatenate([[0], np.cumsum(d)])
                n = len(d)
                # running[i] = sum(d[i:i+4]) - sum(d[i+4:i+8]),
                # window start i in [0, n-8)
                i_arr = np.arange(0, n - 8)
                running = (c[i_arr + 4] - c[i_arr]) \
                    - (c[i_arr + 8] - c[i_arr + 4])
                pos = d > 0
                neg = d < 0
                cp = np.concatenate([[0], np.cumsum(pos)])
                cn = np.concatenate([[0], np.cumsum(neg)])
                has_pm = ((cp[i_arr + 8] - cp[i_arr]) > 0) \
                    & ((cn[i_arr + 8] - cn[i_arr]) > 0)
                # first strictly-better maximum, matching the
                # sequential scan's "<" update rule
                cand = np.where(has_pm, running, np.iinfo(np.int64).min)
                best = int(np.argmax(cand))
                if cand[best] > 0:
                    this_linear = linear0 + best + 4
            bidx[k] = this_linear
            prior_linear = this_linear
        return bidx

    @staticmethod
    def _many_span_ranges(sp, lang1, rel, starts_b):
        """Per-chunk arrays -> (start_char, end_char, lid) numpy
        triple for one MANY span: back boundaries up to the start of
        their word (ItemToVector semantics,
        scoreonescriptspan.cc:323-360) and gate unreliable chunks to
        UNKNOWN. Shared by detect_ranges and the single-pass batch
        ranges path. ``starts_b`` are span-local byte offsets of each
        chunk's (sharpened) first hit; the triples stay numpy until
        _merge_ranges converts the few MERGED ranges to tuples."""
        nch = len(lang1)
        lids = np.where(np.asarray(rel) >= 41,
                        np.asarray(lang1, dtype=np.int64),
                        langs.UNKNOWN)
        if nch == 1:
            # single-chunk span (common): the range is the whole span
            # — k=0 uses sp.offset and the last chunk ends at
            # sp.end_offset, so the word-backup math is moot
            return (np.array([sp.offset], dtype=np.int64),
                    np.array([sp.end_offset], dtype=np.int64), lids)
        sb = sp.text_utf8
        arr = np.frombuffer(sb, dtype=np.uint8)
        cstart = np.flatnonzero((arr & 0xC0) != 0x80)
        letter_byte_starts = cstart[arr[cstart] != 0x20]
        lpos = np.asarray(sp.letter_pos)
        li = np.searchsorted(letter_byte_starts, starts_b,
                             side="right") - 1
        li = np.clip(li, 0, len(lpos) - 1)
        # back boundaries up to the start of their word — dense
        # sampling can land a chunk start mid-word
        gapmask = np.concatenate([[True],
                                  lpos[1:] != lpos[:-1] + 1])
        word_start_of = np.maximum.accumulate(
            np.where(gapmask, np.arange(len(lpos)), 0))
        chunk_char = lpos[word_start_of[li]].astype(np.int64)
        starts = chunk_char.copy()
        starts[0] = sp.offset
        ends = np.concatenate([chunk_char[1:], [sp.end_offset]])
        return starts, ends, lids

    @staticmethod
    def _merge_ranges(text: str, parts) -> list[tuple[int, int, str]]:
        """Concatenate per-span (start_char, end_char, lid) triples,
        merge adjacent same-language ranges, and convert to
        original-text BYTE offsets (detect_ranges' tail)."""
        parts = [p for p in parts if len(p[0])]
        if not parts or not text:
            return []
        starts = np.concatenate([p[0] for p in parts])
        ends = np.concatenate([p[1] for p in parts])
        lids = np.concatenate([p[2] for p in parts])
        keep = np.concatenate([[True], lids[1:] != lids[:-1]])
        ki = np.flatnonzero(keep)
        ms = starts[ki]
        me = np.concatenate([ends[ki[1:] - 1], [ends[-1]]])
        # char -> byte offsets: the merged ranges are FEW, so one
        # incremental prefix encode over the sorted positions (total
        # work = one pass over the text) beats a full per-codepoint
        # utf-8-length cumsum
        pos = np.concatenate([ms, me])
        order = np.argsort(pos, kind="stable")
        out_b = np.empty(len(pos), dtype=np.int64)
        b = 0
        last = 0
        for idx in order:
            p = int(pos[idx])
            if p > last:
                b += len(text[last:p].encode("utf-8"))
                last = p
            out_b[idx] = b
        k = len(ms)
        return [(int(a), int(e - a), langs.lang_code(int(li)))
                for a, e, li in zip(out_b[:k], out_b[k:], lids[ki])]

    def detect_ranges(self, text: str) -> list[tuple[int, int, str]]:
        """Per-document language ranges in ORIGINAL text BYTE offsets —
        the ResultChunkVector analogue (reference: SummaryBufferToVector,
        scoreonescriptspan.cc:389-509 + offset back-mapping
        getonescriptspan.cc:1076-1078).

        MANY-script spans split at chunk granularity, then boundaries
        between different-language chunks are refined with the 8-hit
        BetterBoundary slide (_sharpen_boundaries) and backed up to the
        start of their word (ItemToVector semantics). Adjacent
        same-language ranges merge; unreliable chunks report "un".

        Returns [(byte_offset, byte_len, lang_code), ...].
        """
        if us.codepoints(text).size == 0:
            return []

        raw: list = []   # per-span (start_char, end_char, lid) triples
        for sp in spans.script_spans(text):
            rt = self._rtype(sp.script)
            if rt == us.RTYPE_MANY:
                sb = sp.text.encode("utf-8")
                vals, offs, rdist = self._many_hits(
                    sb, np.array([len(sb)], dtype=np.int64),
                    np.array([sp.script == us.LATIN]))
                if len(vals) == 0:
                    raw.append(_one_range(sp, langs.UNKNOWN))
                    continue
                l3, q3 = unpack_langprobs(vals)
                # delta-reliability only for the per-chunk "un" gate:
                # the expected-rate check (exact 1.5x/4.0x ramp) is a
                # DOCUMENT-level calibration signal; at single-chunk
                # granularity in-vocabulary text overshoots the 4x
                # high cutoff and would shred one-language documents
                # into un fragments (expected=0 means "no estimate"
                # -> rel_e=100 -> rel=rel_delta)
                lang1, _cb, _s1, rel = score.score_chunks(
                    l3, q3, offs, len(sb), score.CHUNKSIZE_QUADS,
                    np.zeros_like(self.model.expected_quad),
                    distinct_mask=rdist,
                    script4=int(us.LSCRIPT4[sp.script]))
                bidx = self._sharpen_boundaries(
                    lang1, l3, q3, score.CHUNKSIZE_QUADS, len(offs))
                raw.append(self._many_span_ranges(sp, lang1, rel,
                                                  offs[bidx]))
            else:
                tote = score.DocTote()
                self._score_span(sp, tote)
                if tote.bytes_:
                    lid = max(tote.bytes_,
                              key=lambda k: (tote.bytes_[k], -k))
                    rp = tote.rel[lid] // max(tote.bytes_[lid], 1)
                    lid = lid if rp >= 41 else langs.UNKNOWN
                else:
                    lid = langs.UNKNOWN
                raw.append(_one_range(sp, lid))
        return self._merge_ranges(text, raw)

    def detect_ranges_html(self, html: bytes) -> list[tuple[int, int, str]]:
        """Language ranges in RAW PAGE byte offsets: extraction builds
        an OffsetMap (extract_text_with_map) and the text-level ranges
        compose through it — the reference's map2original chain."""
        from .extract import extract_text_with_map
        vp = valid_utf8_prefix(html)
        text, om = extract_text_with_map(html[:vp])
        ranges = self.detect_ranges(text)
        if not ranges:
            return []
        starts = np.array([r[0] for r in ranges], dtype=np.int64)
        ends = np.array([r[0] + r[1] for r in ranges], dtype=np.int64)
        o_start = om.to_original(starts)
        o_end = om.to_original(ends)
        return [(int(a), int(b - a), r[2])
                for a, b, r in zip(o_start, o_end, ranges)]

    def detect_html(self, html: bytes,
                    url: str = "") -> tuple[score.DetectResult, str, int]:
        """UTF-8 gate + extraction + detection for raw page bytes.
        Hints (lang= attrs, Content-Language, TLD) are derived from the
        raw page. Returns (result, extracted_text, valid_prefix_bytes)."""
        vp = valid_utf8_prefix(html)
        if vp < len(html):
            # invalid UTF-8 input -> UNKNOWN, like
            # ExtDetectLanguageSummaryCheckUTF8 (compact_lang_det.cc:317-334)
            text = extract_text(html[:vp]) if vp else ""
            return (score.DetectResult(langs.UNKNOWN,
                                       (langs.UNKNOWN,) * 3, (0, 0, 0),
                                       (0.0, 0.0, 0.0), vp, False),
                    text, vp)
        text = extract_text(html)
        hl = (hints_mod.priors_from_page(url, html)
              if (url or html) else None)
        return self.detect(text, hint_langs=hl), text, vp
