"""Hint derivation/application, corpus evaluation, language ranges."""

import pandas as pd

from cld2_ray.data.seeds import HELDOUT
from cld2_ray.functions import langs
from cld2_ray.functions.hints import TLD_HINTS, hints_from_page, tld_of
from cld2_ray.functions.langid import Detector
from cld2_ray.pipelines.evaluate import precision_recall


class TestHintDerivation:
    def test_tld(self):
        assert tld_of("https://example.de/page") == "de"
        assert tld_of("https://sub.host.co.jp:8080/x") == "jp"
        assert tld_of("garbage") == ""

    def test_lang_attr(self):
        h = hints_from_page("https://x.com/", b'<html lang="fr"><body>')
        assert h == [langs.lang_id("fr")]

    def test_content_language_meta(self):
        h = hints_from_page(
            "https://x.com/",
            b'<meta http-equiv="Content-Language" content="de">')
        assert langs.lang_id("de") in h

    def test_tld_hint(self):
        h = hints_from_page("https://site.example.se/x", b"<html>")
        assert h == [langs.lang_id("sv")]

    def test_scan_limit_8kb(self):
        html = b"x" * 9000 + b'<html lang="fr">'
        assert hints_from_page("https://a.com/", html) == []

    def test_dedup_and_order(self):
        html = b'<html lang="fr"><meta http-equiv="content-language" content="fr">'
        h = hints_from_page("https://a.fr/x", html)
        assert h == [langs.lang_id("fr")]


class TestHintApplication:
    def test_hint_tips_close_decision(self):
        d = Detector()
        # short ambiguous text in the cs/sk close pair: a hint decides it
        text = HELDOUT["cs"]
        base = d.detect(text)
        hinted = d.detect(text, hint_langs=[langs.lang_id("cs")])
        assert hinted.summary_code == "cs"
        # hint for an absent language must not fabricate evidence
        ja_hint = d.detect(text, hint_langs=[langs.lang_id("ja")])
        assert ja_hint.summary_code != "ja"

    def test_default_to_english(self):
        d = Detector()
        r = d.detect("12345 !!!", default_to_english=True)
        assert r.summary_code == "en"


class TestRanges:
    def test_multilingual_ranges(self):
        d = Detector()
        text = (HELDOUT["fr"] + " ") * 3 + (HELDOUT["ru"] + " ") * 3
        ranges = d.detect_ranges(text)
        assert [r[2] for r in ranges] == ["fr", "ru"]
        assert ranges[0][0] == 0

    def test_single_lang_merged(self):
        d = Detector()
        ranges = d.detect_ranges((HELDOUT["en"] + " ") * 4)
        assert len(ranges) == 1
        assert ranges[0][2] == "en"


class TestEvaluate:
    def test_precision_recall(self):
        conf = pd.DataFrame([
            {"lang_true": "en", "lang_pred": "en", "n": 90},
            {"lang_true": "en", "lang_pred": "fr", "n": 10},
            {"lang_true": "fr", "lang_pred": "fr", "n": 80},
            {"lang_true": "fr", "lang_pred": "un", "n": 20},
        ])
        out = precision_recall(conf)
        en = out[out.lang == "en"].iloc[0]
        assert en.recall == 0.9
        assert en.precision == 1.0
        fr = out[out.lang == "fr"].iloc[0]
        assert fr.recall == 0.8
        assert abs(fr.precision - 80 / 90) < 1e-3
        tot = out[out.lang == "_Totals_Known"].iloc[0]
        assert tot.support == 200

    def test_end_to_end_eval(self, ray_session):
        from cld2_ray.pipelines import flagship
        from cld2_ray.pipelines.evaluate import evaluate
        from cld2_ray.sources.pages import pages_dataset
        ann = flagship.build(pages_dataset(100, seed=42))
        out = evaluate(ann)
        tot = out[out.lang == "_Totals_Known"].iloc[0]
        assert tot.f1 > 0.75  # junk/bad-utf8 pages depress this by design


class TestEncodingHint:
    def test_charset_supplies_hint(self):
        h = hints_from_page(
            "https://x.com/",
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=Shift_JIS">')
        assert h == [langs.lang_id("ja")]

    def test_universal_charset_no_hint(self):
        h = hints_from_page(
            "https://x.com/", b'<meta charset="utf-8">')
        assert h == []

    def test_order_after_lang_attr(self):
        h = hints_from_page(
            "https://x.com/",
            b'<html lang="ru"><meta charset="euc-kr">')
        assert h == [langs.lang_id("ru"), langs.lang_id("ko")]


class TestBetterBoundary:
    """SharpenBoundaries port (scoreonescriptspan.cc:671-845): the
    boundary between two glued languages lands near the true
    transition, not at chunk granularity."""

    def test_boundary_sharpened_to_transition(self):
        from cld2_ray.data.seeds import SEEDS
        from cld2_ray.functions.langid import Detector
        d = Detector()
        en = SEEDS["en"][:600]
        de = SEEDS["de"][:600]
        text = en + " " + de
        ranges = d.detect_ranges(text)
        true_b = len(en.encode("utf-8"))
        codes = [c for _, _, c in ranges]
        assert "en" in codes and "de" in codes
        # the en->de boundary: start of the first de range
        de_start = next(off for off, _, c in ranges if c == "de")
        # chunk-granular placement could be off by a whole chunk
        # (~40 hits ~ 200+ bytes of dense sampling); sharpened must
        # land within a couple of words of the true transition
        assert abs(de_start - true_b) <= 48, (de_start, true_b)

    def test_single_language_unchanged(self):
        from cld2_ray.data.seeds import SEEDS
        from cld2_ray.functions.langid import Detector
        d = Detector()
        ranges = d.detect_ranges(SEEDS["en"][:800])
        assert len(ranges) == 1
        assert ranges[0][2] == "en"


class TestLangAttrScanEquivalence:
    """The find()-seeded anchored lang-attr scan must reproduce
    _LANG_ATTR_RE.finditer exactly, including non-overlap resume
    semantics (values like 'xml'/'lan' followed by '=' nest matches)."""

    def test_fuzz_vs_finditer(self):
        import random
        from cld2_ray.functions.hints import _LANG_ATTR_RE, _iter_lang_attrs
        random.seed(7)
        alphabet = [b"lang", b"xml:lang", b"=", b'"', b"'", b" ", b"en",
                    b"de-DE", b"xx_abcdefgh", b"hreflang", b"language",
                    b"<link hreflang='es'>", b"LANG", b"XML:LANG", b"a",
                    b"-", b"_", b":", b"langlang=fr", b"\n",
                    b"content-language", b"xml", b"lan="]
        for _ in range(8000):
            s = b"".join(random.choice(alphabet)
                         for _ in range(random.randint(1, 14)))
            a = [(m.span(), m.group(1)) for m in _LANG_ATTR_RE.finditer(s)]
            b = [(m.span(), m.group(1)) for m in _iter_lang_attrs(s)]
            assert a == b, s


class TestHintStrengths:
    """Per-entry packed prior strengths (verdict r2 item 8): parsed
    from compact_lang_det_hint_code.cc tables rather than one flat
    boost."""

    def test_lang_attr_outweighs_tld(self):
        """lang= carries W10, a TLD carries W2..W8 ('lang= always
        overcomes tld', hint_code.cc:44-45): with both present, the
        lang= language must hold the larger weight after the merge."""
        from cld2_ray.functions.hints import priors_from_page
        pri = dict(priors_from_page("https://x.se/", b'<html lang="fr">'))
        fr, sv = langs.lang_id("fr"), langs.lang_id("sv")
        assert pri[fr] == 10          # W10 from the lang-tag table
        assert 0 < pri[sv] < pri[fr]  # W4-ish from the TLD table

    def test_tld_secondary_negative_weight(self):
        """tld .ba carries BOSNIAN+W8, CROATIAN-W4 — the negative
        prior is kept (it blocks the close-set whack of hr) but never
        boosts."""
        from cld2_ray.functions.hints import payloads, priors_from_page
        pri = priors_from_page("https://x.ba/", b"<html>")
        d = dict(pri)
        assert d[langs.lang_id("bs")] == 8
        assert d[langs.lang_id("hr")] == -4
        latn, _ = payloads(pri)
        boosted = [v & 0xFFFF for v in latn if v >= 0]
        assert langs.lang_id("hr") not in boosted

    def test_close_set_whack_on_single_member(self):
        """A lone hinted close-set member whacks its siblings
        (ApplyHints, impl.cc:1656-1683): hinting cs suppresses sk."""
        from cld2_ray.functions.hints import payloads
        cs, sk = langs.lang_id("cs"), langs.lang_id("sk")
        latn, _ = payloads([(cs, 10)])
        assert (cs | (10 << 16)) in latn
        assert -sk in latn
        # whacks come after boosts (ScoreBoosts order)
        assert latn.index(-sk) > latn.index(cs | (10 << 16))

    def test_no_whack_when_two_members_hinted(self):
        from cld2_ray.functions.hints import payloads
        cs, sk = langs.lang_id("cs"), langs.lang_id("sk")
        latn, _ = payloads([(cs, 10), (sk, 10)])
        assert -sk not in latn and -cs not in latn

    def test_script_class_gating(self):
        """A hint only reaches spans whose script class can carry the
        language (AddLangPriorBoost, impl.cc:1524-1543): ja never
        boosts Latin spans; fr never boosts non-Latin spans."""
        from cld2_ray.functions.hints import payloads
        ja, fr = langs.lang_id("ja"), langs.lang_id("fr")
        latn, othr = payloads([(ja, 8), (fr, 8)])
        assert (ja | (8 << 16)) not in latn
        assert (ja | (8 << 16)) in othr
        assert (fr | (8 << 16)) in latn
        assert (fr | (8 << 16)) not in othr

    def test_whack_tips_close_pair_detection(self):
        """End to end: a cs hint on cs/sk-ambiguous text must both
        boost cs and zero sk chunk scores."""
        d = Detector()
        text = HELDOUT["cs"]
        hinted = d.detect(text, hint_langs=[(langs.lang_id("cs"), 10)])
        assert hinted.summary_code == "cs"
        assert langs.lang_id("sk") not in hinted.language3

    def test_encoding_weight(self):
        from cld2_ray.functions.hints import priors_from_page
        pri = dict(priors_from_page(
            "https://x.com/", b'<meta charset="euc-kr">'))
        assert pri[langs.lang_id("ko")] == 4   # kCLDPriorEncodingWeight
