"""Script-span segmentation tests (GetOneScriptSpan analogue)."""

from cld2_ray.functions import uscript as us
from cld2_ray.functions.spans import script_spans


def test_single_latin_span():
    spans = script_spans("Hello, World! 123")
    assert len(spans) == 1
    s = spans[0]
    assert s.script == us.LATIN
    assert s.text == " hello world "


def test_mixed_scripts_split():
    spans = script_spans("hello мир κόσμος")
    assert [s.script for s in spans] == [us.LATIN, us.CYRILLIC, us.GREEK]
    assert spans[0].text == " hello "
    assert spans[1].text == " мир "
    assert spans[2].text == " κόσμος "


def test_digits_and_punct_collapse():
    spans = script_spans("one 2 three... four!")
    assert len(spans) == 1
    assert spans[0].text == " one three four "


def test_cjk_merged():
    spans = script_spans("日本語 ひらがな カタカナ 한국어")
    assert len(spans) == 1
    assert spans[0].script == us.HANI


def test_empty_and_nonletter():
    assert script_spans("") == []
    assert script_spans("123 ... !!!") == []


def test_lowercasing():
    spans = script_spans("HELLO ПРИВЕТ")
    assert spans[0].text == " hello "
    assert spans[1].text == " привет "


def test_giant_span_splits_at_40kb():
    word = "abcdefg "
    text = word * 8000  # ~64 KB
    spans = script_spans(text, text_limit=10**9)
    assert len(spans) >= 2
    for s in spans:
        assert s.text_bytes <= 40960 + 8


def test_text_limit_caps_scan():
    text = "word " * 100
    spans = script_spans(text, text_limit=50)
    total_letters = sum(s.text_bytes for s in spans)
    assert total_letters < 100


class TestSingleForeignLetter:
    """getonescriptspan.cc:905-930 comment-table cases:
    AAA(BA continue, AAA(BB break, AAA(Bc continue."""

    def test_foreign_then_nonletter_absorbed(self):
        # "Bc": lone Cyrillic letter followed by a space joins the span
        out = script_spans("hello и world again")
        assert len(out) == 1
        assert out[0].script == 1  # Latin
        assert "и" in out[0].text

    def test_foreign_then_spanscript_absorbed(self):
        # "BA": foreign letter directly followed by span-script letter
        out = script_spans("wordБword another")
        assert len(out) == 1
        assert "б" in out[0].text  # absorbed AND pin-lowercased

    def test_two_foreign_break(self):
        # "BB": two consecutive foreign letters break the span
        out = script_spans("hello из world again")
        assert [s.script for s in out] == [1, 2, 1]

    def test_foreign_then_third_script_breaks(self):
        # "BD": foreign letter adjacent to ANOTHER script's letter
        out = script_spans("helloБγδ more")
        assert out[0].script == 1
        assert len(out) >= 2


class TestPinnedLowercase:
    def test_simple_1to1_only(self):
        from cld2_ray.functions import uscript as us
        lut = us.lower_lut()
        assert lut[ord("A")] == ord("a")
        assert lut[0x0419] == 0x0439          # Й -> й
        assert lut[0x0391] == 0x03B1          # Α -> α
        assert lut[0x0130] == ord("i")        # İ -> i (reference replace
        #                                         table maps it 1:1, unlike
        #                                         Python's 2-cp casefold)
        assert lut[0x10A0] == 0x2D00          # Ⴀ -> ⴀ (Georgian)
        # non-cased-script identity (Thai, Han)
        assert lut[0x0E01] == 0x0E01
        assert lut[0x4E00] == 0x4E00

    def test_length_never_changes(self):
        t = "İstanbul STRASSE ΑΘΗΝΑ Москва"
        out = script_spans(t)
        assert sum(s.text_bytes for s in out) > 0
        for s in out:
            # framed " w1 w2 " text round-trips to the declared bytes
            assert len(s.text.encode("utf-8")) == s.text_bytes
