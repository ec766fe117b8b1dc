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
