"""CLDHints derivation + application (reference: internal/
compact_lang_det_hint_code.cc).

Hint sources, as in the reference:
* TLD from the url (tld_hint; :1446-1462, per-entry packed strengths
  from kCLDTLDHintTable, Boost-merged +2 on repeats),
* ``lang="xx"`` / ``xml:lang`` attributes and Content-Language metas
  scanned in the first 8KB of HTML (:1557-1612,
  FLAGS_cld_max_lang_tag_scan_kb = 8), looked up in the long/short
  lang-tag tables (kCLDLangTagsHintTable1/2, Max-merged),
* legacy encoding (kCLDPriorEncodingWeight = 4),
* an explicit caller hint (kCLDPriorLanguageWeight = 8).

The per-entry strengths, table contents and per-script-class language
sets are parsed from the reference at build time
(scripts/gen_hintdata.py -> cld2_ray/data/hintdata.py). Application
follows ApplyHints (compact_lang_det_impl.cc:1589-1686): priors are
trimmed to the 4 largest absolute weights; positive priors become
per-chunk score boosts of their weight on spans whose script class
can carry the language; when exactly ONE member of a statistically
close set is hinted, the other members are whacked (zeroed) per chunk
(:1656-1683 + AddCloseLangWhack).

Payload encoding (shared with the C kernel): one int64 per entry;
boost = lang_id | (weight << 16), whack = -lang_id.
"""

from __future__ import annotations

import re
from functools import lru_cache

from . import langs
from cld2_ray.data.hintdata import (LANGTAG_LONG, LANGTAG_SHORT,
                                    LATN_LANGS, OTHR_LANGS, TLD_PRIORS)

HINT_BOOST = 6          # legacy flat boost (detect(hint_langs=[ids]))
MAX_SCAN_BYTES = 8192   # first 8KB of HTML (FLAGS_cld_max_lang_tag_scan_kb)
ENCODING_WEIGHT = 4     # kCLDPriorEncodingWeight
LANGUAGE_WEIGHT = 8     # kCLDPriorLanguageWeight (explicit caller hint)
MAX_PRIORS = 4          # TrimCLDLangPriors(4, ...)

# compat view of the parsed TLD table: tld -> its strongest
# positively-weighted language code
TLD_HINTS: dict[str, str] = {
    tld: max((p for p in priors if p[1] > 0), key=lambda p: p[1])[0]
    for tld, priors in TLD_PRIORS.items()
    if any(w > 0 for _, w in priors)
}

# legacy-encoding -> likely language (the encoding_hint analogue,
# compact_lang_det.h:133-138 + the hint boost table
# compact_lang_det_hint_code.cc:647-1390): only encodings that are
# strongly language-identifying carry a hint; universal encodings
# (utf-8, iso-8859-1, windows-1252, ascii) map to none.
ENCODING_HINTS: dict[str, str] = {
    "shift_jis": "ja", "shift-jis": "ja", "sjis": "ja", "euc-jp": "ja",
    "iso-2022-jp": "ja",
    "gb2312": "zh", "gbk": "zh", "gb18030": "zh", "hz-gb-2312": "zh",
    "big5": "zh-Hant", "big5-hkscs": "zh-Hant",
    "euc-kr": "ko", "iso-2022-kr": "ko", "ks_c_5601-1987": "ko",
    "koi8-r": "ru", "koi8-u": "uk",
    "windows-1251": "ru", "iso-8859-5": "ru",
    "windows-1253": "el", "iso-8859-7": "el",
    "windows-1254": "tr", "iso-8859-9": "tr",
    "windows-1255": "he", "iso-8859-8": "he", "iso-8859-8-i": "he",
    "windows-1256": "ar", "iso-8859-6": "ar",
    "windows-1258": "vi",
    "tis-620": "th", "windows-874": "th", "iso-8859-11": "th",
    "iso-8859-2": "pl", "windows-1250": "pl",
    "windows-1257": "lt", "iso-8859-13": "lt",
    "iscii-devanagari": "hi", "x-mac-cyrillic": "ru",
}

_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE)

_TLD_RE = re.compile(r"^[a-z]+://[^/]*?([a-z0-9-]+\.)?([a-z]{2,6})(?::\d+)?/",
                     re.IGNORECASE)
# left boundary: the reference requires ' lang' / ':lang' before '='
# (GetLangTagsFromHtml, compact_lang_det_hint_code.cc) — without it,
# hreflang="xx" on <link rel=alternate> would supply a bogus hint
_LANG_ATTR_RE = re.compile(
    rb"""(?<![A-Za-z-])(?:lang|xml:lang)\s*=\s*["']?\s*([A-Za-z]{2,3})(?:[-_][A-Za-z]{2,8})?""",
    re.IGNORECASE)
# anchored form for the find()-seeded scan in hints_from_page (the
# lookbehind is checked manually there; scanning the full 8KB head
# with a variable lookbehind at every byte was ~90% of hint cost)
_LANG_ATTR_AT_RE = re.compile(
    rb"""(?:lang|xml:lang)\s*=\s*["']?\s*([A-Za-z]{2,3})(?:[-_][A-Za-z]{2,8})?""",
    re.IGNORECASE)


def _iter_lang_attrs(head: bytes):
    """Exactly _LANG_ATTR_RE.finditer(head), seeded by substring find:
    every match starts at a literal 'lang' or 'xml:lang', so anchored
    probes at each 'lang' occurrence (trying the 'xml:lang' start
    first, as leftmost-first does) enumerate the same matches in the
    same order. last_end reproduces finditer's non-overlap rule —
    candidates inside a previous match (e.g. a value like 'xml' or
    'lan' followed by '=') are skipped, as the engine resumes scanning
    at the previous match's end."""
    low = head.lower()
    pos = 0
    last_end = 0
    while True:
        p = low.find(b"lang", pos)
        if p < 0:
            return
        starts = []
        if p >= 4 and low[p - 4:p] == b"xml:":
            starts.append(p - 4)
        starts.append(p)
        for s in starts:
            if s < last_end:
                continue
            prev = head[s - 1:s]
            if prev and (prev.isalpha() or prev == b"-"):
                continue  # the (?<![A-Za-z-]) boundary
            m = _LANG_ATTR_AT_RE.match(head, s)
            if m:
                yield m
                last_end = m.end()
                break
        pos = p + 4
_CONTENT_LANG_RE = re.compile(
    rb"""content-language["']?\s+content\s*=\s*["']?\s*([A-Za-z]{2,3})""",
    re.IGNORECASE)
# tag contexts the reference skips when scanning for lang= attributes
# (link/script/a tags and comments carry hreflang/JS/outbound-locale
# noise, not the page's own language)
_SKIP_TAG_RE = re.compile(
    rb"""<!--.*?(?:-->|$)|<script\b.*?(?:</script\s*>|$)"""
    rb"""|<(?:link|a|area|font|img)\b[^>]*(?:>|$)""",
    re.IGNORECASE | re.DOTALL)


def tld_of(url: str) -> str:
    """Last dns label of the host ('' if unparseable)."""
    m = re.match(r"^[a-z]+://([^/:?#]+)", url, re.IGNORECASE)
    if not m:
        return ""
    host = m.group(1)
    return host.rsplit(".", 1)[-1].lower() if "." in host else ""


def _merge_max(priors: list[list], code: str, w: int) -> None:
    """MergeCLDLangPriorsMax (hint_code.cc:941-955)."""
    for p in priors:
        if p[0] == code:
            p[1] = max(p[1], w)
            return
    priors.append([code, w])


def _merge_boost(priors: list[list], code: str, w: int) -> None:
    """MergeCLDLangPriorsBoost (hint_code.cc:958-971): +2 on repeat."""
    for p in priors:
        if p[0] == code:
            p[1] += 2
            return
    priors.append([code, w])


def _langtag_priors(tag: str, priors: list[list]) -> None:
    """One lang tag value -> Max-merged priors (SetCLDLangTagsHint,
    hint_code.cc:1394-1435: long table first, else short table with
    the code truncated at the first hyphen)."""
    tag = tag.strip().lower()
    if not tag or len(tag) > 16:
        return
    entry = LANGTAG_LONG.get(tag)
    if entry is None:
        short = tag.split("-", 1)[0]
        if len(short) <= 3:
            entry = LANGTAG_SHORT.get(short)
    if entry:
        for code, w in entry:
            _merge_max(priors, code, w)


def priors_from_page(url: str, html: bytes) -> list[tuple[int, int]]:
    """Derive (lang_id, signed_weight) priors from a page — lang=
    attrs + content-language metas (Max merge), charset (encoding
    weight, Boost merge), TLD (per-entry strengths, Boost merge) —
    trimmed to the 4 largest absolute weights (TrimCLDLangPriors)."""
    return page_hints(url, html)[0]


def page_hints(url: str, html: bytes):
    """One scan of the page head -> (priors, declared, tld_lang).

    priors: as priors_from_page (all hint sources merged + trimmed).
    declared: tuple of lang ids the page EXPLICITLY declares
      (content-language meta / lang= attributes only — TLD and charset
      are inferences, not declarations).
    tld_lang: the TLD prior table's strongest positive language
      (0 when the TLD carries no prior), for metadata fallback on
      zero-signal pages."""
    priors: list[list] = []   # [code, weight], insertion-ordered
    declared: tuple = ()

    raw_head = html[:MAX_SCAN_BYTES]
    # fast substring pre-filter: the three regexes each scan the full
    # 8KB head; a lowercase copy + find is ~10x cheaper than one regex
    # pass, and most pages carry no content-language/charset at all
    low = raw_head.lower()
    has_lang = b"lang" in low
    has_cl = b"content-language" in low
    has_cs = b"charset" in low
    if has_lang or has_cl or has_cs:
        head = _SKIP_TAG_RE.sub(b" ", raw_head)
        if has_lang:
            for m in _iter_lang_attrs(head):
                _langtag_priors(m.group(1).decode("ascii"), priors)
        if has_cl:
            m = _CONTENT_LANG_RE.search(head)
            if m:
                _langtag_priors(m.group(1).decode("ascii"), priors)
        declared = tuple(lid for lid in
                         (langs.lang_id(c) for c, w in priors if w > 0)
                         if lid)
        if has_cs:
            m = _CHARSET_RE.search(head)
            if m:
                enc = m.group(1).decode("ascii").lower()
                code = ENCODING_HINTS.get(enc, "")
                if code:
                    _merge_boost(priors, code, ENCODING_WEIGHT)
    tld_entry = TLD_PRIORS.get(tld_of(url))
    tld_lang = 0
    if tld_entry:
        for code, w in tld_entry:
            _merge_boost(priors, code, w)
        best = max((p for p in tld_entry if p[1] > 0),
                   key=lambda p: p[1], default=None)
        if best:
            tld_lang = langs.lang_id(best[0])

    # TrimCLDLangPriors(4): keep largest |weight|, stable on ties
    priors.sort(key=lambda p: -abs(p[1]))
    out = []
    for code, w in priors[:MAX_PRIORS]:
        lid = langs.lang_id(code)
        if lid:
            out.append((lid, w))
    return out, declared, tld_lang


# close set -> member lang ids (computed once; _whacks used to loop
# all NUM_LANGS per hinted language, ~4% of whole-pipeline profile)
_SET_MEMBERS: dict[int, list[int]] = {}
for _lid in range(langs.NUM_LANGS):
    _cs = langs.language_close_set(_lid)
    if _cs:
        _SET_MEMBERS.setdefault(_cs, []).append(_lid)


def _whacks(priors) -> list[int]:
    """Close-set whack targets (ApplyHints, impl.cc:1656-1683): when
    exactly one member of a close set carries a prior, suppress the
    other members; zh/zh-Hant are a whack-pair here even though they
    are not a close set elsewhere."""
    zh, zht = langs.lang_id("zh"), langs.lang_id("zh-Hant")
    set_count: dict[int, int] = {}
    zh_count = 0
    for lid, _w in priors:
        cs = langs.language_close_set(lid)
        if cs:
            set_count[cs] = set_count.get(cs, 0) + 1
        if lid in (zh, zht):
            zh_count += 1
    out: list[int] = []
    for lid, w in priors:
        if w <= 0:
            continue
        cs = langs.language_close_set(lid)
        if cs and set_count.get(cs) == 1:
            out.extend(o for o in _SET_MEMBERS[cs] if o != lid)
        if lid in (zh, zht) and zh_count == 1:
            out.append(zht if lid == zh else zh)
    return out


def payloads(priors) -> tuple[list[int], list[int]]:
    """(latn_payload, othr_payload): packed per-chunk hint entries,
    filtered by script class (AddLangPriorBoost/AddOneWhack,
    impl.cc:1524-1562: a hint only applies to spans whose script class
    can carry the language). Boost = lid | (w << 16); whack = -lid;
    boosts precede whacks (ScoreBoosts applies whacks last).

    Cached on the priors tuple: pages repeat the same small set of
    hint combinations (TLDs, lang= values), and the per-page Python
    cost of re-deriving class filters + whacks was ~5% of the whole
    fused pipeline."""
    lat, oth = _payloads_cached(tuple(priors))
    return list(lat), list(oth)


@lru_cache(maxsize=4096)
def _payloads_cached(priors):
    latn: list[int] = []
    othr: list[int] = []
    for lid, w in priors:
        if w <= 0:
            continue
        code = langs.lang_code(lid)
        v = lid | (w << 16)
        if code in LATN_LANGS:
            latn.append(v)
        if code in OTHR_LANGS:
            othr.append(v)
    wh = _whacks(priors)
    hinted_latn = any(langs.lang_code(lid) in LATN_LANGS
                      for lid, w in priors if w > 0)
    hinted_othr = any(langs.lang_code(lid) in OTHR_LANGS
                      for lid, w in priors if w > 0)
    for lid in wh:
        code = langs.lang_code(lid)
        if hinted_latn and code in LATN_LANGS:
            latn.append(-lid)
        if hinted_othr and code in OTHR_LANGS:
            othr.append(-lid)
    return latn, othr


def hints_from_page(url: str, html: bytes) -> list[int]:
    """Compat view: positively-hinted lang ids in prior order."""
    return [lid for lid, w in priors_from_page(url, html) if w > 0]
