"""CLDHints derivation + application (reference: internal/
compact_lang_det_hint_code.cc).

Hint sources, as in the reference:
* TLD from the url (tld_hint; :1446-1462 uses a TLD->language table),
* ``lang="xx"`` / ``xml:lang`` attributes and Content-Language metas
  scanned in the first 8KB of HTML (:1557-1612,
  FLAGS_cld_max_lang_tag_scan_kb = 8),
* an explicit caller hint.

Application: hinted languages get a per-chunk score boost — the
analogue of kLangHintInitial/kLangHintBoost (compact_lang_det_impl.cc:
200-201); this engine applies a flat +HINT_BOOST to the hinted
language's chunk scores, which shifts both ranking and the
ReliabilityDelta margin exactly where the reference's langprob boosts
would.
"""

from __future__ import annotations

import re

from . import langs

HINT_BOOST = 6          # per-chunk score points for a hinted language
MAX_SCAN_BYTES = 8192   # first 8KB of HTML (FLAGS_cld_max_lang_tag_scan_kb)

# TLD -> likely language (only entries where the tld is strongly
# language-identifying; com/org/net etc. carry no hint, as in the
# reference's table where ambiguous TLDs map to UNKNOWN)
TLD_HINTS: dict[str, str] = {
    "de": "de", "at": "de", "fr": "fr", "es": "es", "it": "it",
    "pt": "pt", "br": "pt", "nl": "nl", "se": "sv", "no": "no",
    "dk": "da", "fi": "fi", "pl": "pl", "cz": "cs", "sk": "sk",
    "hu": "hu", "ro": "ro", "tr": "tr", "id": "id", "my": "ms",
    "vn": "vi", "ru": "ru", "ua": "uk", "bg": "bg", "rs": "sr",
    "gr": "el", "il": "he", "sa": "ar", "eg": "ar", "ir": "fa",
    "pk": "ur", "in": "hi", "th": "th", "cn": "zh", "tw": "zh-Hant",
    "jp": "ja", "kr": "ko", "ge": "ka", "am": "hy", "kh": "km",
    "la": "lo", "mm": "my", "lk": "si", "np": "ne", "bd": "bn",
    "ee": "et", "lv": "lv", "lt": "lt", "si": "sl", "hr": "hr",
    "ba": "bs", "mk": "mk", "by": "be", "al": "sq", "is": "is",
    "mt": "mt", "ie": "ga",
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


def hints_from_page(url: str, html: bytes) -> list[int]:
    """Derive hinted lang ids (deduped, order: lang= attr, content-lang
    meta, tld)."""
    out: list[int] = []

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
                lid = langs.lang_id(m.group(1).decode("ascii").lower())
                if lid:
                    out.append(lid)
        if has_cl:
            m = _CONTENT_LANG_RE.search(head)
            if m:
                lid = langs.lang_id(m.group(1).decode("ascii").lower())
                if lid:
                    out.append(lid)
        if has_cs:
            m = _CHARSET_RE.search(head)
            if m:
                enc = m.group(1).decode("ascii").lower()
                code = ENCODING_HINTS.get(enc, "")
                if code:
                    lid = langs.lang_id(code)
                    if lid:
                        out.append(lid)
    code = TLD_HINTS.get(tld_of(url), "")
    if code:
        lid = langs.lang_id(code)
        if lid:
            out.append(lid)
    seen: list[int] = []
    for lid in out:
        if lid not in seen:
            seen.append(lid)
    return seen
