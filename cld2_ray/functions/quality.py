"""Heuristic quality rules for web text — Gopher/C4-style filters.

North-rule stage (BASELINE.json): new code, not in the reference.
Rule set follows the published heuristics (Rae et al. 2021 "Scaling
Language Models" Gopher rules, Raffel et al. 2020 C4): word-count
bounds, mean word length, symbol/word ratios, bullet/ellipsis line
ratios, alpha-word ratio, stopword evidence, duplicate-line fractions,
brace/lorem-ipsum markers.

Everything is computed vectorized per batch (pandas str ops / numpy
over token counts); each rule has a stable name used as ``drop_reason``
(first failing rule wins, in the declared order). The same function is
both the Ray `map_batches` kernel body and the single-process oracle.

Tokenization contract: words = regexp split on whitespace — chosen so
that every rule below is expressible in DuckDB SQL for the driver's
oracle comparison (string_split_regex(text, '\\s+')).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_WORD_RATIO = 0.1      # '#' or '...' per word
MAX_BULLET_LINE_RATIO = 0.9
MAX_ELLIPSIS_LINE_RATIO = 0.3
MIN_ALPHA_WORD_RATIO = 0.7       # words containing at least one letter
MIN_STOPWORDS = 2
MAX_DUP_LINE_RATIO = 0.3
MIN_SENTENCES = 1

# small cross-lingual stopword set (en/fr/de/es + universal particles);
# evidence of running prose rather than keyword lists
STOPWORDS = (
    "the of and to in a is that for it with as was on be at by this "
    "le la de et les des un une du en que est pour dans "
    "der die das und den von zu mit sich auf ist im "
    "el los las y o del para con una por se no "
    "e o a os as um uma não com "
    "и в не на с что он как по это"
).split()



_TOKEN = re.compile(r"\S+")
# a token containing at least one Unicode letter ([^\W\d_] with re.UNICODE)
_ALPHA_TOKEN = re.compile(r"(?<!\S)\S*[^\W\d_]")
_STOP_WORDS_ALT = "|".join(
    "the of and to in a is that for it with as was on be at by this "
    "le la de et les des un une du en que est pour dans "
    "der die das und den von zu mit sich auf ist im "
    "el los las y o del para con una por se no "
    "e os as um uma não com "
    "и в не на с что он как по это".split())
_STOP_RE = re.compile(
    r"(?<!\S)['\"(]*(?:" + _STOP_WORDS_ALT + r")[.,;:!?'\")]*(?=\s|$)",
    re.IGNORECASE)
# anchored whole-token form of _STOP_RE: applied to already-split
# tokens it needs no lookarounds, so it runs on Arrow's RE2 kernels
_STOP_TOKEN_PATTERN = \
    r"^['\"(]*(?:" + _STOP_WORDS_ALT + r")[.,;:!?'\")]*$"


def _stopword_counts_arrow(arr) -> np.ndarray:
    """Per-row stopword counts, equal to str.count(_STOP_RE): split on
    whitespace, anchored-match each token (RE2 DFA, no Python loop)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(arr, r"\s+")
    flat = pc.list_flatten(toks)
    is_stop = pc.match_substring_regex(
        flat, _STOP_TOKEN_PATTERN, ignore_case=True)
    hits = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(hits)])
    return csum[offsets[1:]] - csum[offsets[:-1]]


from functools import lru_cache


@lru_cache(maxsize=1)
def _letter_lut():
    """uint8[0x30000]: 1 where unicodedata category is L* — the \\pL
    analogue for the C quality scan (RE2's letter table agrees on every
    codepoint the corpora exercise; equality with the Arrow path is
    pinned by tests)."""
    import unicodedata
    lut = np.zeros(0x30000, dtype=np.uint8)
    for cp in range(0x30000):
        if unicodedata.category(chr(cp)).startswith("L"):
            lut[cp] = 1
    return lut


@lru_cache(maxsize=1)
def _fold_lut():
    """uint32[0x30000]: fold each codepoint onto its stopword-alphabet
    representative, derived FROM RE2 itself (one anchored `(?i)` match
    per alphabet letter over all codepoints), so the C scan and the
    Arrow/RE2 fallback agree by construction on the whole fold domain
    — including orbits outside Latin-1/Cyrillic-proper (ſ→s U+017F,
    ᲀ→в U+1C80, ᲂ→о, ᲃ→с, ᲄ/ᲅ→т in Cyrillic Extended-C). Codepoints
    whose orbit has no alphabet member keep identity; they can never
    be part of a stopword match, so identity is exact."""
    import pyarrow as pa
    import pyarrow.compute as pc
    lim = 0x30000
    lut = np.arange(lim, dtype=np.uint32)
    chars = pa.array([chr(cp) if not 0xD800 <= cp < 0xE000 else "\x00"
                      for cp in range(lim)])
    alphabet = sorted(set("".join(_STOP_WORDS_ALT.split("|"))))
    for ch in alphabet:
        m = pc.match_substring_regex(
            chars, "^" + re.escape(ch) + "$", ignore_case=True)
        lut[np.nonzero(m.to_numpy(zero_copy_only=False))[0]] = ord(ch)
    return lut


@lru_cache(maxsize=1)
def _stop_table():
    """Open-addressed uint64 set of the stopwords, keyed by packed
    little-endian utf-8 bytes (all <= 8 bytes), same probe as the C
    model tables."""
    words = set(_STOP_WORDS_ALT.split("|"))
    cap = 256
    tbl = np.zeros(cap, dtype=np.uint64)
    for w in words:
        b = w.encode("utf-8")
        assert 0 < len(b) <= 8, w
        key = int.from_bytes(b, "little")
        h = (key * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 29
        idx = h & (cap - 1)
        while tbl[idx] != 0 and int(tbl[idx]) != key:
            idx = (idx + 1) & (cap - 1)
        tbl[idx] = key
    return tbl


def _scan_stats(stripped: pd.Series) -> np.ndarray | None:
    """(n, 9) int64 [n_words, n_chars, n_ws, alpha_words, n_stop,
    n_sentences, symbols, has_lorem, has_brace] via ONE C pass over
    the concatenated stripped texts; None when the native kernel is
    unavailable (callers then use the Arrow/RE2 kernels — equality
    between the two paths is pinned by tests)."""
    from cld2_ray import native
    if not native.AVAILABLE:
        return None
    bufs = [t.encode("utf-8") for t in stripped]
    bounds = np.cumsum(np.array([len(b) for b in bufs], dtype=np.int64))
    cat = b"".join(bufs)
    return native.quality_scan(cat, bounds, _letter_lut(), _fold_lut(),
                               _stop_table())


def word_stats(texts: pd.Series,
               _scan: np.ndarray | None = None) -> pd.DataFrame:
    """Vectorized word-level statistics per document. With the native
    kernel, everything comes from the single-pass C scan; the fallback
    runs Arrow compute kernels (C++/RE2 — also what DuckDB uses, which
    keeps the SQL oracle aligned). The two paths are equal (tested)."""
    stripped = texts.fillna("").str.strip()
    scan = _scan if _scan is not None else _scan_stats(stripped)
    if scan is not None:
        n_words = pd.Series(scan[:, 0], index=texts.index)
        n_chars = pd.Series(scan[:, 1], index=texts.index)
        n_ws = pd.Series(scan[:, 2], index=texts.index)
        alpha_words = pd.Series(scan[:, 3], index=texts.index)
        n_stop = pd.Series(scan[:, 4], index=texts.index)
    else:
        import pyarrow as pa
        import pyarrow.compute as pc
        arr = pa.Array.from_pandas(stripped)
        n_words = pd.Series(
            pc.count_substring_regex(arr, r"\S+")
            .to_numpy(zero_copy_only=False),
            index=texts.index).astype(np.int64)
        n_chars = pd.Series(
            pc.utf8_length(arr).to_numpy(zero_copy_only=False),
            index=texts.index).astype(np.int64)
        n_ws = pd.Series(
            pc.count_substring_regex(arr, r"\s")
            .to_numpy(zero_copy_only=False),
            index=texts.index).astype(np.int64)
        alpha_words = pd.Series(
            pc.count_substring_regex(arr, r"(^|\s)\S*\pL")
            .to_numpy(zero_copy_only=False), index=texts.index)
        n_stop = pd.Series(_stopword_counts_arrow(arr), index=texts.index)
    word_chars = n_chars - n_ws
    mean_wl = (word_chars / n_words.replace(0, np.nan)).fillna(0.0)
    return pd.DataFrame({
        "n_words": n_words,
        "n_chars": n_chars,
        "mean_word_len": mean_wl.astype(np.float64),
        "alpha_ratio": (alpha_words / n_words.replace(0, np.nan)).fillna(0.0),
        "n_stopwords": n_stop,
    })


def line_stats(texts: pd.Series,
               _scan: np.ndarray | None = None) -> pd.DataFrame:
    """Per-document line statistics. The native path reads them from
    the same single C pass as word_stats (scan cols 9-12); the pandas
    path below is the semantic pin (tested equal). Line stats are
    invariant to whole-doc strip(), so the stripped scan input is fine:
    per-line strip + empty-line drop subsume the outer strip."""
    scan = _scan
    if scan is None:
        scan = _scan_stats(texts.fillna("").str.strip())
    if scan is not None:
        n_lines = np.maximum(scan[:, 9], 1)
        return pd.DataFrame({
            "n_lines": n_lines,
            "bullet_ratio": scan[:, 10] / n_lines,
            "ellipsis_ratio": scan[:, 11] / n_lines,
            "dup_line_ratio": scan[:, 12] / n_lines,
        }, index=texts.index)
    lines = texts.fillna("").str.split("\n")
    lines = lines.map(lambda ls: [l.strip() for l in ls if l.strip()])
    n_lines = lines.map(len).replace(0, 1)
    bullet = lines.map(
        lambda ls: sum(1 for l in ls if l.startswith(("-", "*", "•", "·"))))
    ellipsis = lines.map(
        lambda ls: sum(1 for l in ls if l.endswith(("...", "…"))))
    dup = lines.map(lambda ls: len(ls) - len(set(ls)))
    return pd.DataFrame({
        "n_lines": n_lines.astype(np.int64),
        "bullet_ratio": (bullet / n_lines).astype(np.float64),
        "ellipsis_ratio": (ellipsis / n_lines).astype(np.float64),
        "dup_line_ratio": (dup / n_lines).astype(np.float64),
    })


_SENT_END = re.compile(r"[.!?。！？]")


# languages written without inter-word spaces: word-shape rules do not
# apply; word count is approximated by character count
SPACELESS_LANGS = frozenset(["zh", "zh-Hant", "ja", "th", "km", "lo", "my"])

# languages whose stopwords the STOPWORDS list actually covers — the
# too_few_stopwords rule only fires for these (demanding en/fr/de/es/
# pt/ru function words from, say, Turkish prose would drop every
# well-formed Turkish page)
STOPWORD_LANGS = frozenset(["en", "fr", "de", "es", "pt", "ru"])


def _apply_rules_scan(t: pd.Series, scan: np.ndarray,
                      lang_codes: pd.Series | None) -> pd.DataFrame:
    """apply_rules fast path: every stat already sits in the single C
    scan, so the rule cascade runs on plain numpy arrays (the pandas
    Series/mask machinery was ~70% of apply_rules' wall time). Output
    is equal to the pandas path — pinned by tests/test_native.py."""
    n = len(t)
    n_words = scan[:, 0]
    n_chars = scan[:, 1]
    word_chars = n_chars - scan[:, 2]
    alpha_words = scan[:, 3]
    n_stop = scan[:, 4]
    n_sentences = scan[:, 5]
    symbols = scan[:, 6]
    has_lorem = scan[:, 7] != 0
    has_brace = scan[:, 8] != 0
    n_lines = np.maximum(scan[:, 9], 1)
    bullet_ratio = scan[:, 10] / n_lines
    ellipsis_ratio = scan[:, 11] / n_lines
    dup_line_ratio = scan[:, 12] / n_lines
    nz_words = np.maximum(n_words, 1)
    mean_wl = np.where(n_words > 0, word_chars / nz_words, 0.0)
    alpha_ratio = np.where(n_words > 0, alpha_words / nz_words, 0.0)

    if lang_codes is not None:
        lc = np.asarray(lang_codes, dtype=object)
        spaceless = np.isin(lc, list(SPACELESS_LANGS))
        stopword_gated = np.isin(lc, list(STOPWORD_LANGS))
    else:
        spaceless = np.zeros(n, bool)
        stopword_gated = np.zeros(n, bool)
    eff_words = np.where(spaceless, (n_chars / 2.5).astype(np.int64),
                         n_words)

    names = np.array([
        "too_few_words", "too_many_words", "mean_word_len",
        "symbol_ratio", "bullet_lines", "ellipsis_lines", "alpha_ratio",
        "too_few_stopwords", "dup_lines", "lorem_ipsum",
        "brace_source_code", "too_few_sentences", ""], dtype=object)
    masks = [
        eff_words < MIN_WORDS,
        eff_words > MAX_WORDS,
        ~spaceless & ((mean_wl < MIN_MEAN_WORD_LEN)
                      | (mean_wl > MAX_MEAN_WORD_LEN)),
        (symbols / np.where(eff_words == 0, 1, eff_words))
        > MAX_SYMBOL_WORD_RATIO,
        bullet_ratio > MAX_BULLET_LINE_RATIO,
        ellipsis_ratio > MAX_ELLIPSIS_LINE_RATIO,
        ~spaceless & (alpha_ratio < MIN_ALPHA_WORD_RATIO),
        stopword_gated & (n_stop < MIN_STOPWORDS),
        dup_line_ratio > MAX_DUP_LINE_RATIO,
        has_lorem,
        has_brace,
        n_sentences < MIN_SENTENCES,
    ]
    ridx = np.full(n, len(names) - 1, dtype=np.int64)  # default: kept
    for i in range(len(masks) - 1, -1, -1):            # first match wins
        ridx[masks[i]] = i
    reason = names[ridx]
    return pd.DataFrame({
        "n_words": n_words, "n_chars": n_chars, "mean_word_len": mean_wl,
        "alpha_ratio": alpha_ratio, "n_stopwords": n_stop,
        "n_lines": n_lines, "bullet_ratio": bullet_ratio,
        "ellipsis_ratio": ellipsis_ratio,
        "dup_line_ratio": dup_line_ratio,
        "n_sentences": n_sentences, "keep": ridx == len(names) - 1,
        "drop_reason": reason}, index=t.index)


def apply_rules(texts: pd.Series,
                lang_codes: pd.Series | None = None) -> pd.DataFrame:
    """Returns keep: bool, drop_reason: str ('' if kept) + the stats.

    Rule order is the drop_reason priority order (first failure wins).
    ``lang_codes`` (optional, aligned) marks spaceless-script documents,
    whose word-shape rules are evaluated on characters instead.
    """
    t = texts.fillna("")
    scan = _scan_stats(t.str.strip())
    if scan is not None:
        return _apply_rules_scan(t, scan, lang_codes)
    ws = word_stats(texts, _scan=scan)
    ls = line_stats(texts, _scan=scan)
    if lang_codes is not None:
        lc = lang_codes.reset_index(drop=True)
        lc.index = t.index
        spaceless = lc.isin(SPACELESS_LANGS)
        stopword_gated = lc.isin(STOPWORD_LANGS)
    else:
        spaceless = pd.Series(False, index=t.index)
        # language unknown -> cannot demand specific stopwords
        stopword_gated = pd.Series(False, index=t.index)
    # effective word count: chars/2.5 for spaceless scripts
    eff_words = ws.n_words.mask(spaceless,
                                (ws.n_chars / 2.5).astype(np.int64))
    if scan is not None:
        n_sentences = pd.Series(scan[:, 5], index=t.index)
        symbols = pd.Series(scan[:, 6], index=t.index)
        has_lorem = pd.Series(scan[:, 7] != 0, index=t.index)
        has_brace = pd.Series(scan[:, 8] != 0, index=t.index)
    else:
        import pyarrow as pa
        import pyarrow.compute as pc
        arr = pa.Array.from_pandas(t)

        def _count(pattern, regex=False):
            f = pc.count_substring_regex if regex else pc.count_substring
            return pd.Series(f(arr, pattern).to_numpy(zero_copy_only=False),
                             index=t.index).astype(np.int64)

        n_sentences = _count("[.!?。！？]", regex=True)
        symbols = _count("#") + _count(r"\.\.\.", regex=True) + _count("…")
        has_lorem = pd.Series(
            pc.match_substring(arr, "lorem ipsum", ignore_case=True)
            .to_numpy(zero_copy_only=False), index=t.index)
        has_brace = pd.Series(
            pc.match_substring(arr, "{").to_numpy(zero_copy_only=False),
            index=t.index)

    rules = [
        ("too_few_words", eff_words < MIN_WORDS),
        ("too_many_words", eff_words > MAX_WORDS),
        ("mean_word_len", ~spaceless & ((ws.mean_word_len < MIN_MEAN_WORD_LEN)
         | (ws.mean_word_len > MAX_MEAN_WORD_LEN))),
        ("symbol_ratio", (symbols / eff_words.replace(0, 1))
         > MAX_SYMBOL_WORD_RATIO),
        ("bullet_lines", ls.bullet_ratio > MAX_BULLET_LINE_RATIO),
        ("ellipsis_lines", ls.ellipsis_ratio > MAX_ELLIPSIS_LINE_RATIO),
        ("alpha_ratio", ~spaceless & (ws.alpha_ratio < MIN_ALPHA_WORD_RATIO)),
        ("too_few_stopwords", stopword_gated
         & (ws.n_stopwords < MIN_STOPWORDS)),
        ("dup_lines", ls.dup_line_ratio > MAX_DUP_LINE_RATIO),
        ("lorem_ipsum", has_lorem),
        ("brace_source_code", has_brace),
        ("too_few_sentences", n_sentences < MIN_SENTENCES),
    ]

    reason = pd.Series([""] * len(t), index=t.index, dtype=object)
    for name, mask in rules:
        mask = mask.fillna(True)
        reason = reason.mask((reason == "") & mask, name)

    out = pd.concat([ws, ls], axis=1)
    out["n_sentences"] = n_sentences.astype(np.int64)
    out["keep"] = reason == ""
    out["drop_reason"] = reason
    return out


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 "Exploring the Limits of
# Transfer Learning", §2.2). The reference engine has no line-level
# cleaner; this is the standard webtext pre-filter that runs BEFORE
# document-level rules: drop boilerplate LINES, then judge the page on
# what remains.
# ---------------------------------------------------------------------------

def _rejoin_lines(flat, keep: np.ndarray, n_kept: np.ndarray):
    """Re-join kept lines per document in C++: the exploded line
    column is already in (doc, line) order, so filtering by the keep
    mask and re-listing with per-doc kept counts reconstructs each
    document; binary_join adds the separators. Shared by
    c4_line_filter and dedup_lines_within_doc (one place owns the
    LargeList-offset subtleties)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    kept_flat = flat.filter(pa.array(keep))
    offsets = np.zeros(len(n_kept) + 1, dtype=np.int64)
    np.cumsum(n_kept, out=offsets[1:])
    return pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, kept_flat), "\n")


C4_MIN_LINE_WORDS = 5        # "only retained lines with >= 5 words"
C4_MIN_SENTENCES = 3         # "discarded pages with < 3 sentences"
# terminal punctuation a retained line must end with (period,
# exclamation, question mark, end quotation mark)
C4_TERMINAL = '[.!?"”]'
# the word "javascript" (any case) drops the line. Matched on the
# LOWERCASED line with a case-sensitive pattern — exactly what the SQL
# oracle does with lower(l); RE2's (?i) would additionally simple-fold
# U+017F/U+212A-style characters and diverge from lower() (review
# finding, round 5)
_JS_PATTERN = r"(^|[^a-z])javascript([^a-z]|$)"


def c4_line_filter(texts: pd.Series) -> pd.DataFrame:
    """C4-style line filter + page verdict, fully vectorized (Arrow
    RE2 kernels over the exploded line table — no Python loop over
    lines). Per document:

    line rules (priority order for the drop counters; each line counts
    under its FIRST failing rule):
      1. ``javascript`` — line contains the word "javascript"
      2. ``few_words``  — fewer than C4_MIN_LINE_WORDS whitespace words
      3. ``no_punct``   — trimmed line does not end in C4_TERMINAL

    page rules on the surviving text (priority order):
      ``lorem_ipsum`` (original text, case-insensitive), ``brace``
      ('{' anywhere in the original text), ``too_few_sentences``
      (< C4_MIN_SENTENCES terminal marks in the kept text).

    Lines are trimmed with DuckDB trim() semantics (Zs spaces) before
    the word/punctuation rules so the SQL oracle mirrors exactly;
    ``kept_text`` re-joins the retained (trimmed) lines with '\\n'.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from cld2_ray.functions.textstats import TRIM_CHARS

    t = texts.fillna("")
    arr = pa.array(t, type=pa.string(), from_pandas=True)
    lines = pc.split_pattern(arr, "\n")
    flat = pc.utf8_trim(pc.list_flatten(lines), TRIM_CHARS)
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n = len(t)

    is_js = pc.match_substring_regex(pc.utf8_lower(flat), _JS_PATTERN) \
        .to_numpy(zero_copy_only=False)
    n_words = pc.count_substring_regex(flat, r"\S+") \
        .to_numpy(zero_copy_only=False)
    ends_ok = pc.match_substring_regex(flat, C4_TERMINAL + "$") \
        .to_numpy(zero_copy_only=False)

    few = ~is_js & (n_words < C4_MIN_LINE_WORDS)
    nopunct = ~is_js & ~few & ~ends_ok
    keep_line = ~is_js & ~few & ~nopunct

    n_lines = np.bincount(parent, minlength=n).astype(np.int64)
    c_js = np.bincount(parent, weights=is_js, minlength=n).astype(np.int64)
    c_few = np.bincount(parent, weights=few, minlength=n).astype(np.int64)
    c_np = np.bincount(parent, weights=nopunct, minlength=n).astype(np.int64)
    n_kept = n_lines - c_js - c_few - c_np

    kept_arr = _rejoin_lines(flat, keep_line, n_kept)
    kept_text = kept_arr.to_numpy(zero_copy_only=False)

    n_sent = pc.count_substring_regex(kept_arr, "[.!?]") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    has_lorem = pc.match_substring(arr, "lorem ipsum", ignore_case=True) \
        .to_numpy(zero_copy_only=False)
    has_brace = pc.match_substring(arr, "{").to_numpy(zero_copy_only=False)

    reason = np.full(n, "", dtype=object)
    reason[n_sent < C4_MIN_SENTENCES] = "too_few_sentences"
    reason[has_brace] = "brace"
    reason[has_lorem] = "lorem_ipsum"
    kept_chars = pc.utf8_length(kept_arr) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return pd.DataFrame({
        "n_lines": n_lines, "n_kept_lines": n_kept,
        "drop_javascript": c_js, "drop_few_words": c_few,
        "drop_no_punct": c_np, "n_sentences": n_sent,
        "kept_chars": kept_chars, "keep": reason == "",
        "drop_reason": reason, "kept_text": kept_text,
    }, index=texts.index)


def blocklist_filter(texts: pd.Series,
                     words: "frozenset[str] | list[str]",
                     _tok=None) -> pd.DataFrame:
    """C4-style bad-words page filter: a page is dropped when any
    whitespace token — lowercased, with leading/trailing ASCII
    punctuation stripped, so "Word." and "(word" match — is in the
    blocklist (Raffel et al. 2020 §2.2 drop pages with any word on a
    blocklist). Vectorized — one Arrow split + regex-strip + is_in
    over the flattened token column, no Python loop. Returns
    n_blocked_tokens + keep per document.

    At scale the blocklist is broadcast once per actor (ray.put the
    set, pass the ObjectRef into the map_batches class __init__), not
    re-shipped per batch; callers with a constant list can pass it
    directly — Ray captures it in the task closure once.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from cld2_ray.functions.textstats import ws_token_table

    flat, parent, _counts = _tok if _tok is not None \
        else ws_token_table(texts)
    low = pc.utf8_lower(flat)
    # edge-punctuation strip (ASCII classes — mirrors the RE2 the
    # DuckDB oracle runs): 'word.' / '(word' / '"word!"' all match
    low = pc.replace_substring_regex(
        low, r"^[^a-z0-9]+|[^a-z0-9]+$", "")
    hit = pc.is_in(low, value_set=pa.array(sorted(set(words)),
                                           type=pa.string()))
    n_blocked = np.bincount(
        parent, weights=hit.to_numpy(zero_copy_only=False),
        minlength=len(texts)).astype(np.int64)
    return pd.DataFrame({"n_blocked_tokens": n_blocked,
                         "keep": n_blocked == 0}, index=texts.index)


def dedup_lines_within_doc(texts: pd.Series) -> pd.DataFrame:
    """Within-document duplicate-line removal (the removal form of
    Gopher's duplicate-line filters, Rae et al. 2021 §A1.1): every
    repeat of an earlier NON-EMPTY line in the same document is
    dropped; first occurrences and empty lines pass through, order
    preserved. Returns the Gopher numerators alongside the cleaned
    text: ``dup_line_count`` / ``dup_line_chars`` are the repeats
    beyond each first occurrence (the "fraction of characters in
    duplicate lines" numerator; divide by the original text length).

    Vectorized: Arrow split + dictionary_encode give batch-wide line
    ids; doc-scoped first occurrences come from one np.unique over
    (doc_index << 32 | line_id); the cleaned text is re-joined in C++
    (ListArray + binary_join). Lines are compared exactly as split —
    no trimming — so the SQL mirror is a plain equality group.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    t = texts.fillna("")
    arr = pa.array(t, type=pa.string(), from_pandas=True)
    n = len(t)
    lines = pc.split_pattern(arr, "\n")
    flat = pc.list_flatten(lines)
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_lines = np.bincount(parent, minlength=n).astype(np.int64)

    ids = flat.dictionary_encode().indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    packed = (parent.astype(np.int64) << np.int64(32)) | ids
    _, first_idx = np.unique(packed, return_index=True)
    keep = np.zeros(len(ids), dtype=bool)
    keep[first_idx] = True
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    keep |= ~nonempty          # empty lines always pass through

    L = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    drop = ~keep
    dup_count = np.bincount(parent[drop], minlength=n).astype(np.int64)
    dup_chars = np.bincount(parent[drop], weights=L[drop],
                            minlength=n).astype(np.int64)

    cleaned = _rejoin_lines(flat, keep, n_lines - dup_count) \
        .to_numpy(zero_copy_only=False)
    return pd.DataFrame({
        "n_lines": n_lines,
        "dup_line_count": dup_count,
        "dup_line_chars": dup_chars,
        "cleaned_text": cleaned,
    }, index=texts.index)
