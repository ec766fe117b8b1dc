"""Text analysis kernels: token counting, fingerprinting, language
heuristics — the per-document statistics family (SQL-parity friendly).

Tokenization contracts are chosen so every function here has an exact
DuckDB-SQL equivalent for the driver's oracle comparison:
* whitespace tokens  == string_split_regex(trim(text), '\\s+')
* BPE-ish tokens     == regexp_extract_all(text, pattern) with the
  shared ``BPE_TOKEN_PATTERN`` (a GPT-2-style pre-tokenizer: word
  pieces, numbers, punctuation runs — RE2-safe, no lookarounds)
* fingerprint        == md5(text)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# GPT-2-style pre-tokenizer shape, without lookarounds (RE2/duckdb safe):
# optional leading space + (letters | digits | non-space-non-alnum run)
BPE_TOKEN_PATTERN = r" ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s]+"
_BPE = re.compile(BPE_TOKEN_PATTERN)

# ASCII \s to match RE2 (DuckDB string_split_regex): python's unicode
# \s would also split at NBSP etc., which the oracle does not
_WS = re.compile(r"\s+", re.ASCII)

# DuckDB trim() strips exactly the Unicode Zs space separators (probed:
# 0x20/NBSP/ogham/en..hair spaces/NNBSP/MMSP/ideographic; NOT
# tab/newline/VT/FF/CR/NEL/LS/PS) — shared by every oracle-mirrored
# tokenizer so '' edge tokens match the SQL
TRIM_CHARS = ("   "
              + "".join(chr(c) for c in range(0x2000, 0x200b))
              + "  　")


def count_tokens(texts: pd.Series) -> pd.DataFrame:
    """(n_ws_tokens, n_bpe_tokens) per document."""
    t = texts.fillna("")
    # strip SPACES only — DuckDB trim() does not strip tabs/newlines,
    # and those edges produce '' tokens the oracle counts
    stripped = t.str.strip(TRIM_CHARS)
    n_ws = stripped.str.split(_WS).map(
        lambda w: 0 if w == [""] else len(w)).astype(np.int64)
    n_bpe = t.str.findall(_BPE).map(len).astype(np.int64)
    return pd.DataFrame({"n_ws_tokens": n_ws, "n_bpe_tokens": n_bpe})


def fingerprint(texts: pd.Series) -> pd.Series:
    """Stable content fingerprint (md5 hex) per document. One
    GIL-released C pass per batch (native.md5_batch) with a
    bit-identical hashlib fallback."""
    from cld2_ray import native
    t = texts.fillna("")
    if native.AVAILABLE and len(t):
        data, offs = native.utf8_cat(t.tolist())
        hx = np.asarray(native.hex_digest(native.md5_batch(data, offs)))
        return pd.Series(hx.astype("U32"), index=t.index)
    return t.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def token_hashes(toks: list[str], memo: dict | None = None) -> np.ndarray:
    """Per-token 64-bit blake2b hashes: one C pass over the whole
    token list when the native kernel is available (bit-identical —
    LE uint64 of the 8-byte digest), else a hashlib loop optionally
    memoized across calls (corpus vocabularies are tiny relative to
    token occurrences, so with a per-worker memo nearly every lookup
    is a dict hit)."""
    from cld2_ray import native
    if native.AVAILABLE:
        data, offs = native.utf8_cat(toks)
        return native.blake2b_batch(data, offs, 8).view(np.uint64) \
            .ravel()
    out = np.empty(len(toks), dtype=np.uint64)
    if memo is None:
        memo = {}
    for i, t in enumerate(toks):
        h = memo.get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(),
                "little")
            memo[t] = h
        out[i] = h
    return out


def shingle_hashes(tok_hashes: np.ndarray, window: int) -> np.ndarray:
    """Rolling-combine per-token hashes into word-``window``-gram
    hashes (base-31 polynomial, vectorized)."""
    n = len(tok_hashes) - window + 1
    with np.errstate(over="ignore"):
        out = np.zeros(max(n, 0), dtype=np.uint64)
        for k in range(window):
            out += tok_hashes[k:k + n] \
                * np.uint64(31) ** np.uint64(window - 1 - k)
    return out


def rolling_fingerprints(text: str, window: int = 16) -> np.ndarray:
    """Rolling (Rabin-Karp style) window hashes over whitespace tokens —
    the document-fingerprinting primitive for fuzzy containment checks."""
    toks = text.split()
    if len(toks) < window:
        toks = toks + ["<pad>"] * (window - len(toks))
    return shingle_hashes(token_hashes(toks), window)


def kmv_estimate(hashes: list[str], k: int = 64) -> float:
    """Distinct-count estimate from a KMV (bottom-k) sketch
    (queries.q_kmv_distinct's `h` column, sorted ascending).

    Non-saturated sketch (fewer than k hashes): the sketch holds the
    ENTIRE distinct hash set, so the count is exactly its size — the
    KMV contract's small-cardinality case (review finding: feeding
    the last row of a short sketch into the ratio estimator silently
    reads ~2x high). Saturated: the unbiased (k-1)/R_k estimator of
    Bar-Yossef et al. 2002, with R_k the k-th smallest hash
    normalized to [0,1) from the first 16 hex digits of the md5."""
    if len(hashes) < k:
        return float(len(hashes))
    r = int(hashes[k - 1][:16], 16) / 2.0**64
    return (k - 1) / max(r, 2.0**-64)


def stopword_counts(texts: pd.Series, stopwords: list[str]) -> pd.Series:
    """Number of whitespace tokens that are stopwords (exact match,
    lowercased) — SQL: len(list_filter(tokens, t -> lower(t) IN (...)))."""
    stop = frozenset(stopwords)
    # positional index before explode: duplicate input labels would
    # otherwise be merged by the level-0 groupby and fanned back out
    t = texts.fillna("").str.strip(TRIM_CHARS).reset_index(drop=True)
    toks = t.str.split(_WS).explode()
    # an empty doc explodes to one "" token, which is never a stopword,
    # so the per-row sum is 0 there — same as the old per-row map
    out = toks.str.lower().isin(stop).groupby(level=0).sum() \
        .astype(np.int64)
    out.index = texts.index
    return out
