"""PII / toxicity scrubbing — regex redaction stage (north rule).

New code (not in the reference). Patterns are compiled once per process
(module import) / per actor, applied vectorized with pandas
``str.replace`` per batch. Replacement tokens are stable strings so
scrubbed output is deterministic and SQL-reproducible
(``regexp_replace(..., 'g')`` in the DuckDB oracle).

Order matters and is fixed: EMAIL -> IPV4 -> SSN -> CREDIT_CARD ->
PHONE (phone last: its pattern is the loosest).
"""

from __future__ import annotations

import re

import pandas as pd

# (token, python regex, duckdb-compatible regex) — kept in sync; DuckDB
# RE2 has no lookbehind, so patterns avoid lookarounds entirely.
PII_PATTERNS: list[tuple[str, str]] = [
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("<SSN>", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("<CC>", r"\b(?:\d[ -]?){13,16}\d\b"),
    ("<PHONE>", r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b"),
]

_COMPILED = [(tok, re.compile(pat)) for tok, pat in PII_PATTERNS]

# deliberately mild wordlist for the toxicity flag (a stand-in for a
# real blocklist; the mechanism — broadcast wordlist + vectorized scan —
# is the deliverable)
TOXICITY_WORDS = ["badword1", "badword2", "slurword"]
_TOX = re.compile("|".join(re.escape(w) for w in TOXICITY_WORDS),
                  re.IGNORECASE)


def scrub_series(texts: pd.Series) -> pd.DataFrame:
    """Vectorized scrub. Returns scrubbed_text, n_pii, has_toxicity."""
    out = texts.fillna("")
    n_pii = pd.Series(0, index=out.index, dtype="int64")
    for token, rx in _COMPILED:
        n_pii = n_pii + out.str.count(rx)
        out = out.str.replace(rx, token, regex=True)
    has_tox = texts.fillna("").str.contains(_TOX)
    return pd.DataFrame({
        "scrubbed_text": out,
        "n_pii": n_pii,
        "has_toxicity": has_tox,
    })


def scrub_text(text: str) -> str:
    """Single-document scrub (oracle path)."""
    for token, rx in _COMPILED:
        text = rx.sub(token, text)
    return text
