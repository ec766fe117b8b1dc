"""URL canonicalization for web-corpus dedup.

The classic first dedup pass in a crawl pipeline: collapse the
scheme / www. / tracking-query / port / trailing-slash variants of the
same resource to one canonical key BEFORE any content hashing — at
100 TB the URL column is a few orders of magnitude cheaper to shuffle
than the page bodies (the reference operates strictly per-document and
has no corpus-level dedup; this is one of the engine's corpus-level
additions, SURVEY §2.7).

Everything here is pure pyarrow.compute over string columns — no
per-row Python in the hot path.

The canonical key is a FIXPOINT by construction: ``canonicalize_urls``
re-applies the (vectorized) strip pipeline until the column stops
changing, so crawl junk like ``http://http://a.com`` or
``https://a.com://x`` cannot make the dedup key depend on how many
times the stage ran. Each pass only shortens or lowercases, so the
loop terminates in a handful of passes (1 for normal URLs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# query/fragment and scheme prefixes. The scheme charset is RFC 3986
# MINUS the dot: dots are legal in schemes, but keeping them would
# read a HOST followed by "://" ("a.com://x") as a scheme and
# collapse unrelated hosts onto one canonical key (found by review —
# false dedup merges). Dot-free still canonicalizes arbitrary real
# schemes (git://, s3://, rtmp://) scheme-insensitively.
_QUERY_FRAG = r"[?#].*$"
_SCHEME = r"^(?i:[a-z][a-z0-9+\-]*://)+"
# userinfo (RFC 3986 authority): credentials must not distinguish —
# or leak into — dedup keys / domain aggregates. Only strip when the
# '@' precedes the first path slash.
_USERINFO = r"^[^/@]+@"
_WWW = r"^(www\.)+"
_DEFAULT_PORT = r":(80|443)$"
_ANY_PORT = r":\d+$"
_TRAIL_SLASH = r"/+$"


def _coerce(urls) -> pa.Array:
    if isinstance(urls, pa.ChunkedArray):
        return urls.combine_chunks()
    if isinstance(urls, pa.Array):
        return urls
    return pa.array(urls, type=pa.string())


def _split_host(s: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(host, rest): scheme/query/fragment stripped, host lowercased
    with www. prefixes and the default :80/:443 port removed."""
    s = pc.replace_substring_regex(s, pattern=_QUERY_FRAG,
                                   replacement="")
    s = pc.replace_substring_regex(s, pattern=_SCHEME, replacement="")
    s = pc.replace_substring_regex(s, pattern=_USERINFO, replacement="")
    parts = pc.extract_regex(s, r"^(?P<host>[^/]*)(?P<rest>.*)$")
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, pattern=_WWW, replacement="")
    host = pc.replace_substring_regex(host, pattern=_DEFAULT_PORT,
                                      replacement="")
    return host, pc.struct_field(parts, "rest")


def _canon_once(s: pa.Array) -> pa.Array:
    host, rest = _split_host(s)
    rest = pc.replace_substring_regex(rest, pattern=_TRAIL_SLASH,
                                      replacement="")
    return pc.binary_join_element_wise(host, rest, "")


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized canonical key for a string column of URLs.

    Steps (host case-insensitive per RFC 3986 §6.2.2.1; the path keeps
    its case): drop query+fragment, drop the scheme, lowercase the
    host, strip leading "www." prefixes, strip the default :80/:443
    port, strip trailing slashes — iterated to fixpoint (see module
    docstring)."""
    s = _coerce(urls)
    while True:
        t = _canon_once(s)
        if t.equals(s):
            return t
        s = t


def registered_domain(urls) -> pa.Array:
    """Vectorized host extraction (canonical form: lowercased, www./
    userinfo stripped) for per-domain aggregation. Shares the
    canonical-key pipeline (so the domain of a URL always equals the
    host part of its canonical key) and additionally drops ANY port —
    a:8080 traffic belongs to domain a, even though the canonical
    DEDUP key keeps non-default ports (distinct resources)."""
    host, _ = _split_host(canonicalize_urls(urls))
    return pc.replace_substring_regex(host, pattern=_ANY_PORT,
                                      replacement="")
