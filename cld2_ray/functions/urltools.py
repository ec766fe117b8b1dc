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
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# query/fragment and scheme prefixes; scheme per RFC 3986 ALPHA
# *( ALPHA / DIGIT / "+" / "-" / "." )
_QUERY_FRAG = r"[?#].*$"
_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
_WWW = r"^(www\.)+"  # (…)+: stripping one level at a time would make
                     # the canonical key depend on pass count
_DEFAULT_PORT = r":(80|443)$"
_TRAIL_SLASH = r"/+$"


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized canonical key for a string column of URLs.

    Steps (host case-insensitive per RFC 3986 §6.2.2.1; the path keeps
    its case): drop query+fragment, drop the scheme, lowercase the
    host, strip a leading "www.", strip the default :80/:443 port,
    strip trailing slashes.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    elif not isinstance(urls, pa.Array):
        urls = pa.array(urls, type=pa.string())
    s = pc.replace_substring_regex(urls, pattern=_QUERY_FRAG,
                                   replacement="")
    s = pc.replace_substring_regex(s, pattern=_SCHEME, replacement="")
    parts = pc.extract_regex(s, r"^(?P<host>[^/]*)(?P<rest>.*)$")
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, pattern=_WWW, replacement="")
    host = pc.replace_substring_regex(host, pattern=_DEFAULT_PORT,
                                      replacement="")
    rest = pc.replace_substring_regex(pc.struct_field(parts, "rest"),
                                      pattern=_TRAIL_SLASH,
                                      replacement="")
    return pc.binary_join_element_wise(host, rest, "")


def registered_domain(urls) -> pa.Array:
    """Vectorized host extraction (canonical form: lowercased, www.
    and default port stripped) for per-domain aggregation."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    elif not isinstance(urls, pa.Array):
        urls = pa.array(urls, type=pa.string())
    s = pc.replace_substring_regex(urls, pattern=_QUERY_FRAG,
                                   replacement="")
    s = pc.replace_substring_regex(s, pattern=_SCHEME, replacement="")
    host = pc.utf8_lower(
        pc.replace_substring_regex(s, pattern=r"/.*$", replacement=""))
    host = pc.replace_substring_regex(host, pattern=_WWW, replacement="")
    return pc.replace_substring_regex(host, pattern=_DEFAULT_PORT,
                                      replacement="")
