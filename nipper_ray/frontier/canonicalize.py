"""URL canonicalization for the crawl frontier (new engine design; the
reference has no URL handling — SURVEY.md §2.7).

Rules (fixed at design time; see FIXTURES.md §4):
- resolve relative references against the discovering page's URL;
- lowercase scheme and host; strip fragments; strip default ports;
- normalize percent-encoding: decode unreserved characters, uppercase
  remaining hex escapes;
- empty path -> "/"; preserve query strings byte-for-byte otherwise;
- only http/https survive; everything else -> None.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")

# already-canonical fast path: lowercase scheme+host, no port/userinfo,
# a path, no fragment, no percent-escapes anywhere. For such URLs
# canonicalize(u) == u, so the (hot) urlsplit/urlunsplit round-trip can
# be skipped — most frontier URLs hit this after their first pass.
_FAST_RE = re.compile(r"^https?://[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?"
                      r"/[^#%?\s]*(?:\?[^#%\s]+)?$")


def _norm_pct(s: str) -> str:
    def repl(m):
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()
    return _PCT_RE.sub(repl, s)


def canonicalize_url(url: str, base: str | None = None):
    if not url:
        return None
    url = url.strip()
    if _FAST_RE.match(url):
        return url
    if base:
        try:
            url = urljoin(base, url)
        except ValueError:
            return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = None
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and (
            (scheme == "http" and port == 80)
            or (scheme == "https" and port == 443)):
        port = None
    netloc = host if port is None else "%s:%d" % (host, port)
    path = _norm_pct(parts.path) or "/"
    query = _norm_pct(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""
