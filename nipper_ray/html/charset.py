"""Charset detection for raw page bytes (Common-Crawl reality: the
`html` column is bytes in whatever encoding the origin served).

Detection order (the WHATWG encoding-sniffing prefix of the algorithm):
1. BOM (UTF-8 / UTF-16 LE/BE);
2. `<meta charset=...>` / `<meta http-equiv="content-type" ...>` within
   the first 1024 bytes;
3. fallback: UTF-8 with replacement (never raises).
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""", re.I)

# label normalization for the common web encodings (WHATWG encoding
# labels; x-user-defined and friends fall back to latin-1 semantics)
_LABEL_MAP = {
    "utf8": "utf-8", "utf-8": "utf-8", "u8": "utf-8",
    "latin1": "latin-1", "latin-1": "latin-1", "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1", "l1": "latin-1", "ascii": "latin-1",
    "us-ascii": "latin-1", "windows-1252": "cp1252", "cp1252": "cp1252",
    "x-cp1252": "cp1252", "windows-1251": "cp1251",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc_jp", "gb2312": "gb18030", "gbk": "gb18030",
    "gb18030": "gb18030", "big5": "big5", "euc-kr": "euc_kr",
    "iso-8859-2": "iso8859-2", "iso-8859-15": "iso8859-15",
    "koi8-r": "koi8-r", "utf-16": "utf-16", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_encoding(raw: bytes) -> str:
    if raw[:3] == codecs.BOM_UTF8:
        return "utf-8-sig"
    if raw[:2] == codecs.BOM_UTF16_LE:
        return "utf-16-le"
    if raw[:2] == codecs.BOM_UTF16_BE:
        return "utf-16-be"
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        enc = _LABEL_MAP.get(label)
        if enc:
            return enc
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            pass
    return "utf-8"


def decode_html(raw) -> str:
    """bytes (or str) -> str; never raises."""
    if isinstance(raw, str):
        return raw
    if not raw:
        return ""
    enc = sniff_encoding(raw)
    try:
        return raw.decode(enc, errors="replace")
    except (LookupError, ValueError):
        return raw.decode("utf-8", errors="replace")
