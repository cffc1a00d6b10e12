"""HTML5 character-reference decoding (WHATWG spec semantics).

Matches html5ever's tokenizer behavior that the serialization goldens pin
(reference: /root/reference/tests/html-dom.rs:62-90 — `&amp` legacy form,
numeric refs, `&nbsp;` round-trip): longest-match named references from the
HTML5 entity table (with and without trailing semicolon), the
attribute-value rule (a legacy no-semicolon reference followed by ``=`` or an
alphanumeric is NOT decoded), and the numeric-reference replacement table
(C1 remapping, U+0000 -> U+FFFD, out-of-range -> U+FFFD).

Uses only the stdlib ``html.entities.html5`` table (public data).
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5_ENTITIES

# numeric reference replacement table (WHATWG "Numeric character reference
# end state"); same table as stdlib html._invalid_charrefs
_NUMERIC_REPLACE = {
    0x00: "�", 0x0D: "\r", 0x80: "€", 0x81: "\x81",
    0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…",
    0x86: "†", 0x87: "‡", 0x88: "ˆ", 0x89: "‰",
    0x8A: "Š", 0x8B: "‹", 0x8C: "Œ", 0x8D: "\x8d",
    0x8E: "Ž", 0x8F: "\x8f", 0x90: "\x90", 0x91: "‘",
    0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™",
    0x9A: "š", 0x9B: "›", 0x9C: "œ", 0x9D: "\x9d",
    0x9E: "ž", 0x9F: "Ÿ",
}

_CHARREF_RE = re.compile(
    r"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[0-9a-zA-Z]+;?)"
)

# longest entity name (with ;) is 32 chars ("CounterClockwiseContourIntegral;")
_MAX_NAME = max(len(k) for k in _HTML5_ENTITIES)


def _decode_named(name: str, in_attr: bool, next_stream_char: str):
    """Longest-prefix match of *name* against the entity table.

    Returns the decoded text (+ unmatched remainder) or None.
    *next_stream_char* is the character following the whole alnum run in
    the surrounding string — the spec's attribute rule looks at it when
    the legacy match consumes the entire run (e.g. ``&not=``)."""
    # try longest first; names in the table may or may not end with ';'
    for end in range(min(len(name), _MAX_NAME), 0, -1):
        prefix = name[:end]
        if prefix in _HTML5_ENTITIES:
            rest = name[end:]
            if not prefix.endswith(";"):
                # legacy (no-semicolon) reference: inside an attribute
                # value, if the next char is '=' or alphanumeric, the
                # reference is NOT decoded
                nxt = rest[:1] or next_stream_char
                if in_attr and nxt and (nxt == "=" or nxt.isalnum()):
                    return None
            return _HTML5_ENTITIES[prefix] + rest
    return None


def _decode_numeric(body: str) -> str:
    # body like "#38;" / "#x26;" possibly missing the semicolon
    digits = body[1:].rstrip(";")
    if digits[:1] in ("x", "X"):
        num = int(digits[1:], 16)
    else:
        num = int(digits)
    if num in _NUMERIC_REPLACE:
        return _NUMERIC_REPLACE[num]
    if 0xD800 <= num <= 0xDFFF or num > 0x10FFFF:
        return "�"
    return chr(num)


def decode_charrefs(s: str, in_attr: bool = False) -> str:
    """Decode all character references in *s* (text or attribute value)."""
    if "&" not in s:
        return s

    def repl(m):
        body = m.group(1)
        if body[0] == "#":
            if len(body) == 1 or (body[1] in "xX" and len(body) == 2):
                return m.group(0)
            return _decode_numeric(body)
        out = _decode_named(body, in_attr, s[m.end():m.end() + 1])
        if out is None:
            return m.group(0)
        return out

    return _CHARREF_RE.sub(repl, s)
