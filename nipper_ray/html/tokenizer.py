"""HTML5 tokenizer (WHATWG-spec subset faithful to html5ever's behavior).

From-scratch implementation of the tokenizer states that the reference's
golden corpus exercises (reference tests: /root/reference/tests/html-dom.rs):

- data / tag-open / tag-name / attribute states (quoted, unquoted, legacy
  edge cases: EOF inside a tag drops the whole tag -> the `fuzz` golden);
- character references in data and attribute values (entities.py);
- RAWTEXT (script/style/xmp/iframe/noembed/noframes), RCDATA
  (title/textarea), script-data escaped & double-escaped modes, PLAINTEXT;
- comments (incl. abrupt closings and `--!>`), doctype, bogus comments,
  CDATA sections (foreign content only).

Dispatch is synchronous: each token is handed to the sink (the tree
builder) immediately, and the sink may switch the tokenizer into a raw
mode before scanning continues — same contract as html5ever's
Tokenizer/TreeSink pair.
"""

from __future__ import annotations

import re

from .entities import decode_charrefs

_TAG_NAME_RE = re.compile(r"[a-zA-Z][^\t\n\f />]*")
# fast path: tag with no attributes (the majority in table-heavy HTML:
# </td>, <tr>, <p>, ...) — one regex replaces the name+attr-loop scans
_NOATTR_TAG_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9-]*)[\t\n\f ]*(/?)>")
_ATTR_NAME_RE = re.compile(r"[^\t\n\f /=>]+")
# one-regex-per-attribute fast path: name [= value] with trailing ws;
# an unterminated quoted value deliberately fails the quoted alternates
# and is detected by the leading-quote check (EOF-in-tag drop)
_ATTR_FAST_RE = re.compile(
    r"([^\t\n\f /=>]+)"
    r"(?:[\t\n\f ]*=[\t\n\f ]*"
    r"(\"([^\"]*)\"|'([^']*)'|([^\t\n\f >]*)))?"
    r"[\t\n\f ]*")
_UNQUOTED_VAL_RE = re.compile(r"[^\t\n\f >]*")
_WS_RE = re.compile(r"[\t\n\f ]*")
_WS = "\t\n\f "

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)


# tag/attribute names repeat endlessly; memoize lowercase+interned forms
# to cut per-tag string allocation (memory traffic is the scaling limit
# at high worker counts — see BASELINE.md)
_NAME_CACHE: dict = {}


def _lower_name(s: str) -> str:
    v = _NAME_CACHE.get(s)
    if v is None:
        import sys

        v = sys.intern(s.translate(_ASCII_LOWER))
        if len(_NAME_CACHE) < 8192:
            _NAME_CACHE[s] = v
    return v


_SCRIPT_INTEREST_RE = re.compile(
    r"<!--|-->|</[sS][cC][rR][iI][pP][tT](?=[\t\n\f />])|"
    r"<[sS][cC][rR][iI][pP][tT](?=[\t\n\f />])"
)

_RAW_CLOSE_CACHE: dict = {}


def _raw_close_re(tag: str):
    r = _RAW_CLOSE_CACHE.get(tag)
    if r is None:
        pat = "</" + "".join("[%s%s]" % (c, c.upper()) for c in tag) + r"(?=[\t\n\f />])"
        r = _RAW_CLOSE_CACHE[tag] = re.compile(pat)
    return r


class Tokenizer:
    def __init__(self, sink, html: str):
        if "\r" in html:
            html = html.replace("\r\n", "\n").replace("\r", "\n")
        self.s = html
        self.sink = sink
        # raw-mode request set by the sink after a start tag:
        # None or ("rawtext"|"rcdata"|"script"|"plaintext", tag_name)
        self.raw_mode = None
        self.cdata_ok = False  # sink sets while in foreign content

    # -- sink-facing switches --------------------------------------------
    def set_raw(self, kind: str, tag: str) -> None:
        self.raw_mode = (kind, tag)

    # -- main loop --------------------------------------------------------
    def run(self) -> None:
        s = self.s
        n = len(s)
        pos = 0
        sink = self.sink
        while pos < n:
            if self.raw_mode is not None:
                pos = self._consume_raw(pos)
                continue
            lt = s.find("<", pos)
            if lt < 0:
                sink.process_chars(decode_charrefs(s[pos:]))
                pos = n
                break
            if lt > pos:
                sink.process_chars(decode_charrefs(s[pos:lt]))
            pos = self._consume_markup(lt)
        sink.process_eof()

    # -- markup ------------------------------------------------------------
    def _consume_markup(self, pos: int) -> int:
        """pos points at '<'. Returns new position."""
        s = self.s
        n = len(s)
        sink = self.sink
        i = pos + 1
        if i >= n:
            sink.process_chars("<")
            return n
        c = s[i]
        if c == "/":
            j = i + 1
            if j < n and s[j].isalpha() and s[j].isascii():
                return self._consume_tag(j, end_tag=True)
            if j < n and s[j] == ">":
                return j + 1  # '</>' ignored
            # bogus comment: data from after '</'... spec uses chars after '<'
            return self._bogus_comment(i)
        if c.isalpha() and c.isascii():
            return self._consume_tag(i, end_tag=False)
        if c == "!":
            if s.startswith("--", i + 1):
                return self._comment(i + 3)
            if _lower(s[i + 1 : i + 8]) == "doctype":
                return self._doctype(i + 8)
            if s.startswith("[CDATA[", i + 1):
                if self.cdata_ok:
                    return self._cdata(i + 8)
                return self._bogus_comment(i + 1)
            return self._bogus_comment(i + 1)
        if c == "?":
            return self._bogus_comment(i)
        sink.process_chars("<")
        return i

    def _bogus_comment(self, start: int) -> int:
        if hasattr(self.sink, "parse_error"):
            self.sink.parse_error("bogus-comment")
        s = self.s
        end = s.find(">", start)
        if end < 0:
            self.sink.process_comment(s[start:])
            return len(s)
        self.sink.process_comment(s[start:end])
        return end + 1

    def _comment(self, start: int) -> int:
        s = self.s
        n = len(s)
        # abrupt closings: <!--> and <!--->
        if s.startswith(">", start):
            self.sink.process_comment("")
            return start + 1
        if s.startswith("->", start):
            self.sink.process_comment("")
            return start + 2
        i = s.find("-->", start)
        j = s.find("--!>", start)
        if j != -1 and (i == -1 or j < i):
            self.sink.process_comment(s[start:j])
            return j + 4
        if i != -1:
            self.sink.process_comment(s[start:i])
            return i + 3
        self.sink.process_comment(s[start:])
        return n

    def _doctype(self, start: int) -> int:
        s = self.s
        n = len(s)
        i = _WS_RE.match(s, start).end()
        m = re.compile(r"[^\t\n\f >]*").match(s, i)
        name = _lower(m.group())
        i = m.end()
        end = s.find(">", i)
        if end < 0:
            # unterminated doctype: eof-in-doctype -> force-quirks
            self.sink.process_doctype(name, s[i:], True)
            return n
        # the raw post-name declaration text feeds the quirks decision
        # (treebuilder.doctype_quirks); ids are not stored on the node
        self.sink.process_doctype(name, s[i:end], False)
        return end + 1

    def _cdata(self, start: int) -> int:
        s = self.s
        end = s.find("]]>", start)
        if end < 0:
            self.sink.process_chars(s[start:])
            return len(s)
        self.sink.process_chars(s[start:end])
        return end + 3

    # -- tags --------------------------------------------------------------
    def _consume_tag(self, name_start: int, end_tag: bool) -> int:
        """name_start points at the first letter of the tag name.

        Returns new position. On EOF inside the tag the whole tag is
        dropped (spec: EOF-in-tag; golden `fuzz` in html-dom.rs).
        """
        s = self.s
        n = len(s)
        m = _NOATTR_TAG_RE.match(s, name_start)
        if m is not None:
            name = _lower_name(m.group(1))
            if end_tag:
                self.sink.process_end_tag(name)
            else:
                self.sink.process_start_tag(name, [], m.group(2) == "/")
            return m.end()
        m = _TAG_NAME_RE.match(s, name_start)
        name = _lower_name(m.group())
        i = m.end()
        attrs = []
        seen = set()
        self_closing = False
        while True:
            # skip whitespace
            while i < n and s[i] in _WS:
                i += 1
            if i >= n:
                return n  # EOF in tag -> drop
            c = s[i]
            if c == ">":
                i += 1
                break
            if c == "/":
                if s.startswith("/>", i):
                    self_closing = True
                    i += 2
                    break
                i += 1
                continue
            if c != "=":
                fm = _ATTR_FAST_RE.match(s, i)
                if fm is not None:
                    g5 = fm.group(5)
                    # a quote char opening the "unquoted" alternative means
                    # an unterminated quoted value: take the slow path
                    if not (g5 is not None and g5[:1] in ('"', "'")):
                        if fm.end() >= n:
                            return n  # EOF before '>' -> drop tag
                        aname = _lower_name(fm.group(1))
                        if fm.group(2) is None:
                            value = ""
                        else:
                            v = fm.group(3)
                            if v is None:
                                v = fm.group(4)
                            if v is None:
                                v = g5
                            value = decode_charrefs(v, in_attr=True) \
                                if "&" in v else v
                        i = fm.end()
                        if aname not in seen:
                            seen.add(aname)
                            attrs.append([None, aname, value])
                        continue
            # attribute name ('=' as first char is consumed into the name)
            if c == "=":
                aname = "="
                i += 1
                m2 = _ATTR_NAME_RE.match(s, i)
                if m2:
                    aname += m2.group()
                    i = m2.end()
            else:
                m2 = _ATTR_NAME_RE.match(s, i)
                if m2 is None:  # defensive; '>' and '/' handled above
                    i += 1
                    continue
                aname = m2.group()
                i = m2.end()
            aname = _lower_name(aname)
            # after attribute name
            while i < n and s[i] in _WS:
                i += 1
            value = ""
            if i < n and s[i] == "=":
                i += 1
                while i < n and s[i] in _WS:
                    i += 1
                if i >= n:
                    return n  # EOF
                q = s[i]
                if q == '"' or q == "'":
                    j = s.find(q, i + 1)
                    if j < 0:
                        return n  # EOF in quoted value -> drop tag
                    value = decode_charrefs(s[i + 1 : j], in_attr=True)
                    i = j + 1
                else:
                    m3 = _UNQUOTED_VAL_RE.match(s, i)
                    value = decode_charrefs(m3.group(), in_attr=True)
                    i = m3.end()
                    if i >= n:
                        return n  # EOF right after unquoted value
            elif i >= n:
                return n  # EOF after attr name -> drop
            if aname not in seen:
                seen.add(aname)
                attrs.append([None, aname, value])
        if end_tag:
            self.sink.process_end_tag(name)
        else:
            self.sink.process_start_tag(name, attrs, self_closing)
        return i

    # -- raw modes ---------------------------------------------------------
    def _consume_raw(self, pos: int) -> int:
        kind, tag = self.raw_mode
        self.raw_mode = None
        s = self.s
        n = len(s)
        sink = self.sink
        if kind == "plaintext":
            if pos < n:
                sink.process_chars(s[pos:])
            return n
        if kind == "script":
            return self._consume_script(pos)
        m = _raw_close_re(tag).search(s, pos)
        if m is None:
            text = s[pos:]
            if text:
                sink.process_chars(
                    decode_charrefs(text) if kind == "rcdata" else text
                )
            return n
        text = s[pos : m.start()]
        if text:
            sink.process_chars(decode_charrefs(text) if kind == "rcdata" else text)
        return self._consume_tag(m.start() + 2, end_tag=True)

    def _consume_script(self, pos: int) -> int:
        """Script data with escaped / double-escaped handling (condensed
        WHATWG script-data states)."""
        s = self.s
        n = len(s)
        escaped = False
        double = False
        scan = pos
        while True:
            m = _SCRIPT_INTEREST_RE.search(s, scan)
            if m is None:
                if pos < n:
                    self.sink.process_chars(s[pos:])
                return n
            tok = m.group()
            if tok == "<!--":
                if not escaped:
                    escaped = True
                    double = False
            elif tok == "-->":
                escaped = False
                double = False
            elif tok[1] == "/":  # '</script'
                if double:
                    double = False
                else:
                    text = s[pos : m.start()]
                    if text:
                        self.sink.process_chars(text)
                    return self._consume_tag(m.start() + 2, end_tag=True)
            else:  # '<script'
                if escaped and not double:
                    double = True
            scan = m.end()
