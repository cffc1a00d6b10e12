"""C-assisted tokenizer front-end: same sink contract as
``tokenizer.Tokenizer`` (the pure-Python reference implementation), with
the data/tag/comment/doctype scanning done by the compiled macro-
tokenizer (_scan.c) over the document's UTF-8 bytes.

Why byte space is exact: every span boundary the scanner reports falls
on an ASCII delimiter byte ('<', '>', quotes, whitespace, '&', '='),
and UTF-8 continuation bytes can never alias ASCII, so slicing the byte
string at record offsets and decoding the slice reproduces the
character-space slices of the Python tokenizer byte-for-byte.

The synchronous TreeSink contract (the sink may switch the tokenizer
into a raw mode *during* start-tag processing) is preserved because the
scanner terminates its record stream at every start tag whose name
could trigger ``set_raw`` — after dispatching that tag, this front-end
checks ``raw_mode`` before re-entering the scanner.  Raw-mode content
(RAWTEXT / RCDATA / script-data / PLAINTEXT) is consumed here with
byte-space ports of the Python logic, and CDATA arbitration (which
needs the sink's live foreign-content flag) happens between scanner
calls, at exactly the stream position where the tree state is current.

``tests/test_ctokenizer_differential.py`` pins this front-end
DOM-identical to the Python tokenizer over the goldens, the fixture
pages and adversarial generated inputs.
"""

from __future__ import annotations

import ctypes
import re
import sys

from .entities import decode_charrefs
from .tokenizer import Tokenizer, _ASCII_LOWER, _lower

_B_SCRIPT_RE = re.compile(
    rb"<!--|-->|</[sS][cC][rR][iI][pP][tT](?=[\t\n\f />])|"
    rb"<[sS][cC][rR][iI][pP][tT](?=[\t\n\f />])")

_B_RAW_CLOSE_CACHE: dict = {}


def _b_raw_close_re(tag: str):
    r = _B_RAW_CLOSE_CACHE.get(tag)
    if r is None:
        pat = (b"</"
               + b"".join(b"[%c%c]" % (ord(c), ord(c.upper())) for c in tag)
               + rb"(?=[\t\n\f />])")
        r = _B_RAW_CLOSE_CACHE[tag] = re.compile(pat)
    return r


# byte-keyed twin of tokenizer._NAME_CACHE: utf-8 name bytes ->
# interned lowercase str
_BNAME_CACHE: dict = {}


def _bname(bs: bytes) -> str:
    v = _BNAME_CACHE.get(bs)
    if v is None:
        v = sys.intern(
            bs.decode("utf-8", "surrogatepass").translate(_ASCII_LOWER))
        if len(_BNAME_CACHE) < 8192:
            _BNAME_CACHE[bs] = v
    return v


class CTokenizer:
    """Drop-in for ``Tokenizer`` driven by the compiled scanner."""

    def __init__(self, sink, html: str, scan_fn):
        if "\r" in html:
            html = html.replace("\r\n", "\n").replace("\r", "\n")
        self.b = html.encode("utf-8", "surrogatepass")
        self.sink = sink
        self.raw_mode = None
        self.cdata_ok = False
        self._scan = scan_fn

    def set_raw(self, kind: str, tag: str) -> None:
        self.raw_mode = (kind, tag)

    @staticmethod
    def _dec(bs: bytes) -> str:
        return bs.decode("utf-8", "surrogatepass")

    # -- main loop --------------------------------------------------------
    def run(self) -> None:
        b = self.b
        n = len(b)
        sink = self.sink
        # size the record buffer to the document, but only in THREE
        # quantized buckets: `(c_int32 * cap)` creates (and caches) a
        # ctypes array TYPE per distinct cap, so a per-document cap
        # would manufacture types faster than it saves allocation
        cap = 1024 if n <= 1024 else (8192 if n <= 8192 else 1 << 15)
        buf = (ctypes.c_int32 * cap)()
        count = ctypes.c_int64()
        reason = ctypes.c_int32()
        scan = self._scan
        pos = 0
        while pos < n:
            if self.raw_mode is not None:
                pos = self._consume_raw(pos)
                continue
            resume = scan(b, n, pos, buf, cap,
                          ctypes.byref(count), ctypes.byref(reason))
            if count.value:
                self._dispatch(buf, count.value)
            pos = resume
            r = reason.value
            if r == 2:           # CDATA: needs the live foreign flag
                pos = self._cdata_or_bogus(pos)
            elif r == 4:         # one record outgrew the buffer: retry
                cap *= 4
                buf = (ctypes.c_int32 * cap)()
        sink.process_eof()

    def _dispatch(self, buf, count: int) -> None:
        b = self.b
        sink = self.sink
        rec = buf[:count]        # one bulk int conversion
        k = 0
        while k < count:
            t = rec[k]
            if t == 0:           # TEXT
                txt = self._dec(b[rec[k + 1]:rec[k + 2]])
                sink.process_chars(
                    decode_charrefs(txt) if rec[k + 3] else txt)
                k += 4
            elif t == 1:         # START
                name = _bname(b[rec[k + 1]:rec[k + 2]])
                self_closing = bool(rec[k + 3])
                na = rec[k + 4]
                k += 5
                attrs = []
                seen = set()
                for _ in range(na):
                    aname = _bname(b[rec[k]:rec[k + 1]])
                    vs = rec[k + 2]
                    if vs < 0:
                        value = ""
                    else:
                        value = self._dec(b[vs:rec[k + 3]])
                        if rec[k + 4]:
                            value = decode_charrefs(value, in_attr=True)
                    if aname not in seen:
                        seen.add(aname)
                        attrs.append([None, aname, value])
                    k += 5
                sink.process_start_tag(name, attrs, self_closing)
            elif t == 2:         # END
                sink.process_end_tag(_bname(b[rec[k + 1]:rec[k + 2]]))
                k += 3
            elif t == 3:         # COMMENT
                sink.process_comment(self._dec(b[rec[k + 1]:rec[k + 2]]))
                k += 3
            elif t == 4:         # DOCTYPE
                # the scanner record carries the name span; recover the
                # post-name declaration span with the scanner's own
                # first-'>' rule (_scan.c scan_doctype resumes at e+1)
                ne = rec[k + 2]
                gt = b.find(b">", ne)
                sink.process_doctype(
                    _lower(self._dec(b[rec[k + 1]:ne])),
                    self._dec(b[ne:gt] if gt >= 0 else b[ne:]),
                    gt < 0)
                k += 3
            elif t == 5:         # BOGUS comment
                if hasattr(sink, "parse_error"):
                    sink.parse_error("bogus-comment")
                sink.process_comment(self._dec(b[rec[k + 1]:rec[k + 2]]))
                k += 3
            else:                # LT
                sink.process_chars("<")
                k += 1

    # -- raw modes (byte-space ports of tokenizer.py) ---------------------
    def _consume_raw(self, pos: int) -> int:
        kind, tag = self.raw_mode
        self.raw_mode = None
        b = self.b
        n = len(b)
        sink = self.sink
        if kind == "plaintext":
            if pos < n:
                sink.process_chars(self._dec(b[pos:]))
            return n
        if kind == "script":
            return self._consume_script(pos)
        m = _b_raw_close_re(tag).search(b, pos)
        if m is None:
            if pos < n:
                text = self._dec(b[pos:])
                sink.process_chars(
                    decode_charrefs(text) if kind == "rcdata" else text)
            return n
        if m.start() > pos:
            text = self._dec(b[pos:m.start()])
            sink.process_chars(
                decode_charrefs(text) if kind == "rcdata" else text)
        return m.start()         # scanner parses the close tag itself

    def _consume_script(self, pos: int) -> int:
        b = self.b
        n = len(b)
        escaped = False
        double = False
        scan = pos
        while True:
            m = _B_SCRIPT_RE.search(b, scan)
            if m is None:
                if pos < n:
                    self.sink.process_chars(self._dec(b[pos:]))
                return n
            tok = m.group()
            if tok == b"<!--":
                if not escaped:
                    escaped = True
                    double = False
            elif tok == b"-->":
                escaped = False
                double = False
            elif tok[1:2] == b"/":   # '</script'
                if double:
                    double = False
                else:
                    if m.start() > pos:
                        self.sink.process_chars(self._dec(b[pos:m.start()]))
                    return m.start()
            else:                    # '<script'
                if escaped and not double:
                    double = True
            scan = m.end()

    def _cdata_or_bogus(self, pos: int) -> int:
        """Scanner stopped at the '<' of '<![CDATA[': arbitrate with the
        sink's (now current) foreign-content flag."""
        b = self.b
        n = len(b)
        i = pos + 1              # the '!'
        if self.cdata_ok:
            start = i + 8
            end = b.find(b"]]>", start)
            if end < 0:
                self.sink.process_chars(self._dec(b[start:]))
                return n
            self.sink.process_chars(self._dec(b[start:end]))
            return end + 3
        if hasattr(self.sink, "parse_error"):
            self.sink.parse_error("bogus-comment")
        start = i + 1
        end = b.find(b">", start)
        if end < 0:
            self.sink.process_comment(self._dec(b[start:]))
            return n
        self.sink.process_comment(self._dec(b[start:end]))
        return end + 1


def make_tokenizer(sink, html: str):
    """CTokenizer when the compiled scanner is available (and the
    document's byte offsets fit int32), else the Python Tokenizer."""
    from . import cscan

    fn = cscan.get()
    if fn is not None and len(html) < (1 << 29):
        return CTokenizer(sink, html, fn)
    return Tokenizer(sink, html)
