"""HTML5 tree builder (WHATWG tree-construction, html5ever-parity subset).

From-scratch implementation of the insertion-mode machine whose observable
output the reference pins via its TreeSink impl and golden corpus
(reference: /root/reference/src/document.rs:65-283 and tests/html-dom.rs):

- implied <html>/<head>/<body>, implied end tags, raw-text elements;
- adjacent text nodes merge on insertion (document.rs:162-215);
- foster parenting for character/element tokens in tables;
- the adoption agency algorithm (misnested formatting tags);
- <template> contents parsed into a detached document (document.rs:129-133)
  so they are excluded from ``text()``;
- leading-LF strip after <pre>/<listing>/<textarea>;
- svg/mathml foreign content with tag/attribute case + namespace
  adjustment (public WHATWG tables).

scripting_enabled is fixed True, matching the reference
(/root/reference/src/manipulation.rs:13-33).  The document's quirks
mode is tracked per the WHATWG "initial" insertion-mode rules and
exposed as ``Tree.quirks_mode`` / ``Document.quirks_mode`` — field
parity with the reference's ``set_quirks_mode`` TreeSink callback
(/root/reference/src/document.rs:26-27,100-103); fragment parses stay
fixed no-quirks (manipulation.rs:25).  No matching behavior depends on
it (the reference matcher hardcodes NoQuirks, src/matcher.rs:26-38).
"""

from __future__ import annotations

from ..dom import (
    DOCUMENT, DOCTYPE, TEXT, ELEMENT,
    HTML_NS, SVG_NS, MATHML_NS, Tree,
)
from .tokenizer import Tokenizer

MARKER = None  # active-formatting-elements list marker

WS = "\t\n\f "

FORMATTING = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split())

SPECIAL_HTML = frozenset(
    """address applet area article aside base basefont bgsound blockquote
    body br button caption center col colgroup dd details dir div dl dt
    embed fieldset figcaption figure footer form frame frameset h1 h2 h3
    h4 h5 h6 head header hgroup hr html iframe img input keygen li link
    listing main marquee menu meta nav noembed noframes noscript object
    ol p param plaintext pre script section select source style summary
    table tbody td template textarea tfoot th thead title tr track ul
    wbr xmp""".split())
SPECIAL_MATHML = frozenset("mi mo mn ms mtext annotation-xml".split())
SPECIAL_SVG = frozenset(["foreignObject", "desc", "title"])

DEFAULT_SCOPE = {
    (HTML_NS, n) for n in
    "applet caption html table td th marquee object template".split()
} | {(MATHML_NS, n) for n in SPECIAL_MATHML} | {(SVG_NS, n) for n in SPECIAL_SVG}
LIST_ITEM_SCOPE = DEFAULT_SCOPE | {(HTML_NS, "ol"), (HTML_NS, "ul")}
BUTTON_SCOPE = DEFAULT_SCOPE | {(HTML_NS, "button")}
TABLE_SCOPE = {(HTML_NS, "html"), (HTML_NS, "table"), (HTML_NS, "template")}

IMPLIED_END = frozenset("dd dt li optgroup option p rb rp rt rtc".split())

HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

BLOCK_CLOSERS = frozenset(
    """address article aside blockquote center details dialog dir div dl
    fieldset figcaption figure footer header hgroup main menu nav ol p
    section summary ul""".split())

IN_HEAD_START = frozenset(
    "base basefont bgsound link meta noframes script style template title".split())

SVG_TAG_ADJUST = {
    "altglyph": "altGlyph", "altglyphdef": "altGlyphDef",
    "altglyphitem": "altGlyphItem", "animatecolor": "animateColor",
    "animatemotion": "animateMotion", "animatetransform": "animateTransform",
    "clippath": "clipPath", "feblend": "feBlend",
    "fecolormatrix": "feColorMatrix",
    "fecomponenttransfer": "feComponentTransfer", "fecomposite": "feComposite",
    "feconvolvematrix": "feConvolveMatrix",
    "fediffuselighting": "feDiffuseLighting",
    "fedisplacementmap": "feDisplacementMap",
    "fedistantlight": "feDistantLight", "fedropshadow": "feDropShadow",
    "feflood": "feFlood", "fefunca": "feFuncA", "fefuncb": "feFuncB",
    "fefuncg": "feFuncG", "fefuncr": "feFuncR",
    "fegaussianblur": "feGaussianBlur", "feimage": "feImage",
    "femerge": "feMerge", "femergenode": "feMergeNode",
    "femorphology": "feMorphology", "feoffset": "feOffset",
    "fepointlight": "fePointLight",
    "fespecularlighting": "feSpecularLighting", "fespotlight": "feSpotLight",
    "fetile": "feTile", "feturbulence": "feTurbulence",
    "foreignobject": "foreignObject", "glyphref": "glyphRef",
    "lineargradient": "linearGradient", "radialgradient": "radialGradient",
    "textpath": "textPath",
}

SVG_ATTR_ADJUST = {
    "attributename": "attributeName", "attributetype": "attributeType",
    "basefrequency": "baseFrequency", "baseprofile": "baseProfile",
    "calcmode": "calcMode", "clippathunits": "clipPathUnits",
    "diffuseconstant": "diffuseConstant", "edgemode": "edgeMode",
    "filterunits": "filterUnits", "glyphref": "glyphRef",
    "gradienttransform": "gradientTransform", "gradientunits": "gradientUnits",
    "kernelmatrix": "kernelMatrix", "kernelunitlength": "kernelUnitLength",
    "keypoints": "keyPoints", "keysplines": "keySplines",
    "keytimes": "keyTimes", "lengthadjust": "lengthAdjust",
    "limitingconeangle": "limitingConeAngle", "markerheight": "markerHeight",
    "markerunits": "markerUnits", "markerwidth": "markerWidth",
    "maskcontentunits": "maskContentUnits", "maskunits": "maskUnits",
    "numoctaves": "numOctaves", "pathlength": "pathLength",
    "patterncontentunits": "patternContentUnits",
    "patterntransform": "patternTransform", "patternunits": "patternUnits",
    "pointsatx": "pointsAtX", "pointsaty": "pointsAtY",
    "pointsatz": "pointsAtZ", "preservealpha": "preserveAlpha",
    "preserveaspectratio": "preserveAspectRatio",
    "primitiveunits": "primitiveUnits", "refx": "refX", "refy": "refY",
    "repeatcount": "repeatCount", "repeatdur": "repeatDur",
    "requiredextensions": "requiredExtensions",
    "requiredfeatures": "requiredFeatures",
    "specularconstant": "specularConstant",
    "specularexponent": "specularExponent", "spreadmethod": "spreadMethod",
    "startoffset": "startOffset", "stddeviation": "stdDeviation",
    "stitchtiles": "stitchTiles", "surfacescale": "surfaceScale",
    "systemlanguage": "systemLanguage", "tablevalues": "tableValues",
    "targetx": "targetX", "targety": "targetY", "textlength": "textLength",
    "viewbox": "viewBox", "viewtarget": "viewTarget",
    "xchannelselector": "xChannelSelector",
    "ychannelselector": "yChannelSelector", "zoomandpan": "zoomAndPan",
}

FOREIGN_ATTR_ADJUST = {
    "xlink:actuate": ("xlink", "actuate"), "xlink:arcrole": ("xlink", "arcrole"),
    "xlink:href": ("xlink", "href"), "xlink:role": ("xlink", "role"),
    "xlink:show": ("xlink", "show"), "xlink:title": ("xlink", "title"),
    "xlink:type": ("xlink", "type"), "xml:lang": ("xml", "lang"),
    "xml:space": ("xml", "space"), "xmlns": ("xmlns", "xmlns"),
    "xmlns:xlink": ("xmlns", "xlink"),
}

FOREIGN_BREAKOUT = frozenset(
    """b big blockquote body br center code dd div dl dt em embed h1 h2 h3
    h4 h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s
    small span strong strike sub sup table tt u ul var""".split())

# insertion modes
(INITIAL, BEFORE_HTML, BEFORE_HEAD, IN_HEAD, AFTER_HEAD, IN_BODY, TEXT_MODE,
 IN_TABLE, IN_TABLE_TEXT, IN_CAPTION, IN_COLUMN_GROUP, IN_TABLE_BODY, IN_ROW,
 IN_CELL, IN_SELECT, IN_SELECT_IN_TABLE, IN_TEMPLATE, AFTER_BODY,
 IN_FRAMESET, AFTER_FRAMESET, AFTER_AFTER_BODY, AFTER_AFTER_FRAMESET,
 ) = range(22)

TABLEISH = frozenset("table tbody tfoot thead tr".split())

# -- quirks-mode classification (WHATWG "initial" insertion mode) -------
# Public-id prefix / exact tables from the spec (the same data html5ever
# ships in markup5ever data.rs — public knowledge, spec-normative).
_QUIRKY_PUBLIC_EXACT = frozenset(s.lower() for s in (
    "-//W3O//DTD W3 HTML Strict 3.0//EN//",
    "-/W3C/DTD HTML 4.0 Transitional/EN",
    "HTML",
))
_QUIRKY_SYSTEM_EXACT = frozenset((
    "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd",
))
_QUIRKY_PUBLIC_PREFIXES = tuple(s.lower() for s in (
    "+//Silmaril//dtd html Pro v0r11 19970101//",
    "-//AS//DTD HTML 3.0 asWedit + extensions//",
    "-//AdvaSoft Ltd//DTD HTML 3.0 asWedit + extensions//",
    "-//IETF//DTD HTML 2.0 Level 1//",
    "-//IETF//DTD HTML 2.0 Level 2//",
    "-//IETF//DTD HTML 2.0 Strict Level 1//",
    "-//IETF//DTD HTML 2.0 Strict Level 2//",
    "-//IETF//DTD HTML 2.0 Strict//",
    "-//IETF//DTD HTML 2.0//",
    "-//IETF//DTD HTML 2.1E//",
    "-//IETF//DTD HTML 3.0//",
    "-//IETF//DTD HTML 3.2 Final//",
    "-//IETF//DTD HTML 3.2//",
    "-//IETF//DTD HTML 3//",
    "-//IETF//DTD HTML Level 0//",
    "-//IETF//DTD HTML Level 1//",
    "-//IETF//DTD HTML Level 2//",
    "-//IETF//DTD HTML Level 3//",
    "-//IETF//DTD HTML Strict Level 0//",
    "-//IETF//DTD HTML Strict Level 1//",
    "-//IETF//DTD HTML Strict Level 2//",
    "-//IETF//DTD HTML Strict Level 3//",
    "-//IETF//DTD HTML Strict//",
    "-//IETF//DTD HTML//",
    "-//Metrius//DTD Metrius Presentational//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 2.0 Tables//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 3.0 Tables//",
    "-//Netscape Comm. Corp.//DTD HTML//",
    "-//Netscape Comm. Corp.//DTD Strict HTML//",
    "-//O'Reilly and Associates//DTD HTML 2.0//",
    "-//O'Reilly and Associates//DTD HTML Extended 1.0//",
    "-//O'Reilly and Associates//DTD HTML Extended Relaxed 1.0//",
    "-//SQ//DTD HTML 2.0 HoTMetaL + extensions//",
    "-//SoftQuad Software//DTD HoTMetaL PRO 6.0::19990601::"
    "extensions to HTML 4.0//",
    "-//SoftQuad//DTD HoTMetaL PRO 4.0::19971010::"
    "extensions to HTML 4.0//",
    "-//Spyglass//DTD HTML 2.0 Extended//",
    "-//Sun Microsystems Corp.//DTD HotJava HTML//",
    "-//Sun Microsystems Corp.//DTD HotJava Strict HTML//",
    "-//W3C//DTD HTML 3 1995-03-24//",
    "-//W3C//DTD HTML 3.2 Draft//",
    "-//W3C//DTD HTML 3.2 Final//",
    "-//W3C//DTD HTML 3.2//",
    "-//W3C//DTD HTML 3.2S Draft//",
    "-//W3C//DTD HTML 4.0 Frameset//",
    "-//W3C//DTD HTML 4.0 Transitional//",
    "-//W3C//DTD HTML Experimental 19960712//",
    "-//W3C//DTD HTML Experimental 970421//",
    "-//W3C//DTD W3 HTML//",
    "-//W3O//DTD W3 HTML 3.0//",
    "-//WebTechs//DTD Mozilla HTML 2.0//",
    "-//WebTechs//DTD Mozilla HTML//",
))
# quirks when the system id is MISSING, limited-quirks when present
_HTML401_PREFIXES = ("-//w3c//dtd html 4.01 frameset//",
                     "-//w3c//dtd html 4.01 transitional//")
_LIMITED_PREFIXES = ("-//w3c//dtd xhtml 1.0 frameset//",
                     "-//w3c//dtd xhtml 1.0 transitional//")

_DT_WS = "\t\n\f\r "


def _parse_doctype_ids(rest: str):
    """(public_id, system_id, force_quirks) from the raw declaration
    text between the doctype name and the terminating '>'.

    All three tokenizer lanes end a doctype at the FIRST '>' (see
    _scan.c scan_doctype) — which coincides with the spec: a '>' inside
    a quoted id is an abrupt-doctype-*-identifier error that closes the
    doctype with force-quirks on, so id content past it never matters."""
    n = len(rest)
    i = 0
    while i < n and rest[i] in _DT_WS:
        i += 1
    if i == n:
        return None, None, False

    def quoted(j):
        while j < n and rest[j] in _DT_WS:
            j += 1
        if j >= n or rest[j] not in "\"'":
            return None, j  # missing-quote -> bogus, force-quirks
        q = rest[j]
        k = rest.find(q, j + 1)
        if k < 0:
            return None, j  # abrupt (hit the '>' / EOF) -> force-quirks
        return rest[j + 1:k], k + 1

    kw = rest[i:i + 6].lower()
    if kw == "public":
        public, i = quoted(i + 6)
        if public is None:
            return None, None, True
        while i < n and rest[i] in _DT_WS:
            i += 1
        if i == n:
            return public, None, False
        system, i = quoted(i)
        if system is None:
            return public, None, True
        return public, system, False  # trailing junk: error, not quirks
    if kw == "system":
        system, i = quoted(i + 6)
        if system is None:
            return None, None, True
        return None, system, False  # trailing junk: error, not quirks
    return None, None, True  # bogus doctype


def doctype_quirks(name: str, rest: str, eof: bool) -> str:
    """The WHATWG initial-insertion-mode quirks decision for a doctype
    token — 'quirks' / 'limited-quirks' / 'no-quirks'.  Shared by the
    Python machine and the C fast lane (which hands back the raw
    post-name span) so the lanes cannot diverge."""
    public, system, force = _parse_doctype_ids(rest)
    if eof or force or name != "html":
        return "quirks"
    # ALL quirks conditions are evaluated before ANY limited-quirks
    # rule (spec order): a quirky SYSTEM id (the IBM dtd) wins even
    # when the public id matches a limited-quirks prefix.
    p = (public or "").lower()
    if public is not None and (
            p in _QUIRKY_PUBLIC_EXACT
            or p.startswith(_QUIRKY_PUBLIC_PREFIXES)
            or (system is None and p.startswith(_HTML401_PREFIXES))):
        return "quirks"
    if system is not None \
            and system.lower() in _QUIRKY_SYSTEM_EXACT:
        return "quirks"
    if public is not None and (
            p.startswith(_LIMITED_PREFIXES)
            or (system is not None and p.startswith(_HTML401_PREFIXES))):
        return "limited-quirks"
    return "no-quirks"


class _FmtEntry:
    """Active-formatting-elements entry (element id + token snapshot)."""
    __slots__ = ("el", "name", "attrs")

    def __init__(self, el, name, attrs):
        self.el = el
        self.name = name
        self.attrs = attrs


class TreeBuilder:
    def __init__(self, fragment_ctx=None):
        self.tree = Tree()
        self.open = []           # node ids
        self.afe = []            # _FmtEntry | MARKER
        self.mode = INITIAL
        self.original_mode = IN_BODY
        self.head_id = -1
        self.form_id = -1
        self.frameset_ok = True
        self.ignore_lf = False
        self.foster = False
        self.pending_table_text = []
        self.template_modes = []
        self.fragment_ctx = fragment_ctx  # context element name or None
        self.done = False
        self.tok = None

    # ------------------------------------------------------------------
    def parse_error(self, msg: str) -> None:
        """Accumulate a recoverable parse error on the tree (reference:
        TreeSink::parse_error -> Document.errors, document.rs:79-81).
        Recovery itself is unchanged — errors are observational."""
        self.tree.errors.append(msg)

    # ------------------------------------------------------------------
    def parse(self, html: str) -> Tree:
        from .ctokenizer import make_tokenizer

        self.tok = make_tokenizer(self, html)
        if self.fragment_ctx is None:
            # document parse: quirks unless (and until) a doctype in
            # INITIAL mode decides otherwise — every other way of
            # leaving INITIAL is the spec's anything-else -> quirks.
            # Fragment parses keep the Tree default no-quirks
            # (reference: manipulation.rs:25).
            self.tree.quirks_mode = "quirks"
        if self.fragment_ctx is not None:
            ctx = self.fragment_ctx
            root = self.tree.new_element("html")
            self.tree.append_child(0, root.id)
            self.open.append(root.id)
            if ctx == "template":
                self.template_modes.append(IN_TEMPLATE)
            self._reset_mode()
            if ctx in ("title", "textarea"):
                self.tok.set_raw("rcdata", ctx)
            elif ctx in ("style", "xmp", "iframe", "noembed", "noframes",
                         "noscript"):
                self.tok.set_raw("rawtext", ctx)
            elif ctx == "script":
                self.tok.set_raw("script", ctx)
            elif ctx == "plaintext":
                self.tok.set_raw("plaintext", ctx)
        self.tok.run()
        return self.tree

    # -- helpers --------------------------------------------------------
    def _node(self, nid):
        return self.tree.nodes[nid]

    def _current(self):
        return self.tree.nodes[self.open[-1]]

    def _adjusted_current(self):
        if self.fragment_ctx is not None and len(self.open) == 1:
            return ("ctx", self.fragment_ctx)  # html-ns context element
        n = self._current()
        return (n.ns, n.name)

    def _update_cdata_flag(self):
        if not self.open:
            self.tok.cdata_ok = False
            return
        if self.fragment_ctx is not None and len(self.open) == 1:
            self.tok.cdata_ok = False
            return
        self.tok.cdata_ok = self._current().ns != HTML_NS

    # scope checks ------------------------------------------------------
    def _in_scope(self, name, scope=DEFAULT_SCOPE):
        nodes = self.tree.nodes
        for nid in reversed(self.open):
            n = nodes[nid]
            if n.ns == HTML_NS and n.name == name:
                return True
            if (n.ns, n.name) in scope:
                return False
        return False

    def _el_in_scope(self, el_id, scope=DEFAULT_SCOPE):
        nodes = self.tree.nodes
        for nid in reversed(self.open):
            if nid == el_id:
                return True
            n = nodes[nid]
            if (n.ns, n.name) in scope:
                return False
        return False

    def _any_in_scope(self, names, scope=DEFAULT_SCOPE):
        nodes = self.tree.nodes
        for nid in reversed(self.open):
            n = nodes[nid]
            if n.ns == HTML_NS and n.name in names:
                return True
            if (n.ns, n.name) in scope:
                return False
        return False

    def _select_scope_ok(self, name):
        # select scope: all element types EXCEPT optgroup and option
        nodes = self.tree.nodes
        for nid in reversed(self.open):
            n = nodes[nid]
            if n.ns == HTML_NS and n.name == name:
                return True
            if not (n.ns == HTML_NS and n.name in ("optgroup", "option")):
                return False
        return False

    def _is_special(self, node):
        if node.ns == HTML_NS:
            return node.name in SPECIAL_HTML
        if node.ns == MATHML_NS:
            return node.name in SPECIAL_MATHML
        if node.ns == SVG_NS:
            return node.name in SPECIAL_SVG
        return False

    # insertion ---------------------------------------------------------
    def _insertion_point(self, override=None):
        """Returns (parent_id, before_id) — before_id == -1 means append."""
        target = override if override is not None else self.open[-1]
        tnode = self.tree.nodes[target]
        if (self.foster and tnode.ns == HTML_NS and tnode.name in TABLEISH):
            self.parse_error("foster-parenting")
            nodes = self.tree.nodes
            last_table = -1
            last_template = -1
            for i in range(len(self.open) - 1, -1, -1):
                n = nodes[self.open[i]]
                if n.name == "table" and n.ns == HTML_NS and last_table == -1:
                    last_table = i
                if (n.name == "template" and n.ns == HTML_NS
                        and last_template == -1):
                    last_template = i
            if last_template != -1 and (last_table == -1
                                        or last_template > last_table):
                tc = nodes[self.open[last_template]].template_contents
                return (tc, -1)
            if last_table == -1:
                return (self.open[0], -1)
            table_id = self.open[last_table]
            if nodes[table_id].parent != -1:
                return (nodes[table_id].parent, table_id)
            return (self.open[last_table - 1], -1)
        if tnode.kind == ELEMENT and tnode.name == "template" \
                and tnode.ns == HTML_NS:
            return (tnode.template_contents, -1)
        return (target, -1)

    def _insert_at(self, nid, parent_id, before_id):
        if before_id == -1:
            self.tree.append_child(parent_id, nid)
        else:
            self.tree.insert_before(before_id, nid)

    def _insert_text(self, text, override=None):
        """Insert characters, merging with an adjacent text node
        (reference TreeSink: document.rs:162-215)."""
        parent_id, before_id = self._insertion_point(override)
        nodes = self.tree.nodes
        if before_id != -1:
            prev = nodes[before_id].prev
            if prev != -1 and nodes[prev].kind == TEXT:
                nodes[prev].data += text
                return
            t = self.tree.new_text(text)
            self.tree.insert_before(before_id, t.id)
            return
        last = nodes[parent_id].last_child
        if last != -1 and nodes[last].kind == TEXT:
            nodes[last].data += text
            return
        t = self.tree.new_text(text)
        self.tree.append_child(parent_id, t.id)

    def _insert_element(self, name, attrs, ns=HTML_NS, push=True):
        el = self.tree.new_element(name, ns, attrs)
        if ns == HTML_NS and name == "template":
            doc = self.tree.new_node(DOCUMENT)
            el.template_contents = doc.id
        parent_id, before_id = self._insertion_point()
        self._insert_at(el.id, parent_id, before_id)
        if push:
            self.open.append(el.id)
        return el

    def _add_attrs_if_missing(self, nid, attrs):
        node = self.tree.nodes[nid]
        have = {a[1] for a in node.attrs}
        for a in attrs:
            if a[1] not in have:
                node.attrs.append(a)
                have.add(a[1])

    # stack / implied-end helpers --------------------------------------
    def _pop(self):
        return self.open.pop()

    def _pop_until(self, *names):
        nodes = self.tree.nodes
        while self.open:
            nid = self.open.pop()
            n = nodes[nid]
            if n.ns == HTML_NS and n.name in names:
                return nid
        return -1

    def _generate_implied(self, except_for=()):
        nodes = self.tree.nodes
        while self.open:
            n = nodes[self.open[-1]]
            if (n.ns == HTML_NS and n.name in IMPLIED_END
                    and n.name not in except_for):
                self.open.pop()
            else:
                break

    def _close_p(self):
        if self._in_scope("p", BUTTON_SCOPE):
            self._generate_implied(("p",))
            self._pop_until("p")

    def _clear_to_table_context(self):
        nodes = self.tree.nodes
        while True:
            n = nodes[self.open[-1]]
            if n.ns == HTML_NS and n.name in ("table", "template", "html"):
                return
            self.open.pop()

    def _clear_to_table_body_context(self):
        nodes = self.tree.nodes
        while True:
            n = nodes[self.open[-1]]
            if n.ns == HTML_NS and n.name in ("tbody", "tfoot", "thead",
                                              "template", "html"):
                return
            self.open.pop()

    def _clear_to_row_context(self):
        nodes = self.tree.nodes
        while True:
            n = nodes[self.open[-1]]
            if n.ns == HTML_NS and n.name in ("tr", "template", "html"):
                return
            self.open.pop()

    # active formatting elements ---------------------------------------
    def _afe_push(self, el_id, name, attrs):
        # Noah's Ark clause: at most 3 identical entries since last marker
        key = (name, tuple(sorted((a[1], a[2]) for a in attrs)))
        count = 0
        for i in range(len(self.afe) - 1, -1, -1):
            e = self.afe[i]
            if e is MARKER:
                break
            ekey = (e.name, tuple(sorted((a[1], a[2]) for a in e.attrs)))
            if ekey == key:
                count += 1
                if count == 3:
                    del self.afe[i]
                    break
        self.afe.append(_FmtEntry(el_id, name,
                                  [list(a) for a in attrs]))

    def _afe_clear_to_marker(self):
        while self.afe:
            e = self.afe.pop()
            if e is MARKER:
                break

    def _reconstruct_afe(self):
        afe = self.afe
        if not afe:
            return
        last = afe[-1]
        if last is MARKER or last.el in self.open:
            return
        i = len(afe) - 1
        while i >= 0:
            e = afe[i]
            if e is MARKER or (e is not MARKER and e.el in self.open):
                i += 1
                break
            i -= 1
        if i < 0:
            i = 0
        for j in range(i, len(afe)):
            e = afe[j]
            el = self._insert_element(e.name, [list(a) for a in e.attrs])
            e.el = el.id

    # adoption agency (WHATWG; html5lib-style bookkeeping) --------------
    def _adoption_agency(self, name):
        nodes = self.tree.nodes
        cur = self._current()
        if cur.ns == HTML_NS and cur.name == name:
            cur_id = self.open[-1]
            # spec step 1: current node matches and is NOT in the afe
            # list -> just pop
            entry = None
            for i in range(len(self.afe) - 1, -1, -1):
                e = self.afe[i]
                if e is MARKER:
                    break
                if e.name == name:
                    entry = e
                    break
            if entry is None or all(
                    e is MARKER or e.el != cur_id for e in self.afe):
                self.open.pop()
                return
            if entry.el == cur_id:
                # well-formed </fmt> of the current element: no deeper
                # special element can exist, so the furthest-block
                # search is vacuous and the full agency reduces to
                # pop + afe remove.  Not a parse error.
                self.open.pop()
                self.afe.remove(entry)
                return
        self.parse_error("misnested-tag-</%s>" % name)
        for _ in range(8):
            fmt_entry = None
            for i in range(len(self.afe) - 1, -1, -1):
                e = self.afe[i]
                if e is MARKER:
                    break
                if e.name == name:
                    fmt_entry = e
                    break
            if fmt_entry is None:
                self._any_other_end_tag(name)
                return
            if fmt_entry.el not in self.open:
                self.afe.remove(fmt_entry)
                return
            if not self._el_in_scope(fmt_entry.el):
                return
            fmt_el = fmt_entry.el
            si = self.open.index(fmt_el)
            furthest = None
            for j in range(si + 1, len(self.open)):
                if self._is_special(nodes[self.open[j]]):
                    furthest = self.open[j]
                    break
            if furthest is None:
                del self.open[si:]
                self.afe.remove(fmt_entry)
                return
            common_ancestor = self.open[si - 1]
            bookmark = self.afe.index(fmt_entry)
            last_node = furthest
            node = furthest
            inner = 0
            node_idx = self.open.index(furthest)
            while True:
                inner += 1
                node_idx -= 1
                node = self.open[node_idx]
                # spec order: the formatting-element break comes BEFORE
                # the counter>3 AFE eviction (otherwise the entry we are
                # adopting gets removed out from under us)
                if node == fmt_el:
                    break
                node_entry = None
                for e in self.afe:
                    if e is not MARKER and e.el == node:
                        node_entry = e
                        break
                if inner > 3 and node_entry is not None:
                    self.afe.remove(node_entry)
                    if self.afe.index(fmt_entry) < bookmark:
                        bookmark -= 1
                    node_entry = None
                if node_entry is None:
                    self.open.remove(node)
                    continue
                clone = self.tree.new_element(
                    node_entry.name, HTML_NS,
                    [list(a) for a in node_entry.attrs])
                node_entry.el = clone.id
                self.open[self.open.index(node)] = clone.id
                node = clone.id
                if last_node == furthest:
                    bookmark = self.afe.index(node_entry) + 1
                self.tree.remove_from_parent(last_node)
                self.tree.append_child(node, last_node)
                last_node = node
            self.tree.remove_from_parent(last_node)
            ca = nodes[common_ancestor]
            if ca.ns == HTML_NS and ca.name in TABLEISH:
                saved = self.foster
                self.foster = True
                pid, bid = self._insertion_point(common_ancestor)
                self.foster = saved
                self._insert_at(last_node, pid, bid)
            elif ca.ns == HTML_NS and ca.name == "template":
                self.tree.append_child(ca.template_contents, last_node)
            else:
                self.tree.append_child(common_ancestor, last_node)
            clone2 = self.tree.new_element(
                fmt_entry.name, HTML_NS, [list(a) for a in fmt_entry.attrs])
            self.tree.reparent_children(furthest, clone2.id)
            self.tree.append_child(furthest, clone2.id)
            bookmark = min(bookmark, len(self.afe))
            old_idx = self.afe.index(fmt_entry)
            self.afe.remove(fmt_entry)
            if old_idx < bookmark:
                bookmark -= 1
            self.afe.insert(bookmark, _FmtEntry(
                clone2.id, fmt_entry.name, [list(a) for a in fmt_entry.attrs]))
            self.open.remove(fmt_el)
            self.open.insert(self.open.index(furthest) + 1, clone2.id)

    def _any_other_end_tag(self, name):
        nodes = self.tree.nodes
        for i in range(len(self.open) - 1, -1, -1):
            n = nodes[self.open[i]]
            if n.ns == HTML_NS and n.name == name:
                self._generate_implied((name,))
                while len(self.open) > i:
                    self.open.pop()
                return
            if self._is_special(n):
                self.parse_error("unexpected-end-tag-</%s>" % name)
                return

    # reset insertion mode ---------------------------------------------
    def _reset_mode(self):
        nodes = self.tree.nodes
        for i in range(len(self.open) - 1, -1, -1):
            last = i == 0
            if last and self.fragment_ctx is not None:
                name = self.fragment_ctx
            else:
                node = nodes[self.open[i]]
                name = node.name
                # the reset algorithm's name cases mean HTML elements:
                # a FOREIGN <template>/<select>/... (e.g. inside <svg>)
                # must not match (an svg "template" has no entry in
                # template_modes — found by the deep soup fuzz)
                if node.ns != HTML_NS:
                    if last:
                        self.mode = IN_BODY
                        return
                    continue
            if name == "select":
                mode = IN_SELECT
                if not last:
                    for j in range(i - 1, 0, -1):
                        nj = nodes[self.open[j]]
                        if nj.ns != HTML_NS:
                            continue
                        if nj.name == "template":
                            break
                        if nj.name == "table":
                            mode = IN_SELECT_IN_TABLE
                            break
                self.mode = mode
                return
            if name in ("td", "th") and not last:
                self.mode = IN_CELL
                return
            if name == "tr":
                self.mode = IN_ROW
                return
            if name in ("tbody", "thead", "tfoot"):
                self.mode = IN_TABLE_BODY
                return
            if name == "caption":
                self.mode = IN_CAPTION
                return
            if name == "colgroup":
                self.mode = IN_COLUMN_GROUP
                return
            if name == "table":
                self.mode = IN_TABLE
                return
            if name == "template":
                self.mode = self.template_modes[-1]
                return
            if name == "head" and not last:
                self.mode = IN_HEAD
                return
            if name == "body":
                self.mode = IN_BODY
                return
            if name == "frameset":
                self.mode = IN_FRAMESET
                return
            if name == "html":
                self.mode = BEFORE_HEAD if self.head_id == -1 else AFTER_HEAD
                return
            if last:
                self.mode = IN_BODY
                return

    # ------------------------------------------------------------------
    # token entry points (tokenizer sink interface)
    # ------------------------------------------------------------------
    def process_doctype(self, name, rest="", eof=False):
        """*rest* is the raw declaration text between the name and the
        terminating '>' (or input end, with ``eof=True``) — consumed
        only for the quirks decision; the node keeps the name-only
        shape the serializer emits (ids stay untracked, like the node
        the reference golden corpus pins)."""
        self.ignore_lf = False
        if self.done:
            return
        if self.mode == INITIAL:
            d = self.tree.new_node(DOCTYPE)
            d.data = name
            d.data2 = (None, None)
            self.tree.append_child(0, d.id)
            self.tree.quirks_mode = doctype_quirks(name, rest, eof)
            self.mode = BEFORE_HTML
        else:  # parse error, ignore the token
            self.parse_error("unexpected-doctype")

    def process_comment(self, text):
        self.ignore_lf = False
        if self.done:
            return
        if self.mode == IN_TABLE_TEXT:
            self._flush_table_text()
        if self.mode in (INITIAL, BEFORE_HTML, AFTER_AFTER_BODY,
                         AFTER_AFTER_FRAMESET):
            c = self.tree.new_comment(text)
            self.tree.append_child(0, c.id)
            return
        if self.mode == AFTER_BODY:
            c = self.tree.new_comment(text)
            self.tree.append_child(self.open[0], c.id)
            return
        c = self.tree.new_comment(text)
        parent_id, before_id = self._insertion_point()
        self._insert_at(c.id, parent_id, before_id)

    def process_chars(self, text):
        if self.done or not text:
            return
        if self.ignore_lf:
            self.ignore_lf = False
            if text[0] == "\n":
                text = text[1:]
                if not text:
                    return
        self._chars(text)

    def process_start_tag(self, name, attrs, self_closing):
        self.ignore_lf = False
        if self.done:
            return
        if self._dispatch_foreign(("start", name)):
            self._foreign_start(name, attrs, self_closing)
        else:
            self._start(name, attrs, self_closing)
        self._update_cdata_flag()

    def process_end_tag(self, name):
        self.ignore_lf = False
        if self.done:
            return
        if self._dispatch_foreign(("end", name)):
            self._foreign_end(name)
        else:
            self._end(name)
        self._update_cdata_flag()

    def process_eof(self):
        if self.done:
            return
        self._eof()

    # -- tree construction dispatcher (foreign content) -----------------
    def _dispatch_foreign(self, token):
        if not self.open:
            return False
        if self.fragment_ctx is not None and len(self.open) == 1:
            return False
        n = self._current()
        if n.ns == HTML_NS:
            return False
        kind, name = token
        if n.ns == MATHML_NS and n.name in ("mi", "mo", "mn", "ms", "mtext"):
            if kind == "start" and name not in ("mglyph", "malignmark"):
                return False
            if kind == "chars":
                return False
        if n.ns == MATHML_NS and n.name == "annotation-xml" \
                and kind == "start" and name == "svg":
            return False
        if self._is_html_integration_point(n):
            if kind in ("start", "chars"):
                return False
        return True

    def _is_html_integration_point(self, n):
        if n.ns == SVG_NS and n.name in ("foreignObject", "desc", "title"):
            return True
        if n.ns == MATHML_NS and n.name == "annotation-xml":
            enc = None
            for a in n.attrs:
                if a[1] == "encoding":
                    enc = a[2].lower()
            return enc in ("text/html", "application/xhtml+xml")
        return False

    # ------------------------------------------------------------------
    # character tokens
    # ------------------------------------------------------------------
    def _chars(self, text):
        mode = self.mode
        # fast path: ordinary text in body under an HTML-ns element —
        # the overwhelmingly common case; semantics identical to the
        # IN_BODY tail below (the foreign-content branch is a no-op
        # for HTML-ns current nodes)
        if mode == IN_BODY and self.open \
                and self.tree.nodes[self.open[-1]].ns == HTML_NS:
            if "\x00" in text:
                text = text.replace("\x00", "")
                if not text:
                    return
            self._reconstruct_afe()
            self._insert_text(text)
            if self.frameset_ok and text.strip(WS):
                self.frameset_ok = False
            return
        # foreign content check for char tokens
        if self.open and not (self.fragment_ctx is not None
                              and len(self.open) == 1):
            n = self._current()
            if n.ns != HTML_NS:
                in_mtext = (n.ns == MATHML_NS and
                            n.name in ("mi", "mo", "mn", "ms", "mtext"))
                if not in_mtext and not self._is_html_integration_point(n):
                    text = text.replace("\x00", "�")
                    self._insert_text(text)
                    if text.strip(WS):
                        self.frameset_ok = False
                    return
        if mode in (INITIAL, BEFORE_HTML, BEFORE_HEAD):
            stripped = text.lstrip(WS)
            if not stripped:
                return
            self._anything_else_to_body()
            self._chars(stripped)
            return
        if mode in (IN_HEAD, AFTER_HEAD, IN_COLUMN_GROUP, AFTER_FRAMESET,
                    IN_FRAMESET, AFTER_BODY, AFTER_AFTER_BODY,
                    AFTER_AFTER_FRAMESET):
            # leading whitespace is inserted / rest reprocessed
            i = 0
            n = len(text)
            while i < n and text[i] in WS:
                i += 1
            ws, rest = text[:i], text[i:]
            if ws:
                if mode in (AFTER_BODY, AFTER_AFTER_BODY,
                            AFTER_AFTER_FRAMESET):
                    # "process per in body rules"
                    saved = self.mode
                    self.mode = IN_BODY
                    self._chars(ws)
                    self.mode = saved
                else:
                    self._insert_text(ws)
            if not rest:
                return
            if mode == IN_HEAD:
                self.open.pop()
                self.mode = AFTER_HEAD
                self._chars(rest)
            elif mode == AFTER_HEAD:
                self._insert_element("body", [])
                self.mode = IN_BODY
                self._chars(rest)
            elif mode == IN_COLUMN_GROUP:
                if self._current().name == "colgroup":
                    self.open.pop()
                    self.mode = IN_TABLE
                    self._chars(rest)
            elif mode in (AFTER_BODY, AFTER_AFTER_BODY):
                self.mode = IN_BODY
                self._chars(rest)
            # frameset modes ignore non-ws chars
            return
        if mode in (IN_TABLE, IN_TABLE_BODY, IN_ROW) \
                and self._current().ns == HTML_NS \
                and self._current().name in ("table", "tbody", "tfoot",
                                             "thead", "tr", "template"):
            # IN_TABLE_BODY / IN_ROW delegate character tokens to the
            # in-table rules ("anything else" clause), whose character
            # rule buffers pending table text whenever the CURRENT node
            # is table/tbody/tfoot/thead/tr/template — so whitespace
            # between rows/cells lands inside tbody/tr with no error
            # (html5ever parity; previously it was foster-parented)
            self.pending_table_text = []
            self.original_mode = self.mode
            self.mode = IN_TABLE_TEXT
            self._chars(text)
            return
        if mode == IN_TABLE_TEXT:
            self.pending_table_text.append(text.replace("\x00", ""))
            return
        if mode in (IN_TABLE, IN_TABLE_BODY, IN_ROW):
            # anything-else: foster-parented in-body processing
            self.foster = True
            saved = self.mode
            self.mode = IN_BODY
            self._chars(text)
            self.mode = saved
            self.foster = False
            return
        if mode in (IN_CAPTION, IN_CELL, IN_TEMPLATE):
            saved = self.mode
            self.mode = IN_BODY
            self._chars(text)
            self.mode = saved
            return
        if mode in (IN_SELECT, IN_SELECT_IN_TABLE):
            self._insert_text(text.replace("\x00", ""))
            return
        if mode == TEXT_MODE:
            self._insert_text(text)
            return
        # IN_BODY and friends
        text = text.replace("\x00", "")
        if not text:
            return
        self._reconstruct_afe()
        self._insert_text(text)
        if text.strip(WS):
            self.frameset_ok = False

    def _flush_table_text(self):
        pending = "".join(self.pending_table_text)
        self.pending_table_text = []
        if pending:
            if pending.strip(WS):
                # non-whitespace: foster-parent via in-body rules
                self.foster = True
                saved = self.mode
                self.mode = IN_BODY
                self._reconstruct_afe()
                self._insert_text(pending)
                self.frameset_ok = False
                self.mode = saved
                self.foster = False
            else:
                self._insert_text(pending)
        self.mode = self.original_mode

    def _anything_else_to_body(self):
        """Advance INITIAL/BEFORE_HTML/BEFORE_HEAD/... to IN_BODY by
        synthesizing the implied html/head/body elements."""
        if self.mode == INITIAL:
            self.mode = BEFORE_HTML
        if self.mode == BEFORE_HTML:
            root = self.tree.new_element("html")
            self.tree.append_child(0, root.id)
            self.open.append(root.id)
            self.mode = BEFORE_HEAD
        if self.mode == BEFORE_HEAD:
            el = self._insert_element("head", [])
            self.head_id = el.id
            self.mode = IN_HEAD
        if self.mode == IN_HEAD:
            self.open.pop()
            self.mode = AFTER_HEAD
        if self.mode == AFTER_HEAD:
            self._insert_element("body", [])
            self.mode = IN_BODY

    # ------------------------------------------------------------------
    # start tags
    # ------------------------------------------------------------------
    def _start(self, name, attrs, self_closing):
        if self.mode == IN_TABLE_TEXT:
            self._flush_table_text()
        mode = self.mode
        if mode in (INITIAL, BEFORE_HTML, BEFORE_HEAD):
            if name == "html" and mode != INITIAL:
                if mode == BEFORE_HTML:
                    root = self.tree.new_element("html", HTML_NS, attrs)
                    self.tree.append_child(0, root.id)
                    self.open.append(root.id)
                    self.mode = BEFORE_HEAD
                    return
                # BEFORE_HEAD: in-body rules -> merge attrs
                self._add_attrs_if_missing(self.open[0], attrs)
                return
            if mode == BEFORE_HEAD and name == "head":
                el = self._insert_element("head", attrs)
                self.head_id = el.id
                self.mode = IN_HEAD
                return
            self._anything_else_to_body_until(name)
            self._start(name, attrs, self_closing)
            return
        if mode == IN_HEAD:
            r = self._start_in_head(name, attrs, self_closing)
            if r:
                return
            # anything else: pop head, reprocess in AFTER_HEAD
            self.open.pop()
            self.mode = AFTER_HEAD
            self._start(name, attrs, self_closing)
            return
        if mode == AFTER_HEAD:
            if name == "html":
                self._in_body_start(name, attrs, self_closing)
                return
            if name == "body":
                self._insert_element("body", attrs)
                self.frameset_ok = False
                self.mode = IN_BODY
                return
            if name == "frameset":
                self._insert_element("frameset", attrs)
                self.mode = IN_FRAMESET
                return
            if name in IN_HEAD_START:
                # parse error: re-enter head
                self.open.append(self.head_id)
                self._start_in_head(name, attrs, self_closing)
                if self.head_id in self.open:
                    self.open.remove(self.head_id)
                return
            if name == "head":
                return
            self._insert_element("body", [])
            self.mode = IN_BODY
            self._start(name, attrs, self_closing)
            return
        if mode == IN_BODY:
            self._in_body_start(name, attrs, self_closing)
            return
        if mode == TEXT_MODE:
            return  # cannot happen (tokenizer in raw mode)
        if mode == IN_TABLE:
            self._in_table_start(name, attrs, self_closing)
            return
        if mode == IN_CAPTION:
            if name in ("caption", "col", "colgroup", "tbody", "td", "tfoot",
                        "th", "thead", "tr"):
                if self._in_scope("caption", TABLE_SCOPE):
                    self._generate_implied()
                    self._pop_until("caption")
                    self._afe_clear_to_marker()
                    self.mode = IN_TABLE
                    self._start(name, attrs, self_closing)
                return
            self._in_body_start(name, attrs, self_closing)
            return
        if mode == IN_COLUMN_GROUP:
            if name == "html":
                self._in_body_start(name, attrs, self_closing)
                return
            if name == "col":
                self._insert_element("col", attrs)
                self.open.pop()
                return
            if name == "template":
                self._start_in_head(name, attrs, self_closing)
                return
            if self._current().name == "colgroup":
                self.open.pop()
                self.mode = IN_TABLE
                self._start(name, attrs, self_closing)
            return
        if mode == IN_TABLE_BODY:
            if name == "tr":
                self._clear_to_table_body_context()
                self._insert_element("tr", attrs)
                self.mode = IN_ROW
                return
            if name in ("th", "td"):
                self._clear_to_table_body_context()
                self._insert_element("tr", [])
                self.mode = IN_ROW
                self._start(name, attrs, self_closing)
                return
            if name in ("caption", "col", "colgroup", "tbody", "tfoot",
                        "thead"):
                if self._any_in_scope(("tbody", "thead", "tfoot"),
                                      TABLE_SCOPE):
                    self._clear_to_table_body_context()
                    self.open.pop()
                    self.mode = IN_TABLE
                    self._start(name, attrs, self_closing)
                return
            self._in_table_start(name, attrs, self_closing)
            return
        if mode == IN_ROW:
            if name in ("th", "td"):
                self._clear_to_row_context()
                self._insert_element(name, attrs)
                self.mode = IN_CELL
                self.afe.append(MARKER)
                return
            if name in ("caption", "col", "colgroup", "tbody", "tfoot",
                        "thead", "tr"):
                if self._in_scope("tr", TABLE_SCOPE):
                    self._clear_to_row_context()
                    self.open.pop()
                    self.mode = IN_TABLE_BODY
                    self._start(name, attrs, self_closing)
                return
            self._in_table_start(name, attrs, self_closing)
            return
        if mode == IN_CELL:
            if name in ("caption", "col", "colgroup", "tbody", "td", "tfoot",
                        "th", "thead", "tr"):
                if self._any_in_scope(("td", "th"), TABLE_SCOPE):
                    self._close_cell()
                    self._start(name, attrs, self_closing)
                return
            self._in_body_start(name, attrs, self_closing)
            return
        if mode in (IN_SELECT, IN_SELECT_IN_TABLE):
            if mode == IN_SELECT_IN_TABLE and name in (
                    "caption", "table", "tbody", "tfoot", "thead",
                    "tr", "td", "th"):
                self._pop_until("select")
                self._reset_mode()
                self._start(name, attrs, self_closing)
                return
            self._in_select_start(name, attrs, self_closing)
            return
        if mode == IN_TEMPLATE:
            if name in IN_HEAD_START:
                self._start_in_head(name, attrs, self_closing)
                return
            if name in ("caption", "colgroup", "tbody", "tfoot", "thead"):
                self.template_modes.pop()
                self.template_modes.append(IN_TABLE)
                self.mode = IN_TABLE
                self._start(name, attrs, self_closing)
                return
            if name == "col":
                self.template_modes.pop()
                self.template_modes.append(IN_COLUMN_GROUP)
                self.mode = IN_COLUMN_GROUP
                self._start(name, attrs, self_closing)
                return
            if name == "tr":
                self.template_modes.pop()
                self.template_modes.append(IN_TABLE_BODY)
                self.mode = IN_TABLE_BODY
                self._start(name, attrs, self_closing)
                return
            if name in ("td", "th"):
                self.template_modes.pop()
                self.template_modes.append(IN_ROW)
                self.mode = IN_ROW
                self._start(name, attrs, self_closing)
                return
            self.template_modes.pop()
            self.template_modes.append(IN_BODY)
            self.mode = IN_BODY
            self._start(name, attrs, self_closing)
            return
        if mode in (AFTER_BODY, AFTER_AFTER_BODY):
            if name == "html":
                self._in_body_start(name, attrs, self_closing)
                return
            self.mode = IN_BODY
            self._start(name, attrs, self_closing)
            return
        if mode == IN_FRAMESET:
            if name == "html":
                self._in_body_start(name, attrs, self_closing)
            elif name == "frameset":
                self._insert_element("frameset", attrs)
            elif name == "frame":
                self._insert_element("frame", attrs)
                self.open.pop()
            elif name == "noframes":
                self._start_in_head(name, attrs, self_closing)
            return
        if mode in (AFTER_FRAMESET, AFTER_AFTER_FRAMESET):
            if name == "html":
                self._in_body_start(name, attrs, self_closing)
            elif name == "noframes":
                self._start_in_head(name, attrs, self_closing)
            return

    def _anything_else_to_body_until(self, name):
        """Advance early modes enough to process a start tag *name*."""
        if self.mode == INITIAL:
            self.mode = BEFORE_HTML
        if self.mode == BEFORE_HTML:
            if name == "html":
                return
            root = self.tree.new_element("html")
            self.tree.append_child(0, root.id)
            self.open.append(root.id)
            self.mode = BEFORE_HEAD
        if self.mode == BEFORE_HEAD:
            if name in ("html", "head"):
                return
            el = self._insert_element("head", [])
            self.head_id = el.id
            self.mode = IN_HEAD

    def _generic_raw(self, name, attrs, kind):
        self._insert_element(name, attrs)
        self.tok.set_raw(kind, name)
        self.original_mode = self.mode
        self.mode = TEXT_MODE

    def _start_in_head(self, name, attrs, self_closing):
        """Returns True if the token was handled by in-head rules."""
        if name == "html":
            self._in_body_start(name, attrs, self_closing)
            return True
        if name in ("base", "basefont", "bgsound", "link", "meta"):
            self._insert_element(name, attrs)
            self.open.pop()
            return True
        if name == "title":
            self._generic_raw(name, attrs, "rcdata")
            return True
        if name in ("noframes", "style", "noscript"):
            # scripting_enabled=True -> noscript is raw text
            self._generic_raw(name, attrs, "rawtext")
            return True
        if name == "script":
            self._generic_raw(name, attrs, "script")
            return True
        if name == "template":
            self._insert_element(name, attrs)
            self.afe.append(MARKER)
            self.frameset_ok = False
            self.mode = IN_TEMPLATE
            self.template_modes.append(IN_TEMPLATE)
            return True
        if name == "head":
            return True  # parse error, ignore
        return False

    def _in_select_start(self, name, attrs, self_closing):
        if name == "html":
            self._in_body_start(name, attrs, self_closing)
            return
        if name == "option":
            if self._current().name == "option":
                self.open.pop()
            self._insert_element(name, attrs)
            return
        if name == "optgroup":
            if self._current().name == "option":
                self.open.pop()
            if self._current().name == "optgroup":
                self.open.pop()
            self._insert_element(name, attrs)
            return
        if name == "hr":
            if self._current().name == "option":
                self.open.pop()
            if self._current().name == "optgroup":
                self.open.pop()
            self._insert_element(name, attrs)
            self.open.pop()
            return
        if name == "select":
            if self._select_scope_ok("select"):
                self._pop_until("select")
                self._reset_mode()
            return
        if name in ("input", "keygen", "textarea"):
            if self._select_scope_ok("select"):
                self._pop_until("select")
                self._reset_mode()
                self._start(name, attrs, False)
            return
        if name in ("script", "template"):
            self._start_in_head(name, attrs, self_closing)
            return
        # anything else: ignore

    def _in_table_start(self, name, attrs, self_closing):
        if name == "caption":
            self._clear_to_table_context()
            self.afe.append(MARKER)
            self._insert_element(name, attrs)
            self.mode = IN_CAPTION
            return
        if name == "colgroup":
            self._clear_to_table_context()
            self._insert_element(name, attrs)
            self.mode = IN_COLUMN_GROUP
            return
        if name == "col":
            self._clear_to_table_context()
            self._insert_element("colgroup", [])
            self.mode = IN_COLUMN_GROUP
            self._start(name, attrs, self_closing)
            return
        if name in ("tbody", "tfoot", "thead"):
            self._clear_to_table_context()
            self._insert_element(name, attrs)
            self.mode = IN_TABLE_BODY
            return
        if name in ("td", "th", "tr"):
            self._clear_to_table_context()
            self._insert_element("tbody", [])
            self.mode = IN_TABLE_BODY
            self._start(name, attrs, self_closing)
            return
        if name == "table":
            if self._in_scope("table", TABLE_SCOPE):
                self._pop_until("table")
                self._reset_mode()
                self._start(name, attrs, self_closing)
            return
        if name in ("style", "script", "template"):
            self._start_in_head(name, attrs, self_closing)
            return
        if name == "input":
            typ = ""
            for a in attrs:
                if a[1] == "type":
                    typ = a[2].lower()
            if typ == "hidden":
                self._insert_element(name, attrs)
                self.open.pop()
                return
            # else fall through to anything-else
        if name == "form":
            if self.form_id == -1 and not self._template_on_stack():
                el = self._insert_element(name, attrs)
                self.form_id = el.id
                self.open.pop()
            return
        # anything else: foster-parented in-body processing
        self.foster = True
        saved = self.mode
        self.mode = IN_BODY
        self._in_body_start(name, attrs, self_closing)
        if self.mode == IN_BODY:
            self.mode = saved
        elif self.mode == IN_SELECT and saved in (
                IN_TABLE, IN_CAPTION, IN_TABLE_BODY, IN_ROW, IN_CELL):
            # in-body <select> picks select-in-table when the REAL mode
            # is a table mode — the wrapper masked it as IN_BODY
            self.mode = IN_SELECT_IN_TABLE
        self.foster = False

    def _template_on_stack(self):
        nodes = self.tree.nodes
        return any(nodes[nid].name == "template"
                   and nodes[nid].ns == HTML_NS for nid in self.open)

    def _close_cell(self):
        self._generate_implied()
        self._pop_until("td", "th")
        self._afe_clear_to_marker()
        self.mode = IN_ROW

    # ------------------------------------------------------------------
    # in-body start tags
    # ------------------------------------------------------------------
    def _in_body_start(self, name, attrs, self_closing):
        if name == "html":
            if not self._template_on_stack():
                self._add_attrs_if_missing(self.open[0], attrs)
            return
        if name in IN_HEAD_START:
            self._start_in_head(name, attrs, self_closing)
            return
        if name == "body":
            if len(self.open) > 1:
                body = self.tree.nodes[self.open[1]]
                if body.name == "body" and not self._template_on_stack():
                    self.frameset_ok = False
                    self._add_attrs_if_missing(self.open[1], attrs)
            return
        if name == "frameset":
            if not self.frameset_ok or len(self.open) < 2:
                return
            body = self.tree.nodes[self.open[1]]
            if body.name != "body":
                return
            self.tree.remove_from_parent(self.open[1])
            while len(self.open) > 1:
                self.open.pop()
            self._insert_element("frameset", attrs)
            self.mode = IN_FRAMESET
            return
        if name in BLOCK_CLOSERS:
            self._close_p()
            self._insert_element(name, attrs)
            return
        if name in HEADINGS:
            self._close_p()
            if self._current().name in HEADINGS \
                    and self._current().ns == HTML_NS:
                self.open.pop()
            self._insert_element(name, attrs)
            return
        if name in ("pre", "listing"):
            self._close_p()
            self._insert_element(name, attrs)
            self.ignore_lf = True
            self.frameset_ok = False
            return
        if name == "form":
            if self.form_id != -1 and not self._template_on_stack():
                return
            self._close_p()
            el = self._insert_element(name, attrs)
            if not self._template_on_stack():
                self.form_id = el.id
            return
        if name == "li":
            self.frameset_ok = False
            nodes = self.tree.nodes
            for i in range(len(self.open) - 1, -1, -1):
                n = nodes[self.open[i]]
                if n.ns == HTML_NS and n.name == "li":
                    self._generate_implied(("li",))
                    self._pop_until("li")
                    break
                if self._is_special(n) and n.name not in ("address", "div",
                                                          "p"):
                    break
            self._close_p()
            self._insert_element(name, attrs)
            return
        if name in ("dd", "dt"):
            self.frameset_ok = False
            nodes = self.tree.nodes
            for i in range(len(self.open) - 1, -1, -1):
                n = nodes[self.open[i]]
                if n.ns == HTML_NS and n.name in ("dd", "dt"):
                    self._generate_implied((n.name,))
                    self._pop_until(n.name)
                    break
                if self._is_special(n) and n.name not in ("address", "div",
                                                          "p"):
                    break
            self._close_p()
            self._insert_element(name, attrs)
            return
        if name == "plaintext":
            self._close_p()
            self._insert_element(name, attrs)
            self.tok.set_raw("plaintext", name)
            return
        if name == "button":
            if self._in_scope("button"):
                self._generate_implied()
                self._pop_until("button")
            self._reconstruct_afe()
            self._insert_element(name, attrs)
            self.frameset_ok = False
            return
        if name == "a":
            for i in range(len(self.afe) - 1, -1, -1):
                e = self.afe[i]
                if e is MARKER:
                    break
                if e.name == "a":
                    self._adoption_agency("a")
                    if e in self.afe:
                        self.afe.remove(e)
                    if e.el in self.open:
                        self.open.remove(e.el)
                    break
            self._reconstruct_afe()
            el = self._insert_element(name, attrs)
            self._afe_push(el.id, name, attrs)
            return
        if name in ("b", "big", "code", "em", "font", "i", "s", "small",
                    "strike", "strong", "tt", "u"):
            self._reconstruct_afe()
            el = self._insert_element(name, attrs)
            self._afe_push(el.id, name, attrs)
            return
        if name == "nobr":
            self._reconstruct_afe()
            if self._in_scope("nobr"):
                self._adoption_agency("nobr")
                self._reconstruct_afe()
            el = self._insert_element(name, attrs)
            self._afe_push(el.id, name, attrs)
            return
        if name in ("applet", "marquee", "object"):
            self._reconstruct_afe()
            self._insert_element(name, attrs)
            self.afe.append(MARKER)
            self.frameset_ok = False
            return
        if name == "table":
            self._close_p()
            self._insert_element(name, attrs)
            self.frameset_ok = False
            self.mode = IN_TABLE
            return
        if name in ("area", "br", "embed", "img", "keygen", "wbr"):
            self._reconstruct_afe()
            self._insert_element(name, attrs)
            self.open.pop()
            self.frameset_ok = False
            return
        if name == "input":
            self._reconstruct_afe()
            self._insert_element(name, attrs)
            self.open.pop()
            typ = ""
            for a in attrs:
                if a[1] == "type":
                    typ = a[2].lower()
            if typ != "hidden":
                self.frameset_ok = False
            return
        if name in ("param", "source", "track"):
            self._insert_element(name, attrs)
            self.open.pop()
            return
        if name == "hr":
            self._close_p()
            self._insert_element(name, attrs)
            self.open.pop()
            self.frameset_ok = False
            return
        if name == "image":
            self._in_body_start("img", attrs, self_closing)
            return
        if name == "textarea":
            self._insert_element(name, attrs)
            self.ignore_lf = True
            self.tok.set_raw("rcdata", name)
            self.original_mode = self.mode
            self.frameset_ok = False
            self.mode = TEXT_MODE
            return
        if name == "xmp":
            self._close_p()
            self._reconstruct_afe()
            self.frameset_ok = False
            self._generic_raw(name, attrs, "rawtext")
            return
        if name == "iframe":
            self.frameset_ok = False
            self._generic_raw(name, attrs, "rawtext")
            return
        if name in ("noembed", "noscript"):
            self._generic_raw(name, attrs, "rawtext")
            return
        if name == "select":
            self._reconstruct_afe()
            self._insert_element(name, attrs)
            self.frameset_ok = False
            if self.mode in (IN_TABLE, IN_CAPTION, IN_TABLE_BODY, IN_ROW,
                             IN_CELL):
                self.mode = IN_SELECT_IN_TABLE
            else:
                self.mode = IN_SELECT
            return
        if name in ("optgroup", "option"):
            if self._current().name == "option":
                self.open.pop()
            self._reconstruct_afe()
            self._insert_element(name, attrs)
            return
        if name in ("rb", "rtc"):
            if self._in_scope("ruby"):
                self._generate_implied()
            self._insert_element(name, attrs)
            return
        if name in ("rp", "rt"):
            if self._in_scope("ruby"):
                self._generate_implied(("rtc",))
            self._insert_element(name, attrs)
            return
        if name == "math":
            self._reconstruct_afe()
            attrs = self._adjust_foreign_attrs(
                [[a[0], "definitionURL" if a[1] == "definitionurl" else a[1],
                  a[2]] for a in attrs])
            self._insert_element(name, attrs, ns=MATHML_NS)
            if self_closing:
                self.open.pop()
            return
        if name == "svg":
            self._reconstruct_afe()
            attrs = self._adjust_foreign_attrs(
                [[a[0], SVG_ATTR_ADJUST.get(a[1], a[1]), a[2]]
                 for a in attrs])
            self._insert_element(name, attrs, ns=SVG_NS)
            if self_closing:
                self.open.pop()
            return
        if name in ("caption", "col", "colgroup", "frame", "head", "tbody",
                    "td", "tfoot", "th", "thead", "tr"):
            return  # parse error, ignore
        self._reconstruct_afe()
        self._insert_element(name, attrs)

    def _adjust_foreign_attrs(self, attrs):
        out = []
        for a in attrs:
            adj = FOREIGN_ATTR_ADJUST.get(a[1])
            if adj is not None:
                out.append([adj[0], adj[1], a[2]])
            else:
                out.append(a)
        return out

    # ------------------------------------------------------------------
    # foreign content
    # ------------------------------------------------------------------
    def _foreign_start(self, name, attrs, self_closing):
        font_breakout = False
        if name == "font":
            for a in attrs:
                if a[1] in ("color", "face", "size"):
                    font_breakout = True
        if name in FOREIGN_BREAKOUT or font_breakout:
            nodes = self.tree.nodes
            while self.open:
                n = nodes[self.open[-1]]
                if n.ns == HTML_NS:
                    break
                if (n.ns == MATHML_NS and n.name in ("mi", "mo", "mn", "ms",
                                                     "mtext")):
                    break
                if self._is_html_integration_point(n):
                    break
                self.open.pop()
            self._start(name, attrs, self_closing)
            return
        cur_ns = self._current().ns
        if cur_ns == SVG_NS:
            name = SVG_TAG_ADJUST.get(name, name)
            attrs = [[a[0], SVG_ATTR_ADJUST.get(a[1], a[1]), a[2]]
                     for a in attrs]
        elif cur_ns == MATHML_NS:
            attrs = [[a[0], "definitionURL" if a[1] == "definitionurl"
                      else a[1], a[2]] for a in attrs]
        attrs = self._adjust_foreign_attrs(attrs)
        self._insert_element(name, attrs, ns=cur_ns)
        if self_closing:
            self.open.pop()

    def _foreign_end(self, name):
        nodes = self.tree.nodes
        for i in range(len(self.open) - 1, -1, -1):
            n = nodes[self.open[i]]
            if n.ns == HTML_NS:
                # process per HTML rules
                self._end(name)
                return
            if n.name.lower() == name:
                while len(self.open) > i:
                    self.open.pop()
                return
        # not found: ignore

    # ------------------------------------------------------------------
    # end tags
    # ------------------------------------------------------------------
    def _end(self, name):
        if self.mode == IN_TABLE_TEXT:
            self._flush_table_text()
        mode = self.mode
        if mode in (INITIAL, BEFORE_HTML, BEFORE_HEAD):
            if name not in ("head", "body", "html", "br"):
                return  # parse error, ignore
            self._anything_else_to_body_until("#end")
            self._end(name)
            return
        if mode == IN_HEAD:
            if name == "head":
                self.open.pop()
                self.mode = AFTER_HEAD
                return
            if name == "template":
                self._end_template()
                return
            if name not in ("body", "html", "br"):
                return
            self.open.pop()
            self.mode = AFTER_HEAD
            self._end(name)
            return
        if mode == AFTER_HEAD:
            if name == "template":
                self._end_template()
                return
            if name not in ("body", "html", "br"):
                return
            self._insert_element("body", [])
            self.mode = IN_BODY
            self._end(name)
            return
        if mode == IN_BODY:
            self._in_body_end(name)
            return
        if mode == TEXT_MODE:
            self.open.pop()
            self.mode = self.original_mode
            return
        if mode == IN_TABLE:
            self._in_table_end(name)
            return
        if mode == IN_CAPTION:
            if name == "caption":
                if self._in_scope("caption", TABLE_SCOPE):
                    self._generate_implied()
                    self._pop_until("caption")
                    self._afe_clear_to_marker()
                    self.mode = IN_TABLE
                return
            if name == "table":
                if self._in_scope("caption", TABLE_SCOPE):
                    self._generate_implied()
                    self._pop_until("caption")
                    self._afe_clear_to_marker()
                    self.mode = IN_TABLE
                    self._end(name)
                return
            if name in ("body", "col", "colgroup", "html", "tbody", "td",
                        "tfoot", "th", "thead", "tr"):
                return
            self._in_body_end(name)
            return
        if mode == IN_COLUMN_GROUP:
            if name == "colgroup":
                if self._current().name == "colgroup":
                    self.open.pop()
                    self.mode = IN_TABLE
                return
            if name == "col":
                return
            if name == "template":
                self._end_template()
                return
            if self._current().name == "colgroup":
                self.open.pop()
                self.mode = IN_TABLE
                self._end(name)
            return
        if mode == IN_TABLE_BODY:
            if name in ("tbody", "tfoot", "thead"):
                if self._in_scope(name, TABLE_SCOPE):
                    self._clear_to_table_body_context()
                    self.open.pop()
                    self.mode = IN_TABLE
                return
            if name == "table":
                if self._any_in_scope(("tbody", "thead", "tfoot"),
                                      TABLE_SCOPE):
                    self._clear_to_table_body_context()
                    self.open.pop()
                    self.mode = IN_TABLE
                    self._end(name)
                return
            if name in ("body", "caption", "col", "colgroup", "html", "td",
                        "th", "tr"):
                return
            self._in_table_end(name)
            return
        if mode == IN_ROW:
            if name == "tr":
                if self._in_scope("tr", TABLE_SCOPE):
                    self._clear_to_row_context()
                    self.open.pop()
                    self.mode = IN_TABLE_BODY
                return
            if name == "table":
                if self._in_scope("tr", TABLE_SCOPE):
                    self._clear_to_row_context()
                    self.open.pop()
                    self.mode = IN_TABLE_BODY
                    self._end(name)
                return
            if name in ("tbody", "tfoot", "thead"):
                if self._in_scope(name, TABLE_SCOPE) \
                        and self._in_scope("tr", TABLE_SCOPE):
                    self._clear_to_row_context()
                    self.open.pop()
                    self.mode = IN_TABLE_BODY
                    self._end(name)
                return
            if name in ("body", "caption", "col", "colgroup", "html", "td",
                        "th"):
                return
            self._in_table_end(name)
            return
        if mode == IN_CELL:
            if name in ("td", "th"):
                if self._in_scope(name, TABLE_SCOPE):
                    self._generate_implied()
                    self._pop_until(name)
                    self._afe_clear_to_marker()
                    self.mode = IN_ROW
                return
            if name in ("body", "caption", "col", "colgroup", "html"):
                return
            if name in ("table", "tbody", "tfoot", "thead", "tr"):
                if self._in_scope(name, TABLE_SCOPE):
                    self._close_cell()
                    self._end(name)
                return
            self._in_body_end(name)
            return
        if mode in (IN_SELECT, IN_SELECT_IN_TABLE):
            if mode == IN_SELECT_IN_TABLE and name in (
                    "caption", "table", "tbody", "tfoot", "thead", "tr",
                    "td", "th"):
                if self._in_scope(name, TABLE_SCOPE):
                    self._pop_until("select")
                    self._reset_mode()
                    self._end(name)
                return
            if name == "optgroup":
                nodes = self.tree.nodes
                if self._current().name == "option" and len(self.open) > 1 \
                        and nodes[self.open[-2]].name == "optgroup":
                    self.open.pop()
                if self._current().name == "optgroup":
                    self.open.pop()
                return
            if name == "option":
                if self._current().name == "option":
                    self.open.pop()
                return
            if name == "select":
                if self._select_scope_ok("select"):
                    self._pop_until("select")
                    self._reset_mode()
                return
            if name == "template":
                self._end_template()
                return
            return
        if mode == IN_TEMPLATE:
            if name == "template":
                self._end_template()
            return
        if mode == AFTER_BODY:
            if name == "html":
                if self.fragment_ctx is not None:
                    return
                self.mode = AFTER_AFTER_BODY
                return
            self.mode = IN_BODY
            self._end(name)
            return
        if mode == AFTER_AFTER_BODY:
            self.mode = IN_BODY
            self._end(name)
            return
        if mode == IN_FRAMESET:
            if name == "frameset":
                if len(self.open) == 1:
                    return
                self.open.pop()
                if self.fragment_ctx is None \
                        and self._current().name != "frameset":
                    self.mode = AFTER_FRAMESET
            return
        if mode == AFTER_FRAMESET:
            if name == "html":
                self.mode = AFTER_AFTER_FRAMESET
            return
        if mode == AFTER_AFTER_FRAMESET:
            return

    def _in_body_end(self, name):
        if name == "template":
            self._end_template()
            return
        if name == "body":
            if self._in_scope("body"):
                self.mode = AFTER_BODY
            return
        if name == "html":
            if self._in_scope("body"):
                self.mode = AFTER_BODY
                self._end(name)
            return
        if name in BLOCK_CLOSERS and name != "p":
            if self._in_scope(name):
                self._generate_implied()
                self._pop_until(name)
            return
        if name in ("button", "listing", "pre"):
            if self._in_scope(name):
                self._generate_implied()
                self._pop_until(name)
            return
        if name == "form":
            if not self._template_on_stack():
                node = self.form_id
                self.form_id = -1
                if node == -1 or not self._el_in_scope(node):
                    return
                self._generate_implied()
                if node in self.open:
                    self.open.remove(node)
            else:
                if self._in_scope("form"):
                    self._generate_implied()
                    self._pop_until("form")
            return
        if name == "p":
            if not self._in_scope("p", BUTTON_SCOPE):
                self._insert_element("p", [])
            self._close_p()
            return
        if name == "li":
            if self._in_scope("li", LIST_ITEM_SCOPE):
                self._generate_implied(("li",))
                self._pop_until("li")
            return
        if name in ("dd", "dt"):
            if self._in_scope(name):
                self._generate_implied((name,))
                self._pop_until(name)
            return
        if name in HEADINGS:
            if self._any_in_scope(HEADINGS):
                self._generate_implied()
                self._pop_until(*HEADINGS)
            return
        if name in FORMATTING:
            self._adoption_agency(name)
            return
        if name in ("applet", "marquee", "object"):
            if self._in_scope(name):
                self._generate_implied()
                self._pop_until(name)
                self._afe_clear_to_marker()
            return
        if name == "br":
            self._in_body_start("br", [], False)
            return
        self._any_other_end_tag(name)

    def _in_table_end(self, name):
        if name == "table":
            if self._in_scope("table", TABLE_SCOPE):
                self._pop_until("table")
                self._reset_mode()
            return
        if name in ("body", "caption", "col", "colgroup", "html", "tbody",
                    "td", "tfoot", "th", "thead", "tr"):
            return
        if name == "template":
            self._end_template()
            return
        # anything else: foster-parented in-body processing
        self.foster = True
        saved = self.mode
        self.mode = IN_BODY
        self._in_body_end(name)
        self.mode = saved if self.mode == IN_BODY else self.mode
        self.foster = False

    def _end_template(self):
        if not self._template_on_stack():
            return
        self._generate_implied()
        self._pop_until("template")
        self._afe_clear_to_marker()
        if self.template_modes:
            self.template_modes.pop()
        self._reset_mode()

    # ------------------------------------------------------------------
    def _eof(self):
        if self.mode == IN_TABLE_TEXT:
            self._flush_table_text()
        if self.mode == TEXT_MODE:
            self.open.pop()
            self.mode = self.original_mode
            self._eof()
            return
        if self.mode in (INITIAL, BEFORE_HTML, BEFORE_HEAD, IN_HEAD,
                         AFTER_HEAD):
            self._anything_else_to_body()
            self.done = True
            return
        if self.template_modes and self._template_on_stack():
            self._pop_until("template")
            self._afe_clear_to_marker()
            if self.template_modes:
                self.template_modes.pop()
            self._reset_mode()
            self._eof()
            return
        self.done = True
