"""CSS selector parser for the grammar the reference supports.

The conformance surface is everything the `selectors` 0.22 crate parses
minus non-tree-structural pseudo-classes and all pseudo-elements
(reference: /root/reference/src/matcher.rs:125-130 — the parser hooks are
not overridden, so unknown pseudo-classes are parse errors), i.e.:

- type / universal / #id / .class
- attribute: [a] [a=v] [a~=v] [a|=v] [a^=v] [a$=v] [a*=v] (+ i/s flag)
- combinators: descendant, >, +, ~ ; selector groups "a, b"
- tree-structural pseudo-classes: :root :empty :first-child :last-child
  :only-child :nth-child(an+b) :nth-last-child :first-of-type
  :last-of-type :only-of-type :nth-of-type :nth-last-of-type :not(...)
  :scope

Invalid selectors raise SelectorError (the reference's Document::select
panics on those, try_select returns None: /root/reference/src/traversal.rs:15-49).
"""

from __future__ import annotations

import re


class SelectorError(ValueError):
    pass


_IDENT_RE = re.compile(
    r"-?(?:[_a-zA-Z-\U0010ffff]|\\[^\n])"
    r"(?:[_a-zA-Z0-9\--\U0010ffff]|\\[^\n])*"
)
_WS_RE = re.compile(r"[ \t\n\r\f]+")
_NTH_RE = re.compile(
    r"""^\s*(?:
        (?P<odd>odd) | (?P<even>even) |
        (?P<int>[+-]?\d+) |
        (?P<an>[+-]?\d*)[nN]\s*(?:(?P<sign>[+-])\s*(?P<b>\d+))?
    )\s*$""",
    re.X,
)

PSEUDO_NO_ARG = frozenset([
    "root", "empty", "first-child", "last-child", "only-child",
    "first-of-type", "last-of-type", "only-of-type", "scope",
    # selectors-0.22 built-in link pseudo-classes: routed through
    # Element::is_link() (reference element.rs:134-142), which returns
    # true iff the element's local name is literally "link".  :visited
    # never matches (VisitedHandlingMode::AllLinksUnvisited default).
    "link", "any-link", "visited",
])
PSEUDO_NTH = frozenset([
    "nth-child", "nth-last-child", "nth-of-type", "nth-last-of-type",
])


def _unescape_ident(s: str) -> str:
    if "\\" not in s:
        return s
    return re.sub(r"\\(.)", r"\1", s)


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def peek(self):
        return self.s[self.i] if self.i < self.n else ""

    def skip_ws(self) -> bool:
        m = _WS_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return True
        return False

    def ident(self):
        m = _IDENT_RE.match(self.s, self.i)
        if m is None:
            raise SelectorError("expected identifier at %d in %r"
                                % (self.i, self.s))
        self.i = m.end()
        return _unescape_ident(m.group())


def parse_selector_list(s: str):
    """Returns a list of complex selectors.

    complex := [(combinator, compound), ...]   combinator of first is None
    compound := list of simple-selector tuples
    """
    p = _P(s)
    out = []
    while True:
        p.skip_ws()
        out.append(_parse_complex(p))
        p.skip_ws()
        if p.peek() == ",":
            p.i += 1
            continue
        if p.i >= p.n:
            break
        raise SelectorError("unexpected %r at %d in %r"
                            % (p.peek(), p.i, s))
    if not out:
        raise SelectorError("empty selector")
    return out


def _parse_complex(p: _P):
    parts = []
    compound = _parse_compound(p)
    parts.append((None, compound))
    while True:
        had_ws = p.skip_ws()
        c = p.peek()
        if c in (">", "+", "~"):
            p.i += 1
            p.skip_ws()
            comb = c
        elif had_ws and c and c != "," and p.i < p.n:
            comb = " "
        else:
            break
        parts.append((comb, _parse_compound(p)))
    return parts


def _parse_compound(p: _P):
    simples = []
    c = p.peek()
    # type or universal first
    if c == "*":
        p.i += 1
        simples.append(("universal",))
    elif c and (c.isalpha() or c in "_\\" or ord(c) > 127 or c == "-"):
        name = p.ident()
        simples.append(("type", name, name.lower()))
    while True:
        c = p.peek()
        if c == "#":
            p.i += 1
            simples.append(("id", p.ident()))
        elif c == ".":
            p.i += 1
            simples.append(("class", p.ident()))
        elif c == "[":
            p.i += 1
            simples.append(_parse_attr(p))
        elif c == ":":
            p.i += 1
            if p.peek() == ":":
                raise SelectorError("pseudo-elements are not supported")
            simples.append(_parse_pseudo(p))
        else:
            break
    if not simples:
        raise SelectorError("expected selector at %d in %r" % (p.i, p.s))
    return simples


def _parse_attr(p: _P):
    p.skip_ws()
    name = p.ident()
    p.skip_ws()
    c = p.peek()
    if c == "]":
        p.i += 1
        return ("attr", name, name.lower(), None, None, False)
    op = None
    if c in "~|^$*":
        if p.s[p.i + 1 : p.i + 2] != "=":
            raise SelectorError("bad attribute operator")
        op = c + "="
        p.i += 2
    elif c == "=":
        op = "="
        p.i += 1
    else:
        raise SelectorError("bad attribute selector")
    p.skip_ws()
    c = p.peek()
    if c in ("'", '"'):
        end = p.s.find(c, p.i + 1)
        if end < 0:
            raise SelectorError("unterminated string")
        value = p.s[p.i + 1 : end]
        p.i = end + 1
    else:
        value = p.ident()
    p.skip_ws()
    ci = False
    if p.peek() in ("i", "I", "s", "S"):
        flag = p.peek().lower()
        ci = flag == "i"
        p.i += 1
        p.skip_ws()
    if p.peek() != "]":
        raise SelectorError("expected ] at %d" % p.i)
    p.i += 1
    return ("attr", name, name.lower(), op, value, ci)


def _parse_pseudo(p: _P):
    name = p.ident().lower()
    if p.peek() == "(":
        p.i += 1
        depth = 1
        start = p.i
        while p.i < p.n and depth:
            ch = p.s[p.i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            p.i += 1
        if depth:
            raise SelectorError("unterminated ( in pseudo-class")
        arg = p.s[start : p.i - 1]
        if name in PSEUDO_NTH:
            return ("nth", name, *_parse_nth(arg))
        if name == "not":
            return ("not", parse_selector_list(arg))
        raise SelectorError("unsupported functional pseudo-class :%s" % name)
    if name in PSEUDO_NO_ARG:
        return ("pseudo", name)
    raise SelectorError("unsupported pseudo-class :%s" % name)


def _parse_nth(arg: str):
    m = _NTH_RE.match(arg)
    if m is None:
        raise SelectorError("bad An+B expression %r" % arg)
    if m.group("odd"):
        return (2, 1)
    if m.group("even"):
        return (2, 0)
    if m.group("int") is not None:
        return (0, int(m.group("int")))
    an = m.group("an")
    if an in ("", "+"):
        a = 1
    elif an == "-":
        a = -1
    else:
        a = int(an)
    b = 0
    if m.group("b") is not None:
        b = int(m.group("b"))
        if m.group("sign") == "-":
            b = -b
    return (a, b)
