"""Lower a parsed selector AST to the C selector engine's IR.

The C fast lane (`html/_fastlane.c`) carries a from-scratch CSS matching
engine over CNode arenas (`select_all`); this module converts the AST
produced by `css.parser.parse_selector_list` into the flat int/str IR
that `nr_fastlane.compile_program` consumes, precomputing every
selector-side derived string (ci-lowered values, the `|=` dash prefix,
the never-matches cases of `~=` / `^=` / `$=` / `*=`) so the C matcher
does no Python-level string work at match time.

Every construct the Python matcher supports lowers; an unknown AST kind
returns None and the caller stays on the Python path.  Programs are
cached per selector source (process-wide, like `matcher._CACHE`) because
capsules must not ride along when a CompiledSelector is pickled into a
Ray task spec.

Simple-selector IR rows (tuples; first item = kind tag):
    (0,)                                universal
    (1, name, name_lower)               type       (both interned)
    (2, value)                          #id
    (3, value)                          .class
    (4, name, name_lower, op, value, aux, ci)   [attr]
        op: 0 presence, 1 '=', 2 '~=', 3 '|=', 4 '^=', 5 '$=', 6 '*=',
            7 never-matches;  value pre-lowered when ci;  aux = value+'-'
            for '|='
    (5, pseudo_code)                    :pseudo
        0 link/any-link, 1 visited, 2 root/scope, 3 empty, 4 first-child,
        5 last-child, 6 only-child, 7 first-of-type, 8 last-of-type,
        9 only-of-type
    (6, flags, a, b)                    :nth-*  (bit0 of-type, bit1 from-end)
    (7, (complex, ...))                 :not(selector list)

complex = ((comb, compound), ...) with comb 0 none / 1 ' ' / 2 '>' /
3 '+' / 4 '~'; program IR = (complexes, fast_names_or_None).
"""

from __future__ import annotations

import os
import sys

_COMB = {None: 0, " ": 1, ">": 2, "+": 3, "~": 4}
_ATTR_OP = {None: 0, "=": 1, "~=": 2, "|=": 3, "^=": 4, "$=": 5, "*=": 6}
_PSEUDO = {
    "link": 0, "any-link": 0, "visited": 1, "root": 2, "scope": 2,
    "empty": 3, "first-child": 4, "last-child": 5, "only-child": 6,
    "first-of-type": 7, "last-of-type": 8, "only-of-type": 9,
}


def _lower_simple(simple):
    k = simple[0]
    if k == "universal":
        return (0,)
    if k == "type":
        return (1, sys.intern(simple[1]), sys.intern(simple[2]))
    if k == "id":
        return (2, simple[1])
    if k == "class":
        return (3, simple[1])
    if k == "attr":
        _, name, name_lower, op, value, ci = simple
        opc = _ATTR_OP[op]
        if opc:
            if ci:
                value = value.lower()
            if opc == 2 and (not value or any(c.isspace() for c in value)):
                opc = 7  # '~=' with empty/whitespace value never matches
            elif opc in (4, 5, 6) and not value:
                opc = 7  # '^=' '$=' '*=' with empty value never match
        aux = value + "-" if opc == 3 else None
        return (4, sys.intern(name), sys.intern(name_lower), opc, value,
                aux, 1 if ci else 0)
    if k == "pseudo":
        code = _PSEUDO.get(simple[1])
        if code is None:
            return None
        return (5, code)
    if k == "nth":
        _, kind, a, b = simple
        flags = (1 if kind.endswith("of-type") else 0) \
            | (2 if "last" in kind else 0)
        return (6, flags, a, b)
    if k == "not":
        sub = _lower_selectors(simple[1])
        if sub is None:
            return None
        return (7, sub)
    return None


def _lower_selectors(selectors):
    out = []
    for complex_sel in selectors:
        parts = []
        for comb, compound in complex_sel:
            simples = []
            for simple in compound:
                low = _lower_simple(simple)
                if low is None:
                    return None
                simples.append(low)
            parts.append((_COMB[comb], tuple(simples)))
        out.append(tuple(parts))
    return tuple(out)


def lower_ir(compiled):
    """IR tuple for a CompiledSelector, or None if not lowerable."""
    sels = _lower_selectors(compiled.selectors)
    if sels is None:
        return None
    fast = compiled.fast_names
    if fast is not None:
        fast = tuple(sorted(sys.intern(n) for n in fast))
    return (sels, fast)


_PROGS: dict = {}
_UNLOWERABLE = object()


def get_cprog(compiled):
    """Compiled C program capsule for *compiled*, or None.

    Cached by selector source string (never stored on the
    CompiledSelector itself: capsules don't pickle, and stage instances
    ship compiled selectors inside Ray task specs).  The env gate is
    consulted only on a cache miss: tests toggling NIPPER_RAY_NO_CSELECT
    at runtime must clear ``_PROGS``."""
    prog = _PROGS.get(compiled.source)
    if prog is _UNLOWERABLE:
        return None
    if prog is not None:
        return prog
    if os.environ.get("NIPPER_RAY_NO_CSELECT"):
        return None
    from ..html.fastlane import get
    mod = get()
    if mod is None or not hasattr(mod, "compile_program"):
        return None
    ir = lower_ir(compiled)
    if ir is None:
        prog = _UNLOWERABLE
    else:
        try:
            prog = mod.compile_program(ir)
        except Exception:
            prog = _UNLOWERABLE
    if len(_PROGS) < 4096:
        _PROGS[compiled.source] = prog
    return prog if prog is not _UNLOWERABLE else None
