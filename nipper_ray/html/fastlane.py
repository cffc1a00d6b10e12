"""Runtime build + loader for the C whole-document fast lane
(_fastlane.c): integrated tokenizer + subset insertion-mode machine
that returns a dom.Node-compatible arena, or None to fall back to the
pure-Python TreeBuilder.

Build mirrors cscan.py: compiled once per machine into a content-hashed
cache path shared across Ray workers; every failure mode degrades
silently to None (the Python machine is always correct).  Set
``NIPPER_RAY_NO_FASTLANE=1`` to force the Python path.

Unlike _scan.c this is a real CPython extension (it materializes Node
objects directly), so the build needs the Python headers; when they are
absent the fast lane simply stays off.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fastlane.c")

_mod = None
_tried = False


def _build():
    import importlib.util
    from importlib.machinery import ExtensionFileLoader

    with open(_SRC, "rb") as f:
        src = f.read()
    h = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NIPPER_RAY_CSCAN_DIR",
        os.path.join(tempfile.gettempdir(), "nipper_ray_cscan"))
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, "fastlane_%s.so" % h)
    if not os.path.exists(so):
        inc = sysconfig.get_paths()["include"]
        tmp = "%s.%d.tmp" % (so, os.getpid())
        subprocess.run(
            ["gcc", "-O3", "-fPIC", "-shared", "-I", inc, "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
    loader = ExtensionFileLoader("nr_fastlane", so)
    spec = importlib.util.spec_from_file_location("nr_fastlane", so,
                                                  loader=loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)

    from .. import dom
    from . import treebuilder as tb
    from .entities import decode_charrefs

    mod.setup(decode_charrefs, dom.HTML_NS, dom._node_from_state,
              dom.SVG_NS, dom.MATHML_NS, tb.SVG_TAG_ADJUST,
              tb.SVG_ATTR_ADJUST, tb.FOREIGN_ATTR_ADJUST)
    return mod


def get():
    """The bound extension module, or None when unavailable/disabled."""
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    if os.environ.get("NIPPER_RAY_NO_FASTLANE") \
            or os.environ.get("NIPPER_RAY_NO_CSCAN"):
        return None
    try:
        _mod = _build()
    except Exception:
        _mod = None
    return _mod


_Tree = None


def parse_document_fast(html: str):
    """Tree for *html* via the C fast lane, or None (caller falls back).

    Exact byte-space contract as ctokenizer.CTokenizer: \r-normalize in
    character space first, then operate on the UTF-8 encoding.
    """
    global _Tree
    mod = get()
    if mod is None:
        return None
    if "\r" in html:
        html = html.replace("\r\n", "\n").replace("\r", "\n")
    try:
        b = html.encode("utf-8", "surrogatepass")
    except UnicodeEncodeError:
        return None
    res = mod.parse(b)
    if res is None:
        return None
    if _Tree is None:
        from ..dom import Tree as _T
        _Tree = _T
    t = _Tree.__new__(_Tree)
    t.nodes, t.errors, quirks_src = res
    if quirks_src is None:
        t.quirks_mode = "quirks"  # no INITIAL-mode doctype
    else:
        from .treebuilder import doctype_quirks

        t.quirks_mode = doctype_quirks(*quirks_src)
    return t
