"""Charset sniffing + fast-path canonicalization properties."""

import codecs
import re

from hypothesis import given, settings, strategies as st

import nipper_ray.frontier.canonicalize as canon_mod
from nipper_ray.api import Document
from nipper_ray.html.charset import decode_html, sniff_encoding


def test_meta_charset_latin1():
    raw = ('<html><head><meta charset="iso-8859-1"><title>café</title>'
           '</head><body>déjà vu</body></html>').encode("latin-1")
    assert sniff_encoding(raw) == "latin-1"
    assert Document(decode_html(raw)).select("body").text() == "déjà vu"


def test_meta_http_equiv():
    raw = (b'<html><head><meta http-equiv="Content-Type" '
           b'content="text/html; charset=windows-1252"></head>'
           b'<body>\x93quoted\x94</body></html>')
    assert sniff_encoding(raw) == "cp1252"
    assert Document(decode_html(raw)).select("body").text() == "“quoted”"


def test_bom_utf16():
    raw = codecs.BOM_UTF16_LE + "<body>uni</body>".encode("utf-16-le")
    assert "uni" in decode_html(raw)


def test_bad_charset_label_falls_back():
    raw = b'<meta charset="not-a-codec"><body>hello</body>'
    assert "hello" in decode_html(raw)


def test_str_and_empty_passthrough():
    assert decode_html("s") == "s"
    assert decode_html(b"") == ""
    assert decode_html(None) == ""


# -- canonicalize fast path == slow path (property) -------------------------
_url_chars = st.sampled_from(list(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789-._~/%?#=&: @"))


def _slow(url):
    saved = canon_mod._FAST_RE
    canon_mod._FAST_RE = re.compile(r"$^")  # disable fast path
    try:
        return canon_mod.canonicalize_url(url)
    finally:
        canon_mod._FAST_RE = saved


@settings(max_examples=300, deadline=None)
@given(st.text(_url_chars, max_size=40))
def test_fast_path_equals_slow_path(tail):
    for prefix in ("https://ex.com/", "http://Ex.COM:80/", "https://a.b/"):
        url = prefix + tail
        assert canon_mod.canonicalize_url(url) == _slow(url), url
