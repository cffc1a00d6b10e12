"""Quirks-mode field parity (reference: Document.quirks_mode set via
the set_quirks_mode TreeSink callback, document.rs:26-27,100-103; the
decision logic is html5ever's = the WHATWG initial-insertion-mode
rules).  Pins the three doctype classes, the no-doctype/anything-else
path, the fragment fixed no-quirks, and cross-lane agreement (Python
tokenizer / C scanner / C fast lane) on randomized doctypes."""

import random

import pytest

from nipper_ray.api import Document
from nipper_ray.html import fastlane
from nipper_ray.html.parser import parse_fragment
from nipper_ray.html.treebuilder import TreeBuilder, doctype_quirks

CASES = [
    # --- no-quirks ---
    ("<!DOCTYPE html><p>x", "no-quirks"),
    ("<!doctype HTML ><p>x", "no-quirks"),
    ("<!DOCTYPE html SYSTEM 'about:legacy-compat'>", "no-quirks"),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
     '"http://www.w3.org/TR/html4/strict.dtd">', "no-quirks"),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN">',
     "no-quirks"),
    # --- quirks ---
    ("<p>x", "quirks"),                       # anything-else (no doctype)
    ("", "quirks"),
    ("<!-- c --><p>x", "quirks"),
    ("<!DOCTYPE foo>", "quirks"),             # name != html
    ("<!DOCTYPE>", "quirks"),                 # missing name
    ("<!DOCTYPE html PUBLIC>", "quirks"),     # malformed -> force
    ('<!DOCTYPE html PUBLIC "unclosed', "quirks"),   # eof-in-doctype
    ("<!DOCTYPE html junk>", "quirks"),       # bogus -> force
    ('<!DOCTYPE html PUBLIC "HTML">', "quirks"),
    ('<!DOCTYPE html PUBLIC "-//IETF//DTD HTML 2.0//EN">', "quirks"),
    ('<!DOCTYPE html PUBLIC '
     '"-//w3c//dtd html 4.0 transitional//en">', "quirks"),  # ci prefix
    ('<!DOCTYPE html SYSTEM '
     '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">',
     "quirks"),
    ('<!DOCTYPE html PUBLIC '
     '"-//W3C//DTD HTML 4.01 Transitional//EN">', "quirks"),  # no system
    ("<p><!DOCTYPE html>", "quirks"),         # late doctype ignored
    # spec precedence: a quirky SYSTEM id (the IBM dtd) is a QUIRKS
    # condition evaluated before any limited-quirks rule, so it wins
    # over limited-quirks public-id prefixes
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" '
     '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">',
     "quirks"),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Frameset//EN" '
     '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">',
     "quirks"),
    # --- limited-quirks ---
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
     '"http://www.w3.org/TR/html4/loose.dtd">', "limited-quirks"),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Frameset//EN" "x">',
     "limited-quirks"),
    ('<!DOCTYPE html PUBLIC '
     '"-//W3C//DTD XHTML 1.0 Transitional//EN">', "limited-quirks"),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Frameset//">',
     "limited-quirks"),
]


@pytest.mark.parametrize("html,want", CASES)
def test_quirks_classes_document(html, want):
    assert Document(html).quirks_mode == want


@pytest.mark.parametrize("html,want", CASES)
def test_quirks_classes_python_lane(html, want):
    assert TreeBuilder().parse(html).quirks_mode == want


def test_fragment_fixed_no_quirks():
    # reference manipulation.rs:25 pins NoQuirks for non-document trees
    assert parse_fragment("<p>x</p>").quirks_mode == "no-quirks"
    assert parse_fragment("<!DOCTYPE foo><p>x").quirks_mode == "no-quirks"


def test_doctype_quirks_trailing_junk_not_forced():
    # junk AFTER a complete system id is an error but NOT force-quirks
    assert doctype_quirks("html", ' SYSTEM "s" trailing junk',
                          False) == "no-quirks"
    # junk after a complete public id where a system id would start IS
    # force-quirks (missing-quote branch)
    assert doctype_quirks("html", ' PUBLIC "p" junk', False) == "quirks"


@pytest.mark.skipif(fastlane.get() is None,
                    reason="fast lane unavailable")
def test_quirks_cross_lane_randomized():
    """Random doctype declarations: the C fast lane and the Python
    machine must agree on quirks_mode (and the fast lane must accept —
    doctypes are native)."""
    rng = random.Random(0xD0C)
    names = ["html", "HTML", "foo", "", "ht ml"[:2]]
    pubs = ["-//W3C//DTD HTML 4.01 Transitional//EN",
            "-//W3C//DTD XHTML 1.0 Frameset//EN",
            "-//IETF//DTD HTML 3.2//", "HTML", "whatever", ""]
    syss = ["about:legacy-compat", "http://x/y.dtd",
            "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd"]
    for _ in range(400):
        name = rng.choice(names)
        parts = ["<!DOCTYPE"]
        if name or rng.random() < 0.5:
            parts.append(" " + name)
        form = rng.random()
        q = rng.choice('"\'')
        if form < 0.4:
            parts.append(" PUBLIC %s%s%s" % (q, rng.choice(pubs), q))
            if rng.random() < 0.5:
                q2 = rng.choice('"\'')
                parts.append(" %s%s%s" % (q2, rng.choice(syss), q2))
        elif form < 0.6:
            parts.append(" SYSTEM %s%s%s" % (q, rng.choice(syss), q))
        elif form < 0.7:
            parts.append(" PUBLIC " + rng.choice(pubs))  # unquoted junk
        elif form < 0.8:
            parts.append(" bogus words")
        closed = rng.random() < 0.9
        html = "".join(parts) + (">" if closed else "") + "<p>x</p>"
        fast = fastlane.parse_document_fast(html)
        py = TreeBuilder().parse(html)
        assert fast is not None, html
        assert fast.quirks_mode == py.quirks_mode, html
        assert fast.errors == py.errors, html
