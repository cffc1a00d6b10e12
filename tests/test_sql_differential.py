"""Hypothesis differential: the text kernels vs the exact DuckDB
expressions used as their oracles, over GENERATED text (ASCII, unicode
letters, unicode whitespace, quotes, empty).  The driver only checks
the shipped corpus; this guards the Python-regex-vs-RE2 and
rounding-semantics boundary on inputs beyond it (e.g. Python ``\\s``
is Unicode-wide while RE2's is ASCII — the normalize kernel uses an
explicit ASCII class for exactly that reason)."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Z", "Mn"),
        whitelist_characters=" \t\n\f\r'\"&<>_-—  　"),
    max_size=120)


def _con():
    con = duckdb.connect()
    return con


@settings(max_examples=120, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_token_stats_matches_sql(texts):
    from nipper_ray.ops.textstats import token_stats

    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
    out = token_stats(batch)
    con = _con()
    con.register("d", batch.to_pandas())
    gold = con.execute(
        "SELECT len(regexp_extract_all(text, '[A-Za-z0-9_]+')) n,"
        " length(text) c FROM d ORDER BY doc_id").fetchall()
    assert out.column("n_tokens").to_pylist() == [g[0] for g in gold]
    assert out.column("n_chars_computed").to_pylist() == \
        [g[1] for g in gold]


@settings(max_examples=120, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_normalize_matches_sql(texts):
    from nipper_ray.ops.textstats import normalize_text

    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
    out = normalize_text(batch)
    con = _con()
    con.register("d", batch.to_pandas())
    gold = con.execute(
        r"""SELECT trim(regexp_replace(nfc_normalize(text),
                                       '[\t\n\f\r ]+', ' ', 'g'),
                        ' ') FROM d ORDER BY doc_id""").fetchall()
    assert out.column("norm_text").to_pylist() == [g[0] for g in gold]


@settings(max_examples=120, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_quality_ppm_matches_sql(texts):
    import re

    tok_re = re.compile(r"[A-Za-z0-9_]+")
    stop = frozenset(
        "the a an and or of to in is are was were be been it this that"
        .split())
    con = _con()
    import pandas as pd

    con.register("d", pd.DataFrame({"doc_id": range(len(texts)),
                                    "text": texts}))
    gold = con.execute("""
        SELECT CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                    = 0 THEN 0 ELSE
          len(list_filter(regexp_extract_all(text, '[A-Za-z0-9_]+'),
              x -> lower(x) IN ('the','a','an','and','or','of','to',
                                'in','is','are','was','were','be',
                                'been','it','this','that')))
            * 1000000
            // len(regexp_extract_all(text, '[A-Za-z0-9_]+')) END
        FROM d ORDER BY doc_id""").fetchall()
    for t, g in zip(texts, gold):
        toks = tok_re.findall(t)
        mine = (sum(1 for w in toks if w.lower() in stop)
                * 1_000_000 // len(toks)) if toks else 0
        assert mine == g[0], repr(t)


@settings(max_examples=80, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_fingerprint_matches_sql(texts):
    from nipper_ray.ops.textstats import fingerprint

    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
    out = fingerprint(batch)
    con = _con()
    con.register("d", batch.to_pandas())
    gold = con.execute(
        "SELECT md5(text) FROM d ORDER BY doc_id").fetchall()
    assert out.column("fp_md5").to_pylist() == [g[0] for g in gold]


def test_synth_host_title_sql_mirrors_python():
    """_SYNTH_HOST_SQL/_SYNTH_TITLE_SQL (the basis of the extract /
    readability / crawl_wave oracles) == sources/synth.py exactly for
    every doc id shape."""
    import pandas as pd

    import __ray_entry__ as m
    from nipper_ray.sources.synth import host_for, page_url
    import hashlib

    ids = list(range(0, 600, 7)) + [0, 1, 3, 4, 499]
    con = _con()
    con.register("d", pd.DataFrame({"doc_id": ids}))
    rows = con.execute(
        "SELECT doc_id, %s AS host, %s AS title FROM d ORDER BY doc_id"
        % (m._SYNTH_HOST_SQL, m._SYNTH_TITLE_SQL)).fetchall()
    for doc_id, host, title in rows:
        assert host == host_for(doc_id), doc_id
        assert page_url(doc_id) == "https://%s/doc/%d" % (host, doc_id)
        h = hashlib.sha256(b"page:%d" % doc_id).hexdigest()[:12]
        assert title == "Doc %d — %s" % (doc_id, h), doc_id


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_shingle_strings_match_sql(text):
    """The word-3-gram shingle SET built by the minhash pipeline equals
    the DuckDB expression used in the minhash/dedup_clusters oracles."""
    from nipper_ray.ops.dedup import _fold_words

    words = _fold_words(text)
    mine = ({" ".join(words[i:i + 3]) for i in range(len(words) - 2)}
            if len(words) >= 3 else None)
    con = _con()
    got = con.execute("""
        SELECT list_distinct(list_transform(
            generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        FROM (SELECT regexp_extract_all(
                  translate(?, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            'abcdefghijklmnopqrstuvwxyz'),
                  '[a-z0-9_]+') AS w)
        WHERE len(w) >= 3""", [text]).fetchall()
    if mine is None:
        assert got == []
    else:
        assert set(got[0][0]) == mine, repr(text)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    TEXT,
    st.text(alphabet="的是不了人我在有一鿿中 ", max_size=60),  # CJK range edges
    st.just(""),
    st.just("th"),                       # below trigram length
    st.just(" de le la et les des que"),  # fr profile verbatim
    st.just(" de "),                      # fr/es/de tie -> first profile
), min_size=1, max_size=8))
def test_langid_matches_oracle_sql(texts):
    """LangIdStage._predict vs oracle_sql()['langid'] on generated text
    including the paths the shipped (pure-ASCII) corpus never hits:
    the CJK short-circuit, sub-trigram strings, and profile-order tie
    breaks."""
    import __ray_entry__ as entry
    from nipper_ray.ops.textstats import LangIdStage

    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
    con = _con()
    con.register("documents", batch.to_pandas())
    gold = con.execute(entry.oracle_sql()["langid"]).fetchall()
    st_ = LangIdStage()
    assert [(i, st_._predict(t)) for i, t in enumerate(texts)] == gold
