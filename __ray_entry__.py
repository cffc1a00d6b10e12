"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship extraction pipeline (read pages ->
map_batches(ExtractStage actor pool) -> extracted columns) on sf0.001.

`queries()` exposes one callable per implemented operator family
(SURVEY.md §2 + the training-data ops); `oracle_sql()` gives the DuckDB
equivalent for every SQL-expressible one. Column names match between
the Ray result and the SQL exactly. Ray is initialised by the driver —
nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tests", "fixtures")

STOPWORDS_SQL = "('the','a','an','and','or','of','to','in','is','are'," \
    "'was','were','be','been','it','this','that')"

# The synthetic documents vocabulary is a CLOSED 31-word set (verified
# at every shipped scale factor), so xxh64(word) — not SQL-expressible
# as a function — can ship as an embedded lookup VALUES table, making
# the simhash family exactly SQL-derivable.  A future corpus word
# missing from this list fails LOUDLY (the join drops it, so the
# simhash votes diverge and the value hash mismatches).
_DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window").split()


def _simhash_oracle_sql() -> str:
    """Exact SQL re-derivation of ops/dedup.simhash64_batch: per-word
    xxh64 via the embedded vocabulary table, per-bit +1/-1 vote,
    bit set iff the vote sum is positive; tokenless docs hash to 0."""
    from nipper_ray.frontier.hashing import xxh64_str

    rows = ", ".join("('%s', CAST(%d AS UBIGINT))" % (w, xxh64_str(w))
                     for w in _DOC_VOCAB)
    # CAST(1 AS UBIGINT) << 63 overflows in DuckDB (shift is signed),
    # so the per-bit weights are precomputed literals
    bit_sum = " + ".join(
        "(CASE WHEN sum(CASE WHEN (h >> %d) & 1 = 1 THEN 1 ELSE -1 END)"
        " > 0 THEN CAST(%d AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
        % (b, 1 << b) for b in range(64))
    return f"""
        WITH w AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(translate(text,
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                     'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_]+')) AS w
          FROM documents),
        hv AS (SELECT * FROM (VALUES {rows}) t(w, h)),
        votes AS (
          SELECT doc_id, {bit_sum} AS simhash
          FROM w JOIN hv USING (w)
          GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(v.simhash, CAST(0 AS UBIGINT)) AS simhash
        FROM documents d LEFT JOIN votes v USING (doc_id)
        ORDER BY doc_id
    """


def _simhash_neardup_oracle_sql() -> str:
    """Pairs at hamming <= 3 over the SQL-derived simhashes; the
    engine's 4x16-bit banding has recall 1 for hamming < 4 (pigeonhole)
    and exact in-bucket verification, and excludes simhash==0 docs
    (the degenerate-bucket rule), so this all-pairs join is its exact
    oracle."""
    return f"""
        WITH s AS ({_simhash_oracle_sql()})
        SELECT s1.doc_id AS a, s2.doc_id AS b
        FROM s s1 JOIN s s2 ON s1.doc_id < s2.doc_id
        WHERE s1.simhash <> 0 AND s2.simhash <> 0
          AND bit_count(xor(s1.simhash, s2.simhash)) <= 3
        ORDER BY a, b
    """


def _langid_oracle_sql() -> str:
    """Exact SQL re-derivation of ops/textstats.LangIdStage._predict:
    DISTINCT char-trigrams of lower(text[:1000]) intersected with each
    embedded language-profile trigram set (the literal seed strings of
    _LANG_PROFILES shipped as a VALUES table — the logic, trigram
    extraction / intersection counting / argmax, runs in SQL), tie
    broken by profile order (first strict max wins, matching the
    Python dict-iteration `score > best_score`); a CJK-codepoint count
    over the RAW text[:200] short-circuits to 'zh'; no positive score
    -> 'und'."""
    from nipper_ray.ops.textstats import _LANG_PROFILES

    rows = []
    for rnk, (lang, seed) in enumerate(_LANG_PROFILES.items()):
        for g in sorted({seed[i:i + 3] for i in range(len(seed) - 2)}):
            rows.append("(%d, '%s', '%s')"
                        % (rnk, lang, g.replace("'", "''")))
    values = ", ".join(rows)
    return f"""
        WITH d AS (
          SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        s AS (
          SELECT doc_id, lower(substr(text, 1, 1000)) AS s,
                 substr(text, 1, 200) AS head
          FROM d),
        cjk AS (
          SELECT doc_id,
                 len(list_filter(range(1, length(head) + 1), i ->
                     unicode(substr(head, CAST(i AS INT), 1))
                     BETWEEN 19968 AND 40959)) AS n_cjk
          FROM s),
        grams AS (
          SELECT DISTINCT doc_id, g
          FROM (SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(length(s) - 2, 0) + 1),
                           i -> substr(s, CAST(i AS INT), 3))) AS g
                FROM s)),
        prof AS (SELECT * FROM (VALUES {values}) t(rnk, lang, g)),
        scores AS (
          SELECT g.doc_id, p.lang, p.rnk, count(*) AS score
          FROM grams g JOIN prof p USING (g)
          GROUP BY g.doc_id, p.lang, p.rnk),
        best AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, rnk) AS rn
          FROM scores)
        SELECT d.doc_id,
               CASE WHEN c.n_cjk > 10 THEN 'zh'
                    ELSE COALESCE(b.lang, 'und') END AS lang_pred
        FROM d
        JOIN cjk c USING (doc_id)
        LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        ORDER BY doc_id
    """


def _double_list_sql(vec) -> str:
    """[..]::DOUBLE[] literal with full round-trip precision."""
    return "[%s]::DOUBLE[]" % ", ".join(repr(float(x)) for x in vec)


def _ann_lsh_oracle_sql() -> str:
    """Independent SQL re-derivation of ops/similarity.lsh_topk (as
    wired by q_ann_lsh: probes=4, k=10, queries vec_id < 5): the fixed
    random hyperplanes (seed 0xC0FFEE, _planes) ship as a VALUES table;
    16-bit sign bucketing, margin-ordered multi-probe expansion (the 4
    least-confident single-bit flips + the 2-bit flip of the two least
    confident planes), global candidate filtering, and exact cosine
    top-10 over the candidates all run in SQL.  Every sign / ordering
    decision is float-sum-order-safe: min |projection| over all shipped
    corpora is >= 2e-5 and min probe-order gap >= 2.8e-4 (pinned by
    tests/test_similarity_oracle.py) vs ~1e-13 summation noise."""
    from nipper_ray.ops.similarity import _N_PLANES, _planes

    planes = _planes(64)
    rows = ", ".join("(%d, %s)" % (b, _double_list_sql(planes[b]))
                     for b in range(_N_PLANES))
    return f"""
        WITH pl AS (SELECT * FROM (VALUES {rows}) t(b, w)),
        e AS (SELECT vec_id,
                     list_transform(embedding,
                                    x -> CAST(x AS DOUBLE)) AS emb,
                     embedding
              FROM embeddings),
        proj AS (SELECT e.vec_id, pl.b,
                        list_dot_product(e.emb, pl.w) AS p
                 FROM e CROSS JOIN pl),
        bkt AS (SELECT vec_id,
                       CAST(sum(CASE WHEN p > 0 THEN (1::BIGINT << b)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM proj GROUP BY vec_id),
        qkey AS (SELECT * FROM bkt WHERE vec_id < 5),
        flips AS (SELECT vec_id, b,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY abs(p), b) AS rn
                  FROM proj WHERE vec_id < 5
                  QUALIFY rn <= 4),
        wanted AS (
            SELECT bucket FROM qkey
            UNION
            SELECT xor(k.bucket, 1::BIGINT << f.b)
            FROM qkey k JOIN flips f USING (vec_id)
            UNION
            SELECT xor(xor(k.bucket, 1::BIGINT << f0.b),
                       1::BIGINT << f1.b)
            FROM qkey k
            JOIN flips f0 ON f0.vec_id = k.vec_id AND f0.rn = 1
            JOIN flips f1 ON f1.vec_id = k.vec_id AND f1.rn = 2),
        cand AS (SELECT e.vec_id, e.emb
                 FROM e JOIN bkt USING (vec_id)
                 WHERE bucket IN (SELECT bucket FROM wanted)),
        q AS (SELECT vec_id, emb FROM e WHERE vec_id < 5),
        s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.emb, c.emb), 6)
                         AS sim
              FROM q CROSS JOIN cand c)
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id)
                   AS rank
        FROM s QUALIFY rank <= 10
        ORDER BY query_id, rank
    """


def _ivf_oracle_centroids(sf_dir: str, n_cells: int = 16,
                          sample_size: int = 2048) -> np.ndarray:
    """The q_ann_ivf codebook recomputed WITHOUT Ray (pure pyarrow +
    numpy): the same hash-spread sample (rows with the smallest
    xxh64(vec_id), survivor mask h % m == 0) and the same deterministic
    Lloyd iterations (_kmeans_cosine).  Bitwise equality with the
    distributed _hash_spread_sample path is pinned by
    tests/test_similarity_oracle.py."""
    import pyarrow.parquet as pq

    from nipper_ray.frontier.hashing import xxh64_fixed_rows
    from nipper_ray.ops.similarity import _kmeans_cosine

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = (t.column("vec_id").to_numpy(zero_copy_only=False)
           .astype(np.int64))
    col = t.column("embedding").combine_chunks()
    d = len(col[0])
    m = (col.flatten().to_numpy(zero_copy_only=False)
         .reshape(len(ids), d).astype(np.float64))
    n = len(ids)
    mod = np.uint64(max(1, n // (4 * sample_size)))
    h = xxh64_fixed_rows(
        np.ascontiguousarray(ids).view(np.uint8).reshape(n, 8))
    mask = (h % mod) == 0
    order = np.argsort(h[mask], kind="stable")
    sample = m[mask][order][:sample_size]
    return _kmeans_cosine(sample, n_cells)


def _ann_ivf_oracle_sql() -> str:
    """Independent SQL re-derivation of ops/similarity.ivf_topk (as
    wired by q_ann_ivf: n_cells=16, nprobe=4, k=10): the deterministic
    codebook — a pure function of the corpus, recomputed Ray-free by
    _ivf_oracle_centroids — ships as a VALUES table; cell assignment
    (argmax dot, scale-invariant so normalization is skipped), per-query
    nprobe cell selection, candidate filtering and exact cosine top-10
    all run in SQL.  Assignment margins >= 8.9e-5 at every shipped
    scale (pinned) vs ~1e-13 summation noise.  The gate scale is fixed
    (the driver compares at sf0.01); NIPPER_RAY_ORACLE_SF overrides the
    corpus for local sweeps at other scales."""
    sf_dir = os.environ.get("NIPPER_RAY_ORACLE_SF",
                            "/root/testdata/sf0.01")
    cent = _ivf_oracle_centroids(sf_dir)
    rows = ", ".join("(%d, %s)" % (j, _double_list_sql(cent[j]))
                     for j in range(len(cent)))
    return f"""
        WITH cent AS (SELECT * FROM (VALUES {rows}) t(cell, c)),
        e AS (SELECT vec_id,
                     list_transform(embedding,
                                    x -> CAST(x AS DOUBLE)) AS emb,
                     embedding
              FROM embeddings),
        dots AS (SELECT e.vec_id, cent.cell,
                        list_dot_product(e.emb, cent.c) AS d
                 FROM e CROSS JOIN cent),
        assign AS (SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d DESC, cell)
                              AS rn
                   FROM dots QUALIFY rn = 1),
        probes AS (SELECT DISTINCT cell FROM (
                   SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d DESC, cell)
                              AS rn
                   FROM dots WHERE vec_id < 5
                   QUALIFY rn <= 4)),
        cand AS (SELECT e.vec_id, e.emb
                 FROM e JOIN assign USING (vec_id)
                 WHERE cell IN (SELECT cell FROM probes)),
        q AS (SELECT vec_id, emb FROM e WHERE vec_id < 5),
        s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.emb, c.emb), 6)
                         AS sim
              FROM q CROSS JOIN cand c)
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id)
                   AS rank
        FROM s QUALIFY rank <= 10
        ORDER BY query_id, rank
    """


# exact word-3-gram Jaccard join over documents, parameterized on the
# threshold — the minhash_neardup (0.6) and ngram_jaccard (0.5)
# oracles, also reused as the pair source of the dedup_clusters oracle
_JACCARD_PAIRS_SQL_TMPL = """
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(
                                  translate(text,
                                      'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                      'abcdefghijklmnopqrstuvwxyz'),
                                  '[a-z0-9_]+') AS w
                       FROM documents),
                 sh AS (SELECT doc_id, list_distinct(list_transform(
                            generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                            AS s
                        FROM w WHERE len(w) >= 3),
                 e AS (SELECT doc_id, unnest(s) AS g FROM sh),
                 sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                 inter AS (SELECT e1.doc_id AS a, e2.doc_id AS b,
                                  count(*) AS i
                           FROM e e1 JOIN e e2
                             ON e1.g = e2.g AND e1.doc_id < e2.doc_id
                           GROUP BY 1, 2)
            SELECT a, b
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold}
            ORDER BY a, b
        """
_MINHASH_PAIRS_SQL = _JACCARD_PAIRS_SQL_TMPL.format(threshold="0.6")

# Golden (title, n_links) for the 5 reference fixture pages embedded in
# the synthetic corpus.  Values are pinned byte-exact by the round-1
# reference-parity tests (tests/test_extract_e2e.py); the 500+ synthetic
# rows of the extract oracle are derived INDEPENDENTLY in SQL from the
# corpus generation rule (sources/synth.py gen_page_html).
_FIXTURE_EXTRACT = (
    ("page.html", "\n            Provok.in\n        ", 5),
    ("page2.html", "Tests for siblings", 0),
    ("hacker_news.html", "Hacker News", 226),
    ("rustwiki.html", "Rust (programming language) - Wikipedia", 863),
    ("wisburg.html", "通胀三部曲之一：哄抢卫生纸对通胀的影响大吗？ - 智堡 Wisburg", 38),
)


def _sql_str(s: str) -> str:
    """SQL string literal (single-quote escape; newlines via chr())."""
    out = s.replace("'", "''")
    if "\n" in out:
        parts = out.split("\n")
        return " || chr(10) || ".join("'%s'" % p for p in parts)
    return "'%s'" % out


# URL / host / title of synthetic page doc_id, as SQL over `documents`
# — mirrors sources/synth.py host_for/page_url/gen_page_html exactly.
_SYNTH_HOST_SQL = """
    CASE WHEN doc_id % 4 = 0 THEN 'h0.example.com'
         ELSE 'h' || CAST(1 + (doc_id * 2654435761) % 15 AS VARCHAR)
              || '.example.com' END"""
_SYNTH_TITLE_SQL = ("'Doc ' || CAST(doc_id AS VARCHAR) || ' — ' || "
                    "substr(sha256('page:' || CAST(doc_id AS VARCHAR)),"
                    " 1, 12)")


def _extract_oracle_sql() -> str:
    fixture_rows = ",\n              ".join(
        "('https://fixtures.example.com/%s', %s, CAST(%d AS BIGINT))"
        % (name, _sql_str(title), n)
        for name, title, n in _FIXTURE_EXTRACT)
    return """
        SELECT 'https://' || %s || '/doc/' || CAST(doc_id AS VARCHAR)
                   AS url,
               %s AS title,
               CAST(11 AS BIGINT) AS n_links
        FROM documents
        UNION ALL
        SELECT * FROM (VALUES
              %s) fx(url, title, n_links)
    """ % (_SYNTH_HOST_SQL, _SYNTH_TITLE_SQL, fixture_rows)


# Golden readability digests for the 5 fixture pages (title,
# md5(article_text), n_chars) — pinned by tests/test_ops.py
# readability tests; synthetic rows are derived independently in SQL.
_FIXTURE_READABILITY = (
    ("page.html", "Provok.in",
     "60c84f83afd1d7f11ebe7ce417373c18", 218),
    ("page2.html", "Tests for siblings",
     "d41d8cd98f00b204e9800998ecf8427e", 0),
    ("hacker_news.html", "Hacker News",
     "a38e0a58ea2d15fd21e897d176ea2481", 4806),
    ("rustwiki.html", "Rust (programming language) - Wikipedia",
     "6a6a3438b24696f84e0457ea07aade6d", 27467),
    ("wisburg.html", "通胀三部曲之一：哄抢卫生纸对通胀的影响大吗？ - 智堡 Wisburg",
     "91851ac105f88388b9931b0ebe37dccd", 5636),
)


def _readability_oracle_sql() -> str:
    """Synthetic article_text == 'Document N' + '\\n    '-joined
    400-char chunks of the doc text (the <h1> + <p> paragraph layout of
    sources/synth.py gen_page_html, empty text -> '(empty)'), verified
    exact in tests; the oracle reconstructs it and hashes."""
    fixture_rows = ",\n              ".join(
        "('https://fixtures.example.com/%s', %s, '%s', CAST(%d AS BIGINT))"
        % (name, _sql_str(title), fp, n)
        for name, title, fp, n in _FIXTURE_READABILITY)
    return """
        WITH synth AS (
            SELECT doc_id,
                   'Document ' || CAST(doc_id AS VARCHAR)
                   || chr(10) || '    ' ||
                   CASE WHEN length(text) = 0 THEN '(empty)'
                        ELSE array_to_string(
                            list_transform(
                                generate_series(
                                    0, (length(text) + 399) // 400 - 1),
                                i -> substr(text, i * 400 + 1, 400)),
                            chr(10) || '    ') END AS article_text
            FROM documents)
        SELECT 'https://' || %s || '/doc/' || CAST(doc_id AS VARCHAR)
                   AS url,
               %s AS title,
               md5(article_text) AS fp_article,
               length(article_text) AS n_article_chars
        FROM synth
        UNION ALL
        SELECT * FROM (VALUES
              %s) fx(url, title, fp_article, n_article_chars)
    """ % (_SYNTH_HOST_SQL, _SYNTH_TITLE_SQL, fixture_rows)


def _crawl_wave_oracle_sql() -> str:
    """Both crawl waves re-derived in SQL, mirroring the frontier
    semantics exactly (frontier/{scheduler,politeness,seen,robots}.py):

    wave 0: seeds range(0,120,3) -> robots digit filter -> per-host
    top-30 by (priority desc, url asc) -> global cap 100.  All seeds
    share priority, so ordering reduces to url asc.

    wave 1: every fetched page links to its 10 deterministic outlink
    doc urls (sources/synth.py outlink_ids, n_docs = count(documents))
    plus its host's home page '/'; candidates are canonical-distinct,
    robots-filtered (the home path passes; /doc/<digit> prefixes
    don't), anti-joined against everything the wave-0 dedup probe
    admitted (all robots-passing seeds — inserted at probe time, before
    politeness), then per-host top-30 / global top-100 again.  Home
    pages fetch-fail -> empty title rows, kept.

    The per-host robots digit (synthetic REP file, frontier/robots.py:
    Disallow /doc/<xxh64(host)%%10>) is precomputed here — a pure
    function of the 16 fixed host names."""
    from nipper_ray.frontier.hashing import xxh64_str

    digit_rows = ", ".join(
        "('h%d.example.com', '%d')" % (k, xxh64_str(
            "h%d.example.com" % k) % 10) for k in range(16))
    host_t = _SYNTH_HOST_SQL.replace("doc_id", "tgt")
    title_t = _SYNTH_TITLE_SQL.replace("doc_id", "tgt")
    return """
        WITH n AS (SELECT count(*) AS n_docs FROM documents),
        seeds AS (
            SELECT CAST(x AS BIGINT) AS doc_id
            FROM generate_series(0, 119, 3) s(x)),
        u AS (
            SELECT doc_id, %(host)s AS host,
                   'https://' || %(host)s || '/doc/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   %(title)s AS title
            FROM seeds),
        hd AS (SELECT * FROM (VALUES %(digits)s) t(host, digit)),
        w0_allowed AS (
            SELECT u.* FROM u JOIN hd ON u.host = hd.host
            WHERE substr(CAST(doc_id AS VARCHAR), 1, 1) <> hd.digit),
        w0_sel AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY host
                                             ORDER BY url) AS rn
                FROM w0_allowed) WHERE rn <= 30
            ORDER BY url LIMIT 100),
        tgts AS (
            SELECT (d.doc_id * 7919 + g.i * 104729 + g.i * g.i)
                       %% n.n_docs AS tgt
            FROM w0_sel d, generate_series(0, 7) g(i), n
            UNION ALL
            SELECT (doc_id + 1) %% n.n_docs FROM w0_sel, n
            UNION ALL
            SELECT (doc_id * 7919) %% n.n_docs FROM w0_sel, n),
        link_urls AS (
            SELECT DISTINCT
                   'https://' || %(host_t)s || '/doc/'
                       || CAST(tgt AS VARCHAR) AS url,
                   %(host_t)s AS host, tgt, %(title_t)s AS title
            FROM tgts
            UNION
            SELECT DISTINCT 'https://' || host || '/' AS url,
                   host, CAST(NULL AS BIGINT) AS tgt, '' AS title
            FROM w0_sel),
        w1_cand AS (
            SELECT l.* FROM link_urls l JOIN hd ON l.host = hd.host
            WHERE (l.tgt IS NULL
                   OR substr(CAST(l.tgt AS VARCHAR), 1, 1) <> hd.digit)
              AND l.url NOT IN (SELECT url FROM w0_allowed)),
        w1_sel AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY host
                                             ORDER BY url) AS rn
                FROM w1_cand) WHERE rn <= 30
            ORDER BY url LIMIT 100),
        tgts2 AS (
            SELECT (d.tgt * 7919 + g.i * 104729 + g.i * g.i)
                       %% n.n_docs AS tgt
            FROM w1_sel d, generate_series(0, 7) g(i), n
            WHERE d.tgt IS NOT NULL
            UNION ALL
            SELECT (tgt + 1) %% n.n_docs FROM w1_sel, n
            WHERE tgt IS NOT NULL
            UNION ALL
            SELECT (tgt * 7919) %% n.n_docs FROM w1_sel, n
            WHERE tgt IS NOT NULL),
        link_urls2 AS (
            SELECT DISTINCT
                   'https://' || %(host_t)s || '/doc/'
                       || CAST(tgt AS VARCHAR) AS url,
                   %(host_t)s AS host, tgt, %(title_t)s AS title
            FROM tgts2
            UNION
            SELECT DISTINCT 'https://' || host || '/' AS url,
                   host, CAST(NULL AS BIGINT) AS tgt, '' AS title
            FROM w1_sel WHERE tgt IS NOT NULL),
        w2_cand AS (
            SELECT l.* FROM link_urls2 l JOIN hd ON l.host = hd.host
            WHERE (l.tgt IS NULL
                   OR substr(CAST(l.tgt AS VARCHAR), 1, 1) <> hd.digit)
              AND l.url NOT IN (SELECT url FROM w0_allowed
                                UNION SELECT url FROM w1_cand)),
        w2_sel AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY host
                                             ORDER BY url) AS rn
                FROM w2_cand) WHERE rn <= 30
            ORDER BY url LIMIT 100)
        SELECT url, host, CAST(0 AS INTEGER) AS depth, title FROM w0_sel
        UNION ALL
        SELECT url, host, CAST(1 AS INTEGER) AS depth, title FROM w1_sel
        UNION ALL
        SELECT url, host, CAST(2 AS INTEGER) AS depth, title FROM w2_sel
    """ % {"host": _SYNTH_HOST_SQL, "title": _SYNTH_TITLE_SQL,
           "digits": digit_rows, "host_t": host_t, "title_t": title_t}


def _rd():
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return rd


def _add_micros(t: pa.Table, value_col: str = "value") -> pa.Table:
    """Exact fixed-point micro-units of a float column: money-style
    sums of full-precision doubles are not scale-stable (partial-sum
    order vs the oracle's), so sums run over int64 micros rounded
    identically on both sides and divide once at the end."""
    m = pc.cast(
        pc.round(pc.multiply(t.column(value_col), pa.scalar(1e6)),
                 round_mode="half_towards_infinity"), pa.int64())
    return t.append_column("micros", m)


def _micros_finalize(t: pa.Table, cols: list[str]) -> pa.Table:
    """Post-aggregate micros -> sum_value = round(micros / 1e6, 6),
    pyarrow-native: the reduced table never hops through pandas.  The
    quotient of an int64 micro-sum is within ~1e-13 of a 6-decimal
    value, so every round mode agrees; half_towards_infinity is used
    to mirror DuckDB's round()."""
    sv = pc.round(pc.divide(pc.cast(t.column("micros"), pa.float64()),
                            pa.scalar(1e6)), 6,
                  round_mode="half_towards_infinity")
    return t.append_column("sum_value", sv).select(cols)


def _cents_to_dollars(t: pa.Table, cents_col: str, out_col: str,
                      ndigits: int = 2) -> pa.Table:
    """round(cents / 100, 2) as an appended float64 column (exact
    integer cents divided once at the very end — see _add_micros)."""
    rev = pc.round(
        pc.divide(pc.cast(t.column(cents_col), pa.float64()),
                  pa.scalar(100.0)), ndigits,
        round_mode="half_towards_infinity")
    return t.append_column(out_col, rev)


_SUM_MICROS_SQL = ("round(CAST(sum(CAST(round(value * 1000000) "
                   "AS BIGINT)) AS DOUBLE) / 1000000.0, 6) "
                   "AS sum_value")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry() -> Any:
    """Flagship: synthesize the sf0.001 pages corpus, run the
    nipper-semantics extraction stage over it, return the Dataset."""
    from nipper_ray.sources import read_pages
    from nipper_ray.stages import extract_pages

    ds = read_pages("/root/testdata/sf0.001", columns=["url", "html"])
    return extract_pages(ds, batch_size=32, concurrency=4)


# ---------------------------------------------------------------------------
# relational operators (groupby / join / sort / filter / windows)
# ---------------------------------------------------------------------------
def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with batch-local pre-aggregation
    before the (small) groupby shuffle (ray_guide: aggregation at scale)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native batch-local pre-aggregation.  Money columns sum
        # as EXACT integer cents (each term rounded identically on
        # both sides) — at 10^8+ rows a float accumulation differs
        # from DuckDB's summation order in the 2nd decimal, so float
        # sums of money are not scale-stable (found at sf0.1)
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        disc = pc.multiply(t.column("l_extendedprice"),
                           pc.subtract(pa.scalar(1.0),
                                       t.column("l_discount")))
        to_cents = lambda col: pc.cast(
            pc.round(pc.multiply(col, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "l_quantity": t.column("l_quantity"),
            "base_cents": to_cents(t.column("l_extendedprice")),
            "disc_cents": to_cents(disc),
        }).group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("base_cents", "sum"),
            ("disc_cents", "sum"), ("l_quantity", "count")])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty",
             "base_cents", "disc_cents", "count_order"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=32768)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("base_cents", alias_name="base_cents"),
        Sum("disc_cents", alias_name="disc_cents"),
        Sum("count_order", alias_name="count_order"))

    def finalize(t: pa.Table) -> pa.Table:
        # sum_qty is a float sum of INTEGRAL values -> exact
        t = t.append_column("avg_qty", pc.round(
            pc.divide(t.column("sum_qty"),
                      pc.cast(t.column("count_order"), pa.float64())),
            6, round_mode="half_towards_infinity"))
        t = t.set_column(
            t.schema.get_field_index("sum_qty"), "sum_qty",
            pc.round(t.column("sum_qty"), 2,
                     round_mode="half_towards_infinity"))
        t = _cents_to_dollars(t, "base_cents", "sum_base_price")
        t = _cents_to_dollars(t, "disc_cents", "sum_disc_price")
        return t.select(["l_returnflag", "l_linestatus", "sum_qty",
                         "sum_base_price", "sum_disc_price",
                         "count_order", "avg_qty"])

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_segment_revenue(sf_dir: str):
    """orders ⋈ customer via broadcast small side (no shuffle join):
    the customer dimension is loaded once and looked up per batch."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    rd = _rd()
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    seg_of = dict(zip(cust.column("c_custkey").to_pylist(),
                      cust.column("c_mktsegment").to_pylist()))
    from nipper_ray.ops.join import broadcast_map

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    ds = broadcast_map(ds, seg_of, "o_custkey", "c_mktsegment")

    def partial(t: pa.Table) -> pa.Table:
        # money sums in exact integer cents (scale-stable vs the
        # oracle's summation order — see pricing_summary); arrow
        # half_towards_infinity == DuckDB round for positives
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"),
                                 pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"c_mktsegment": t.column("c_mktsegment"),
                      "cents": cents}).group_by(
            "c_mktsegment").aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["c_mktsegment", "cents", "n_orders"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=32768)
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("cents", alias_name="cents"),
        Sum("n_orders", alias_name="n_orders"))
    return agg.map_batches(
        lambda t: _cents_to_dollars(t, "cents", "revenue").select(
            ["c_mktsegment", "revenue", "n_orders"]),
        batch_format="pyarrow")


def q_region_revenue(sf_dir: str):
    """TPC-H-Q5-shaped multi-way join: lineitem ⋈ orders is a
    HASH-PARTITIONED large-large join (ops/join.py hash_join — both
    sides shuffle, no broadcast leg); customer/supplier/nation/region
    are broadcast dict lookups.  Selectivity is pushed below the
    shuffle: both sides are column-pruned and pre-filtered (orders to
    the 1996 window + ASIA customers, lineitem to ASIA suppliers)
    before any byte moves."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from nipper_ray.ops.join import hash_join

    rd = _rd()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    region_name = dict(zip(reg.column("r_regionkey").to_pylist(),
                           reg.column("r_name").to_pylist()))
    asia_name = {
        nk: name
        for nk, name, rk in zip(nat.column("n_nationkey").to_pylist(),
                                nat.column("n_name").to_pylist(),
                                nat.column("n_regionkey").to_pylist())
        if region_name[rk] == "ASIA"}
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    c_nat = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_nationkey").to_pylist()))
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    s_nat = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_nationkey").to_pylist()))

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    # broadcast lookups as Arrow key/value array pairs: probed with
    # pc.index_in + take per batch (vectorized), never a per-row
    # Python dict.get loop
    c_keys = pa.array(list(c_nat.keys()), pa.int64())
    c_vals = pa.array(list(c_nat.values()), pa.int64())
    s_keys = pa.array(list(s_nat.keys()), pa.int64())
    s_vals = pa.array(list(s_nat.values()), pa.int64())

    def prep_orders(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cn = pc.take(c_vals,
                     pc.index_in(t.column("o_custkey"), value_set=c_keys))
        t = t.append_column("c_nation", cn)
        keep = pc.is_in(t.column("c_nation"),
                        value_set=pa.array(list(asia_name), pa.int64()))
        return t.filter(keep).select(["o_orderkey", "c_nation"])

    def prep_line(t: pa.Table) -> pa.Table:
        sn = pc.take(s_vals,
                     pc.index_in(t.column("l_suppkey"), value_set=s_keys))
        t = t.append_column("s_nation", sn)
        keep = pc.is_in(t.column("s_nation"),
                        value_set=pa.array(list(asia_name), pa.int64()))
        t = t.filter(keep)
        revenue = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        # exact integer cents: scale-stable money sums (see
        # pricing_summary)
        cents = pc.cast(
            pc.round(pc.multiply(revenue, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "s_nation": t.column("s_nation"),
                         "rev_cents": cents})

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]
    ).map_batches(prep_line, batch_format="pyarrow")
    j = hash_join(line, orders, on=("l_orderkey",),
                  right_on=("o_orderkey",), num_partitions=8)

    a_keys = pa.array(list(asia_name.keys()), pa.int64())
    a_vals = pa.array(list(asia_name.values()), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_nation"),
                              t.column("s_nation")))
        nm = pc.take(a_vals, pc.index_in(t.column("s_nation"),
                                         value_set=a_keys))
        tb = pa.table({"n_name": nm, "rev_cents": t.column("rev_cents")})
        # pa group_by emits key cols first, aggregates as <col>_<agg>
        g = tb.group_by("n_name").aggregate([("rev_cents", "sum")])
        return g.rename_columns(["n_name", "rev_cents"])

    agg = j.map_batches(partial, batch_format="pyarrow").groupby(
        "n_name").aggregate(Sum("rev_cents", alias_name="rev_cents"))
    return agg.map_batches(
        lambda t: _cents_to_dollars(t, "rev_cents", "revenue")
        .select(["n_name", "revenue"]),
        batch_format="pyarrow")


def q_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shaped join: lineitem x part on partkey (the second
    large-large hash-join leg, a different key distribution than the
    orderkey leg) with a shipdate window and a conditional aggregate.

    Per brand: item count, exact-cent revenue, and the PROMO share in
    exact integer ppm (floor division on both sides — no float ratio).
    Both sides are pruned + filtered BELOW the shuffle."""
    from ray.data.aggregate import Sum

    from nipper_ray.ops.join import hash_join

    rd = _rd()
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-07-01", "us"))

    def prep_line(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        revenue = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        cents = pc.cast(
            pc.round(pc.multiply(revenue, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "rev_cents": cents})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]
    ).map_batches(prep_line, batch_format="pyarrow")
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_brand", "p_type"])
    j = hash_join(line, part, on=("l_partkey",),
                  right_on=("p_partkey",), num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        promo = pc.if_else(
            pc.equal(t.column("p_type"), pa.scalar("PROMO")),
            t.column("rev_cents"), pa.scalar(0, pa.int64()))
        ones = pa.array(np.ones(len(t), dtype=np.int64))
        tb = pa.table({"p_brand": t.column("p_brand"),
                       "rev_cents": t.column("rev_cents"),
                       "promo_cents": promo, "n_items": ones})
        g = tb.group_by("p_brand").aggregate(
            [("rev_cents", "sum"), ("promo_cents", "sum"),
             ("n_items", "sum")])
        return g.rename_columns(
            ["p_brand", "rev_cents", "promo_cents", "n_items"])

    agg = j.map_batches(partial, batch_format="pyarrow").groupby(
        "p_brand").aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("n_items", alias_name="n_items"))

    def finalize(t: pa.Table) -> pa.Table:
        rev = pc.divide(pc.cast(t.column("rev_cents"), pa.float64()),
                        pa.scalar(100.0))
        # integer division on positives: arrow trunc == pandas floor
        ppm = pc.divide(pc.multiply(t.column("promo_cents"),
                                    pa.scalar(1_000_000, pa.int64())),
                        t.column("rev_cents"))
        return pa.table({"p_brand": t.column("p_brand"),
                         "n_items": t.column("n_items"),
                         "revenue": rev, "promo_ppm": ppm})

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_part_profit(sf_dir: str):
    """TPC-H-Q9-shaped chain: TWO large-large hash joins in one
    pipeline (lineitem x 'red'-part on partkey, then x orders on
    orderkey) with supplier-nation as a broadcast lookup — revenue by
    (supplier nation, order year) for red parts.  Both join legs are
    column-pruned and filtered BELOW their shuffles; money is exact
    integer cents end to end."""
    from ray.data.aggregate import Sum

    from nipper_ray.ops.join import hash_join

    rd = _rd()
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    red = part.filter(pc.match_substring(part.column("p_name"), "red"))
    red_keys = pa.array(red.column("p_partkey").to_pylist(), pa.int64())

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    nat_name = dict(zip(nat.column("n_nationkey").to_pylist(),
                        nat.column("n_name").to_pylist()))
    s_keys = pa.array(supp.column("s_suppkey").to_pylist(), pa.int64())
    s_vals = pa.array(
        [nat_name[k] for k in supp.column("s_nationkey").to_pylist()],
        pa.string())

    def prep_line(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("l_partkey"),
                              value_set=red_keys))
        revenue = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        cents = pc.cast(
            pc.round(pc.multiply(revenue, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        n_name = pc.take(s_vals, pc.index_in(t.column("l_suppkey"),
                                             value_set=s_keys))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "n_name": n_name, "rev_cents": cents})

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_year": pc.cast(pc.year(t.column("o_orderdate")),
                              pa.int64())})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]
    ).map_batches(prep_line, batch_format="pyarrow")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    j = hash_join(line, orders, on=("l_orderkey",),
                  right_on=("o_orderkey",), num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(len(t), dtype=np.int64))
        tb = pa.table({"n_name": t.column("n_name"),
                       "o_year": t.column("o_year"),
                       "rev_cents": t.column("rev_cents"),
                       "n_items": ones})
        g = tb.group_by(["n_name", "o_year"]).aggregate(
            [("rev_cents", "sum"), ("n_items", "sum")])
        return g.rename_columns(
            ["n_name", "o_year", "rev_cents", "n_items"])

    agg = j.map_batches(partial, batch_format="pyarrow").groupby(
        ["n_name", "o_year"]).aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("n_items", alias_name="n_items"))

    def finalize(t: pa.Table) -> pa.Table:
        rev = pc.divide(pc.cast(t.column("rev_cents"), pa.float64()),
                        pa.scalar(100.0))
        return t.append_column("revenue", rev).select(
            ["n_name", "o_year", "n_items", "revenue"])

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_unshipped_parts(sf_dir: str):
    """Large-large ANTI join (ops/join.anti_join): parts with no
    lineitem shipment in a 2-month window — NOT EXISTS at scale.
    Only (key, marker) rows of the right side ever shuffle."""
    from nipper_ray.ops.join import anti_join

    rd = _rd()
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-03-01", "us"))
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_brand"])
    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), lo),
            pc.less(t.column("l_shipdate"), hi))).select(["l_partkey"]),
        batch_format="pyarrow")
    return anti_join(part, line, on=("p_partkey",),
                     right_on=("l_partkey",))


def q_price_quantiles(sf_dir: str):
    """Exact distributed quantiles via the value-histogram pattern:
    per-batch (flag, cents) partial counts -> one narrow groupby ->
    per-flag cumulative pick.  Matches DuckDB's quantile_disc rule
    (sorted element at ceil(q*n)-1) on exact integer cents, so the
    oracle is value-identical — no sampling, no sketch error."""
    import math

    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"),
                                 pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        tb = pa.table({"l_returnflag": t.column("l_returnflag"),
                       "cents": cents})
        g = tb.group_by(["l_returnflag", "cents"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["l_returnflag", "cents", "n"])

    hist = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "cents"]).aggregate(Sum("n", alias_name="n"))

    QS = (0.25, 0.5, 0.9, 0.99)

    def pick(g):
        g = g.sort_values("cents")
        c = g["n"].to_numpy().cumsum()
        n = int(c[-1])
        row = {"l_returnflag": g["l_returnflag"].iloc[0],
               "n_items": np.int64(n)}
        vals = g["cents"].to_numpy()
        for q in QS:
            k = max(1, math.ceil(q * n))
            idx = int(np.searchsorted(c, k))
            row["p%d" % int(q * 100)] = vals[idx] / 100.0
        import pandas as pd

        return pd.DataFrame([row])

    return hist.groupby("l_returnflag").map_groups(
        pick, batch_format="pandas")


def q_pagerank(sf_dir: str):
    """Distributed link-graph PageRank (ops/rank.py): the crawl
    frontier's authority prioritization as an iterative pipeline —
    one hash join + one groupby per iteration over (node, int64)
    rows.  Exact integer arithmetic end to end (RANK_SCALE units,
    floor division both sides), so the DuckDB oracle's unrolled-CTE
    iterations are bit-identical."""
    import pyarrow.parquet as pq

    from nipper_ray.ops.rank import edges_from_docs_stage, pagerank

    rd = _rd()
    path = os.path.join(sf_dir, "documents.parquet")
    nd = pq.ParquetFile(path).metadata.num_rows
    docs = rd.read_parquet(path, columns=["doc_id"])
    edges = docs.map_batches(edges_from_docs_stage,
                             batch_format="pyarrow",
                             fn_kwargs={"n_docs": nd})
    return pagerank(edges, nd, iters=5)


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled-CTE mirror of ops/rank.pagerank (exact integers)."""
    head = """
            WITH nn AS (SELECT count(*) AS nd FROM documents),
            e0 AS (
                SELECT doc_id AS src,
                       (doc_id * 7919 + g.i * 104729 + g.i * g.i)
                           %% nn.nd AS dst
                FROM documents, generate_series(0, 7) g(i), nn
                UNION ALL
                SELECT doc_id, (doc_id + 1) %% nn.nd FROM documents, nn
                UNION ALL
                SELECT doc_id, (doc_id * 7919) %% nn.nd
                FROM documents, nn),
            e AS (SELECT DISTINCT src, dst FROM e0),
            od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
            ed AS (SELECT e.src, e.dst, od.outdeg
                   FROM e JOIN od USING (src)),
            r1 AS (SELECT ed.dst AS node,
                          (15 * (1000000000000 // nn.nd)) // 100
                          + (85 * sum((1000000000000 // nn.nd)
                                      // ed.outdeg)) // 100 AS r
                   FROM ed, nn GROUP BY ed.dst, nn.nd)"""
    parts = [head % ()]
    for t in range(2, iters + 1):
        parts.append(""",
            r%d AS (SELECT ed.dst AS node,
                          (15 * (1000000000000 // nn.nd)) // 100
                          + (85 * sum(r%d.r // ed.outdeg)) // 100 AS r
                   FROM ed JOIN r%d ON r%d.node = ed.src, nn
                   GROUP BY ed.dst, nn.nd)""" % (t, t - 1, t - 1, t - 1))
    parts.append("""
            SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_u
            FROM r%d""" % iters)
    return "".join(parts)


def q_top_users(sf_dir: str):
    """filter -> groupby -> global sort -> limit (top-k)."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: _add_micros(t.filter(
            pc.equal(t.column("event_type"), pa.scalar("click")))),
        batch_format="pyarrow")
    agg = ds.groupby("user_id").aggregate(
        Count(alias_name="n_clicks"), Sum("micros", alias_name="micros"))
    agg = agg.map_batches(
        lambda t: _micros_finalize(t, ["user_id", "n_clicks",
                                       "sum_value"]),
        batch_format="pyarrow")
    return agg.sort(["n_clicks", "user_id"],
                    descending=[True, False]).limit(10)


def q_hourly_windows(sf_dir: str):
    """Tumbling event-time windows as a grouped aggregate over the
    truncated timestamp (ray_guide: streaming-shaped workloads)."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts", "value"])

    def add_hour(t: pa.Table) -> pa.Table:
        return _add_micros(t.append_column(
            "hour", pc.floor_temporal(t.column("ts"), unit="hour")))

    ds = ds.map_batches(add_hour, batch_format="pyarrow")
    agg = ds.groupby(["event_type", "hour"]).aggregate(
        Count(alias_name="n"), Sum("micros", alias_name="micros"))
    return agg.map_batches(
        lambda t: _micros_finalize(t, ["event_type", "hour", "n",
                                       "sum_value"]),
        batch_format="pyarrow")


def q_props_stats(sf_dir: str):
    """Semi-structured column op: extract a field from the JSON
    ``props`` payload, pre-aggregate per batch, tiny final groupby.
    The hot path is a vectorized RE2 scan (pc.extract_regex) for the
    integer ``k`` field; rows the regex can't see (nested/typed JSON)
    fall back to stdlib json per row — at the shipped corpora that
    fallback never fires, and at 100 TB a C JSON parser swaps in
    behind the same stage boundary."""
    import json

    from ray.data.aggregate import Max, Min, Sum

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        props = t.column("props")
        ext = pc.extract_regex(props, r'"k"\s*:\s*(?P<k>-?\d+)')
        ks = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        # exactness fallback: any non-null props row the regex missed
        # (e.g. float/string-valued k) goes through the JSON parser
        miss = pc.and_(pc.is_null(ks), pc.is_valid(props))
        if pc.any(miss).as_py():
            idx = np.nonzero(miss.to_numpy(zero_copy_only=False))[0]
            vals = ks.to_pylist()
            plist = props.to_pylist()
            for i in idx:
                vals[i] = json.loads(plist[i] or "{}").get("k")
            ks = pa.array(vals, pa.int64())
        tt = pa.table({"event_type": t.column("event_type"),
                       "k": ks})
        g = tt.group_by(["event_type"]).aggregate(
            [("k", "sum"), ("k", "min"), ("k", "max"), ("k", "count")])
        return g.rename_columns(["event_type", "sum_k", "min_k",
                                 "max_k", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("event_type").aggregate(
        Sum("sum_k", alias_name="sum_k"),
        Min("min_k", alias_name="min_k"),
        Max("max_k", alias_name="max_k"),
        Sum("n", alias_name="n"))
    return agg


def q_value_bands(sf_dir: str):
    """Range (interval) join with OVERLAPPING bands: each event joins
    every band containing its value (broadcast interval side, flat-map
    expansion — ops/join.py range_join_broadcast), then a grouped
    aggregate per (event_type, band)."""
    from ray.data.aggregate import Count, Sum

    from nipper_ray.ops.join import range_join_broadcast

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    bands = [(0.0, 20.0, "low"), (10.0, 50.0, "mid"),
             (40.0, 100.0, "high"), (0.0, 100.0, "all")]
    j = range_join_broadcast(ds.map_batches(_add_micros,
                                            batch_format="pyarrow"),
                             bands, value_col="value")
    agg = j.groupby(["event_type", "band"]).aggregate(
        Count(alias_name="n"), Sum("micros", alias_name="micros"))
    return agg.map_batches(
        lambda t: _micros_finalize(t, ["event_type", "band", "n",
                                       "sum_value"]),
        batch_format="pyarrow")


def q_click_attribution(sf_dir: str):
    """As-of join (an operator Ray Data lacks natively): every click
    attributed to the user's latest view at-or-before the click.
    ops/join.py asof_join = tag + union + ONE groupby(user) shuffle +
    pandas merge_asof per group; ties on view ts pick the max view id
    (mirrors the oracle's per-(user, ts) max aggregation before its
    native ASOF JOIN)."""
    from nipper_ray.ops.join import asof_join

    rd = _rd()
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"),
                                    pa.scalar("click")))
        .select(["user_id", "event_id", "ts"])
        .rename_columns(["user_id", "click_id", "ts"]),
        batch_format="pyarrow")
    views = ev.map_batches(
        lambda t: (lambda f: pa.table({
            "user_id": f.column("user_id"),
            "ts": f.column("ts"),
            "view_id": f.column("event_id"),
            "view_ts": f.column("ts"),
        }))(t.filter(pc.equal(t.column("event_type"),
                              pa.scalar("view")))),
        batch_format="pyarrow")
    j = asof_join(clicks, views, by="user_id", on="ts",
                  right_cols=["view_id", "view_ts"],
                  right_tiebreak=["view_id"])

    def finish(t: pa.Table) -> pa.Table:
        gap = pc.cast(pc.cast(pc.subtract(t.column("ts"),
                                          t.column("view_ts")),
                              pa.duration("us")), pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "click_id": t.column("click_id"),
            "view_id": t.column("view_id"),
            "gap_us": gap,
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_sliding_windows(sf_dir: str):
    """Sliding event-time windows (1 h window, 30 min slide): each
    event expands to its 2 covering windows inside map_batches (no
    shuffle for the expansion), then one grouped aggregate — the
    standard sliding-window-as-tumbling-union rewrite."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts", "value"])
    half = pa.scalar(30 * 60 * 1000, pa.duration("ms"))

    def expand(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t.column("ts"), multiple=30, unit="minute")
        base = _add_micros(pa.table({
            "event_type": t.column("event_type"),
            "value": t.column("value")}))
        return pa.concat_tables([
            base.append_column("w_start", w),
            base.append_column("w_start", pc.subtract(w, half)),
        ])

    ds = ds.map_batches(expand, batch_format="pyarrow")
    agg = ds.groupby(["event_type", "w_start"]).aggregate(
        Count(alias_name="n"), Sum("micros", alias_name="micros"))
    return agg.map_batches(
        lambda t: _micros_finalize(t, ["event_type", "w_start", "n",
                                       "sum_value"]),
        batch_format="pyarrow")


def q_distinct_types(sf_dir: str):
    """distinct (shuffle) + filter."""
    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("value"), pa.scalar(10.0))),
        batch_format="pyarrow")
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def q_session_windows(sf_dir: str):
    """Gap-based session windows (30 min) per user: the stream-shaped
    stateful operator done as groupby(key).map_groups over ts-sorted
    groups (ray_guide: streaming-shaped workloads). Exact SQL oracle
    via lag + cumulative sum."""
    import numpy as np
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "ts"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        sid = gap.cumsum() + 1  # first row: NaT diff -> False -> 1
        out = g.assign(session_id=sid.astype(np.int64)).groupby(
            "session_id", as_index=False).agg(
                n_events=("event_id", "count"),
                session_start=("ts", "min"))
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    from nipper_ray.ops.grouping import routed_map_groups

    if os.environ.get("NIPPER_RAY_SALT"):
        # Hot-key rescue (exact): salt by a time-RANGE bucket so each
        # sub-group is time-contiguous; partials carry (first_ts,
        # last_ts) so the combine can stitch sessions across bucket
        # boundaries (gap rule applied to inter-partial gaps — exact
        # because bucket ranges are disjoint, so partial sessions of a
        # user are totally ordered in time).
        def add_bucket(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_tsbucket",
                pc.floor_temporal(t.column("ts"), unit="day"))

        def sessionize_partial(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["_tsbucket"])
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            gap = g["ts"].diff() > pd.Timedelta(minutes=30)
            agg = g.assign(_sid=gap.cumsum()).groupby(
                "_sid", as_index=False).agg(
                    n_events=("event_id", "count"),
                    first_ts=("ts", "min"),
                    last_ts=("ts", "max"))
            agg.insert(0, "user_id", g["user_id"].iloc[0])
            return agg[["user_id", "first_ts", "last_ts", "n_events"]]

        def sessions_combine(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["first_ts", "last_ts"], kind="mergesort")
            # partials are disjoint time intervals in order, so
            # last_ts is nondecreasing and shift() is the rolling max
            new = (g["first_ts"] - g["last_ts"].shift()) \
                > pd.Timedelta(minutes=30)
            sid = new.cumsum() + 1
            out = g.assign(session_id=sid.astype(np.int64)).groupby(
                "session_id", as_index=False).agg(
                    n_events=("n_events", "sum"),
                    session_start=("first_ts", "min"))
            out.insert(0, "user_id", g["user_id"].iloc[0])
            return out

        salted = ds.map_batches(add_bucket, batch_format="pyarrow")
        return routed_map_groups(salted, ["user_id"], sessionize_partial,
                                 salt=("_tsbucket", None),
                                 combine_fn=sessions_combine)

    return routed_map_groups(ds, ["user_id"], sessionize)


def q_top_events_per_user(sf_dir: str):
    """Top-3 events by value per user (window-function shape as
    groupby + map_groups head-N; deterministic tiebreak)."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "value"])

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(value=g.value.round(6))
        g = g.sort_values(["value", "event_id"],
                          ascending=[False, True], kind="mergesort")
        out = g.head(3).copy()
        out["rank"] = range(1, len(out) + 1)
        return out

    from nipper_ray.ops.grouping import routed_map_groups

    if os.environ.get("NIPPER_RAY_SALT"):
        # top-N is combinable: topn(concat(topn(parts))) == topn(whole),
        # so the two-phase salted reduction reuses fn as its combine.
        return routed_map_groups(ds, ["user_id"], topn,
                                 salt=("event_id", 8))

    return routed_map_groups(ds, ["user_id"], topn)


# ---------------------------------------------------------------------------
# text analysis (documents)
# ---------------------------------------------------------------------------
def q_token_stats(sf_dir: str):
    from nipper_ray.ops.textstats import token_stats

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(token_stats, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens", "n_chars_computed"])


def q_quality(sf_dir: str):
    """Quality stats in exact integer ppm so the float-free values match
    the SQL oracle bit-for-bit."""
    import re

    rd = _rd()
    tok_re = re.compile(r"[A-Za-z0-9_]+")
    punct_re = re.compile(r"[.,;:!?]")
    stop = frozenset(
        "the a an and or of to in is are was were be been it this that"
        .split())

    def stats(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n_punct, stop_ppm, wlen_ppm = [], [], []
        for s in texts:
            s = s or ""
            toks = tok_re.findall(s)
            n_punct.append(len(punct_re.findall(s)))
            if toks:
                n_stop = sum(1 for w in toks if w.lower() in stop)
                stop_ppm.append(n_stop * 1_000_000 // len(toks))
                wlen_ppm.append(
                    sum(len(w) for w in toks) * 1_000_000 // len(toks))
            else:
                stop_ppm.append(0)
                wlen_ppm.append(0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_punct": pa.array(n_punct, pa.int64()),
            "stop_ppm": pa.array(stop_ppm, pa.int64()),
            "word_len_ppm": pa.array(wlen_ppm, pa.int64()),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return ds.map_batches(stats, batch_format="pyarrow")


def q_normalize(sf_dir: str):
    """Text normalization (NFC + whitespace squeeze + trim)."""
    from nipper_ray.ops.textstats import normalize_text

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(normalize_text, batch_format="pyarrow")
    return out.select_columns(["doc_id", "norm_text"])


def q_curate(sf_dir: str):
    """Composed curation pipeline: lang filter + token bounds +
    stopword floor (cheap row filters first), then exact-dedup keeper
    (the single shuffle) — pipelines/curate.py."""
    from nipper_ray.pipelines.curate import curate

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    return curate(ds, langs=("en",), min_tokens=30, max_tokens=120,
                  min_stop_ppm=50_000)


def q_hash_sample(sf_dir: str):
    """Deterministic content-hash sampling (the reproducible way to
    subsample a training corpus — unlike RNG sampling it is stable
    across engines, runs and partitionings): keep documents whose
    md5(text) falls below a fixed threshold (~1/4 here)."""
    import hashlib

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def keep(t: pa.Table) -> pa.Table:
        mask = [hashlib.md5((s or "").encode("utf-8")).hexdigest()
                < "40000000"
                for s in t.column("text").to_pylist()]
        return t.filter(pa.array(mask, pa.bool_())).select(["doc_id"])

    return ds.map_batches(keep, batch_format="pyarrow")


def q_label_centroids(sf_dir: str):
    """Per-label centroid of the embeddings, in EXACT integer
    micro-units per dimension — the one-pass (groupby-aggregate)
    alternative to all-pairs intra-label similarity: the corpus
    embeddings are unit-norm by construction, so mean pairwise cosine
    of a label is derivable from ||centroid_sum|| alone, and only
    (labels x dims) integers ever shuffle.

    Cross-engine float discipline (the round-2 lesson): every op
    BEFORE the round is a per-element IEEE op on the stored doubles
    (val * 1e6), identical in any engine; everything after is exact
    integer math.  Deliberately NOT re-normalizing inside the query:
    a norm is a float SUM, and float-sum order is engine-defined
    (DuckDB's list_sum is neither left-to-right nor reproducible by
    numpy — measured: low-bit norm differences flipped 3 of 32k
    roundings), so a normalized variant cannot be made value-hash
    exact."""
    from ray.data.aggregate import Sum

    from nipper_ray.ops.similarity import embedding_matrix

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column("embedding"))
        labels = (t.column("label").to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        u = m * 1e6
        micro = np.copysign(np.floor(np.abs(u) + 0.5), u).astype(np.int64)
        dims = m.shape[1] if len(m) else 0
        uniq = np.unique(labels)
        rows = {"label": [], "i": [], "centroid_micro": [],
                "n_vectors": []}
        for lbl in uniq:
            sel = micro[labels == lbl]
            sums = sel.sum(axis=0)      # exact int64
            rows["label"].extend([int(lbl)] * dims)
            rows["i"].extend(range(1, dims + 1))
            rows["centroid_micro"].extend(int(x) for x in sums)
            rows["n_vectors"].extend([len(sel)] * dims)
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "i": pa.array(rows["i"], pa.int64()),
            "centroid_micro": pa.array(rows["centroid_micro"],
                                       pa.int64()),
            "n_vectors": pa.array(rows["n_vectors"], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["label", "i"])
            .aggregate(Sum("centroid_micro",
                           alias_name="centroid_micro"),
                       Sum("n_vectors", alias_name="n_vectors")))


def q_stratified_sample(sf_dir: str, k: int = 20):
    """Stratified (per-source) deterministic sampling: keep the k docs
    per ``source`` with the smallest (md5(text), doc_id) — the
    reproducible way to rebalance a corpus across sources.  Classic
    combiner shape: per-batch per-source top-k first, so the single
    groupby shuffles at most k rows per (source, batch)."""
    import hashlib

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "source": t.column("source").to_pylist(),
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
            "md5": [hashlib.md5((s or "").encode("utf-8")).hexdigest()
                    for s in t.column("text").to_pylist()],
        })
        out = (df.sort_values(["source", "md5", "doc_id"])
               .groupby("source", sort=False).head(k))
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(g):
        return (g.sort_values(["md5", "doc_id"]).head(k)
                [["source", "doc_id"]])

    cand = ds.map_batches(partial, batch_format="pyarrow")
    return cand.groupby("source").map_groups(final,
                                             batch_format="pandas")


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (ops/decontam.py): docs whose distinct
    word-3-gram overlap with the benchmark subset (doc_id % 20 == 0,
    standing in for an eval suite) reaches 10% are flagged.  Benchmark
    shingle union is driver-held + broadcast (benchmarks are small by
    nature); the corpus pass is one shuffle-free map_batches."""
    from nipper_ray.ops.decontam import decontaminate

    rd = _rd()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def _is_bench(t: pa.Table, want: bool) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = (ids % 20 == 0)
        return t.filter(pa.array(m if want else ~m))

    bench = docs.map_batches(lambda t: _is_bench(t, True),
                             batch_format="pyarrow")
    corpus = docs.map_batches(lambda t: _is_bench(t, False),
                              batch_format="pyarrow")
    return decontaminate(corpus, bench, n=3, threshold_ppm=100_000)


def q_fingerprint(sf_dir: str):
    from nipper_ray.ops.textstats import fingerprint

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fp_md5"])


def q_langid(sf_dir: str):
    from nipper_ray.ops.textstats import LangIdStage

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(LangIdStage, batch_format="pyarrow",
                         concurrency=2)
    return out.select_columns(["doc_id", "lang_pred"])


# ---------------------------------------------------------------------------
# deduplication (documents)
# ---------------------------------------------------------------------------
def q_exact_dedup(sf_dir: str):
    """hash-partition + per-group first: md5 content key, one groupby."""
    from ray.data.aggregate import Count, Min

    from nipper_ray.ops.textstats import fingerprint

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    keyed = ds.map_batches(fingerprint, batch_format="pyarrow")
    agg = keyed.groupby("fp_md5").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    return agg.select_columns(["doc_id", "n_copies"])


def q_minhash_neardup(sf_dir: str):
    """MinHash -> LSH banding -> bucket groupby -> candidate pairs ->
    shingle-blob hash join -> true word-3-gram Jaccard verification
    (threshold 0.6).  Fully distributed: no driver-side corpus
    materialization (ops/dedup.py minhash_neardup).

    The driver's synthetic documents table contains genuine near-dup
    pairs (all with true Jaccard >= 0.88, nothing between 0.3 and 0.85),
    so with 16 bands x 4 rows the LSH recall at the threshold is ~1-1e-7
    and the result equals the exact SQL jaccard join in the oracle."""
    from nipper_ray.ops.dedup import minhash_neardup

    rd = _rd()
    corpus = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
    # NIPPER_RAY_MINHASH_CKPT forces the Parquet-checkpoint branch
    # point (the 100 TB shape) through the driver's correctness gate
    return minhash_neardup(
        corpus, threshold=0.6, n=3, n_bands=16, num_partitions=4,
        checkpoint_dir=os.environ.get("NIPPER_RAY_MINHASH_CKPT") or None)


def q_ngram_jaccard(sf_dir: str):
    """EXACT n-gram Jaccard near-dup via the AllPairs/ppjoin prefix
    filter (ops/dedup.py ngram_jaccard_neardup): shingle sets -> prefix
    tokens under the ascending-hash global order -> token-bucket
    candidates (recall exactly 1 by the prefix-filter theorem whenever
    no prefix-token bucket exceeds the star cap — true of the shipped
    corpora, pinned) -> shingle-blob hash join -> true Jaccard >= 0.5.

    Complements minhash_neardup: same verification tail, but the
    candidate step is deterministic-exact instead of LSH-probabilistic,
    and the threshold (0.5) exercises different prefix lengths than the
    minhash query's 0.6."""
    from nipper_ray.ops.dedup import ngram_jaccard_neardup

    rd = _rd()
    corpus = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
    return ngram_jaccard_neardup(corpus, threshold=0.5, n=3,
                                 num_partitions=4)


def q_dedup_clusters(sf_dir: str):
    """Near-dup clustering at scale: verified minhash pairs ->
    distributed connected components (ops/cc.py min-label propagation —
    one hash join + one groupby per iteration over narrow (node, label)
    rows), cluster_id = min doc id of the component.  Exact SQL oracle
    via a recursive-CTE transitive closure over the same pair set."""
    from nipper_ray.ops.cc import connected_components
    from nipper_ray.ops.dedup import minhash_neardup

    rd = _rd()
    corpus = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
    pairs = minhash_neardup(corpus, threshold=0.6, n=3, n_bands=16,
                            num_partitions=4)
    return connected_components(pairs, num_partitions=4)


def q_simhash(sf_dir: str):
    """Per-doc 64-bit simhash (xxh64 word votes).  Exact SQL oracle via
    the embedded closed-vocabulary hash table (_simhash_oracle_sql)."""
    from nipper_ray.ops.dedup import simhash_stage

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(simhash_stage, batch_format="pyarrow")
    return out.select_columns(["doc_id", "simhash"])


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup pairs (hamming <= 3 via 16-bit banding +
    per-bucket verification).  Banding recall is 1 for hamming < 4
    (pigeonhole) and verification is exact, so the all-pairs SQL join
    over the SQL-derived simhashes is an exact oracle."""
    from nipper_ray.ops.dedup import simhash_neardup

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return simhash_neardup(ds, max_hamming=3)


def q_embedding_neardup(sf_dir: str):
    """embedding-cosine near-dup pairs (threshold 0.3, rounded sims),
    exact and fully distributed via the block grid
    (ops/dedup.py embedding_neardup_blocked) — no driver concat."""
    from nipper_ray.ops.dedup import embedding_neardup_blocked

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = embedding_neardup_blocked(ds, threshold=0.3, n_blocks=4)
    return out.select_columns(["a", "b"])


def q_embedding_neardup_approx(sf_dir: str):
    """High-threshold approximate regime (ops/dedup.py
    embedding_neardup_approx): banded-LSH candidates + exact in-bucket
    cosine.  Every emitted pair is exact-verified, so approx ⊆ exact —
    the oracle (exact SQL join at the same threshold) compares the
    PAIR SET only — the engine's float64-dot cosine and DuckDB's
    list_cosine_similarity sum floats in different orders, so a rounded
    cosine column would be fragile at the 6-dp boundary (the round-3
    float-sum lesson); recall is pinned by the pytest recall test on
    planted high-cosine pairs (the shipped corpus has none >= 0.8, so
    this row is empty-vs-empty by construction)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from nipper_ray.ops.dedup import embedding_neardup_approx

    rd = _rd()
    path = os.path.join(sf_dir, "embeddings.parquet")
    first = next(pq.ParquetFile(path).iter_batches(
        batch_size=1, columns=["embedding"]))
    dim = len(first.column("embedding")[0])
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    out = embedding_neardup_approx(ds, threshold=0.8, dim=dim)
    # pair lists are tiny; an all-empty groupby loses its schema, so
    # finalize as a typed frame
    df = out.to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                           "b": pd.Series([], dtype="int64")})
    return df[["a", "b"]]


# ---------------------------------------------------------------------------
# similarity search (embeddings)
# ---------------------------------------------------------------------------
def _query_vectors(sf_dir: str, n: int = 5):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t.column("vec_id"), pa.scalar(n)))
    return {"ids": t.column("vec_id").to_pylist(),
            "vectors": t.column("embedding").to_pylist()}


def q_ann_topk(sf_dir: str):
    """Exact brute-force cosine top-10 (numpy matmul per batch against a
    broadcast query matrix; per-block top-k then a tiny driver reduce)."""
    import ray

    from nipper_ray.ops.similarity import brute_force_topk

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    qref = ray.put(_query_vectors(sf_dir))
    return brute_force_topk(ds, qref, k=10, concurrency=2)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed approximate ANN (coarse k-means quantizer +
    nprobe cell filter; deterministic, rows-only)."""
    import ray

    from nipper_ray.ops.similarity import ivf_topk

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    qref = ray.put(_query_vectors(sf_dir))
    return ivf_topk(ds, qref, k=10, n_cells=16, nprobe=4,
                    concurrency=2)


def q_ann_lsh(sf_dir: str):
    """Approximate LSH-bucketed variant (the scale path; rows-only)."""
    import ray

    from nipper_ray.ops.similarity import lsh_topk

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    qref = ray.put(_query_vectors(sf_dir))
    return lsh_topk(ds, qref, k=10, probes=4, dim=64, concurrency=2)


# ---------------------------------------------------------------------------
# extraction + multimodal (rows-only; pinned by pytest byte-equality)
# ---------------------------------------------------------------------------
def q_extract(sf_dir: str):
    from nipper_ray.sources import read_pages
    from nipper_ray.stages import extract_pages

    ds = read_pages(sf_dir, columns=["url", "html"])
    out = extract_pages(ds, batch_size=32, concurrency=2)
    return out.select_columns(["url", "title", "n_links"])


def q_readability(sf_dir: str):
    """Readability-style main-content extraction (reference example
    examples/readability.rs re-expressed).  Emits a digest row per
    page (title, md5(article_text), n chars) so the oracle — which
    re-derives the synthetic articles in SQL from the corpus
    generation rule — stays compact; the driver hashes values either
    way, so digest rows check exactly as hard as full text."""
    from nipper_ray.sources import read_pages
    from nipper_ray.stages import ReadabilityStage

    ds = read_pages(sf_dir, columns=["url", "html"])
    out = ds.map_batches(ReadabilityStage, batch_format="pyarrow",
                         batch_size=32, concurrency=2)

    def digest(t: pa.Table) -> pa.Table:
        import hashlib

        arts = t.column("article_text").to_pylist()
        return pa.table({
            "url": t.column("url"),
            "title": t.column("title"),
            "fp_article": pa.array(
                [hashlib.md5((a or "").encode("utf-8")).hexdigest()
                 for a in arts], pa.string()),
            "n_article_chars": pa.array([len(a or "") for a in arts],
                                        pa.int64()),
        })

    return out.map_batches(digest, batch_format="pyarrow")


def q_crawl_wave(sf_dir: str):
    """THREE full frontier waves end-to-end (robots + cuckoo dedup +
    politeness + fetch + link extraction + checkpoint).  The fetch set
    of ALL waves is re-derived independently in SQL over the
    deterministic link graph (see _crawl_wave_oracle_sql), putting
    seed selection, robots, outlink extraction, cross-wave dedup
    (including the subtle rule that probe-inserted-but-politeness-cut
    candidates are never re-fetched) and per-wave politeness under the
    driver's hash gate.  Failed fetches (the /-path home links pages
    link to) stay as rows with empty titles — part of the contract."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from nipper_ray.frontier.scheduler import run_crawl
    from nipper_ray.sources.synth import page_url

    out = os.path.join(tempfile.gettempdir(), "nipper_q_crawl")
    shutil.rmtree(out, ignore_errors=True)
    run_crawl(sf_dir, out, [page_url(i) for i in range(0, 120, 3)],
              waves=3, wave_budget=100, per_host_budget=30, num_shards=4)
    parts = []
    for k in (0, 1, 2):
        d = os.path.join(out, "pages", "wave=%d" % k)
        parts += [
            pq.read_table(os.path.join(d, f),
                          columns=["url", "host", "depth", "title"])
            for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    return pa.concat_tables(parts).sort_by("url")


def q_media_features(sf_dir: str):
    """REAL media decode path: documents -> genuine BMP/WAV/Y4M payloads
    (from-scratch public-format codecs, ops/codecs.py) -> actor-pool
    decode + integer-space features.  The payload content is a pure
    function of `documents`, so the decoded features are exactly
    SQL-derivable (byte values of the text, cycled)."""
    from nipper_ray.ops.multimodal import (MediaFeatureStage,
                                           media_table_from_documents)

    rd = _rd()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    media = ds.map_batches(media_table_from_documents,
                           batch_format="pyarrow")
    out = media.map_batches(MediaFeatureStage, batch_format="pyarrow",
                            batch_size=64, concurrency=2)
    return out.select_columns(["media_id", "kind", "n_bytes",
                               "feat_mean_ppm", "feat_std_ppm"])


# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pricing_summary": q_pricing_summary,
        "segment_revenue": q_segment_revenue,
        "region_revenue": q_region_revenue,
        "promo_revenue": q_promo_revenue,
        "part_profit": q_part_profit,
        "pagerank": q_pagerank,
        "unshipped_parts": q_unshipped_parts,
        "price_quantiles": q_price_quantiles,
        "top_users": q_top_users,
        "hourly_windows": q_hourly_windows,
        "session_windows": q_session_windows,
        "sliding_windows": q_sliding_windows,
        "top_events_per_user": q_top_events_per_user,
        "click_attribution": q_click_attribution,
        "value_bands": q_value_bands,
        "props_stats": q_props_stats,
        "distinct_types": q_distinct_types,
        "token_stats": q_token_stats,
        "quality": q_quality,
        "normalize": q_normalize,
        "curate": q_curate,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "label_centroids": q_label_centroids,
        "decontaminate": q_decontaminate,
        "fingerprint": q_fingerprint,
        "langid": q_langid,
        "exact_dedup": q_exact_dedup,
        "minhash_neardup": q_minhash_neardup,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "simhash_neardup": q_simhash_neardup,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_approx": q_embedding_neardup_approx,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "extract": q_extract,
        "readability": q_readability,
        "crawl_wave": q_crawl_wave,
        "media_features": q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(CAST(sum(CAST(round(l_extendedprice * 100)
                                       AS BIGINT)) AS DOUBLE)
                         / 100.0, 2) AS sum_base_price,
                   round(CAST(sum(CAST(round(l_extendedprice
                                             * (1 - l_discount) * 100)
                                       AS BIGINT)) AS DOUBLE)
                         / 100.0, 2) AS sum_disc_price,
                   count(*) AS count_order,
                   round(sum(l_quantity) / count(*), 6) AS avg_qty
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "segment_revenue": """
            SELECT c_mktsegment,
                   round(CAST(sum(CAST(round(o_totalprice * 100)
                                       AS BIGINT)) AS DOUBLE)
                         / 100.0, 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "region_revenue": """
            SELECT n_name,
                   round(CAST(sum(CAST(round(l_extendedprice
                                             * (1 - l_discount) * 100)
                                       AS BIGINT)) AS DOUBLE)
                         / 100.0, 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "promo_revenue": """
            SELECT p_brand,
                   count(*) AS n_items,
                   CAST(sum(rev_cents) AS DOUBLE) / 100.0 AS revenue,
                   CAST(sum(CASE WHEN p_type = 'PROMO'
                                 THEN rev_cents ELSE 0 END)
                        * 1000000 // sum(rev_cents) AS BIGINT)
                       AS promo_ppm
            FROM (SELECT l_partkey,
                         CAST(round(l_extendedprice * (1 - l_discount)
                                    * 100) AS BIGINT) AS rev_cents
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l_shipdate < TIMESTAMP '1996-07-01') l
            JOIN part ON l.l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "part_profit": """
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice
                                       * (1 - l_discount) * 100)
                                 AS BIGINT)) AS DOUBLE) / 100.0
                       AS revenue
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY n_name, o_year
        """,
        "pagerank": _pagerank_sql(5),
        "unshipped_parts": """
            SELECT p_partkey, p_brand FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_partkey = p.p_partkey
                  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate < TIMESTAMP '1996-03-01')
        """,
        "price_quantiles": """
            SELECT l_returnflag, count(*) AS n_items,
                   CAST(quantile_disc(cents, 0.25) AS DOUBLE) / 100.0
                       AS p25,
                   CAST(quantile_disc(cents, 0.50) AS DOUBLE) / 100.0
                       AS p50,
                   CAST(quantile_disc(cents, 0.90) AS DOUBLE) / 100.0
                       AS p90,
                   CAST(quantile_disc(cents, 0.99) AS DOUBLE) / 100.0
                       AS p99
            FROM (SELECT l_returnflag,
                         CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS cents
                  FROM lineitem)
            GROUP BY l_returnflag
        """,
        "top_users": """
            SELECT user_id, count(*) AS n_clicks,
                   round(CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                         AS DOUBLE) / 1000000.0, 6) AS sum_value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id
            ORDER BY n_clicks DESC, user_id LIMIT 10
        """,
        "hourly_windows": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n, round(CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                         AS DOUBLE) / 1000000.0, 6) AS sum_value
            FROM events GROUP BY event_type, hour
        """,
        "session_windows": """
            WITH o AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT user_id, event_id, ts,
                       CAST(sum(new_s) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                            AS BIGINT) AS session_id
                FROM o)
            SELECT user_id, session_id,
                   count(*) AS n_events, min(ts) AS session_start
            FROM s GROUP BY user_id, session_id
        """,
        "sliding_windows": """
            WITH e2 AS (
                SELECT event_type, value,
                       time_bucket(INTERVAL 30 MINUTE, ts) AS w_start
                FROM events
                UNION ALL
                SELECT event_type, value,
                       time_bucket(INTERVAL 30 MINUTE, ts)
                           - INTERVAL 30 MINUTE
                FROM events)
            SELECT event_type, w_start, count(*) AS n,
                   round(CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                         AS DOUBLE) / 1000000.0, 6) AS sum_value
            FROM e2 GROUP BY event_type, w_start
        """,
        "top_events_per_user": """
            SELECT user_id, event_id, round(value, 6) AS value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY round(value, 6) DESC,
                                               event_id) AS rank
            FROM events QUALIFY rank <= 3
        """,
        "distinct_types": """
            SELECT DISTINCT event_type FROM events WHERE value > 10.0
        """,
        "props_stats": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   min(CAST(json_extract(props, '$.k') AS BIGINT))
                       AS min_k,
                   max(CAST(json_extract(props, '$.k') AS BIGINT))
                       AS max_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "value_bands": """
            SELECT event_type, band, count(*) AS n,
                   round(CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                         AS DOUBLE) / 1000000.0, 6) AS sum_value
            FROM events
            JOIN (VALUES (0.0, 20.0, 'low'), (10.0, 50.0, 'mid'),
                         (40.0, 100.0, 'high'), (0.0, 100.0, 'all'))
                 b(lo, hi, band)
              ON value >= lo AND value < hi
            GROUP BY event_type, band
        """,
        "click_attribution": """
            WITH clicks AS (
                SELECT user_id, event_id AS click_id, ts
                FROM events WHERE event_type = 'click'),
            views AS (
                SELECT user_id, max(event_id) AS view_id,
                       ts AS view_ts
                FROM events WHERE event_type = 'view'
                GROUP BY user_id, ts)
            SELECT c.user_id, c.click_id, v.view_id,
                   date_diff('microsecond', v.view_ts, c.ts) AS gap_us
            FROM clicks c ASOF JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.view_ts
        """,
        "token_stats": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                       AS n_tokens,
                   length(text) AS n_chars_computed
            FROM documents
        """,
        "quality": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(text, '[A-Za-z0-9_]+') AS t,
                       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
                FROM documents)
            SELECT doc_id, n_punct,
                   CASE WHEN len(t) = 0 THEN 0 ELSE
                     len(list_filter(t, x -> lower(x) IN %s))
                       * 1000000 // len(t) END AS stop_ppm,
                   CASE WHEN len(t) = 0 THEN 0 ELSE
                     CAST(list_sum(list_transform(t, x -> length(x)))
                          AS BIGINT) * 1000000 // len(t) END AS word_len_ppm
            FROM toks
        """ % STOPWORDS_SQL,
        "fingerprint": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents
        """,
        "hash_sample": """
            SELECT doc_id FROM documents
            WHERE md5(text) < '40000000'
        """,
        "normalize": r"""
            SELECT doc_id,
                   trim(regexp_replace(nfc_normalize(text),
                                       '[\t\n\f\r ]+', ' ', 'g'),
                        ' ') AS norm_text
            FROM documents
        """,
        "curate": """
            WITH stats AS (
                SELECT doc_id, md5(text) AS fp_md5,
                       len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                           AS n_tokens,
                       CASE WHEN len(regexp_extract_all(
                                text, '[A-Za-z0-9_]+')) = 0 THEN 0
                            ELSE len(list_filter(
                                regexp_extract_all(text,
                                                   '[A-Za-z0-9_]+'),
                                x -> lower(x) IN %s)) * 1000000
                              // len(regexp_extract_all(
                                     text, '[A-Za-z0-9_]+')) END
                           AS stop_ppm
                FROM documents WHERE lang = 'en'),
            kept AS (
                SELECT * FROM stats
                WHERE n_tokens BETWEEN 30 AND 120
                  AND stop_ppm >= 50000)
            SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
            FROM kept GROUP BY fp_md5
        """ % STOPWORDS_SQL,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "stratified_sample": """
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(text), doc_id) AS rn
                FROM documents)
            WHERE rn <= 20
        """,
        "label_centroids": """
            WITH u AS (SELECT CAST(label AS BIGINT) AS lbl,
                              unnest(range(1, len(embedding) + 1)) AS i,
                              unnest(embedding) AS val
                       FROM embeddings)
            SELECT lbl AS label, CAST(i AS BIGINT) AS i,
                   -- embedding elements are FLOAT32 in parquet:
                   -- widen BEFORE multiplying or the product is
                   -- computed in float32 and rounds differently
                   CAST(sum(CAST(round(CAST(val AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS BIGINT)
                       AS centroid_micro,
                   count(*) AS n_vectors
            FROM u GROUP BY lbl, i
        """,
        "decontaminate": """
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(
                                  translate(text,
                                      'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                      'abcdefghijklmnopqrstuvwxyz'),
                                  '[a-z0-9_]+') AS w
                       FROM documents),
                 sh AS (SELECT doc_id, list_distinct(list_transform(
                            generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                            AS s
                        FROM w WHERE len(w) >= 3),
                 bench AS (SELECT DISTINCT unnest(s) AS g FROM sh
                           WHERE doc_id % 20 = 0),
                 corpus AS (SELECT doc_id, s FROM sh
                            WHERE doc_id % 20 != 0),
                 e AS (SELECT doc_id, unnest(s) AS g FROM corpus),
                 ov AS (SELECT e.doc_id, count(*) AS n_overlap
                        FROM e JOIN bench ON e.g = bench.g
                        GROUP BY 1)
            SELECT c.doc_id,
                   CAST(len(c.s) AS BIGINT) AS n_shingles,
                   CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
                   CAST(COALESCE(o.n_overlap, 0) * 1000000 // len(c.s)
                        AS BIGINT) AS overlap_ppm,
                   COALESCE(o.n_overlap, 0) * 1000000 // len(c.s)
                       >= 100000 AS contaminated
            FROM corpus c LEFT JOIN ov o ON c.doc_id = o.doc_id
        """,
        "minhash_neardup": _MINHASH_PAIRS_SQL,
        "ngram_jaccard": _JACCARD_PAIRS_SQL_TMPL.format(threshold="0.5"),
        "dedup_clusters": """
            WITH RECURSIVE pr AS (SELECT * FROM (%s) q),
            edges AS (
                SELECT a AS u, b AS v FROM pr
                UNION SELECT b, a FROM pr
                UNION SELECT a, a FROM pr
                UNION SELECT b, b FROM pr),
            reach(u, r) AS (
                SELECT u, v FROM edges
                UNION
                SELECT e.u, reach.r
                FROM edges e JOIN reach ON e.v = reach.u)
            SELECT u AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY u
        """ % _MINHASH_PAIRS_SQL,
        # DOUBLE-widened cosine (same rationale as the ann_* oracles:
        # float32-list cosine sits ~8e-9 off the engine's float64
        # value, a latent 6-dp threshold-flip hazard)
        "embedding_neardup": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS emb
                       FROM embeddings)
            SELECT e1.vec_id AS a, e2.vec_id AS b
            FROM e e1 JOIN e e2 ON e1.vec_id < e2.vec_id
            WHERE round(list_cosine_similarity(e1.emb, e2.emb), 6)
                  >= 0.3
            ORDER BY a, b
        """,
        "embedding_neardup_approx": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS emb
                       FROM embeddings)
            SELECT e1.vec_id AS a, e2.vec_id AS b
            FROM e e1 JOIN e e2 ON e1.vec_id < e2.vec_id
            WHERE round(list_cosine_similarity(e1.emb, e2.emb), 6)
                  >= 0.8
            ORDER BY a, b
        """,
        # cosine computed over DOUBLE-widened lists: float32-list
        # cosine differs from the engine's float64 path by ~8e-9 —
        # five orders above summation noise — so ranking on it risks
        # 6-dp rank flips at a new corpus (CLAUDE.md round-3: widen
        # before ANY arithmetic over float32 columns)
        "ann_topk": """
            WITH q AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS emb
                       FROM embeddings WHERE vec_id < 5),
                 e AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS emb
                       FROM embeddings),
                 s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                              round(list_cosine_similarity(
                                  q.emb, e.emb), 6) AS sim
                       FROM q CROSS JOIN e)
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id)
                       AS rank
            FROM s QUALIFY rank <= 10
            ORDER BY query_id, rank
        """,
        # extract / crawl_wave: the synthetic corpus is a deterministic
        # function of `documents` (sources/synth.py), so the flagship
        # nipper-semantics extraction and the wave-0 crawl selection are
        # independently re-derivable in SQL.
        "extract": _extract_oracle_sql(),
        "crawl_wave": _crawl_wave_oracle_sql(),
        "readability": _readability_oracle_sql(),
        # simhash family: exact oracles via the embedded closed-vocab
        # xxh64 lookup table (see _DOC_VOCAB)
        "simhash": _simhash_oracle_sql(),
        "simhash_neardup": _simhash_neardup_oracle_sql(),
        # media_features: the synthesized BMP/WAV/Y4M payloads encode
        # the document's UTF-8 bytes cycled (ops/multimodal.py), so the
        # real-decode features re-derive from text in SQL: per-kind
        # value lists (image: 8x8 pixels; audio: (b-128)*256 PCM;
        # video: 4 shifted 8x8 luma frames), integer-ppm mean (floor
        # division, exact) and ppm std (floor of the identical IEEE
        # double both engines compute from exact integer sums).  The
        # engine's image stats run over the 3x-replicated RGB multiset,
        # equal to the 64-value stats (same mean; var numerators/
        # denominators scale by 9, and A/4096 is exactly representable
        # so both divisions return the identical double).  n_bytes are
        # the fixed container sizes (54+192 BMP, 44+128 WAV, 39-byte
        # Y4M header + 4x(6+64+32)).
        "media_features": """
            WITH v AS (
              SELECT doc_id,
                CASE doc_id % 3 WHEN 0 THEN 'image'
                                WHEN 1 THEN 'audio'
                                ELSE 'video' END AS kind,
                CASE doc_id % 3
                  WHEN 0 THEN list_transform(range(0, 64), i ->
                      ascii(substr(text, CAST(i % length(text) AS INT)
                                         + 1, 1)))
                  WHEN 1 THEN list_transform(range(0, 64), i ->
                      (ascii(substr(text, CAST(i % length(text) AS INT)
                                          + 1, 1)) - 128) * 256)
                  ELSE list_transform(range(0, 256), i ->
                      ascii(substr(text,
                          CAST(((i % 64) + 7 * (i // 64))
                               % length(text) AS INT) + 1, 1)))
                END AS vals
              FROM documents),
            s AS (SELECT doc_id, kind, len(vals) AS n,
                         list_sum(vals) AS s1,
                         list_sum(list_transform(vals, x -> x * x)) AS s2
                  FROM v)
            SELECT doc_id AS media_id, kind,
                   CASE kind WHEN 'image' THEN 246
                             WHEN 'audio' THEN 172
                             ELSE 447 END AS n_bytes,
                   CAST((s1 * 1000000) // n AS BIGINT) AS feat_mean_ppm,
                   CAST(floor(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                                   / (n * n)) * 1000000) AS BIGINT)
                       AS feat_std_ppm
            FROM s ORDER BY media_id
        """,
        "langid": _langid_oracle_sql(),
        # ann_lsh / ann_ivf: approximate-by-construction but fully
        # deterministic, so exactly SQL-derivable — fixed hyperplanes /
        # the corpus-determined codebook ship as VALUES tables and the
        # bucketing / probe / filter / top-k logic runs in SQL.
        "ann_lsh": _ann_lsh_oracle_sql(),
    }
    # the ivf oracle is the one entry that must READ the gate corpus
    # (its codebook is a function of the embeddings table); a missing/
    # unreadable /root/testdata degrades that single row to no_oracle
    # instead of breaking oracle retrieval for all 42 queries.  Only
    # I/O errors are swallowed — a genuine defect in the Ray-free
    # recompute must still fail loudly.
    try:
        out["ann_ivf"] = _ann_ivf_oracle_sql()
    except OSError:
        pass
    return out
