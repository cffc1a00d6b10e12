"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the 100 TB shapes):

- exact dedup = one content-hash ``map_batches`` (cheap, vectorized)
  followed by ONE ``groupby(hash)`` shuffle keeping the min doc_id per
  group — the only all-to-all exchange;
- MinHash (``minhash_neardup``): shingle hashing is one lane-batched
  xxh64 call per batch (frontier/hashing.py), signatures one
  ``np.minimum.reduceat`` — no per-shingle Python; LSH banding explodes
  each doc into ``n_bands`` narrow (band_id, band_key, doc_id) rows and
  the candidate groupby shuffles only those, never the documents;
  candidate pairs are deduped with a narrow groupby, then the per-doc
  *distinct shingle-hash sets* (a binary blob ~8 bytes/word, carried on
  the signature table — not the texts) are hash-joined back to the pair
  rows (``Dataset.join``) and true Jaccard is verified inside the map
  task.  Nothing is ever materialized on the driver.
- SimHash gives a 64-bit near-dup key; bucketing by 16-bit bands of the
  simhash finds hamming-close candidates the same way.
- embedding near-dup (``embedding_neardup_blocked``): exact all-pairs
  cosine at threshold t via a block grid — row i goes to the
  ``n_blocks`` unordered block-pair groups containing block(i), each
  group computes its cross/upper-triangle pairs with one matmul.  Every
  unordered row pair co-locates in exactly one group; shuffle volume is
  ``n_blocks`` × input.  (An LSH pre-filter is NOT correct here: at
  t=0.3 the surviving pairs disagree on ~40 % of hyperplane bits, so
  bucket-equality recall is ≈0.6^16 — measured on the test corpus the
  pairs sit at cosine 0.30–0.51.  Exact grids are the only way to match
  an exact-threshold oracle.)

All RNG-free: hash seeds are fixed constants.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..frontier.hashing import xxh64_batch, xxh64_fixed_rows

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")

# ASCII-only case folding for shingle/simhash tokenization: full
# str.lower() is locale-sensitive ('İ' -> 'i'+combining dot in Python
# vs ICU's choice in DuckDB — found by the hypothesis SQL
# differential), so word extraction would diverge from the oracle's
# translate()-based fold on such text.  ASCII fold is identical on
# both sides for every input.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")


def _fold_words(text: str):
    return _WORD_RE.findall((text or "").translate(_ASCII_LOWER))

# fixed odd multipliers for the k minhash "permutations": multiply-shift
# hashing h_j(x) = (a_j * (x XOR b_j)) mod 2^64 — numpy uint64 arithmetic
# wraps mod 2^64 natively, and odd multipliers make each map a bijection
# of the 64-bit space (well-mixed, unlike a near-monotonic a*x+b mod p)
_N_PERM = 64
_AS = np.array([((2 * i + 1) * 0x9E3779B97F4A7C15 | 1) & 0xFFFFFFFFFFFFFFFF
                for i in range(1, _N_PERM + 1)], dtype=np.uint64)
_BS = np.array([((i * i + 7) * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
                for i in range(1, _N_PERM + 1)], dtype=np.uint64)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

# cap on shingles expanded per reduceat chunk: bounds the temporary
# (chunk, 64) uint64 permutation matrix to ~64 MB
_SIG_CHUNK = 1 << 17


def shingle_hashes_batch(texts, n: int = 3, short_doc_fallback=False):
    """Word n-gram shingles for a whole batch, hashed in ONE lane-batched
    xxh64 pass.  Returns ``(all_hashes, offsets)`` with doc i's shingles
    at ``all_hashes[offsets[i]:offsets[i+1]]`` (not distinct).

    Docs with fewer than n words contribute ZERO shingles (mirroring the
    SQL oracle's ``len(w) >= n`` filter) unless ``short_doc_fallback``
    asks for the legacy single whole-text shingle."""
    shingles: list = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        words = _fold_words(t)
        if len(words) >= n:
            shingles.extend(" ".join(words[j:j + n])
                            for j in range(len(words) - n + 1))
        elif short_doc_fallback:
            shingles.append(" ".join(words))
        offsets[i + 1] = len(shingles)
    all_h = (xxh64_batch(shingles) if shingles
             else np.empty(0, dtype=np.uint64))
    return all_h, offsets


def _shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Single-doc shingle hashes (legacy kernel; short docs fall back to
    one whole-text shingle so ngram_jaccard stays total)."""
    all_h, _ = shingle_hashes_batch([text], n, short_doc_fallback=True)
    return all_h


def _sigs_from_hashes(all_h: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Minhash signatures from batched shingle hashes: one
    ``np.minimum.reduceat`` over the (chunk, N_PERM) permutation matrix
    per bounded chunk.  Docs with no shingles get the all-ones
    signature (deterministic, never collides with a real min)."""
    n_docs = len(offsets) - 1
    sigs = np.full((n_docs, _N_PERM), _U64_MAX, dtype=np.uint64)
    if len(all_h) == 0:
        return sigs
    doc = 0
    with np.errstate(over="ignore"):
        while doc < n_docs:
            end = doc + 1
            while (end < n_docs
                   and offsets[end + 1] - offsets[doc] <= _SIG_CHUNK):
                end += 1
            lo, hi = offsets[doc], offsets[end]
            seg = all_h[lo:hi]
            if len(seg):
                m = (seg[:, None] ^ _BS[None, :]) * _AS[None, :]
                counts = offsets[doc + 1:end + 1] - offsets[doc:end]
                nonempty = counts > 0
                starts = (offsets[doc:end] - lo)[nonempty]
                if len(starts):
                    red = np.minimum.reduceat(m, starts, axis=0)
                    sigs[np.nonzero(nonempty)[0] + doc] = red
            doc = end
    return sigs


def minhash_signature(text: str, n: int = 5) -> np.ndarray:
    return minhash_signatures_batch([text], n)[0]


def minhash_signatures_batch(texts, n: int = 5) -> np.ndarray:
    """Vectorized minhash for a batch: one (n_docs, N_PERM) matrix.
    Short docs use the legacy whole-text-shingle fallback."""
    all_h, offsets = shingle_hashes_batch(texts, n,
                                          short_doc_fallback=True)
    return _sigs_from_hashes(all_h, offsets)


def minhash_stage(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    sigs = minhash_signatures_batch(texts, n)
    return pa.table({
        id_col: batch.column(id_col),
        "minhash": pa.array(list(sigs), pa.list_(pa.uint64(), _N_PERM)),
    })


def shingle_minhash_stage(batch: pa.Table, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 3) -> pa.Table:
    """Near-dup pipeline stage: doc_id, minhash signature, and the
    distinct shingle-hash set as a sorted little-endian uint64 blob
    (the verification payload — ~8 bytes per word, ~10× smaller than
    the text).  Docs with fewer than n words are DROPPED, mirroring the
    oracle's ``len(w) >= n`` filter."""
    texts = batch.column(text_col).to_pylist()
    all_h, offsets = shingle_hashes_batch(texts, n)
    sigs = _sigs_from_hashes(all_h, offsets)
    keep = np.nonzero(np.diff(offsets) > 0)[0]
    blobs = [np.unique(all_h[offsets[i]:offsets[i + 1]]).tobytes()
             for i in keep]
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(keep, pa.int64())),
        "minhash": pa.array(list(sigs[keep]),
                            pa.list_(pa.uint64(), _N_PERM)),
        "shingles": pa.array(blobs, pa.binary()),
    })


def lsh_bands_stage(batch: pa.Table, n_bands: int = 16,
                    id_col: str = "doc_id",
                    n_parts: int = 0) -> pa.Table:
    """Explode signatures into (band_id, band_key, doc_id) rows.
    Band keys are one vectorized xxh64 pass over the per-band signature
    byte rows (a key collision only adds a candidate pair, which the
    Jaccard verification then rejects — never a correctness issue).

    With ``n_parts`` > 0 a ``pkey`` hash-partition column is added so
    the candidate groupby dispatches O(n_parts) groups instead of one
    ``map_groups`` call per bucket (the ~2 ms/group executor dispatch
    dominates at corpus scale — same routing as
    ``embedding_neardup_approx``)."""
    n = len(batch)
    rows_per = _N_PERM // n_bands
    col = batch.column("minhash")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sigs = col.flatten().to_numpy(zero_copy_only=False).reshape(n, _N_PERM)
    band_bytes = (np.ascontiguousarray(sigs.astype(np.uint64, copy=False))
                  .view(np.uint8)
                  .reshape(n * n_bands, rows_per * 8))
    keys = xxh64_fixed_rows(band_bytes)
    band_id = np.tile(np.arange(n_bands, dtype=np.int32), n)
    cols = {
        "band_id": pa.array(band_id),
        "band_key": pa.array(keys, pa.uint64()),
        id_col: pa.array(
            np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False),
                      n_bands), pa.int64()),
    }
    if n_parts:
        pkey = (((keys ^ band_id.astype(np.uint64))
                 * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(40)) % np.uint64(n_parts)
        cols["pkey"] = pa.array(pkey.astype(np.int32))
    return pa.table(cols)


# Bucket-size guard for LSH band buckets.  A boilerplate mega-cluster
# (e.g. 100k identical pages, routine in web crawls) lands every member
# in ONE (band_id, band_key) group; all-pairs emission there is O(k^2)
# (5e9 pairs at k=100k).  Above the cap we emit the k-1 STAR pairs to
# the bucket's min-id representative instead: the transitive closure
# (what ``dedup_clusters`` / connected_components computes) is
# identical, and each star pair still goes through the exact Jaccard
# verification.  The cap only changes which spanning pairs represent a
# >cap-sized bucket — below it (all shipped corpora) output is the
# exact all-pairs set.
_BUCKET_CAP = 1024


def candidate_pairs_from_band(g: pd.DataFrame,
                              bucket_cap: int = _BUCKET_CAP
                              ) -> pd.DataFrame:
    """map_groups fn over (band_id, band_key): emit unique id pairs,
    vectorized (``np.triu_indices``), star-capped above ``bucket_cap``."""
    ids = np.unique(g["doc_id"].to_numpy(dtype=np.int64))
    k = len(ids)
    if k < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    if k > bucket_cap:
        return pd.DataFrame({"a": np.full(k - 1, ids[0], dtype=np.int64),
                             "b": ids[1:]})
    iu, ju = np.triu_indices(k, k=1)
    return pd.DataFrame({"a": ids[iu], "b": ids[ju]})


def candidate_pairs_from_partition(g: pd.DataFrame,
                                   bucket_cap: int = _BUCKET_CAP
                                   ) -> pd.DataFrame:
    """map_groups fn over a ``pkey`` partition: every (band_id,
    band_key) bucket routed here is segmented out with one lexsort and
    emitted via ``candidate_pairs_from_band``'s vectorized/star-capped
    kernel — O(n_parts) group dispatches total, not one per bucket."""
    bid = g["band_id"].to_numpy(dtype=np.int64)
    key = g["band_key"].to_numpy(dtype=np.uint64)
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    order = np.lexsort((ids, key, bid))
    bid, key, ids = bid[order], key[order], ids[order]
    new_seg = (bid[1:] != bid[:-1]) | (key[1:] != key[:-1])
    seg = np.concatenate(([0], np.nonzero(new_seg)[0] + 1, [len(ids)]))
    outs = []
    for s, e in zip(seg[:-1], seg[1:]):
        if e - s >= 2:
            outs.append(candidate_pairs_from_band(
                pd.DataFrame({"doc_id": ids[s:e]}), bucket_cap))
    if not outs:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.concat(outs, ignore_index=True)


def jaccard_verify_stage(batch: pa.Table,
                         threshold: float = 0.6) -> pa.Table:
    """Verify candidate pairs by exact Jaccard over the joined distinct
    shingle-hash blobs (columns sh_a / sh_b); keeps (a, b)."""
    keep = []
    for x, y in zip(batch.column("sh_a").to_pylist(),
                    batch.column("sh_b").to_pylist()):
        ha = np.frombuffer(x, dtype="<u8")
        hb = np.frombuffer(y, dtype="<u8")
        inter = len(np.intersect1d(ha, hb, assume_unique=True))
        keep.append(inter / (len(ha) + len(hb) - inter) >= threshold)
    return batch.select(["a", "b"]).filter(pa.array(keep, pa.bool_()))


def _signature_branch_point(sh, checkpoint_dir: str | None,
                            columns: list[str]):
    """The near-dup pipelines read their signature table twice (banding
    / prefix pass + the verify joins).  Default: ``materialize()`` —
    distributed and spillable, but pinned in the object store for the
    run.  With ``checkpoint_dir``: write the table to sharded Parquet
    ONCE and read both branches from disk — the 100 TB shape (the
    object store never holds the whole table, and a crashed attempt's
    partial output is purged before the rewrite, so reruns are
    idempotent).  Equality of the two modes is pinned by
    tests/test_ops.py."""
    if checkpoint_dir is None:
        return sh.materialize()
    import os
    import shutil

    import ray.data as rd

    # own a dedicated SUBDIRECTORY of the caller's path and purge only
    # that: write_parquet uses unique filenames and would APPEND beside
    # a previous attempt's output, duplicating every signature row —
    # but checkpoint_dir is operator-supplied (env-injectable), so an
    # rmtree of the path itself could eat an unrelated tree (/tmp!)
    sig_dir = os.path.join(checkpoint_dir, "signatures")
    if os.path.isdir(sig_dir):
        shutil.rmtree(sig_dir)
    os.makedirs(sig_dir, exist_ok=True)
    sh.write_parquet(sig_dir)
    # columns= always: a hive-partitioned path would otherwise grow a
    # partition column (CLAUDE.md gotcha)
    return rd.read_parquet(sig_dir, columns=columns)


def minhash_neardup(corpus_ds, threshold: float = 0.6, n: int = 3,
                    n_bands: int = 16, num_partitions: int = 8,
                    id_col: str = "doc_id", text_col: str = "text",
                    bucket_cap: int = _BUCKET_CAP,
                    checkpoint_dir: str | None = None):
    """Full distributed MinHash near-dup pipeline: Dataset[id, text] ->
    Dataset[a, b] of verified pairs (true n-gram Jaccard >= threshold).

    Everything streams: documents are read once into the signature
    table (id, minhash, shingle-blob), which is the branch point for
    (a) LSH banding -> narrow candidate shuffle and (b) the two hash
    joins that bring each pair's shingle blobs to the verify task.
    The branch point is ``materialize()`` by default and a Parquet
    checkpoint when ``checkpoint_dir`` is given — the 100 TB shape
    (see _signature_branch_point)."""
    sh = corpus_ds.map_batches(
        shingle_minhash_stage, batch_format="pyarrow", batch_size=256,
        fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n})
    sh = _signature_branch_point(sh, checkpoint_dir,
                                 [id_col, "minhash", "shingles"])
    bands = sh.select_columns([id_col, "minhash"]).map_batches(
        lsh_bands_stage, batch_format="pyarrow",
        fn_kwargs={"n_bands": n_bands, "id_col": id_col,
                   "n_parts": 64})
    cand = bands.groupby("pkey").map_groups(
        lambda g: candidate_pairs_from_partition(g, bucket_cap),
        batch_format="pandas")
    shing = sh.select_columns([id_col, "shingles"])
    return verify_candidate_pairs(cand, shing, threshold,
                                  num_partitions, id_col)


def shingle_set_stage(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3) -> pa.Table:
    """doc_id + sorted distinct shingle-hash blob (the minhash stage's
    verification payload without the signature — the input to exact
    set-similarity joins).  Docs with fewer than n words are dropped,
    mirroring the oracle's ``len(w) >= n`` filter."""
    texts = batch.column(text_col).to_pylist()
    all_h, offsets = shingle_hashes_batch(texts, n)
    keep = np.nonzero(np.diff(offsets) > 0)[0]
    blobs = [np.unique(all_h[offsets[i]:offsets[i + 1]]).tobytes()
             for i in keep]
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(keep, pa.int64())),
        "shingles": pa.array(blobs, pa.binary()),
    })


def _threshold_fraction(threshold: float) -> tuple[int, int]:
    """Exact (num, den) for the decimal threshold, with the denominator
    BOUNDED at 10**6 so the downstream int64 vector math cannot
    overflow (num * (sa + sb) needs sa + sb > 9e12 shingles to wrap —
    physically impossible — whereas Fraction(str(1/3)) yields
    num ~ 3.3e15, which wrapped past ~2.7k shingles).  When the exact
    fraction needs a bigger denominator, round DOWN to the nearest
    n/10**6: a slightly lower threshold only LOOSENS the prefix /
    positional filters (recall-safe; the exact Jaccard verification
    downstream restores precision)."""
    from fractions import Fraction

    fr = Fraction(str(threshold))
    if fr.denominator > 10**6:
        fr = Fraction(int(fr * 10**6), 10**6)  # floor for positives
    return fr.numerator, fr.denominator


def _prefix_len(sizes: np.ndarray, threshold: float) -> np.ndarray:
    """Prefix-filter length p = s - ceil(t*s) + 1 per set size, with the
    ceil computed in EXACT integer arithmetic (float ceil(0.6*5) = 4
    because 0.6*5 = 3.0000000000000004 — an over-ceil SHRINKS the prefix
    and silently loses recall, so the decimal threshold is taken as an
    exact denominator-bounded fraction)."""
    num, den = _threshold_fraction(threshold)
    s = sizes.astype(np.int64)
    return s - (num * s + den - 1) // den + 1


_SKETCH_BITS = 20
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _sketch_bucket(tokens: np.ndarray, bits: int) -> np.ndarray:
    """Fixed-size hash bucket per uint64 shingle token (top ``bits``
    of a Fibonacci-mixed hash — a different bit window than the pkey
    routing so the two hashings are independent)."""
    return ((tokens * _GOLD) >> np.uint64(64 - bits)).astype(np.int64)


def token_df_sketch(sh, bits: int = _SKETCH_BITS,
                    batch_size: int = 256) -> np.ndarray:
    """Approximate document-frequency table for the prefix-filter token
    order: per-batch sparse (bucket, df) partials, one narrow groupby
    over at most 2**bits keys, densified on the driver into a fixed
    2**bits int64 array (8 MB at the default — broadcast once per
    stage regardless of corpus size, unlike the exact (token, df) map,
    which is unbounded at 100 TB).  Collisions only overestimate a
    token's df, i.e. perturb the ORDER — the prefix filter is recall-1
    under ANY fixed total order, so correctness is unaffected; only
    candidate-count optimality degrades, gracefully, with load
    factor."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        blobs = batch.column("shingles").to_pylist()
        if not blobs:
            return pa.table({"bkt": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        all_t = np.frombuffer(b"".join(blobs), dtype="<u8")
        c = np.bincount(_sketch_bucket(all_t, bits), minlength=1 << bits)
        nz = np.flatnonzero(c)
        return pa.table({"bkt": pa.array(nz, pa.int64()),
                         "df": pa.array(c[nz], pa.int64())})

    agg = (sh.select_columns(["shingles"])
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("bkt").aggregate(Sum("df", alias_name="df"))
           .to_pandas())
    dense = np.zeros(1 << bits, dtype=np.int64)
    dense[agg["bkt"].to_numpy(dtype=np.int64)] = \
        agg["df"].to_numpy(dtype=np.int64)
    return dense


def prefix_tokens_stage(batch: pa.Table, threshold: float,
                        id_col: str = "doc_id",
                        n_parts: int = 64,
                        df_sketch: np.ndarray | None = None,
                        sketch_bits: int = _SKETCH_BITS) -> pa.Table:
    """Explode each doc's distinct shingle set into its PREFIX tokens:
    the p first tokens under the global token order, p = s - ceil(t*s)
    + 1.  The order is ascending (sketched df, hash) — the AllPairs
    ascending-df order with the fixed-size ``token_df_sketch`` standing
    in for exact global dfs — so frequent tokens land in suffixes and
    almost never generate candidate buckets.

    Recall is exactly 1 (AllPairs/ppjoin prefix filter) for ANY fixed
    total order: for a pair with Jaccard >= t, the minimal common token
    lies inside BOTH prefixes — if it ranked past x's prefix, the
    overlap would be <= ceil(t*|x|) - 1, below the ceil(t*|x∪y|) >=
    ceil(t*|x|) a Jaccard of t forces.  Each emitted row also carries
    the token's 0-based POSITION in the doc's fully-ordered set and the
    set SIZE, feeding the ppjoin positional filter downstream.  Tokens
    are hash-routed to ``n_parts`` partition keys so the candidate
    groupby dispatches O(n_parts) groups (same routing as the LSH band
    path).  Token columns ship as int64 views of the uint64 hash
    (bijective): raw values above 2^63 trip Ray's block conversion
    into the pickled-python-objects fallback path."""
    blobs = batch.column("shingles").to_pylist()
    if not blobs:
        return pa.table({"token": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int32()),
                         "sz": pa.array([], pa.int32()),
                         "pkey": pa.array([], pa.int32())})
    sizes = np.fromiter((len(b) >> 3 for b in blobs), dtype=np.int64,
                        count=len(blobs))
    all_t = np.frombuffer(b"".join(blobs), dtype="<u8")
    if df_sketch is not None:
        doc_idx = np.repeat(np.arange(len(blobs), dtype=np.int64), sizes)
        df = df_sketch[_sketch_bucket(all_t, sketch_bits)]
        order = np.lexsort((all_t, df, doc_idx))
        all_t = all_t[order]
    p = _prefix_len(sizes, threshold)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    pos = np.arange(len(all_t), dtype=np.int64) - np.repeat(starts, sizes)
    mask = pos < np.repeat(p, sizes)
    tokens = all_t[mask]
    ids = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False), sizes)[mask]
    pkey = ((tokens * _GOLD) >> np.uint64(40)) % np.uint64(n_parts)
    return pa.table({
        "token": pa.array(tokens.view(np.int64)),
        "doc_id": pa.array(ids, pa.int64()),
        "pos": pa.array(pos[mask].astype(np.int32)),
        "sz": pa.array(np.repeat(sizes, sizes)[mask].astype(np.int32)),
        "pkey": pa.array(pkey.astype(np.int32)),
    })


def pairs_from_token_partition(g: pd.DataFrame, threshold: float,
                               bucket_cap: int = _BUCKET_CAP
                               ) -> pd.DataFrame:
    """map_groups fn over a ``pkey`` partition of (token, doc_id, pos,
    sz) rows: segment by token with one lexsort, emit each token
    bucket's id pairs that survive the ppjoin POSITIONAL filter —
    a pair sharing this token at positions (i, j) of sets sized
    (sa, sb) can overlap at most min(sa-i, sb-j), so it is pruned
    when that bound is under alpha = ceil(t/(1+t) * (sa+sb)), the
    overlap a Jaccard of t forces.

    Recall at the PAIR level is exactly 1 WHEN NO TOKEN BUCKET
    EXCEEDS ``bucket_cap``: a qualifying pair's first common token w
    (under the global order) has all o common tokens ranked >= w in
    both sets, so min(sa-i, sb-j) >= o >= alpha — the emission at w
    always passes even if emissions at later shared tokens are
    pruned.  Buckets above ``bucket_cap`` fall back to the unfiltered
    star emission (k-1 pairs to the bucket's min id).  In that regime
    the guarantee weakens two ways: (1) the pair itself may only be
    reachable through min-id star edges, i.e. closure-level rather
    than pair-level (and only when the star pairs themselves pass
    Jaccard verification, as they do for identical-content floods —
    the case the cap exists for); (2) if a qualifying pair's FIRST
    common token sits in an over-cap bucket, its direct emissions at
    later shared tokens may be positionally pruned (fewer common
    tokens remain past those positions).  Shipped corpora have no
    prefix-token bucket above the default cap (pinned by tests); for
    an unconditional pair-level contract on a skewed corpus, raise
    ``bucket_cap`` above the hottest prefix-token df."""
    num, den = _threshold_fraction(threshold)
    key = g["token"].to_numpy(dtype=np.int64)
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    pos = g["pos"].to_numpy(dtype=np.int64)
    sz = g["sz"].to_numpy(dtype=np.int64)
    order = np.lexsort((ids, key))
    key, ids, pos, sz = key[order], ids[order], pos[order], sz[order]
    seg = np.concatenate(
        ([0], np.nonzero(key[1:] != key[:-1])[0] + 1, [len(ids)]))
    outs_a, outs_b = [], []
    for s, e in zip(seg[:-1], seg[1:]):
        k = e - s
        if k < 2:
            continue
        if k > bucket_cap:
            star = candidate_pairs_from_band(
                pd.DataFrame({"doc_id": ids[s:e]}), bucket_cap)
            outs_a.append(star["a"].to_numpy(dtype=np.int64))
            outs_b.append(star["b"].to_numpy(dtype=np.int64))
            continue
        iu, ju = np.triu_indices(k, k=1)
        a, b = ids[s:e][iu], ids[s:e][ju]
        sa, sb = sz[s:e][iu], sz[s:e][ju]
        ub = np.minimum(sa - pos[s:e][iu], sb - pos[s:e][ju])
        alpha = -((-num * (sa + sb)) // (num + den))
        keep = (a != b) & (ub >= alpha)
        outs_a.append(a[keep])
        outs_b.append(b[keep])
    if not outs_a:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(outs_a),
                         "b": np.concatenate(outs_b)})


def _pair_route_stage(batch: pa.Table, n_parts: int = 64) -> pa.Table:
    """Attach a pair-hash routing key so emission dedupe runs as
    ``n_parts`` vectorized group tasks instead of one Ray aggregate
    group per distinct (a, b) — the latter is quadratically slower at
    hundreds of thousands of size-~1 groups."""
    a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
    b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = ((a * _GOLD) ^ (b * np.uint64(0xC2B2AE3D27D4EB4F)))
    return batch.append_column(
        "dpkey", pa.array(((h >> np.uint64(33)) % np.uint64(n_parts))
                          .astype(np.int32)))


def _uniq_pairs_group(g: pd.DataFrame) -> pd.DataFrame:
    a = g["a"].to_numpy(dtype=np.int64)
    b = g["b"].to_numpy(dtype=np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.concatenate(
        ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    return pd.DataFrame({"a": a[keep], "b": b[keep]})


def verify_candidate_pairs(cand, shing, threshold: float,
                           num_partitions: int, id_col: str = "doc_id",
                           n_parts: int = 64):
    """Shared tail of the near-dup pipelines: dedupe candidate (a, b)
    emissions with a routed vectorized unique, hash-join each side's
    distinct shingle blob, verify true Jaccard inside the map task."""
    cand = (cand.map_batches(_pair_route_stage, batch_format="pyarrow",
                             fn_kwargs={"n_parts": n_parts})
            .groupby("dpkey")
            .map_groups(_uniq_pairs_group, batch_format="pandas"))
    j = cand.join(shing, "inner", num_partitions,
                  on=("a",), right_on=(id_col,))
    j = j.rename_columns({"shingles": "sh_a"})
    j = j.join(shing, "inner", num_partitions,
               on=("b",), right_on=(id_col,))
    j = j.rename_columns({"shingles": "sh_b"})
    return j.map_batches(jaccard_verify_stage, batch_format="pyarrow",
                         fn_kwargs={"threshold": threshold})


def ngram_jaccard_neardup(corpus_ds, threshold: float = 0.5, n: int = 3,
                          num_partitions: int = 8,
                          id_col: str = "doc_id", text_col: str = "text",
                          bucket_cap: int = _BUCKET_CAP,
                          n_parts: int = 64,
                          checkpoint_dir: str | None = None):
    """EXACT n-gram Jaccard near-dup: Dataset[id, text] ->
    Dataset[a, b] of ALL pairs with true word-n-gram Jaccard >=
    threshold — no probabilistic candidate step.

    Candidates come from the AllPairs/ppjoin prefix filter (recall
    exactly 1 whenever no prefix-token bucket exceeds ``bucket_cap`` —
    deterministic, unlike LSH banding whose recall depends on the band
    geometry; see ``pairs_from_token_partition`` for the over-cap
    regime), so this is the operator to reach for when the dedup
    contract is exact; ``minhash_neardup`` trades that guarantee for a
    signature table ~10x narrower than the shingle blobs.  Same scale shape as the minhash path: one streamed shingle
    pass, a narrow (token, doc_id, pos, sz) shuffle of PREFIX tokens
    only (~(1-t) of each set, positions feeding the ppjoin positional
    filter), routed candidate dedupe, shingle-blob joins, exact
    in-task verification.  Star cap bounds hot-token buckets, closure-
    preserving as in the LSH path."""
    sh = corpus_ds.map_batches(
        shingle_set_stage, batch_format="pyarrow", batch_size=256,
        fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n})
    sh = _signature_branch_point(sh, checkpoint_dir,
                                 [id_col, "shingles"])
    sketch = token_df_sketch(sh)
    pref = sh.map_batches(
        prefix_tokens_stage, batch_format="pyarrow",
        fn_kwargs={"threshold": threshold, "id_col": id_col,
                   "n_parts": n_parts, "df_sketch": sketch})
    cand = pref.groupby("pkey").map_groups(
        lambda g: pairs_from_token_partition(g, threshold, bucket_cap),
        batch_format="pandas")
    return verify_candidate_pairs(cand, sh, threshold,
                                  num_partitions, id_col)


def ngram_jaccard(t1: str, t2: str, n: int = 5) -> float:
    s1 = set(_shingle_hashes(t1, n).tolist())
    s2 = set(_shingle_hashes(t2, n).tolist())
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


# -- simhash ----------------------------------------------------------------
def simhash64(text: str) -> int:
    return int(simhash64_batch([text])[0])


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized simhash: one xxh64 pass over all words in the batch,
    then per-doc bit-vote via ``np.add.reduceat`` on the unpacked bit
    matrix."""
    words: list = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        words.extend(_fold_words(t))
        offsets[i + 1] = len(words)
    out = np.zeros(len(texts), dtype=np.uint64)
    if not words:
        return out
    h = xxh64_batch(words)
    # (n_words, 64) sign matrix: bit b of hash -> +1/-1
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64) * 2 - 1
    counts = np.diff(offsets)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    if len(starts):
        votes = np.add.reduceat(bits, starts, axis=0)
        keys = np.zeros(len(starts), dtype=np.uint64)
        pos = votes > 0
        for b in range(64):
            keys |= pos[:, b].astype(np.uint64) << np.uint64(b)
        out[np.nonzero(nonempty)[0]] = keys
    return out


def simhash_stage(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return pa.table({
        id_col: batch.column(id_col),
        "simhash": pa.array(simhash64_batch(texts), pa.uint64()),
    })


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (byte-table lookup)."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return _POP8[b].sum(axis=1).astype(np.int64)


def simhash_bands_stage(batch: pa.Table, id_col: str = "doc_id",
                        n_bands: int = 4,
                        n_parts: int = 0) -> pa.Table:
    """Explode 64-bit simhashes into (band_id, band_key) rows: two
    docs within hamming distance d < n_bands agree on at least one
    16-bit band (pigeonhole), so banding finds all close pairs.
    ``n_parts`` > 0 adds the bucket hash-partition column (see
    ``lsh_bands_stage``)."""
    h = batch.column("simhash").to_numpy(zero_copy_only=False)
    n = len(h)
    bits = 64 // n_bands
    mask = np.uint64((1 << bits) - 1)
    band_id = np.repeat(np.arange(n_bands, dtype=np.int32), n)
    keys = np.concatenate([
        (h >> np.uint64(b * bits)) & mask for b in range(n_bands)])
    cols = {
        "band_id": pa.array(band_id),
        "band_key": pa.array(keys, pa.uint64()),
        id_col: pa.array(np.tile(
            batch.column(id_col).to_numpy(zero_copy_only=False), n_bands),
            pa.int64()),
        "simhash": pa.array(np.tile(h, n_bands), pa.uint64()),
    }
    if n_parts:
        pkey = (((keys ^ band_id.astype(np.uint64))
                 * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(40)) % np.uint64(n_parts)
        cols["pkey"] = pa.array(pkey.astype(np.int32))
    return pa.table(cols)


def simhash_pairs_from_partition(g: pd.DataFrame,
                                 max_hamming: int = 3) -> pd.DataFrame:
    """map_groups fn over a ``pkey`` partition: segment the routed
    (band_id, band_key) buckets with one lexsort and run the hamming
    verification per bucket — O(n_parts) dispatches total."""
    bid = g["band_id"].to_numpy(dtype=np.int64)
    key = g["band_key"].to_numpy(dtype=np.uint64)
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    hs = g["simhash"].to_numpy(dtype=np.uint64)
    order = np.lexsort((ids, key, bid))
    bid, key, ids, hs = bid[order], key[order], ids[order], hs[order]
    new_seg = (bid[1:] != bid[:-1]) | (key[1:] != key[:-1])
    seg = np.concatenate(([0], np.nonzero(new_seg)[0] + 1, [len(ids)]))
    outs = []
    for s, e in zip(seg[:-1], seg[1:]):
        if e - s >= 2:
            outs.append(simhash_pairs_from_band(
                pd.DataFrame({"doc_id": ids[s:e], "simhash": hs[s:e]}),
                max_hamming))
    if not outs:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.concat(outs, ignore_index=True)


def simhash_pairs_from_band(g: pd.DataFrame,
                            max_hamming: int = 3) -> pd.DataFrame:
    """map_groups fn: verified near-dup pairs within one simhash band
    bucket (hamming distance computed on the full 64-bit keys carried
    in the band rows — no second lookup needed)."""
    sub = g.drop_duplicates("doc_id").sort_values("doc_id")
    ids = sub["doc_id"].to_numpy()
    hs = sub["simhash"].to_numpy().astype(np.uint64)
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    a_out, b_out = [], []
    for i in range(len(ids)):
        d = _popcount64(hs[i] ^ hs[i + 1:])
        for j in np.nonzero(d <= max_hamming)[0]:
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + j]))
    return pd.DataFrame({"a": a_out, "b": b_out})


def simhash_neardup(corpus_ds, max_hamming: int = 3, n_bands: int = 4,
                    id_col: str = "doc_id", text_col: str = "text"):
    """SimHash near-dup pairs, fully distributed: signatures ->
    16-bit banding (pigeonhole guarantees recall for hamming <
    n_bands) -> per-bucket hamming verification -> pair dedup.
    Only narrow (band, key, id, simhash) rows ever shuffle."""
    from ray.data.aggregate import Count

    import pyarrow.compute as pc

    sigs = corpus_ds.map_batches(
        simhash_stage, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "text_col": text_col})
    # tokenless docs all hash to 0: at corpus scale they would share
    # every band bucket and emit a quadratic pair blowup — exclude
    # them (mirrors the minhash pipeline's short-doc rule)
    sigs = sigs.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("simhash"),
                                        pa.scalar(0, pa.uint64()))),
        batch_format="pyarrow")
    bands = sigs.map_batches(
        simhash_bands_stage, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "n_bands": n_bands,
                   "n_parts": 64})
    cand = bands.groupby("pkey").map_groups(
        lambda g: simhash_pairs_from_partition(g, max_hamming),
        batch_format="pandas")
    out = (cand.groupby(["a", "b"])
           .aggregate(Count(alias_name="_nb"))
           .select_columns(["a", "b"]))
    # the pandas-block groupby promotes int keys to float64 when empty
    # partition frames are in the mix — cast back to the id dtype
    return out.map_batches(
        lambda t: pa.table({"a": pc.cast(t.column("a"), pa.int64()),
                            "b": pc.cast(t.column("b"), pa.int64())}),
        batch_format="pyarrow")


# -- embedding near-dup ------------------------------------------------------
def embedding_neardup_pairs(emb_table: pa.Table, threshold: float = 0.95,
                            id_col: str = "vec_id") -> pa.Table:
    """Batch-local all-pairs cosine (numpy matmul); the kernel under
    ``embedding_neardup_blocked``'s per-group computation — full-batch
    in tests.  Thresholding is on round(sim, 6), matching the oracle."""
    from .similarity import embedding_matrix

    ids = emb_table.column(id_col).to_numpy(zero_copy_only=False)
    mn = _normalize_rows(embedding_matrix(emb_table.column("embedding")))
    sims = mn @ mn.T
    iu = np.triu_indices(len(ids), k=1)
    r = np.round(sims[iu], 6)
    mask = r >= threshold
    return pa.table({
        "a": pa.array(ids[iu[0][mask]], pa.int64()),
        "b": pa.array(ids[iu[1][mask]], pa.int64()),
        "cosine": pa.array(r[mask], pa.float64()),
    })


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _grid_group_pairs(g: pa.Table, threshold: float,
                      id_col: str) -> pa.Table:
    """Pairs within one unordered block-pair group of the grid."""
    from .similarity import embedding_matrix

    gi = g.column("gi")[0].as_py()
    gj = g.column("gj")[0].as_py()
    ids = g.column(id_col).to_numpy(zero_copy_only=False)
    mn = _normalize_rows(embedding_matrix(g.column("embedding")))
    if gi == gj:
        sims = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        r = np.round(sims[iu], 6)
        mask = r >= threshold
        xa, xb = ids[iu[0][mask]], ids[iu[1][mask]]
    else:
        blk = g.column("blk").to_numpy(zero_copy_only=False)
        li = np.nonzero(blk == gi)[0]
        rj = np.nonzero(blk == gj)[0]
        sims = mn[li] @ mn[rj].T
        r = np.round(sims, 6)
        pi, pj = np.nonzero(r >= threshold)
        xa, xb = ids[li[pi]], ids[rj[pj]]
        r = r[pi, pj] if len(pi) else np.empty(0)
        mask = slice(None)
    a = np.minimum(xa, xb)
    b = np.maximum(xa, xb)
    cos = (r[mask] if gi == gj else r)
    return pa.table({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64()),
        "cosine": pa.array(np.asarray(cos, dtype=np.float64),
                           pa.float64()),
    })


def embedding_neardup_blocked(ds, threshold: float = 0.95,
                              n_blocks: int = 4, id_col: str = "vec_id"):
    """Exact all-pairs cosine >= threshold, fully distributed.

    Block grid: row i (block = id % n_blocks) is replicated to the
    n_blocks unordered block-pair groups {min(b,j), max(b,j)}; every
    unordered row pair co-locates in exactly one group, so no pair is
    emitted twice and none is missed.  Shuffle volume = n_blocks ×
    input; per-group memory = 2 blocks ≈ 2·|input|/n_blocks — size
    n_blocks so that fits a worker.  (See module docstring for why an
    LSH pre-filter cannot replace this under an exact-threshold
    oracle.)"""
    def expand(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        blk = (ids % n_blocks).astype(np.int32)
        base = t.append_column("blk", pa.array(blk, pa.int32()))
        parts = []
        for j in range(n_blocks):
            parts.append(
                base.append_column(
                    "gi", pa.array(np.minimum(blk, j), pa.int32()))
                .append_column(
                    "gj", pa.array(np.maximum(blk, j), pa.int32())))
        return pa.concat_tables(parts)

    grid = ds.map_batches(expand, batch_format="pyarrow")
    return grid.groupby(["gi", "gj"]).map_groups(
        lambda g: _grid_group_pairs(g, threshold, id_col),
        batch_format="pyarrow")


_EMB_BANDS = 16      # OR-amplification: L independent bands
_EMB_PLANES = 6      # AND within a band: b hyperplanes per band
_EMB_PARTS = 64      # hash partitions the buckets are routed to


def _emb_band_planes(dim: int, n_bands: int, n_planes: int) -> np.ndarray:
    """Fixed-seed (L*b, dim) hyperplane stack — deterministic across
    workers; distinct from ops.similarity._planes' seed."""
    rng = np.random.RandomState(0x5EED5EED)
    return rng.standard_normal((n_bands * n_planes, dim))


def _emb_bands_stage(batch: pa.Table, id_col: str, planes: np.ndarray,
                     n_bands: int, n_planes: int,
                     n_parts: int) -> pa.Table:
    """Explode rows into (pkey, bucket, id, embedding) rows: bucket =
    (band_id, b sign bits) packed into one int64, pkey = bucket hash
    partition (so the downstream groupby has ``n_parts`` groups, not
    one dispatch per bucket).  Zero-norm rows are dropped (they
    cosine-0 everything yet share one key — the tokenless-simhash
    quadratic hazard)."""
    from .similarity import embedding_matrix

    if len(batch) == 0:
        # empty blocks reach map_batches stages after upstream filters;
        # embedding_matrix would return (0, 0) and the matmul against
        # the (L*b, dim) plane stack would raise
        return pa.table({
            "pkey": pa.array([], pa.int32()),
            "bucket": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "embedding": batch.column("embedding").combine_chunks()
            if isinstance(batch.column("embedding"), pa.ChunkedArray)
            else batch.column("embedding"),
        })
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    m = embedding_matrix(batch.column("embedding"))
    norms = np.linalg.norm(m, axis=1)
    ok = norms > 0
    ids, m = ids[ok], _normalize_rows(m[ok])
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    emb = emb.take(pa.array(np.nonzero(ok)[0], pa.int64()))
    n = len(ids)
    bits = (m @ planes.T) > 0  # (n, L*b)
    pw = (1 << np.arange(n_planes, dtype=np.int64))
    keys = (bits.reshape(n, n_bands, n_planes) * pw).sum(axis=2)
    bucket = (keys + (np.arange(n_bands, dtype=np.int64)
                      << np.int64(n_planes))).reshape(-1)
    pkey = ((bucket * np.int64(0x9E3779B9)) % np.int64(n_parts)
            ).astype(np.int32)
    return pa.table({
        "pkey": pa.array(pkey),
        "bucket": pa.array(bucket, pa.int64()),
        id_col: pa.array(np.repeat(ids, n_bands), pa.int64()),
        "embedding": _repeat_list_array(emb, n_bands),
    })


def _repeat_list_array(arr: pa.Array, times: int) -> pa.Array:
    """Each element repeated ``times`` consecutive times."""
    idx = np.repeat(np.arange(len(arr), dtype=np.int64), times)
    return arr.take(pa.array(idx, pa.int64()))


def _emb_partition_pairs(g: pa.Table, threshold: float, id_col: str,
                         bucket_cap: int) -> pa.Table:
    """Exact cosine verification over EVERY bucket routed to this
    partition group: sort by (bucket, id), dedupe, then one matmul per
    bucket segment.  Buckets above ``bucket_cap`` members emit pairs
    against their min-id member only (star) — same guard/rationale as
    ``candidate_pairs_from_band``."""
    from .similarity import embedding_matrix

    buckets = g.column("bucket").to_numpy(zero_copy_only=False)
    ids = g.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, buckets))
    buckets, ids = buckets[order], ids[order]
    uniq = np.concatenate(
        ([True], (buckets[1:] != buckets[:-1]) | (ids[1:] != ids[:-1])))
    order = order[uniq]
    buckets, ids = buckets[uniq], ids[uniq]
    mn = _normalize_rows(embedding_matrix(
        g.column("embedding").take(pa.array(order, pa.int64()))))
    seg = np.concatenate(
        ([0], np.nonzero(buckets[1:] != buckets[:-1])[0] + 1,
         [len(buckets)]))
    a_out, b_out, c_out = [], [], []
    for s, e in zip(seg[:-1], seg[1:]):
        k = e - s
        if k < 2:
            continue
        sub = mn[s:e]
        bid = ids[s:e]
        if k > bucket_cap:
            r = np.round(sub[1:] @ sub[0], 6)
            mask = r >= threshold
            a_out.append(np.full(int(mask.sum()), bid[0]))
            b_out.append(bid[1:][mask])
            c_out.append(r[mask])
        else:
            sims = sub @ sub.T
            iu = np.triu_indices(k, k=1)
            r = np.round(sims[iu], 6)
            mask = r >= threshold
            a_out.append(bid[iu[0][mask]])
            b_out.append(bid[iu[1][mask]])
            c_out.append(r[mask])
    if not a_out:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return pa.table({
        "a": pa.array(np.concatenate(a_out), pa.int64()),
        "b": pa.array(np.concatenate(b_out), pa.int64()),
        "cosine": pa.array(np.concatenate(c_out), pa.float64())})


def embedding_neardup_approx(ds, threshold: float = 0.8, dim: int = 64,
                             id_col: str = "vec_id",
                             n_bands: int = _EMB_BANDS,
                             n_planes: int = _EMB_PLANES,
                             n_parts: int = _EMB_PARTS,
                             bucket_cap: int = _BUCKET_CAP):
    """Approximate high-threshold embedding near-dup — the 100-TB
    regime switch from ``embedding_neardup_blocked``.

    The exact block grid is O(n^2/blocks) compute: correct at any
    threshold (and the only shape that can match an exact-threshold
    oracle at t≈0.3, where LSH recall collapses — see module
    docstring), but quadratic FLOPs.  At high thresholds the geometry
    flips: for cosine >= 0.8 a random hyperplane agrees with
    probability 1-θ/π ≈ 0.795, so a 6-plane band matches with p ≈
    0.795^6 ≈ 0.25 and 16 OR'd bands give recall ≈ 1-(1-p)^16 > 0.98.
    Candidates are only bucket collisions; every emitted pair is still
    verified by EXACT cosine, so precision is 1 — only recall is
    approximate.  Shuffle volume: L × input narrow rows; compute:
    sum of per-bucket squares (bounded by ``bucket_cap``'s star guard).
    Buckets are hash-routed to ``n_parts`` partition groups so the
    groupby dispatches O(n_parts) groups, each verifying its buckets
    vectorized — not one dispatch per bucket.

    At corpus scale widen the geometry so expected bucket size stays
    bounded: b = n_planes ≈ log2(n / target_bucket_size) and L = bands
    to hold recall (e.g. n=1e9 @ t>=0.8: b=16, L=64 gives per-band
    p≈0.795^16≈0.025, recall ≈ 1-(1-p)^64 ≈ 0.80; b=12, L=64 ≈ 0.99),
    and n_parts ≈ cluster cores.  Use the blocked exact grid below the
    crossover (t < ~0.7) or when an exact pair set is required; this
    path above it.  (SCALE.md documents the crossover.)"""
    planes = _emb_band_planes(dim, n_bands, n_planes)
    bands = ds.map_batches(
        _emb_bands_stage, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "planes": planes,
                   "n_bands": n_bands, "n_planes": n_planes,
                   "n_parts": n_parts})
    pairs = bands.groupby("pkey").map_groups(
        lambda g: _emb_partition_pairs(g, threshold, id_col, bucket_cap),
        batch_format="pyarrow")
    from ray.data.aggregate import Min

    return (pairs.groupby(["a", "b"])
            .aggregate(Min("cosine", alias_name="cosine")))


# -- clustering (driver-side, provably small pair lists) --------------------
def union_find_clusters(pairs) -> dict:
    """Min-label union-find over candidate pairs; returns id->root."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}
