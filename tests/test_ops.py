"""Unit tests for the training-data ops (no Ray needed) and the
readability stage."""

import numpy as np
import pyarrow as pa

from nipper_ray.ops.dedup import (hamming64, minhash_signatures_batch,
                                  ngram_jaccard, simhash64,
                                  union_find_clusters)
from nipper_ray.ops.multimodal import (MediaFeatureStage, FrameSampleStage,
                                       media_table_from_documents)
from nipper_ray.ops.similarity import _normalize, topk_reduce
from nipper_ray.ops.textstats import LangIdStage, token_stats
from nipper_ray.stages.readability import extract_article

from conftest import load_fixture


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 30
    b = a[: int(len(a) * 0.7)]
    c = "completely different words entirely here now " * 30
    sigs = minhash_signatures_batch([a, b, c], n=3)
    est_ab = (sigs[0] == sigs[1]).mean()
    true_ab = ngram_jaccard(a, b, 3)
    assert abs(est_ab - true_ab) < 0.2
    assert (sigs[0] == sigs[2]).mean() < 0.1


def test_minhash_deterministic():
    s1 = minhash_signatures_batch(["some stable text here ok then"], n=3)
    s2 = minhash_signatures_batch(["some stable text here ok then"], n=3)
    assert (s1 == s2).all()


def test_simhash_properties():
    a = "word " * 100 + "ending one two three"
    b = a + " tiny change"
    c = "altogether another document with other tokens"
    assert simhash64(a) == simhash64(a)
    assert hamming64(simhash64(a), simhash64(b)) < 12
    assert hamming64(simhash64(a), simhash64(c)) > 12


def test_union_find():
    got = union_find_clusters([(3, 4), (1, 2), (2, 3), (9, 8)])
    assert got[4] == 1 and got[3] == 1 and got[2] == 1
    assert got[9] == 8


def test_topk_reduce_deterministic():
    rows = [
        {"query_id": 1, "neighbor_id": 5, "sim": 0.9},
        {"query_id": 1, "neighbor_id": 3, "sim": 0.9},
        {"query_id": 1, "neighbor_id": 7, "sim": 0.5},
    ]
    t = topk_reduce(rows, k=2)
    assert t.column("neighbor_id").to_pylist() == [3, 5]  # tie -> id asc


def test_normalize_zero_vector():
    m = _normalize(np.array([[0.0, 0.0], [3.0, 4.0]]))
    assert not np.isnan(m).any()
    assert abs(np.linalg.norm(m[1]) - 1.0) < 1e-12


def test_langid_stage():
    stage = LangIdStage()
    batch = pa.table({
        "doc_id": [1, 2],
        "text": ["the cat and the dog in the house of the king",
                 "这是一个中文文档，包含很多中文字符，足够识别语言了吗？还需要更多字符。"],
    })
    out = stage(batch)
    preds = out.column("lang_pred").to_pylist()
    assert preds[0] == "en"
    assert preds[1] == "zh"


def test_token_stats_kernel():
    batch = pa.table({"doc_id": [1], "text": ["a b c d-e f_g"]})
    out = token_stats(batch)
    # tokens: a b c d e f_g  ('-' splits, '_' doesn't)
    assert out.column("n_tokens")[0].as_py() == 6


def test_media_plumbing():
    docs = pa.table({"doc_id": [0, 1, 2], "text": ["aa", "bb", "cc"]})
    media = media_table_from_documents(docs)
    assert media.column("kind").to_pylist() == ["image", "audio", "video"]
    feats = MediaFeatureStage(fake=True)(media)
    assert len(feats) == 3
    assert len(feats.column("features")[0].as_py()) == 16
    frames = FrameSampleStage(n_frames=2, fake=True)(media)
    assert frames.column("media_id").to_pylist() == [2, 2]


def test_media_codec_boundary_raises_on_unsupported_format():
    """The codec boundary is real for BMP/WAV/Y4M; formats without a
    from-scratch decoder (e.g. PNG) still raise."""
    import pytest

    media = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([b"\x89PNG\r\n\x1a\n....."], pa.binary()),
        "mime": pa.array(["image/png"], pa.string()),
        "n_bytes": pa.array([13], pa.int64()),
    })
    with pytest.raises(NotImplementedError):
        MediaFeatureStage(fake=False)(media)


def test_media_real_decode_roundtrip():
    """Real path: synthesized payloads are genuine BMP/WAV/Y4M that the
    from-scratch parsers decode back to the exact source byte streams,
    and the integer-ppm features match a direct computation."""
    import math

    from nipper_ray.ops.codecs import decode_bmp, decode_wav, decode_y4m

    docs = pa.table({"doc_id": [0, 1, 2],
                     "text": ["hello world", "abc def g", "tuv wx yz"]})
    media = media_table_from_documents(docs)
    pay = media.column("payload").to_pylist()
    b0 = np.frombuffer(b"hello world", dtype=np.uint8)
    img = decode_bmp(pay[0])
    assert img.shape == (8, 8, 3)
    assert (img[:, :, 0].ravel() == b0[np.arange(64) % len(b0)]).all()
    assert (img[:, :, 0] == img[:, :, 2]).all()  # grey
    b1 = np.frombuffer(b"abc def g", dtype=np.uint8)
    samples, rate = decode_wav(pay[1])
    assert rate == 8000
    want = (b1[np.arange(64) % len(b1)].astype(np.int16) - 128) * 256
    assert (samples == want).all()
    b2 = np.frombuffer(b"tuv wx yz", dtype=np.uint8)
    frames, w, h = decode_y4m(pay[2])
    assert (w, h, len(frames)) == (8, 8, 4)
    for f in range(4):
        want = b2[(np.arange(64) + 7 * f) % len(b2)].reshape(8, 8)
        assert (frames[f] == want).all()

    feats = MediaFeatureStage(fake=False)(media)
    v = b0[np.arange(64) % len(b0)].astype(np.int64)
    s1, s2, n = int(v.sum()), int((v * v).sum()), len(v)
    assert feats.column("feat_mean_ppm")[0].as_py() == (s1 * 10**6) // n
    assert feats.column("feat_std_ppm")[0].as_py() == int(math.floor(
        math.sqrt((n * s2 - s1 * s1) / (n * n)) * 10**6))


def test_codec_roundtrips_random():
    from nipper_ray.ops.codecs import (decode_bmp, decode_wav, decode_y4m,
                                       encode_bmp, encode_wav, encode_y4m)

    rng = np.random.RandomState(11)
    for hw in [(8, 8), (5, 3), (1, 1), (6, 10)]:
        img = rng.randint(0, 256, (*hw, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all(), hw
    s = rng.randint(-32768, 32768, 200).astype(np.int16)
    d, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and (d == s).all()
    frames = [rng.randint(0, 256, (4, 6), dtype=np.uint8)
              for _ in range(3)]
    df, w, h = decode_y4m(encode_y4m(frames, 6, 4))
    assert (w, h) == (6, 4)
    assert all((a == b).all() for a, b in zip(df, frames))


def test_frame_sample_real_path():
    docs = pa.table({"doc_id": [2], "text": ["some video text here"]})
    media = media_table_from_documents(docs)
    out = FrameSampleStage(n_frames=2, fake=False)(media)
    assert out.column("media_id").to_pylist() == [2, 2]
    assert out.column("frame_idx").to_pylist() == [0, 1]
    # evenly spaced: frames 0 and 2 of the 4 encoded
    from nipper_ray.ops.codecs import decode_y4m

    frames, _, _ = decode_y4m(media.column("payload")[0].as_py())
    assert out.column("frame_feat")[0].as_py() == \
        frames[0].ravel()[:8].astype(np.float32).tolist()
    assert out.column("frame_feat")[1].as_py() == \
        frames[2].ravel()[:8].astype(np.float32).tolist()


def test_readability_wisburg():
    out = extract_article(load_fixture("wisburg.html"))
    assert "Wisburg" in out["title"]
    assert len(out["article_text"]) > 1000
    assert "function" not in out["article_text"]  # no script leakage


def test_readability_rustwiki():
    out = extract_article(load_fixture("rustwiki.html"))
    assert out["title"].startswith("Rust (programming language)")
    assert "memory-safe" in out["article_text"].lower() \
        or "Memory-safe" in out["article_text"]


def test_readability_deterministic():
    h = load_fixture("page.html")
    assert extract_article(h) == extract_article(h)


# -- vectorized dedup kernels: differentials + fixed-vector pins ------------
def test_shingle_hashes_batch_matches_scalar_xxh64():
    """Fast path (one lane-batched xxh64 call) vs slow path (scalar
    xxh64 per shingle string) — bit-identical."""
    from nipper_ray.frontier.hashing import xxh64_str
    from nipper_ray.ops.dedup import _WORD_RE, shingle_hashes_batch

    texts = ["the quick brown fox jumps over the dog",
             "", "one two", "alpha beta gamma delta alpha beta"]
    all_h, offsets = shingle_hashes_batch(texts, n=3)
    for i, t in enumerate(texts):
        words = _WORD_RE.findall(t.lower())
        want = [xxh64_str(" ".join(words[j:j + 3]))
                for j in range(max(0, len(words) - 2))]
        got = all_h[offsets[i]:offsets[i + 1]].tolist()
        assert got == want, i


def test_shingle_short_doc_dropped_vs_fallback():
    from nipper_ray.ops.dedup import shingle_hashes_batch

    short = ["one two"]
    h0, off0 = shingle_hashes_batch(short, n=3)
    assert len(h0) == 0 and off0.tolist() == [0, 0]
    h1, off1 = shingle_hashes_batch(short, n=3, short_doc_fallback=True)
    assert len(h1) == 1  # legacy whole-text shingle


def test_minhash_fixed_vector():
    """Pin the first permutation lanes of a known signature so a silent
    change to the shingle hash or permutation constants is caught."""
    sigs = minhash_signatures_batch(
        ["the quick brown fox jumps over the lazy dog"], n=3)
    assert sigs.shape == (1, 64)
    # recompute independently: min over multiply-shift of shingle hashes
    from nipper_ray.frontier.hashing import xxh64_str
    from nipper_ray.ops.dedup import _AS, _BS

    words = "the quick brown fox jumps over the lazy dog".split()
    hs = np.array([xxh64_str(" ".join(words[j:j + 3]))
                   for j in range(len(words) - 2)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        want = ((hs[:, None] ^ _BS[None, :]) * _AS[None, :]).min(axis=0)
    assert (sigs[0] == want).all()


def test_sigs_chunking_matches_unchunked():
    """Chunked reduceat (bounded memory) equals per-doc computation."""
    import nipper_ray.ops.dedup as dd

    texts = ["word%d " % (i % 7) * (20 + i) for i in range(30)]
    full = dd.minhash_signatures_batch(texts, n=3)
    old_chunk = dd._SIG_CHUNK
    try:
        dd._SIG_CHUNK = 64  # force many tiny chunks
        small = dd.minhash_signatures_batch(texts, n=3)
    finally:
        dd._SIG_CHUNK = old_chunk
    assert (full == small).all()


def test_simhash_batch_matches_reference():
    """Vectorized batch simhash vs a per-word reference implementation."""
    from nipper_ray.frontier.hashing import xxh64_str
    from nipper_ray.ops.dedup import _WORD_RE, simhash64_batch

    texts = ["the quick brown fox", "", "alpha beta alpha", "x"]
    got = simhash64_batch(texts)
    for i, t in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for w in _WORD_RE.findall(t.lower()):
            h = xxh64_str(w)
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        want = 0
        for b in range(64):
            if acc[b] > 0:
                want |= 1 << b
        assert int(got[i]) == want, i


def test_lsh_bands_stage_vectorized_keys():
    """Same signature chunk -> same band key; different chunk -> nearly
    surely different; band keys equal scalar xxh64 of the chunk bytes."""
    from nipper_ray.frontier.hashing import xxh64
    from nipper_ray.ops.dedup import lsh_bands_stage, minhash_stage

    batch = pa.table({"doc_id": [1, 2, 3],
                      "text": ["same text here ok then fine",
                               "same text here ok then fine",
                               "another doc entirely different now"]})
    bands = lsh_bands_stage(minhash_stage(batch, n=3), n_bands=16)
    assert len(bands) == 48
    t = bands.to_pydict()
    key_of = {}
    for bid, key, did in zip(t["band_id"], t["band_key"], t["doc_id"]):
        key_of[(did, bid)] = key
    for b in range(16):
        assert key_of[(1, b)] == key_of[(2, b)]  # identical docs
    # spot-check one key against scalar xxh64 of the raw chunk bytes
    sigs = minhash_stage(batch, n=3).column("minhash").to_pylist()
    chunk = np.array(sigs[0][0:4], dtype=np.uint64).tobytes()
    assert key_of[(1, 0)] == xxh64(chunk)


def test_embedding_grid_matches_allpairs(ray_session):
    """Block-grid distributed near-dup == single-table all-pairs kernel."""
    import ray.data as rd

    from nipper_ray.ops.dedup import (embedding_neardup_blocked,
                                      embedding_neardup_pairs)

    rng = np.random.RandomState(7)
    n, d = 120, 16
    base = rng.standard_normal((n, d))
    base[50] = base[10] * 1.001  # planted near-dup
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in base],
                                        pa.list_(pa.float64()))})
    want = embedding_neardup_pairs(t, threshold=0.5)
    got = embedding_neardup_blocked(rd.from_arrow(t), threshold=0.5,
                                    n_blocks=3).to_pandas()
    wp = sorted(zip(want.column("a").to_pylist(),
                    want.column("b").to_pylist()))
    gp = sorted(zip(got["a"], got["b"]))
    assert wp == gp and len(wp) > 0


def test_embedding_neardup_approx_recall(ray_session):
    """High-threshold regime switch: LSH-banded candidates + exact
    in-bucket cosine.  Precision must be 1 (every emitted pair is
    exact-verified); recall vs the exact all-pairs kernel must clear
    0.9 in the cosine>=0.8 regime the bands are tuned for."""
    import ray.data as rd

    from nipper_ray.ops.dedup import (embedding_neardup_approx,
                                      embedding_neardup_pairs)

    rng = np.random.RandomState(99)
    n, d = 300, 64
    base = rng.standard_normal((n, d))
    # plant 40 near-dup pairs at cosine ~0.85-0.99
    for i in range(40):
        j = 200 + i
        noise = rng.standard_normal(d) * rng.uniform(0.1, 0.45)
        base[j] = base[i] + noise
    base[250] = 0.0  # zero vector: must be dropped, not bucket-bombed
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in base],
                                        pa.list_(pa.float64()))})
    want = embedding_neardup_pairs(t, threshold=0.8)
    wp = set(zip(want.column("a").to_pylist(),
                 want.column("b").to_pylist()))
    got = embedding_neardup_approx(rd.from_arrow(t), threshold=0.8,
                                   dim=d).to_pandas()
    gp = set(zip(got["a"], got["b"]))
    assert gp <= wp                      # exact verify => precision 1
    assert len(wp) >= 30
    recall = len(gp & wp) / len(wp)
    assert recall >= 0.9, recall
    # determinism: same input -> identical pair set + cosines
    again = embedding_neardup_approx(rd.from_arrow(t), threshold=0.8,
                                     dim=d).to_pandas()
    assert sorted(zip(again["a"], again["b"], again["cosine"])) == \
        sorted(zip(got["a"], got["b"], got["cosine"]))


def test_minhash_neardup_pipeline_matches_bruteforce(ray_session):
    """Distributed minhash pipeline == brute-force exact Jaccard join
    on a corpus with planted near-dups."""
    import ray.data as rd

    from nipper_ray.ops.dedup import minhash_neardup, ngram_jaccard

    docs = []
    for i in range(40):
        base = ("alpha beta gamma delta epsilon zeta eta theta "
                "iota kappa word%d " % i) * 6
        docs.append(base)
    docs[20] = docs[5] + "tiny tail change"          # near-dup of 5
    docs[33] = docs[7]                               # exact dup of 7
    docs.append("too short")                         # < 3 words w/ n=3? no: 2 words
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = minhash_neardup(rd.from_arrow(t), threshold=0.6, n=3,
                          num_partitions=2).to_pandas()
    gp = sorted(zip(got["a"], got["b"]))
    want = []
    for i in range(len(docs)):
        wi = docs[i].split()
        if len(wi) < 3:
            continue
        for j in range(i + 1, len(docs)):
            if len(docs[j].split()) < 3:
                continue
            if ngram_jaccard(docs[i], docs[j], 3) >= 0.6:
                want.append((i, j))
    assert gp == sorted(want)
    assert (5, 20) in gp and (7, 33) in gp


def test_prefix_len_exact_integer_ceil():
    """p = s - ceil(t*s) + 1 with an EXACT ceil: float 0.6*5 =
    3.0000000000000004 so math.ceil would give 4 and shrink the prefix
    (recall loss); the integer-fraction path must give ceil(3) = 3."""
    from nipper_ray.ops.dedup import _prefix_len

    p = _prefix_len(np.array([5, 10, 1, 3]), 0.6)
    assert list(p) == [5 - 3 + 1, 10 - 6 + 1, 1, 3 - 2 + 1]
    p = _prefix_len(np.array([7, 2]), 0.5)
    assert list(p) == [7 - 4 + 1, 2 - 1 + 1]


def test_prefix_filter_recall_theorem_randomized():
    """Direct check of the combined prefix + positional filter the
    candidate step relies on: for ANY pair of sets with Jaccard >= t,
    at least one token survives into BOTH prefixes AND its positional
    emission passes — under the hash order, the real df-sketch order,
    and adversarial random-sketch orders."""
    from nipper_ray.ops.dedup import (pairs_from_token_partition,
                                      prefix_tokens_stage,
                                      shingle_set_stage)

    rng = np.random.default_rng(7)
    vocab = ["w%d" % k for k in range(30)]
    docs = []
    for _ in range(60):
        k = rng.integers(3, 20)
        docs.append(" ".join(rng.choice(vocab, size=k)))
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    sh = shingle_set_stage(t, n=3)
    blobs = [np.frombuffer(b, dtype="<u8")
             for b in sh.column("shingles").to_pylist()]
    ids = sh.column("doc_id").to_pylist()
    sketches = [None,
                rng.integers(0, 50, size=1 << 20).astype(np.int64),
                rng.integers(0, 3, size=1 << 20).astype(np.int64)]
    for threshold in (0.5, 0.6, 0.8):
        for sk in sketches:
            pref = prefix_tokens_stage(
                sh, threshold=threshold, df_sketch=sk)
            pdf = pref.to_pandas()
            got = pairs_from_token_partition(pdf, threshold)
            gp = set(zip(got["a"], got["b"]))
            for i in range(len(ids)):
                si = set(blobs[i].tolist())
                for j in range(i + 1, len(ids)):
                    sj = set(blobs[j].tolist())
                    jac = len(si & sj) / len(si | sj)
                    if jac >= threshold:
                        assert (min(ids[i], ids[j]),
                                max(ids[i], ids[j])) in gp, (
                            "candidate filter missed pair (%s,%s) "
                            "jac=%.3f t=%.2f" % (ids[i], ids[j], jac,
                                                 threshold))


def test_ngram_jaccard_neardup_matches_bruteforce(ray_session):
    """EXACT pipeline == brute-force threshold join, including pairs in
    the 0.5-0.6 zone LSH banding can miss, and with a shared hot phrase
    across most docs (exercises the hot-token demotion)."""
    import ray.data as rd

    from nipper_ray.ops.dedup import ngram_jaccard, ngram_jaccard_neardup

    docs = []
    for i in range(30):
        docs.append("common hot phrase every doc starts with "
                    "alpha beta gamma w%d x%d y%d z%d " % (i, i, i, i)
                    * 3)
    docs[10] = docs[3] + "small tail tweak here"      # high-jac pair
    docs[21] = docs[8]                                # exact dup
    # a mid-similarity pair: share ~55% of shingles
    docs[25] = docs[12][: len(docs[12]) * 2 // 3] + \
        " unrelated continuation words keep going different now ok yes"
    docs.append("one two")                            # dropped (<3 words)
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = ngram_jaccard_neardup(rd.from_arrow(t), threshold=0.5, n=3,
                                num_partitions=2).to_pandas()
    gp = sorted(zip(got["a"], got["b"]))
    want = []
    for i in range(len(docs)):
        if len(docs[i].split()) < 3:
            continue
        for j in range(i + 1, len(docs)):
            if len(docs[j].split()) < 3:
                continue
            if ngram_jaccard(docs[i], docs[j], 3) >= 0.5:
                want.append((i, j))
    assert gp == sorted(want)
    assert (3, 10) in gp and (8, 21) in gp


def test_ngram_jaccard_overcap_star_closure(ray_session):
    """Over-cap regime of the ppjoin path (every prefix-token bucket
    of an identical-doc flood exceeds bucket_cap): candidates degrade
    to min-id star emission, the positional filter never drops a star
    edge (identical docs verify at Jaccard 1), and the transitive
    closure still recovers the full cluster — the exact contract the
    pairs_from_token_partition docstring now states for this regime."""
    import ray.data as rd

    from nipper_ray.ops.dedup import (ngram_jaccard_neardup,
                                      union_find_clusters)

    same = ("boilerplate nav header footer copyright terms privacy "
            "contact about careers press blog help ") * 4
    docs = [same] * 600
    docs += ["unique document number %d with its own %s content words"
             % (i, "y" * (i + 3)) for i in range(5)]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = ngram_jaccard_neardup(rd.from_arrow(t), threshold=0.5, n=3,
                                num_partitions=2,
                                bucket_cap=64).to_pandas()
    assert len(got) == 599  # star shape, not 600*599/2
    roots = union_find_clusters(list(zip(got["a"], got["b"])))
    cluster = {x for x, r in roots.items() if r == 0} | {0}
    assert cluster == set(range(600))


def test_threshold_fraction_overflow_guard():
    """Thresholds with long decimal expansions (e.g. 1/3) used to build
    Fraction numerators ~3.3e15 that overflowed int64 in the vectorized
    alpha = ceil(t/(1+t)*(sa+sb)) once sa+sb passed ~2.7k shingles,
    falsely pruning qualifying pairs.  The bounded fraction rounds DOWN
    (recall-safe) and keeps the int64 math exact."""
    import pandas as pd

    from nipper_ray.ops.dedup import (_threshold_fraction,
                                      pairs_from_token_partition)

    num, den = _threshold_fraction(1 / 3)
    assert den <= 10**6 and num / den <= 1 / 3
    assert num * 2 * 10**7 < 2**63  # no wrap for any physical set size
    # exact decimals stay exact
    assert _threshold_fraction(0.6) == (3, 5)
    assert _threshold_fraction(0.88) == (22, 25)
    # a qualifying pair of LARGE sets sharing its first token must
    # survive the positional filter at threshold 1/3
    g = pd.DataFrame({"token": np.array([7, 7], dtype=np.int64),
                      "doc_id": np.array([1, 2], dtype=np.int64),
                      "pos": np.array([0, 0], dtype=np.int64),
                      "sz": np.array([5000, 5000], dtype=np.int64)})
    out = pairs_from_token_partition(g, threshold=1 / 3)
    assert list(zip(out["a"], out["b"])) == [(1, 2)]


def test_neardup_checkpoint_branch_point_equality(ray_session, tmp_path):
    """checkpoint_dir= (Parquet branch point, the 100 TB shape) yields
    the exact same verified pair set as the materialize() default, for
    both near-dup pipelines."""
    import ray.data as rd

    from nipper_ray.ops.dedup import minhash_neardup, ngram_jaccard_neardup

    docs = ["document number %d words %s etc common tail phrase here"
            % (i, " ".join("w%d" % (i * 7 + j) for j in range(8)))
            for i in range(40)]
    docs[11] = docs[4] + " tiny tweak"
    docs[23] = docs[9]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    def pairs(out):
        df = out.to_pandas()
        return sorted(zip(df["a"], df["b"]))

    base = pairs(minhash_neardup(rd.from_arrow(t), threshold=0.6,
                                 num_partitions=2))
    ckpt = pairs(minhash_neardup(
        rd.from_arrow(t), threshold=0.6, num_partitions=2,
        checkpoint_dir=str(tmp_path / "mh_ckpt")))
    assert ckpt == base and len(base) >= 2
    # the checkpoint landed on disk as sharded parquet, inside the
    # function-owned subdirectory (only that subdir is ever purged —
    # checkpoint_dir itself is operator-supplied)
    assert list((tmp_path / "mh_ckpt" / "signatures").glob("*.parquet"))

    base_ng = pairs(ngram_jaccard_neardup(rd.from_arrow(t), threshold=0.5,
                                          num_partitions=2))
    ckpt_ng = pairs(ngram_jaccard_neardup(
        rd.from_arrow(t), threshold=0.5, num_partitions=2,
        checkpoint_dir=str(tmp_path / "ng_ckpt")))
    assert ckpt_ng == base_ng and len(base_ng) >= 2


def test_decontam_stage_kernel():
    """Overlap counting against a benchmark shingle set: exact distinct
    3-gram intersection, integer ppm, short docs dropped."""
    from nipper_ray.ops.decontam import DecontamStage
    from nipper_ray.ops.dedup import shingle_hashes_batch

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    bh, _ = shingle_hashes_batch([bench_text], 3)
    stage = DecontamStage(np.unique(bh), n=3, threshold_ppm=100_000)
    docs = [
        bench_text,                               # full overlap
        "the quick brown fox went home early after work today ok",
        "completely different words about other topics entirely here",
        "too short",                              # dropped (<3 words)
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = stage(t).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 1, 2]
    assert out.loc[0, "overlap_ppm"] == 1_000_000
    assert bool(out.loc[0, "contaminated"])
    # doc 1 shares exactly the 2 leading trigrams of its 11 words ->
    # 9 distinct shingles
    assert out.loc[1, "n_shingles"] == 9
    assert out.loc[1, "n_overlap"] == 2
    assert out.loc[1, "overlap_ppm"] == 2 * 1_000_000 // 9
    assert out.loc[2, "n_overlap"] == 0
    assert not bool(out.loc[2, "contaminated"])
    # dtypes are the oracle's (int64/bool)
    assert str(out["overlap_ppm"].dtype) == "int64"
    assert str(out["contaminated"].dtype) == "bool"


def test_candidate_pairs_vectorized_and_star_capped():
    """Below the cap: exact all-pairs set (vectorized == the old nested
    loop).  Above the cap: k-1 star pairs to the min id — the shape that
    keeps a 100k-identical-page mega-cluster from emitting O(k^2)."""
    import pandas as pd

    from nipper_ray.ops.dedup import candidate_pairs_from_band

    g = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)[::-1]})
    out = candidate_pairs_from_band(g, bucket_cap=1024)
    want = [(i, j) for i in range(100) for j in range(i + 1, 100)]
    assert sorted(zip(out["a"], out["b"])) == want
    assert out["a"].dtype == np.int64 and out["b"].dtype == np.int64

    big = pd.DataFrame({"doc_id": np.arange(7, 5007, dtype=np.int64)})
    star = candidate_pairs_from_band(big, bucket_cap=1024)
    assert len(star) == 4999
    assert (star["a"] == 7).all()
    assert sorted(star["b"]) == list(range(8, 5007))


def test_minhash_neardup_mega_bucket_guard(ray_session):
    """A bucket of 2000 identical docs (the boilerplate mega-cluster
    shape that would emit ~2M pairs per band uncapped) stays linear
    under the star cap, and the transitive closure still recovers the
    full cluster."""
    import ray.data as rd

    from nipper_ray.ops.dedup import minhash_neardup, union_find_clusters

    same = ("boilerplate nav header footer copyright terms privacy "
            "contact about careers press blog help ") * 4
    docs = [same] * 2000
    docs += ["unique document number %d with its own %s content words"
             % (i, "x" * (i + 3)) for i in range(5)]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = minhash_neardup(rd.from_arrow(t), threshold=0.6, n=3,
                          num_partitions=2, bucket_cap=256).to_pandas()
    # star representation: k-1 pairs after dedup, not k*(k-1)/2
    assert len(got) == 1999
    roots = union_find_clusters(list(zip(got["a"], got["b"])))
    cluster = {x for x, r in roots.items() if r == 0} | {0}
    assert cluster == set(range(2000))


def test_asof_join_semantics(ray_session):
    """Backward/forward direction, exact-match ties (max tiebreak wins),
    inner vs left behavior."""
    import pandas as pd
    import ray.data as rd

    from nipper_ray.ops.join import asof_join

    left = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "lid": pa.array([10, 11, 12, 13], pa.int64()),
        "t": pa.array([5, 20, 3, 7], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 1, 9], pa.int64()),
        "t": pa.array([5, 5, 18, 1], pa.int64()),
        "rid": pa.array([100, 101, 102, 103], pa.int64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    by="k", on="t", right_cols=["rid"],
                    right_tiebreak=["rid"]).to_pandas()
    got = {int(r.lid): int(r.rid) for r in out.itertuples()}
    # lid 10 at t=5: ties rid 100/101 -> max (101); lid 11 at t=20 ->
    # rid 102 (t=18); lid 12 at t=3 -> no earlier right row (inner:
    # dropped); k=2 has no right rows -> dropped
    assert got == {10: 101, 11: 102}
    assert out["rid"].dtype.kind == "i"

    fwd = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    by="k", on="t", right_cols=["rid"],
                    direction="forward",
                    right_tiebreak=["rid"]).to_pandas()
    gf = {int(r.lid): int(r.rid) for r in fwd.itertuples()}
    # forward: lid 10/12 -> first right at t>=: the t=5 tie group, where
    # merge_asof forward picks the FIRST row in (t, rid) sort order
    # (rid 100); lid 11 (t=20) has no later right row -> dropped
    assert gf == {10: 100, 12: 100}


def test_asof_join_differential_vs_duckdb(ray_session):
    """Randomized differential: asof_join == DuckDB's native ASOF JOIN
    on generated (key, time) data with exact-ts ties and empty keys."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from nipper_ray.ops.join import asof_join

    rng = np.random.RandomState(11)
    nl, nr = 300, 200
    left = pd.DataFrame({
        "k": rng.randint(0, 12, nl).astype("int64"),
        "lid": np.arange(nl, dtype="int64"),
        # coarse grid forces exact-match ties with the right side
        "t": rng.randint(0, 50, nl).astype("int64"),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 15, nr).astype("int64"),   # some keys unmatched
        "t": rng.randint(0, 50, nr).astype("int64"),
        "rid": np.arange(1000, 1000 + nr, dtype="int64"),
    })
    # deterministic tie semantics on both sides: collapse right to one
    # row per (k, t) keeping max rid
    right = (right.sort_values(["k", "t", "rid"])
             .drop_duplicates(["k", "t"], keep="last")
             .reset_index(drop=True))

    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="k", on="t", right_cols=["rid"],
                    right_tiebreak=["rid"]).to_pandas()
    got = got.sort_values("lid").reset_index(drop=True)

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.k, l.lid, l.t, r.rid
        FROM l ASOF JOIN r ON l.k = r.k AND l.t >= r.t
        ORDER BY lid
    """).df()
    assert len(got) == len(want)
    assert (got["lid"].values == want["lid"].values).all()
    assert (got["rid"].astype("int64").values
            == want["rid"].astype("int64").values).all()


def test_ann_variants_recall(ray_session):
    """Each approximate ANN path asserted in its valid regime:
    IVF (data-dependent coarse quantizer) must keep high recall@10
    even for weak cos~0.3 neighbors; hyperplane-LSH prunes only in the
    high-cosine (near-dup) regime, so it is asserted on planted
    near-duplicate vectors.  Both must be run-to-run deterministic."""
    import ray
    import ray.data as rd
    import numpy as np
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    from nipper_ray.ops.similarity import (brute_force_topk, ivf_topk,
                                           lsh_topk)

    base = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qt = base.filter(pc_.less(base.column("vec_id"), pa.scalar(5)))
    q_vecs = qt.column("embedding").to_pylist()
    # plant 3 near-dups of each query (cos ~0.999) with fresh ids
    n0 = len(base)
    extra_ids, extra_vecs = [], []
    rng = np.random.RandomState(4)
    for qi, v in enumerate(q_vecs):
        a = np.asarray(v)
        for j in range(3):
            extra_ids.append(10_000 + qi * 10 + j)
            extra_vecs.append(
                (a + 0.01 * rng.standard_normal(len(a))).tolist())
    t = pa.concat_tables([base, pa.table({
        "vec_id": pa.array(extra_ids, pa.int64()),
        "embedding": pa.array(extra_vecs, base.column(
            "embedding").type)})])
    ds = rd.from_arrow(t)
    qref = ray.put({"ids": qt.column("vec_id").to_pylist(),
                    "vectors": q_vecs})

    def sets(tbl):
        out = {}
        for r in tbl.to_pylist():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = sets(brute_force_topk(ds, qref, k=10))
    ivf = sets(ivf_topk(ds, qref, k=10, n_cells=8, nprobe=3))
    rec_ivf = [len(ivf.get(q, set()) & exact[q]) / len(exact[q])
               for q in exact]
    assert sum(rec_ivf) / len(rec_ivf) >= 0.9, rec_ivf

    lsh = sets(lsh_topk(ds, qref, k=10, probes=4, dim=64))
    for qi, q in enumerate(sorted(exact)):
        planted = {10_000 + qi * 10 + j for j in range(3)}
        assert planted <= lsh.get(q, set()), (q, lsh.get(q))  # hi-cos found
        assert q in lsh.get(q, set())  # and the query itself

    again = sets(ivf_topk(ds, qref, k=10, n_cells=8, nprobe=3))
    assert again == ivf  # deterministic


def test_connected_components_chain(ray_session):
    """Multi-hop chains (diameter > 1) converge to min-label; isolated
    pair endpoints keep their own component."""
    import ray.data as rd

    from nipper_ray.ops.cc import connected_components

    pairs = pa.table({
        "a": pa.array([10, 11, 12, 13,  50,  70], pa.int64()),
        "b": pa.array([11, 12, 13, 14,  51,  70], pa.int64()),
    })  # chain 10-11-12-13-14, pair 50-51, self-pair 70
    out = connected_components(rd.from_arrow(pairs)).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   50: 50, 51: 50, 70: 70}


def test_asof_join_one_sided_keys(ray_session):
    """Keys with only right rows (or only left rows) must not poison
    the output schema with float-promoted empties."""
    import ray.data as rd

    from nipper_ray.ops.join import asof_join

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "lid": pa.array([10], pa.int64()),
                     "t": pa.array([5], pa.int64())})
    right = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "t": pa.array([4, 4, 4], pa.int64()),
                      "rid": pa.array([100, 101, 102], pa.int64())})
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    by="k", on="t", right_cols=["rid"]).to_pandas()
    assert out["rid"].dtype.kind == "i" and out["lid"].dtype.kind == "i"
    assert dict(zip(out["lid"], out["rid"])) == {10: 100}


def test_simhash_neardup_pipeline(ray_session):
    """Planted tiny-edit near-dups are found; unrelated docs are not;
    result equals the brute-force hamming<=3 pair set."""
    import ray.data as rd

    from nipper_ray.ops.dedup import hamming64, simhash64, simhash_neardup

    docs = [("common filler words shared across documents plus topic%d "
             "alpha beta gamma delta epsilon zeta eta " % (i % 9)) * 8
            for i in range(30)]
    docs[20] = docs[5] + "one extra token"        # near-dup of 5
    docs[25] = docs[7]                            # exact dup of 7
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = sorted(map(tuple, simhash_neardup(
        rd.from_arrow(t), max_hamming=3).to_pandas()[["a", "b"]]
        .itertuples(index=False)))
    hs = [simhash64(d) for d in docs]
    want = sorted((i, j) for i in range(len(docs))
                  for j in range(i + 1, len(docs))
                  if hamming64(hs[i], hs[j]) <= 3)
    assert got == want
    assert (5, 20) in got and (7, 25) in got


def test_popcount64_matches_bin():
    from nipper_ray.ops.dedup import _popcount64, hamming64

    rng = np.random.RandomState(2)
    xs = rng.randint(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
    got = _popcount64(xs)
    want = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == want
    assert hamming64(0xFF, 0x0F) == 4


def test_routed_map_groups_equivalence(ray_session):
    """routed_map_groups == groupby(keys).map_groups for a per-key fn,
    including string keys and empty-output groups."""
    import pandas as pd
    import ray.data as rd

    from nipper_ray.ops.grouping import routed_map_groups

    t = pa.table({
        "k": pa.array([f"key{i % 37}" for i in range(500)]),
        "v": pa.array(np.arange(500, dtype=np.int64) * 7 % 101),
    })

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["v"], ascending=False, kind="mergesort")
        return g.head(2) if g["v"].iloc[0] % 2 == 0 else g.iloc[0:0]

    want = (rd.from_arrow(t).groupby("k")
            .map_groups(top2, batch_format="pandas").to_pandas())
    got = routed_map_groups(rd.from_arrow(t), ["k"], top2,
                            n_parts=8).to_pandas()
    key = lambda df: df.sort_values(["k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(key(want), key(got))


def test_pagerank_integer_properties(ray_session):
    """Exact-integer PageRank sanity on a small synthetic ring+links
    graph: all nodes ranked, total mass conserved up to the documented
    floor leakage, determinism across runs."""
    import ray.data as rd

    from nipper_ray.ops.rank import (RANK_SCALE, edges_from_docs_stage,
                                     pagerank)

    n = 60
    docs = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    edges = rd.from_arrow(docs).map_batches(
        edges_from_docs_stage, batch_format="pyarrow",
        fn_kwargs={"n_docs": n})
    r = pagerank(edges, n, iters=4).to_pandas()
    assert len(r) == n and set(r.doc_id) == set(range(n))
    total = r.rank_u.sum()
    # floor leakage only ever loses mass, bounded by ~1 unit per
    # edge/node per iteration
    assert 0.95 * RANK_SCALE < total <= RANK_SCALE
    r2 = pagerank(edges, n, iters=4).to_pandas()
    assert sorted(zip(r.doc_id, r.rank_u)) == sorted(zip(r2.doc_id,
                                                         r2.rank_u))


def test_routed_map_groups_null_keys(ray_session):
    """Null group keys are KEPT (Ray groupby semantics): routing hashes
    null to a sentinel and the in-partition groupby runs dropna=False."""
    import pandas as pd
    import ray.data as rd

    from nipper_ray.ops.grouping import routed_map_groups

    t = pa.table({
        "k": pa.array(["a", None, "b", None, "a", ""], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": [g["k"].iloc[0]],
            "n": [len(g)],
            "sum_v": [int(g["v"].sum())],
        })

    got = routed_map_groups(rd.from_arrow(t), ["k"], summarize,
                            n_parts=4).to_pandas()
    got = got.sort_values("sum_v", ignore_index=True)
    # null group present, distinct from the "" group
    by_k = {(None if pd.isna(r.k) else r.k): (r.n, r.sum_v)
            for r in got.itertuples()}
    assert by_k[None] == (2, 6)
    assert by_k["a"] == (2, 6)
    assert by_k[""] == (1, 6)
    assert by_k["b"] == (1, 3)


def test_routed_map_groups_salted_skew(ray_session):
    """2000-rows-one-key skew: the salted two-phase top-2 equals the
    unsalted (and plain groupby) result exactly."""
    import pandas as pd
    import ray.data as rd

    from nipper_ray.ops.grouping import routed_map_groups

    n = 2000
    t = pa.table({
        "k": pa.array(["hot"] * n + ["cold1", "cold2"]),
        "id": pa.array(list(range(n + 2)), pa.int64()),
        "v": pa.array([(i * 37) % 1009 for i in range(n + 2)],
                      pa.int64()),
    })

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["v", "id"], ascending=[False, True],
                          kind="mergesort")
        out = g.head(2).copy()
        out["rank"] = range(1, len(out) + 1)
        return out

    want = routed_map_groups(rd.from_arrow(t), ["k"], top2,
                             n_parts=8).to_pandas()
    got = routed_map_groups(rd.from_arrow(t), ["k"], top2,
                            n_parts=8, salt=("id", 16)).to_pandas()
    key = lambda df: df.sort_values(["k", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(key(want), key(got))
    assert len(got) == 4  # 2 for the hot key + 1 each for the colds


def test_session_windows_salted_equivalence(ray_session):
    """q_session_windows with NIPPER_RAY_SALT=1 (time-bucket salt +
    session-stitching combine) returns exactly the unsalted result,
    including sessions spanning the day-bucket boundary."""
    import os

    import pandas as pd

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    base = entry.queries()["session_windows"](sf).to_pandas()
    os.environ["NIPPER_RAY_SALT"] = "1"
    try:
        salted = entry.queries()["session_windows"](sf).to_pandas()
        topn_salted = entry.queries()["top_events_per_user"](sf).to_pandas()
    finally:
        del os.environ["NIPPER_RAY_SALT"]
    topn_base = entry.queries()["top_events_per_user"](sf).to_pandas()

    key = lambda df: df.sort_values(list(df.columns), ignore_index=True)
    pd.testing.assert_frame_equal(key(base), key(salted))
    pd.testing.assert_frame_equal(key(topn_base), key(topn_salted))


def test_emb_bands_stage_empty_batch():
    """Empty pyarrow blocks reach map_batches stages after upstream
    filters; _emb_bands_stage must return the typed empty table rather
    than raising on the (0,0) @ (L*b, dim) matmul."""
    from nipper_ray.ops.dedup import (_EMB_BANDS, _EMB_PLANES,
                                      _emb_band_planes, _emb_bands_stage)

    dim = 8
    planes = _emb_band_planes(dim, _EMB_BANDS, _EMB_PLANES)
    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    })
    out = _emb_bands_stage(empty, "vec_id", planes,
                           _EMB_BANDS, _EMB_PLANES, 64)
    assert len(out) == 0
    assert out.column_names == ["pkey", "bucket", "vec_id", "embedding"]
    # and a non-empty batch still works after the guard
    one = pa.table({
        "vec_id": pa.array([7], pa.int64()),
        "embedding": pa.array([[1.0] * dim], pa.list_(pa.float32())),
    })
    out2 = _emb_bands_stage(one, "vec_id", planes,
                            _EMB_BANDS, _EMB_PLANES, 64)
    assert len(out2) == _EMB_BANDS
