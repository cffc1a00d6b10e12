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


def test_media_codec_stub_raises():
    import pytest

    docs = pa.table({"doc_id": [0], "text": ["xx"]})
    media = media_table_from_documents(docs)
    with pytest.raises(NotImplementedError):
        MediaFeatureStage(fake=False)(media)


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
