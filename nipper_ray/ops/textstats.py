"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, language-ID, document fingerprinting.

All stages are vectorized ``map_batches`` transforms over the
``documents`` table; the token/quality kernels use regex/string ops that
are expressible in ANSI SQL too, so the driver's DuckDB oracle can check
them value-for-value (see __ray_entry__.oracle_sql)."""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

# ASCII-word tokens: identical semantics to DuckDB
# regexp_extract_all(text, '[A-Za-z0-9_]+')
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_PUNCT_RE = re.compile(r"[.,;:!?]")

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that".split())


def normalize_text(batch: pa.Table, text_col: str = "text",
                   out_col: str = "norm_text") -> pa.Table:
    """Text cleaning for training data: Unicode NFC + ASCII-whitespace
    squeeze + space trim.  (No case folding: locale-dependent
    lowercasing — Turkish dotted-I, Greek final sigma — differs between
    runtimes, so a canonicalization op that must byte-match an oracle
    avoids it.  The whitespace class is the explicit ASCII set, not
    ``\\s``, because Python-re ``\\s`` is Unicode-wide while RE2's is
    ASCII-only.)  Mirrors the SQL:
    trim(regexp_replace(nfc_normalize(text), '[\\t\\n\\f\\r ]+', ' ',
    'g'), ' ')."""
    import unicodedata

    texts = batch.column(text_col).to_pylist()
    out = [
        _WS_RUN_RE.sub(" ", unicodedata.normalize("NFC", t or ""))
        .strip(" ")
        for t in texts]
    return batch.append_column(out_col, pa.array(out, pa.string()))


_WS_RUN_RE = re.compile(r"[\t\n\f\r ]+")


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    n_tokens = [len(_TOKEN_RE.findall(t or "")) for t in texts]
    n_chars = [len(t or "") for t in texts]
    return batch.append_column(
        "n_tokens", pa.array(n_tokens, pa.int64())).append_column(
        "n_chars_computed", pa.array(n_chars, pa.int64()))


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    n_punct, stop_ratio, mean_wlen = [], [], []
    for t in texts:
        t = t or ""
        toks = _TOKEN_RE.findall(t)
        n_punct.append(len(_PUNCT_RE.findall(t)))
        if toks:
            stop = sum(1 for w in toks if w.lower() in _STOPWORDS)
            stop_ratio.append(round(stop / len(toks), 6))
            mean_wlen.append(round(sum(map(len, toks)) / len(toks), 6))
        else:
            stop_ratio.append(0.0)
            mean_wlen.append(0.0)
    out = batch.append_column("n_punct", pa.array(n_punct, pa.int64()))
    out = out.append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
    out = out.append_column("mean_word_len",
                            pa.array(mean_wlen, pa.float64()))
    return out


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact-content fingerprint (md5 hex — matches DuckDB md5())."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
           for t in texts]
    return batch.append_column("fp_md5", pa.array(fps, pa.string()))


# -- language id (character n-gram heuristic; rows-only check) -------------
_LANG_PROFILES = {
    "en": " th the and ing ion to of",
    "fr": " de le la et les des que",
    "es": " de la el que los en se ",
    "de": " de der die und den ein ",
    "zh": "",  # CJK handled by codepoint range
}


class LangIdStage:
    """Actor stage: profiles built once per actor in __init__."""

    def __init__(self):
        self.profiles = {}
        for lang, seed_text in _LANG_PROFILES.items():
            grams = set()
            s = seed_text
            for i in range(len(s) - 2):
                grams.add(s[i:i + 3])
            self.profiles[lang] = grams

    def _predict(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
        if cjk > 10:
            return "zh"
        s = text[:1000].lower()
        grams = {s[i:i + 3] for i in range(len(s) - 2)}
        best, best_score = "und", 0
        for lang, prof in self.profiles.items():
            if not prof:
                continue
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t or "")
                 for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 16) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over
    character windows (Schleimer et al., SIGMOD 2003 — public method).
    Rows-only check (not SQL-expressible)."""
    from ..frontier.hashing import xxh64

    texts = batch.column(text_col).to_pylist()
    fps = []
    for t in texts:
        t = t or ""
        if len(t) < window:
            fps.append(xxh64(t.encode()))
            continue
        best = None
        step = max(1, (len(t) - window) // 64)  # sample up to 64 windows
        for i in range(0, len(t) - window + 1, step):
            h = xxh64(t[i:i + window].encode())
            if best is None or h < best:
                best = h
        fps.append(best)
    return batch.append_column(
        "fp_rolling", pa.array(fps, pa.uint64()))
