"""Named end-to-end pipelines (composable, Ray-session-agnostic).

Each returns a lazy ``ray.data.Dataset``; callers own consumption
(write_parquet / iter_batches / aggregates). Nothing here calls
ray.init().
"""

from __future__ import annotations

from ..sources import read_pages
from ..stages import DEFAULT_RULES, ReadabilityStage, extract_pages


def extraction_pipeline(sf_dir: str, rules=DEFAULT_RULES,
                        batch_size: int = 128, limit=None, repeat: int = 1):
    """pages parquet -> map_batches(extract) -> (url, <rule columns>)."""
    ds = read_pages(sf_dir, columns=["url", "html"], limit=limit,
                    repeat=repeat)
    return extract_pages(ds, rules=rules, batch_size=batch_size)


def readability_pipeline(sf_dir: str, batch_size: int = 64, limit=None):
    """pages parquet -> readability content extraction
    (url, title, article_text, score)."""
    ds = read_pages(sf_dir, columns=["url", "html"], limit=limit)
    return ds.map_batches(ReadabilityStage(), batch_format="pyarrow",
                          batch_size=batch_size)


def qa_sample(sf_dir: str, fraction: float = 0.02, seed: int = 42,
              limit=None):
    """QA sampling pipeline (SURVEY.md §2.7 sampling/limit): a seeded
    random sample of extracted pages with basic quality columns, for
    eyeballing crawl output without touching the full corpus."""
    import pyarrow.compute as pc

    ds = extraction_pipeline(sf_dir, limit=limit)
    sample = ds.random_sample(fraction, seed=seed)
    return sample.map_batches(
        lambda t: t.append_column(
            "text_len", pc.utf8_length(t.column("body_text"))),
        batch_format="pyarrow")
