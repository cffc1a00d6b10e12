from .jsonl import read_jsonl, write_jsonl_shards  # noqa: F401
from .synth import (  # noqa: F401
    PAGES_SCHEMA, gen_page_html, page_url, synth_pages_parquet,
    read_pages,
)
