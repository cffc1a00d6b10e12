from .extract import ExtractStage, Rule, DEFAULT_RULES, extract_pages  # noqa: F401
from .readability import ReadabilityStage, extract_article  # noqa: F401
