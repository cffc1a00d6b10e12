from .extract import ExtractStage, Rule, DEFAULT_RULES, extract_pages  # noqa: F401
