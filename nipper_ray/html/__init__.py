from .parser import parse_document, parse_fragment  # noqa: F401
