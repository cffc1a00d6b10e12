from .flagship import extraction_pipeline, readability_pipeline  # noqa: F401
