from .checkpoint import (  # noqa: F401
    last_complete_wave, read_manifest, write_checkpoint,
)
