from . import (dedup, decontam, grouping, multimodal,  # noqa: F401
               similarity, textstats)
