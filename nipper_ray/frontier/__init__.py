from .canonicalize import canonicalize_url, host_of  # noqa: F401
from .hashing import xxh64, xxh64_str  # noqa: F401
from .cuckoo import CuckooFilter  # noqa: F401
