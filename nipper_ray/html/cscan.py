"""Runtime build + ctypes binding for the C macro-tokenizer (_scan.c).

The shared object is compiled once per machine into a content-hashed
cache path (concurrent workers race benignly: each builds to a unique
temp name and ``os.replace``s it).  Every failure mode — no compiler,
build error, load error — degrades silently to ``None`` and the pure
Python tokenizer keeps the exact same behavior (the differential test
pins the two identical).  Set ``NIPPER_RAY_NO_CSCAN=1`` to force the
Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_scan.c")

_fn = None
_tried = False


def _build():
    with open(_SRC, "rb") as f:
        src = f.read()
    h = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NIPPER_RAY_CSCAN_DIR",
        os.path.join(tempfile.gettempdir(), "nipper_ray_cscan"))
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, "scan_%s.so" % h)
    if not os.path.exists(so):
        tmp = "%s.%d.tmp" % (so, os.getpid())
        subprocess.run(
            ["gcc", "-O3", "-fPIC", "-shared", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)
    fn = lib.nr_scan
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    return fn


def get():
    """The bound scan function, or None when unavailable/disabled."""
    global _fn, _tried
    if _tried:
        return _fn
    _tried = True
    if os.environ.get("NIPPER_RAY_NO_CSCAN"):
        return None
    try:
        _fn = _build()
    except Exception:
        _fn = None
    return _fn
