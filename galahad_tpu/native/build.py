"""Build-on-first-use for the native symbolic library."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "symbolic.cpp")


def _cache_dir() -> str:
    d = os.environ.get(
        "GALAHAD_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/galahad_tpu/native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_symbolic() -> ctypes.CDLL:
    """Compile (if needed) and load the symbolic analysis library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = _source_path()
        with open(src, "rb") as fh:
            tag = hashlib.sha256(fh.read()).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"libsymbolic-{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
                 "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rcm_order.argtypes = [ctypes.c_int32, i32p, i32p, i32p]
        lib.amd_order.argtypes = [ctypes.c_int32, i32p, i32p, i32p]
        lib.nd_order.argtypes = [ctypes.c_int32, i32p, i32p,
                                 ctypes.c_int32, i32p]
        lib.etree.argtypes = [ctypes.c_int32, i32p, i32p, i32p]
        lib.postorder_tree.argtypes = [ctypes.c_int32, i32p, i32p]
        lib.supernodes.argtypes = [ctypes.c_int32, i32p, i32p,
                                   ctypes.c_int32, i32p]
        lib.supernodes.restype = ctypes.c_int32
        lib.tree_levels.argtypes = [ctypes.c_int32, i32p, i32p]
        lib.tree_levels.restype = ctypes.c_int32
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.symbolic_count.argtypes = [ctypes.c_int32, i64p, i32p, i32p, i32p]
        lib.symbolic_count.restype = ctypes.c_int64
        lib.symbolic_pattern.argtypes = [ctypes.c_int32, i64p, i32p, i32p,
                                         i32p, i64p, i32p]
        _lib = lib
        return lib
