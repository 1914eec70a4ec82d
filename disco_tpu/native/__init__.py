"""Native (C++) runtime helpers, built on demand with g++ and loaded via
ctypes. Keeps hot or semantics-critical host paths out of Python."""
import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB = None


def _build_and_load() -> ctypes.CDLL:
    src = _DIR / "refsort.cpp"
    so = _DIR / "_refsort.so"
    if (not so.exists()) or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", str(so), str(src)],
            check=True)
    lib = ctypes.CDLL(str(so))
    for name, ktype in (("stdsort_by_key_u64", ctypes.c_uint64),
                        ("stdsort_by_key_i64", ctypes.c_int64),
                        ("stdsort_by_key_i64_desc", ctypes.c_int64)):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.POINTER(ktype), ctypes.POINTER(ctypes.c_int64),
                       ctypes.c_int64]
        fn.restype = None
    return lib


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = _build_and_load()
    return _LIB


def stdsort_permutation(keys, descending: bool = False) -> np.ndarray:
    """Permutation produced by libstdc++ std::sort with a key-only `<`
    comparator — including its exact (unstable) treatment of ties. perm[i] is
    the original index of the element at sorted position i."""
    keys = np.ascontiguousarray(keys)
    n = len(keys)
    out = np.empty(n, np.int64)
    if n == 0:
        return out
    lib = _lib()
    if keys.dtype == np.uint64 and not descending:
        fn = lib.stdsort_by_key_u64
        kp = keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    else:
        keys = keys.astype(np.int64, copy=False)
        kp = keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        fn = (lib.stdsort_by_key_i64_desc if descending
              else lib.stdsort_by_key_i64)
    fn(kp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
    return out
