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


def _compile(name: str, opt: str = "-O2") -> ctypes.CDLL:
    src = _DIR / f"{name}.cpp"
    so = _DIR / f"_{name}.so"
    if (not so.exists()) or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", opt, "-shared", "-fPIC", "-std=c++17",
             "-o", str(so), str(src)],
            check=True)
    return ctypes.CDLL(str(so))


def _build_and_load() -> ctypes.CDLL:
    lib = _compile("refsort")
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


# ---------------------------------------------------------------------------
# Min-cost flow (CS2 replacement; see mcmf.cpp header)
# ---------------------------------------------------------------------------
_MCMF = None


def _mcmf_lib():
    global _MCMF
    with _LOCK:
        if _MCMF is None:
            lib = _compile("mcmf", opt="-O3")
            p64 = ctypes.POINTER(ctypes.c_int64)
            lib.mcmf_solve.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                       p64, p64, p64, p64, p64, p64]
            lib.mcmf_solve.restype = ctypes.c_int64
            _MCMF = lib
    return _MCMF


def mcmf_solve(v_nodes: int, tail, head, lb, ub, cost) -> np.ndarray:
    """Solve min-cost flow with per-arc lower bounds (ub<0 = infinite).
    Returns the per-arc flow vector; raises on infeasibility."""
    p64 = ctypes.POINTER(ctypes.c_int64)
    arrs = [np.ascontiguousarray(a, np.int64)
            for a in (tail, head, lb, ub, cost)]
    n_arcs = len(arrs[0])
    out = np.empty(n_arcs, np.int64)
    lib = _mcmf_lib()
    rc = lib.mcmf_solve(v_nodes, n_arcs,
                        *(a.ctypes.data_as(p64) for a in arrs),
                        out.ctypes.data_as(p64))
    if rc != 0:
        raise RuntimeError("infeasible flow problem")
    return out
