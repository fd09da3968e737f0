"""numpy-friendly wrappers over the native symbolic library."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import load_symbolic


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def rcm_order(rowptr, colind) -> np.ndarray:
    """Reverse Cuthill-McKee permutation (bandwidth reduction)."""
    lib = load_symbolic()
    rowptr = _i32(rowptr)
    colind = _i32(colind)
    n = len(rowptr) - 1
    perm = np.zeros(n, np.int32)
    lib.rcm_order(n, _ptr(rowptr), _ptr(colind), _ptr(perm))
    return perm


def amd_order(rowptr, colind) -> np.ndarray:
    """Minimum-degree permutation (fill reduction)."""
    lib = load_symbolic()
    rowptr = _i32(rowptr)
    colind = _i32(colind)
    n = len(rowptr) - 1
    perm = np.zeros(n, np.int32)
    lib.amd_order(n, _ptr(rowptr), _ptr(colind), _ptr(perm))
    return perm


def nd_order(rowptr, colind, leaf_size: int = 64) -> np.ndarray:
    """Nested-dissection permutation (level-set vertex separators with
    AMD-ordered leaves — the METIS_NodeND role, reference
    src/sls/sls.f90 ordering menu / SSIDS analyse)."""
    lib = load_symbolic()
    rowptr = _i32(rowptr)
    colind = _i32(colind)
    n = len(rowptr) - 1
    perm = np.zeros(n, np.int32)
    lib.nd_order(n, _ptr(rowptr), _ptr(colind), int(leaf_size), _ptr(perm))
    return perm


def etree(rowptr, colind) -> np.ndarray:
    """Elimination tree parents of an (already permuted) pattern."""
    lib = load_symbolic()
    rowptr = _i32(rowptr)
    colind = _i32(colind)
    n = len(rowptr) - 1
    parent = np.zeros(n, np.int32)
    lib.etree(n, _ptr(rowptr), _ptr(colind), _ptr(parent))
    return parent


def postorder(parent) -> np.ndarray:
    lib = load_symbolic()
    parent = _i32(parent)
    n = len(parent)
    post = np.zeros(n, np.int32)
    lib.postorder_tree(n, _ptr(parent), _ptr(post))
    return post


def supernode_partition(parent, colcount, relax_cols=0):
    """snode id per column + count (fundamental supernodes with relaxed
    amalgamation)."""
    lib = load_symbolic()
    parent = _i32(parent)
    colcount = _i32(colcount)
    n = len(parent)
    snode = np.zeros(n, np.int32)
    ns = lib.supernodes(n, _ptr(parent), _ptr(colcount),
                        np.int32(relax_cols), _ptr(snode))
    return snode, int(ns)


def tree_levels(sparent):
    """Per-supernode level (leaves 0) + number of levels."""
    lib = load_symbolic()
    sparent = _i32(sparent)
    ns = len(sparent)
    level = np.zeros(ns, np.int32)
    nl = lib.tree_levels(ns, _ptr(sparent), _ptr(level))
    return level, int(nl)


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def symbolic_count(colptr, rowind, n) -> int:
    """Strict-lower factor nonzero count only (cheap ordering-quality
    probe; same row-walk as symbolic_factor without the pattern pass)."""
    lib = load_symbolic()
    colptr = _i64(colptr)
    rowind = _i32(rowind)
    parent = np.zeros(n, np.int32)
    colcount = np.zeros(n, np.int32)
    return int(lib.symbolic_count(n, _ptr64(colptr), _ptr(rowind),
                                  _ptr(parent), _ptr(colcount)))


def symbolic_factor(colptr, rowind, n):
    """Full symbolic Cholesky of an (already permuted) lower-triangle
    CSC pattern: returns (parent, colcount, Lp, Li) where (Lp, Li) is
    the strict-lower pattern of L in CSC with ascending rows.
    Native row-walk algorithm (the SSIDS/SILS analyse role)."""
    lib = load_symbolic()
    colptr = _i64(colptr)
    rowind = _i32(rowind)
    parent = np.zeros(n, np.int32)
    colcount = np.zeros(n, np.int32)
    nnz = lib.symbolic_count(n, _ptr64(colptr), _ptr(rowind),
                             _ptr(parent), _ptr(colcount))
    Lp = np.zeros(n + 1, np.int64)
    Li = np.zeros(int(nnz), np.int32)
    lib.symbolic_pattern(n, _ptr64(colptr), _ptr(rowind), _ptr(parent),
                         _ptr(colcount), _ptr64(Lp), _ptr(Li))
    return parent, colcount, Lp, Li
