"""Host symbolic analysis: ctypes bindings over the native C++ runtime.

Builds ``native/csparse.cpp`` with g++ on first import (cached as a .so next
to the source) and falls back to equivalent pure-numpy implementations when a
toolchain is unavailable. These produce the static schedules (fill patterns,
level sets) that the TPU numeric phases consume — the division of labour the
reference crate doesn't have because it interleaves symbolic and numeric work
in scalar loops (e.g. ``cholesky_decomp``'s get_row_complete-per-k,
``/root/reference/src/sparse.rs:687-712``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "csparse.cpp")
_SO = os.path.join(_HERE, "native", "csparse.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_I64 = ctypes.POINTER(ctypes.c_int64)


def _build() -> Optional[ctypes.CDLL]:
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        for name, argn in [
            ("coo_to_csr_perm", 6), ("etree", 4), ("chol_row_counts", 5),
            ("chol_pattern", 6), ("level_sets", 4), ("postorder", 3),
        ]:
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_int64] * (2 if name == "coo_to_csr_perm"
                                              else 1) + [_I64] * (argn - (
                                                  2 if name == "coo_to_csr_perm" else 1))
        return lib
    except Exception:
        return None


def native_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        with _lib_lock:
            if _lib is None:
                _lib = _build() or False  # False = tried and failed
    return _lib or None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_I64)


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int64)


# --------------------------------------------------------------------------- #
# Elimination tree
# --------------------------------------------------------------------------- #
def etree(n: int, indptr, indices) -> np.ndarray:
    """Elimination tree from the strictly-lower CSR pattern of a symmetric
    matrix. ``parent[i] == -1`` marks roots."""
    indptr, indices = _c64(indptr), _c64(indices)
    parent = np.empty(n, dtype=np.int64)
    lib = native_lib()
    if lib is not None:
        lib.etree(n, _ptr(indptr), _ptr(indices), _ptr(parent))
        return parent
    # numpy/python fallback (Liu's algorithm with path compression)
    parent[:] = -1
    ancestor = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            k = indices[p]
            while k != -1 and k < i:
                nxt = ancestor[k]
                ancestor[k] = i
                if nxt == -1:
                    parent[k] = i
                k = nxt
    return parent


# --------------------------------------------------------------------------- #
# Symbolic Cholesky fill pattern
# --------------------------------------------------------------------------- #
def chol_symbolic(n: int, indptr, indices) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
    """Full symbolic factorization: returns (parent, l_indptr, l_indices)
    where (l_indptr, l_indices) is the row-wise CSR pattern of L including
    the diagonal (sorted, diagonal last in each row)."""
    indptr, indices = _c64(indptr), _c64(indices)
    parent = etree(n, indptr, indices)
    lib = native_lib()
    counts = np.empty(n, dtype=np.int64)
    if lib is not None:
        lib.chol_row_counts(n, _ptr(indptr), _ptr(indices), _ptr(parent),
                            _ptr(counts))
        l_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=l_indptr[1:])
        l_indices = np.empty(int(l_indptr[-1]), dtype=np.int64)
        lib.chol_pattern(n, _ptr(indptr), _ptr(indices), _ptr(parent),
                         _ptr(l_indptr), _ptr(l_indices))
        return parent, l_indptr, l_indices
    # fallback
    mark = np.full(n, -1, dtype=np.int64)
    rows = []
    for i in range(n):
        row = []
        mark[i] = i
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            while j != -1 and j < i and mark[j] != i:
                mark[j] = i
                row.append(j)
                j = parent[j]
        row.sort()
        row.append(i)
        rows.append(row)
    counts = np.array([len(r) for r in rows], dtype=np.int64)
    l_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=l_indptr[1:])
    l_indices = np.concatenate([np.asarray(r, dtype=np.int64) for r in rows])
    return parent, l_indptr, l_indices


# --------------------------------------------------------------------------- #
# Level sets for triangular solves
# --------------------------------------------------------------------------- #
def level_sets(n: int, indptr, indices) -> Tuple[np.ndarray, int]:
    """Dependency levels for a lower-triangular solve on pattern (indptr,
    indices): rows in the same level are independent and solve in one batched
    TPU step. Returns (level per row, number of levels)."""
    indptr, indices = _c64(indptr), _c64(indices)
    level = np.zeros(n, dtype=np.int64)
    lib = native_lib()
    if lib is not None:
        nlev = int(lib.level_sets(n, _ptr(indptr), _ptr(indices),
                                  _ptr(level)))
        return level, nlev
    nlev = 0
    for i in range(n):
        lv = 0
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            if j < i:
                lv = max(lv, level[j] + 1)
        level[i] = lv
        nlev = max(nlev, lv + 1)
    return level, nlev


def postorder(parent: np.ndarray) -> np.ndarray:
    parent = _c64(parent)
    n = parent.shape[0]
    post = np.empty(n, dtype=np.int64)
    lib = native_lib()
    if lib is not None:
        lib.postorder(n, _ptr(parent), _ptr(post))
        return post
    # fallback: iterative DFS
    head = np.full(n, -1, dtype=np.int64)
    nxt = np.full(n, -1, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        p = parent[i]
        if p != -1:
            nxt[i] = head[p]
            head[p] = i
    out = []
    for root in range(n):
        if parent[root] != -1:
            continue
        stack = [root]
        while stack:
            node = stack[-1]
            child = head[node]
            if child != -1:
                head[node] = nxt[child]
                stack.append(child)
            else:
                stack.pop()
                out.append(node)
    return np.asarray(out, dtype=np.int64)


def coo_to_csr_perm(n_rows: int, rows, cols) -> Tuple[np.ndarray, np.ndarray]:
    """Native counting-sort COO→CSR permutation: returns (indptr, perm) such
    that applying ``perm`` to the triplet arrays yields row-major sorted
    order. Fallback: numpy lexsort."""
    rows, cols = _c64(rows), _c64(cols)
    nnz = rows.shape[0]
    lib = native_lib()
    if lib is not None:
        indptr = np.empty(n_rows + 1, dtype=np.int64)
        perm = np.empty(nnz, dtype=np.int64)
        lib.coo_to_csr_perm(n_rows, nnz, _ptr(rows), _ptr(cols),
                            _ptr(indptr), _ptr(perm))
        return indptr, perm
    perm = np.lexsort((cols, rows))
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(indptr[1:], rows, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, perm
