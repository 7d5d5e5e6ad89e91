"""Symmetric permutations / reordering.

No reference counterpart — the reference factors matrices in given order.
Reordering is standard large-scale practice: RCM reduces bandwidth (gather
locality for SpMM; Cholesky fill) before factorization. ``permute_symmetric``
applies P·A·Pᵀ; solvers then work in permuted space with
``x = Pᵀ·x_permuted``.
"""

from __future__ import annotations

import numpy as np

from ..runtime import symbolic
from ..utils.errors import NonSquareMatrix, check
from .csr import CSR


def rcm_permutation(a: CSR) -> np.ndarray:
    """RCM permutation from A's symmetrised pattern."""
    check(a.rows == a.cols, NonSquareMatrix, "rcm needs square")
    indptr, indices, _ = a.numpy()
    rows = np.repeat(np.arange(a.rows), np.diff(indptr))
    # symmetrise the pattern
    pr = np.concatenate([rows, indices])
    pc = np.concatenate([indices, rows])
    keys = np.unique(pr * a.rows + pc)
    sr, sc = keys // a.rows, keys % a.rows
    sp = np.zeros(a.rows + 1, dtype=np.int64)
    np.add.at(sp[1:], sr, 1)
    sp = np.cumsum(sp)
    return symbolic.rcm_ordering(a.rows, sp, sc)


def permute_symmetric(a: CSR, perm: np.ndarray) -> CSR:
    """P·A·Pᵀ: row/col i of the result is row/col ``perm[i]`` of ``a``."""
    check(a.rows == a.cols, NonSquareMatrix, "permute_symmetric needs square")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    indptr, indices, values = a.numpy()
    rows = np.repeat(np.arange(a.rows), np.diff(indptr))
    return CSR.from_coo_arrays(
        a.dims, inv[rows], inv[indices], values,
        sum_duplicates=False, drop_zeros=False,
    )


def apply_perm(x, perm: np.ndarray, inverse: bool = False):
    """Permute vector/matrix rows into (or out of) permuted space."""
    import jax.numpy as jnp

    perm = np.asarray(perm)
    if inverse:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.shape[0])
        perm = inv
    return jnp.asarray(x)[jnp.asarray(perm)]


def bandwidth(a: CSR) -> int:
    """Maximum |row − col| over stored entries."""
    indptr, indices, _ = a.numpy()
    if a.stored == 0:
        return 0
    rows = np.repeat(np.arange(a.rows), np.diff(indptr))
    return int(np.abs(rows - indices).max())
