"""RCM reordering tests: bandwidth and Cholesky-fill reduction."""

import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import analyze
from basic_sparse_matrix_tpu.ops.reorder import (
    apply_perm,
    bandwidth,
    permute_symmetric,
    rcm_permutation,
)


def _shuffled_banded(n=60, bw=3, seed=0):
    rng = np.random.default_rng(seed)
    a = 4.0 * np.eye(n)
    for k in range(1, bw + 1):
        a -= 0.5 ** k * (np.eye(n, k=k) + np.eye(n, k=-k))
    p = rng.permutation(n)
    return a[p][:, p].astype(np.float32)


def test_rcm_reduces_bandwidth():
    a = CSR.from_dense(_shuffled_banded())
    before = bandwidth(a)
    perm = rcm_permutation(a)
    after = bandwidth(permute_symmetric(a, perm))
    assert after < before
    assert after <= 6  # near the original band of 3


def test_rcm_reduces_cholesky_fill():
    a = CSR.from_dense(_shuffled_banded(n=80, bw=2, seed=1))
    fill_before = analyze(a).nnz_l
    perm = rcm_permutation(a)
    fill_after = analyze(permute_symmetric(a, perm)).nnz_l
    assert fill_after < fill_before


def test_permuted_solve_roundtrip():
    from basic_sparse_matrix_tpu.models.solve import solve_sparse

    a_dense = _shuffled_banded(n=40, bw=2, seed=2)
    a = CSR.from_dense(a_dense)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(40).astype(np.float32)
    perm = rcm_permutation(a)
    ap = permute_symmetric(a, perm)
    bp = apply_perm(b, perm)
    xp = np.asarray(solve_sparse(ap, bp)).ravel()
    x = np.asarray(apply_perm(xp, perm, inverse=True))
    assert np.allclose(a_dense @ x, b, rtol=1e-3, atol=1e-3)


def test_perm_is_permutation():
    a = CSR.from_dense(_shuffled_banded(n=30))
    perm = rcm_permutation(a)
    assert sorted(perm.tolist()) == list(range(30))
