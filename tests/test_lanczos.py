"""Lanczos eigensolver (models/lanczos.py).

The sparse-regime counterpart of the reference's ``eigen_values``
(``/root/reference/src/sparse.rs:758-774``): extremal eigenvalues without
densification. Oracles are numpy's full dense eigvalsh on small operands.
"""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.lanczos import (
    LanczosSetup,
    condition_estimate,
    eigen_values_lanczos,
    extremal_eigen_values,
)
from basic_sparse_matrix_tpu.utils.errors import NonSquareMatrix


def _laplacian_2d(k):
    """k×k grid 5-point Laplacian (SPD, n = k²)."""
    n = k * k
    rows, cols, vals = [], [], []
    for i in range(k):
        for j in range(k):
            p = i * k + j
            rows.append(p); cols.append(p); vals.append(4.0)
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                qi, qj = i + di, j + dj
                if 0 <= qi < k and 0 <= qj < k:
                    rows.append(p); cols.append(qi * k + qj)
                    vals.append(-1.0)
    return CSR.from_coo_arrays((n, n), np.array(rows), np.array(cols),
                               np.array(vals, np.float32))


def test_diagonal_exact():
    d = np.array([1.0, 3.0, 7.0, 10.0], np.float32)
    a = CSR.from_dense(np.diag(d))
    ritz = np.asarray(eigen_values_lanczos(a, k=4))
    np.testing.assert_allclose(np.sort(ritz), np.sort(d), atol=1e-5)


def test_full_k_equals_spectrum():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(24, 24)).astype(np.float32)
    sym = (m + m.T) / 2
    a = CSR.from_dense(sym)
    ritz = np.asarray(eigen_values_lanczos(a, k=24))
    true = np.linalg.eigvalsh(sym)
    np.testing.assert_allclose(ritz, true, atol=5e-4 * np.abs(true).max())


def test_laplacian_extremes_converge():
    a = _laplacian_2d(20)  # n = 400
    dense = np.asarray(a.todense())
    true = np.linalg.eigvalsh(dense)
    lo, hi = extremal_eigen_values(a, k=64)
    assert abs(hi - true[-1]) <= 1e-3 * true[-1]
    assert abs(lo - true[0]) <= 1e-2 * true[0] + 1e-4


def test_k_clamped_to_n():
    a = CSR.from_dense(np.diag(np.array([2.0, 5.0], np.float32)))
    ritz = np.asarray(eigen_values_lanczos(a, k=50))
    assert ritz.shape == (2,)
    np.testing.assert_allclose(np.sort(ritz), [2.0, 5.0], atol=1e-5)


def test_breakdown_restart():
    # Start vector has support on a tiny invariant subspace: identity block
    # plus two distinct eigenvalues; Lanczos breaks down after a couple of
    # steps and must restart to resolve the rest of the spectrum.
    d = np.ones(16, np.float32)
    d[0], d[1] = 9.0, 5.0
    a = CSR.from_dense(np.diag(d))
    ritz = np.asarray(eigen_values_lanczos(a, k=8, seed=3))
    assert abs(ritz[-1] - 9.0) < 1e-3
    assert abs(ritz.min() - 1.0) < 1e-3


def test_condition_estimate_spd():
    a = _laplacian_2d(12)  # n = 144
    true = np.linalg.cond(np.asarray(a.todense()))
    est = condition_estimate(a, k=96)
    assert est == pytest.approx(true, rel=0.05)


def test_condition_estimate_indefinite_is_inf():
    a = CSR.from_dense(np.diag(np.array([-1.0, 2.0, 3.0], np.float32)))
    assert condition_estimate(a, k=3) == float("inf")


def test_setup_amortised_reuse():
    a = _laplacian_2d(8)
    setup = LanczosSetup.build(a)
    r1 = np.asarray(eigen_values_lanczos(a, k=16, setup=setup))
    r2 = np.asarray(eigen_values_lanczos(a, k=16, setup=setup))
    np.testing.assert_array_equal(r1, r2)


def test_non_square_raises():
    a = CSR.from_coo_arrays((2, 3), np.array([0]), np.array([1]),
                            np.array([1.0], np.float32))
    with pytest.raises(NonSquareMatrix):
        eigen_values_lanczos(a, k=2)
