"""Distributed Lanczos (parallel/lanczos.py) on the 8-device CPU mesh.

Oracles: numpy dense eigvalsh and the single-device Lanczos
(models/lanczos.py) run with the same start vector semantics.
"""

import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.parallel.lanczos import (
    eigen_values_lanczos_sharded,
    lanczos_sharded,
)
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.sharded import put_sharded, shard_csr


def _laplacian_2d(k):
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


def _sharded(a, mesh, ndev=8):
    return put_sharded(shard_csr(a, ndev), mesh)


def test_extremes_match_dense_oracle():
    a = _laplacian_2d(12)  # n = 144, padded to 8-multiple internally
    mesh = row_mesh(8)
    sa = _sharded(a, mesh)
    ritz = np.asarray(
        eigen_values_lanczos_sharded(sa, mesh, k=64, n=a.rows))
    true = np.linalg.eigvalsh(np.asarray(a.todense()))
    assert abs(ritz[-1] - true[-1]) <= 1e-3 * true[-1]
    assert abs(ritz[0] - true[0]) <= 1e-2 * true[0] + 1e-4


def test_tridiagonal_coefficients_sane():
    a = _laplacian_2d(8)  # n = 64
    mesh = row_mesh(8)
    sa = _sharded(a, mesh)
    alphas, betas = lanczos_sharded(sa, mesh, k=16, n=a.rows)
    alphas, betas = np.asarray(alphas), np.asarray(betas)
    assert alphas.shape == (16,) and betas.shape == (15,)
    # Gershgorin: every alpha (Rayleigh quotient) lies in the spectrum hull.
    assert np.all(alphas > 0.0) and np.all(alphas < 8.0)
    assert np.all(betas >= 0.0)


def test_full_k_exact_spectrum():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(32, 32)).astype(np.float32)
    sym = ((m + m.T) / 2 + 8 * np.eye(32)).astype(np.float32)
    a = CSR.from_dense(sym)
    mesh = row_mesh(8)
    sa = _sharded(a, mesh)
    ritz = np.asarray(eigen_values_lanczos_sharded(sa, mesh, k=32, n=32))
    true = np.linalg.eigvalsh(sym)
    np.testing.assert_allclose(ritz, true, atol=5e-4 * np.abs(true).max())


def test_matches_single_device_ritz_extremes():
    from basic_sparse_matrix_tpu.models.lanczos import extremal_eigen_values

    a = _laplacian_2d(10)  # n = 100
    mesh = row_mesh(8)
    sa = _sharded(a, mesh)
    ritz = np.asarray(eigen_values_lanczos_sharded(sa, mesh, k=48, n=a.rows))
    lo, hi = extremal_eigen_values(a, k=48)
    assert abs(ritz[-1] - hi) < 1e-3 * max(abs(hi), 1.0)
    assert abs(ritz[0] - lo) < 1e-2 * max(abs(lo), 1e-3) + 1e-4
