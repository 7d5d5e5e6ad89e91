"""Chebyshev semi-iterative solver (models/chebyshev.py,
parallel/chebyshev.py). Oracle: numpy dense solve."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.chebyshev import (
    chebyshev_solve,
    spectral_bounds,
)


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


def test_solves_laplacian_auto_bounds():
    a = _laplacian_2d(12)  # n=144
    dense = np.asarray(a.todense())
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.rows).astype(np.float32)
    x, res = chebyshev_solve(a, b, iters=200, lanczos_k=64)
    assert res < 1e-5
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                               rtol=2e-4, atol=2e-4)


def test_explicit_bounds_and_convergence_rate():
    a = _laplacian_2d(10)
    dense = np.asarray(a.todense())
    ev = np.linalg.eigvalsh(dense)
    b = np.ones(a.rows, np.float32)
    x, res = chebyshev_solve(a, b, iters=150,
                             bounds=(float(ev[0]), float(ev[-1])))
    assert res < 1e-5


def test_spectral_bounds_bracket_true_spectrum():
    a = _laplacian_2d(10)
    ev = np.linalg.eigvalsh(np.asarray(a.todense()))
    lo, hi = spectral_bounds(a, k=64)
    assert lo <= ev[0] + 1e-5 and hi >= ev[-1] - 1e-5


def test_indefinite_bounds_raise():
    a = CSR.from_dense(np.diag(np.array([-2.0, 1.0, 3.0], np.float32)))
    with pytest.raises(ValueError):
        spectral_bounds(a, k=3)


def test_distributed_matches_single_device():
    import jax

    from basic_sparse_matrix_tpu.parallel.chebyshev import (
        chebyshev_solve_sharded,
    )
    from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
    from basic_sparse_matrix_tpu.parallel.sharded import (
        put_sharded,
        shard_csr,
        unshard_rows,
    )

    a = _laplacian_2d(12)  # n=144
    rng = np.random.default_rng(1)
    b = rng.standard_normal(a.rows).astype(np.float32)
    mesh = row_mesh(8)
    sa = put_sharded(shard_csr(a, 8), mesh)
    xs, res_s = chebyshev_solve_sharded(sa, jax.numpy.asarray(b), mesh,
                                        iters=200, lanczos_k=64)
    xs = np.asarray(unshard_rows(xs, a.rows))
    assert res_s < 1e-5
    x1, _ = chebyshev_solve(a, b, iters=200, lanczos_k=64)
    np.testing.assert_allclose(xs, np.asarray(x1), rtol=2e-4, atol=2e-4)
    oracle = np.linalg.solve(np.asarray(a.todense()), b)
    np.testing.assert_allclose(xs, oracle, rtol=2e-4, atol=2e-4)
