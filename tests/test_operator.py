"""SparseOperator serving-path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.operator import SparseOperator
from basic_sparse_matrix_tpu.ops.spmm import spmm


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, n))
    return (m @ m.T + n * np.eye(n)).astype(np.float32)


def test_operator_matmul_and_solve_reuse():
    a_dense = _spd(24)
    op = SparseOperator(CSR.from_dense(a_dense))
    rng = np.random.default_rng(1)
    b = rng.standard_normal((24, 3)).astype(np.float32)
    assert np.allclose(np.asarray(op @ b), a_dense @ b, rtol=1e-4,
                       atol=1e-4)
    # solve twice: second call must reuse the cached factorization
    x1 = np.asarray(op.solve(b))
    assert op._direct is not None
    cached = op._direct
    x2 = np.asarray(op.solve(2 * b))
    assert op._direct is cached
    oracle = np.linalg.solve(a_dense.astype(np.float64), b)
    assert np.allclose(x1, oracle, rtol=1e-3, atol=1e-3)
    assert np.allclose(x2, 2 * oracle, rtol=1e-3, atol=1e-3)


def test_operator_cg():
    a_dense = _spd(30, seed=2)
    op = SparseOperator(CSR.from_dense(a_dense))
    rng = np.random.default_rng(3)
    b = rng.standard_normal(30).astype(np.float32)
    x, iters, res = op.solve_cg(b, tol=1e-8)
    assert res < 1e-6
    assert np.allclose(a_dense @ np.asarray(x), b, rtol=1e-3, atol=1e-3)
    # setup cached
    setup = op._pcg
    op.solve_cg(2 * b)
    assert op._pcg is setup


def test_csr_traced_through_jit():
    # CSR as a traced pytree argument: dispatch must fall back to the
    # general gather path and still be correct
    rng = np.random.default_rng(4)
    d = ((rng.random((20, 25)) < 0.3)
         * rng.standard_normal((20, 25))).astype(np.float32)
    a = CSR.from_dense(d)
    b = jnp.asarray(rng.standard_normal((25, 4)).astype(np.float32))

    @jax.jit
    def f(a, b):
        return spmm(a, b) * 2.0

    out = np.asarray(f(a, b))
    assert np.allclose(out, 2 * d @ b, rtol=1e-4, atol=1e-4)


def test_operator_spectral_methods():
    import numpy as np
    from basic_sparse_matrix_tpu import CSR, SparseOperator

    rng = np.random.default_rng(7)
    m = rng.normal(size=(48, 48)).astype(np.float32)
    spd = (m @ m.T + 48 * np.eye(48)).astype(np.float32)
    op = SparseOperator(CSR.from_dense(spd))
    ritz = np.asarray(op.eigen_values(k=48))
    true = np.linalg.eigvalsh(spd)
    np.testing.assert_allclose(ritz[-1], true[-1], rtol=1e-3)
    est = op.condition_estimate(k=48)
    assert est == __import__("pytest").approx(np.linalg.cond(spd), rel=0.05)
    assert op._lanczos is not None  # setup memoised


def test_operator_chebyshev():
    a_dense = _spd(30, seed=5)
    op = SparseOperator(CSR.from_dense(a_dense))
    rng = np.random.default_rng(6)
    b = rng.standard_normal(30).astype(np.float32)
    x, res = op.solve_chebyshev(b, iters=200)
    assert np.allclose(a_dense @ np.asarray(x), b, rtol=1e-3, atol=1e-3)
    # shares the Lanczos setup with the spectral methods
    setup = op._lanczos
    assert setup is not None
    op.solve_chebyshev(2 * b, iters=50)
    assert op._lanczos is setup


def test_operator_matmul_sparse():
    a_dense = _spd(24, seed=7)
    op = SparseOperator(CSR.from_dense(a_dense))
    c = op.matmul_sparse(CSR.from_dense(a_dense))
    assert np.allclose(np.asarray(c.todense()), a_dense @ a_dense,
                       rtol=1e-4, atol=1e-4)
