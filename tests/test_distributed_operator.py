"""DistributedOperator (mesh-resident serving wrapper) on the 8-device mesh."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.operator import DistributedOperator


@pytest.fixture(scope="module")
def op36():
    from tests.test_distributed_solvers import _lap2d

    a = _lap2d(6)
    return a, DistributedOperator(CSR.from_dense(a), row_mesh(8))


def test_matvec_matmul(op36):
    a, op = op36
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    b = rng.standard_normal((a.shape[1], 4)).astype(np.float32)
    assert np.allclose(np.asarray(op.matvec(x)), a @ x, rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(op.matmul(b)), a @ b, rtol=1e-4, atol=1e-4)


def test_solves(op36):
    a, op = op36
    rng = np.random.default_rng(1)
    b = rng.standard_normal(a.shape[0]).astype(np.float32)
    ref = np.linalg.solve(a.astype(np.float64), b)
    for solver in (op.solve_cg, op.solve_pcg, op.solve_chebyshev):
        x = np.asarray(solver(b, iters=80))
        assert np.allclose(x, ref, rtol=1e-3, atol=1e-3), solver.__name__
    # lazy prep is cached
    assert op._lfac is not None and op._bounds is not None


def test_eigen_values(op36):
    a, op = op36
    ritz = np.asarray(op.eigen_values(k=a.shape[0]))
    ref = np.linalg.eigvalsh(a.astype(np.float64))
    assert np.allclose(ritz[0], ref[0], rtol=1e-3)
    assert np.allclose(ritz[-1], ref[-1], rtol=1e-3)


def test_matmul_sparse(op36):
    a, op = op36
    rng = np.random.default_rng(9)
    db = ((rng.random(a.shape) < 0.1)
          * rng.standard_normal(a.shape)).astype(np.float32)
    other = CSR.from_dense(db)
    c = op.matmul_sparse(other)
    assert np.allclose(np.asarray(c.todense()), a @ db, rtol=1e-4, atol=1e-4)
    assert len(op._spgemm_plans) == 1
    op.matmul_sparse(other)  # plan reused
    assert len(op._spgemm_plans) == 1
