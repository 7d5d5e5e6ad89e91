"""Distributed SpGEMM (row-sharded numeric phase) on the 8-device mesh."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.spgemm_sparse import (
    plan_spgemm_sharded,
    spgemm_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    return row_mesh(8)


def _random_sparse(rows, cols, density, seed):
    rng = np.random.default_rng(seed)
    d = ((rng.random((rows, cols)) < density)
         * rng.standard_normal((rows, cols))).astype(np.float32)
    return d


def test_spgemm_sharded_matches_scipy(mesh8):
    da = _random_sparse(100, 80, 0.05, 0)
    db = _random_sparse(80, 60, 0.05, 1)
    c = spgemm_sharded(CSR.from_dense(da), CSR.from_dense(db), mesh8)
    ref = da @ db
    assert c.rows == 100 and c.cols == 60
    assert np.allclose(np.asarray(c.todense()), ref, rtol=1e-4, atol=1e-5)


def test_spgemm_sharded_skewed_b(mesh8):
    # one dense row in B — the case the bounded expansion cannot handle
    da = _random_sparse(64, 64, 0.03, 2)
    db = _random_sparse(64, 64, 0.01, 3)
    db[5, :] = 1.0
    c = spgemm_sharded(CSR.from_dense(da), CSR.from_dense(db), mesh8)
    assert np.allclose(np.asarray(c.todense()), da @ db, rtol=1e-4,
                       atol=1e-5)


def test_spgemm_sharded_plan_reuse(mesh8):
    da = _random_sparse(48, 48, 0.05, 4)
    db = _random_sparse(48, 48, 0.05, 5)
    a, b = CSR.from_dense(da), CSR.from_dense(db)
    plans = plan_spgemm_sharded(a, b, 8)
    c1 = spgemm_sharded(a, b, mesh8, plans=plans)
    # same patterns, new values: reuse the host plans
    a2 = CSR(indptr=a.indptr, indices=a.indices, values=2.0 * a.values,
             rows=a.rows, cols=a.cols)
    c2 = spgemm_sharded(a2, b, mesh8, plans=plans)
    assert np.allclose(np.asarray(c2.todense()),
                       2.0 * np.asarray(c1.todense()), rtol=1e-5)


def test_spgemm_sharded_rows_fewer_than_shards(mesh8):
    da = _random_sparse(6, 6, 0.4, 6)
    db = _random_sparse(6, 6, 0.4, 7)
    c = spgemm_sharded(CSR.from_dense(da), CSR.from_dense(db), mesh8)
    assert np.allclose(np.asarray(c.todense()), da @ db, rtol=1e-4,
                       atol=1e-5)
