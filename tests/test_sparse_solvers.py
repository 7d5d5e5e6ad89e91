"""Tests for the level-scheduled sparse solver paths (no reference
counterpart — the reference solves sequentially; SURVEY.md §7 step 4)."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import (
    analyze,
    cholesky_sparse,
    factorize,
)
from basic_sparse_matrix_tpu.models.sparse_triangular import (
    build_schedule,
    solve_triangular_sparse,
)
from basic_sparse_matrix_tpu.runtime import symbolic


def _laplacian_1d(n):
    d = 4.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    return d.astype(np.float32)


def _laplacian_2d(k):
    # k×k grid 5-point stencil, n = k²
    n = k * k
    a = np.zeros((n, n), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            r = i * k + j
            a[r, r] = 4.0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < k and 0 <= jj < k:
                    a[r, ii * k + jj] = -1.0
    return a


def _random_spd(rng, n, density=0.15):
    m = (rng.random((n, n)) < density) * rng.standard_normal((n, n))
    a = (m @ m.T + n * np.eye(n)).astype(np.float32)
    return a


class TestSymbolic:
    def test_etree_tridiag(self):
        # tridiagonal → chain etree
        n = 6
        a = _laplacian_1d(n)
        rows, cols = np.nonzero(np.tril(a, -1))
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr[1:], rows, 1)
        indptr = np.cumsum(indptr)
        parent = symbolic.etree(n, indptr, cols)
        assert parent.tolist() == [1, 2, 3, 4, 5, -1]

    def test_fill_pattern_matches_dense(self):
        # pattern of L from symbolic must cover the dense factor's nonzeros
        rng = np.random.default_rng(0)
        a = _random_spd(rng, 20, density=0.2)
        csr = CSR.from_dense(a)
        sched = analyze(csr)
        ldense = np.linalg.cholesky(a.astype(np.float64))
        pat = np.zeros_like(a, dtype=bool)
        cols = np.repeat(np.arange(20), np.diff(sched.l_col_ptr))
        pat[sched.l_row_idx, cols] = True
        assert pat[np.abs(ldense) > 1e-10].all()


class TestSparseCholesky:
    @pytest.mark.parametrize("case", ["tridiag", "lap2d", "dense_spd",
                                      "reference0", "reference1"])
    def test_matches_dense_factor(self, case):
        rng = np.random.default_rng(1)
        if case == "tridiag":
            a = _laplacian_1d(32)
        elif case == "lap2d":
            a = _laplacian_2d(6)
        elif case == "dense_spd":
            a = _random_spd(rng, 24, density=0.3)
        elif case == "reference0":
            # sparse.rs:1031-1060
            a = np.asarray([[4.0, 12, -16], [12, 37, -43], [-16, -43, 98]],
                           dtype=np.float32)
        else:
            # sparse.rs:1063-1080
            a = np.asarray([[8.0, 0, 0, 0], [0, 7, 1, 0], [0, 1, 3, 0],
                            [0, 0, 0, 2]], dtype=np.float32)
        l = cholesky_sparse(CSR.from_dense(a))
        ref = np.linalg.cholesky(a.astype(np.float64))
        assert np.allclose(np.asarray(l.todense()), ref, rtol=1e-4,
                           atol=1e-4)

    def test_factorize_jits_once(self):
        a = _laplacian_1d(16)
        csr = CSR.from_dense(a)
        sched = analyze(csr)
        lv1 = factorize(sched, csr.values)
        lv2 = factorize(sched, csr.values * 1.0)
        assert np.allclose(np.asarray(lv1), np.asarray(lv2))


class TestSparseTriangular:
    def test_forward_matches_scipy(self):
        rng = np.random.default_rng(2)
        a = _random_spd(rng, 30, density=0.2)
        lref = np.linalg.cholesky(a.astype(np.float64)).astype(np.float32)
        l = CSR.from_dense(lref)
        b = rng.standard_normal((30, 4)).astype(np.float32)
        x = np.asarray(solve_triangular_sparse(l, b, lower=True))
        oracle = np.linalg.solve(lref.astype(np.float64), b)
        assert np.allclose(x, oracle, rtol=1e-3, atol=1e-3)

    def test_backward_matches_scipy(self):
        rng = np.random.default_rng(3)
        a = _random_spd(rng, 25, density=0.2)
        uref = np.linalg.cholesky(a.astype(np.float64)).T.astype(np.float32)
        u = CSR.from_dense(uref)
        b = rng.standard_normal(25).astype(np.float32)
        x = np.asarray(solve_triangular_sparse(u, b, lower=False))
        oracle = np.linalg.solve(uref.astype(np.float64), b)
        assert np.allclose(x.ravel(), oracle.ravel(), rtol=1e-3, atol=1e-3)

    def test_schedule_reuse_multi_rhs(self):
        l = CSR.from_dense(np.asarray(
            [[5.0, 0, 0], [8, 2, 0], [3, 7, 1]], dtype=np.float32))
        sched = build_schedule(l, lower=True)
        # reference forward_substitution golden (lib.rs:74-94)
        b = np.asarray([[7.0], [3.0], [1.0]], dtype=np.float32)
        y = np.asarray(solve_triangular_sparse(l, b, sched))
        assert np.allclose(y.ravel(), [7 / 5, -4.1, 25.5], rtol=1e-5)
        # 2-RHS batch through the same schedule
        b2 = np.concatenate([b, 2 * b], axis=1)
        y2 = np.asarray(solve_triangular_sparse(l, b2, sched))
        assert np.allclose(y2[:, 1], 2 * y.ravel(), rtol=1e-5)

    def test_full_sparse_solve_pipeline(self):
        # chol → fwd → bwd entirely through the sparse level-scheduled path,
        # against the reference solve golden (lib.rs:120-138)
        a = CSR.from_dense(np.asarray(
            [[8.0, 0, 0, 0], [0, 7, 1, 0], [0, 1, 3, 0], [0, 0, 0, 2]],
            dtype=np.float32))
        b = np.asarray([[5.0], [2.0], [8.0], [1.0]], dtype=np.float32)
        l = cholesky_sparse(a)
        y = solve_triangular_sparse(l, b, lower=True)
        x = np.asarray(solve_triangular_sparse(l.transpose(), y, lower=False))
        assert np.allclose(x.ravel(), [0.625, -0.1, 2.6999998, 0.5],
                           rtol=1e-4)
