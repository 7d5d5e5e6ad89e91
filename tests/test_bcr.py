"""Tests for block cyclic reduction (``models/bcr.py``) — oracle parity
with dense solves and with the banded scan path."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models import banded, bcr


def _banded_spd(rng, n, bw):
    a = np.zeros((n, n), dtype=np.float32)
    for d in range(1, bw + 1):
        vals = rng.standard_normal(n - d).astype(np.float32) * 0.3
        a += np.diag(vals, k=d) + np.diag(vals, k=-d)
    a += (2.0 * bw + 2.0) * np.eye(n, dtype=np.float32)
    return a


@pytest.mark.parametrize("n,bw,nb", [
    (16, 1, 8),     # m=2 (one level)
    (64, 3, 8),     # m=8, power of two
    (70, 3, 8),     # m=9 -> padded to 16
    (96, 7, 8),     # m=12 -> padded to 16
    (24, 5, 24),    # m=1 (degenerate: no levels)
])
def test_bcr_matches_dense_oracle(n, bw, nb):
    rng = np.random.default_rng(n + bw)
    dense = _banded_spd(rng, n, bw)
    solver = bcr.prepare_bcr(CSR.from_dense(dense), nb)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    x = np.asarray(solver.solve(b))
    np.testing.assert_allclose(x, np.linalg.solve(dense, b),
                               rtol=3e-4, atol=3e-4)


def test_bcr_matches_banded_scan():
    rng = np.random.default_rng(5)
    dense = _banded_spd(rng, 200, 6)
    a = CSR.from_dense(dense)
    b = rng.standard_normal((200, 4)).astype(np.float32)
    x_scan = np.asarray(banded.solve_banded(a, b))
    x_bcr = np.asarray(bcr.prepare_bcr(a).solve(b))
    np.testing.assert_allclose(x_bcr, x_scan, rtol=2e-4, atol=2e-4)


def test_bcr_1d_rhs():
    rng = np.random.default_rng(8)
    dense = _banded_spd(rng, 40, 2)
    x = bcr.prepare_bcr(CSR.from_dense(dense), 8).solve(
        np.ones(40, dtype=np.float32))
    assert np.asarray(x).shape == (40,)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(dense, np.ones(40)),
                               rtol=3e-4, atol=3e-4)


def test_bcr_factor_reuse():
    # one factor, many right-hand sides — results match fresh solves
    rng = np.random.default_rng(9)
    dense = _banded_spd(rng, 80, 4)
    solver = bcr.prepare_bcr(CSR.from_dense(dense), 8)
    for _ in range(3):
        b = rng.standard_normal((80, 2)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(solver.solve(b)),
                                   np.linalg.solve(dense, b),
                                   rtol=3e-4, atol=3e-4)


def test_direct_solver_dispatches_bcr():
    from basic_sparse_matrix_tpu.models.solve import prepare_direct
    from basic_sparse_matrix_tpu.utils.config import (
        Config,
        get_config,
        set_config,
    )

    rng = np.random.default_rng(12)
    dense = _banded_spd(rng, 120, 5)
    b = rng.standard_normal((120, 3)).astype(np.float32)
    oracle = np.linalg.solve(dense, b)
    old = get_config()
    try:
        set_config(Config(**{**old.__dict__, "banded_min_steps": 2}))
        s = prepare_direct(CSR.from_dense(dense))
        assert s.kind == "banded-bcr"
        np.testing.assert_allclose(np.asarray(s.solve(b)), oracle,
                                   rtol=3e-4, atol=3e-4)
        set_config(Config(**{**old.__dict__, "banded_min_steps": 2,
                             "banded_solver": "scan"}))
        s2 = prepare_direct(CSR.from_dense(dense))
        assert s2.kind == "banded"
        np.testing.assert_allclose(np.asarray(s2.solve(b)), oracle,
                                   rtol=3e-4, atol=3e-4)
    finally:
        set_config(old)


def test_bcr_solver_checkpoint_roundtrip(tmp_path):
    from basic_sparse_matrix_tpu.runtime import checkpoint as cp

    rng = np.random.default_rng(41)
    dense = _banded_spd(rng, 72, 4)
    solver = bcr.prepare_bcr(CSR.from_dense(dense), 8)
    p = str(tmp_path / "bcrfac.npz")
    cp.save_banded(p, solver)
    solver2 = cp.load_banded(p)
    b = rng.standard_normal((72, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(solver.solve(b)),
                                  np.asarray(solver2.solve(b)))


def test_direct_solver_checkpoint_includes_permutation(tmp_path):
    # DirectSolver's banded factor lives in PERMUTED space; save_direct must
    # carry the permutation so a reload solves the original system
    from basic_sparse_matrix_tpu.models.solve import prepare_direct
    from basic_sparse_matrix_tpu.runtime import checkpoint as cp
    from basic_sparse_matrix_tpu.utils.config import (
        Config,
        get_config,
        set_config,
    )

    rng = np.random.default_rng(43)
    # a 2D Laplacian so RCM actually permutes
    k = 10
    n = k * k
    dense = np.zeros((n, n), np.float32)
    for i in range(k):
        for j in range(k):
            r = i * k + j
            dense[r, r] = 4.0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < k and 0 <= jj < k:
                    dense[r, ii * k + jj] = -1.0
    b = rng.standard_normal((n, 2)).astype(np.float32)
    old = get_config()
    try:
        set_config(Config(**{**old.__dict__, "banded_min_steps": 2}))
        for backend in ("bcr", "scan"):
            set_config(Config(**{**old.__dict__, "banded_min_steps": 2,
                                 "banded_solver": backend}))
            s = prepare_direct(CSR.from_dense(dense))
            assert s.perm is not None
            p = str(tmp_path / f"direct_{backend}.npz")
            cp.save_direct(p, s)
            s2 = cp.load_direct(p)
            np.testing.assert_allclose(np.asarray(s2.solve(b)),
                                       np.linalg.solve(dense, b),
                                       rtol=1e-3, atol=1e-3)
            np.testing.assert_array_equal(np.asarray(s.solve(b)),
                                          np.asarray(s2.solve(b)))
    finally:
        set_config(old)
