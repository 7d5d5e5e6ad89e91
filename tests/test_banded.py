"""Tests for the banded (block-tridiagonal) factorization path
(``models/banded.py``) — no reference counterpart; value-level parity with
the dense Cholesky oracle (reference semantics, sparse.rs:682-714)."""

import numpy as np
import pytest

import jax

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models import banded
from basic_sparse_matrix_tpu.models.cholesky import cholesky_auto
from basic_sparse_matrix_tpu.models.solve import solve_sparse
from basic_sparse_matrix_tpu.utils.config import (
    Config,
    get_config,
    set_config,
)
from basic_sparse_matrix_tpu.utils.errors import IncorrectDimensions


def _laplacian_1d(n):
    return (4.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(
        np.float32)


def _laplacian_2d(k):
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


def _banded_spd(rng, n, bw):
    a = np.zeros((n, n), dtype=np.float32)
    for d in range(1, bw + 1):
        vals = rng.standard_normal(n - d).astype(np.float32) * 0.3
        a += np.diag(vals, k=d) + np.diag(vals, k=-d)
    a += (2.0 * bw + 2.0) * np.eye(n, dtype=np.float32)
    return a


class TestBlocks:
    def test_bandwidth(self):
        a = CSR.from_dense(_laplacian_2d(5))
        assert banded.bandwidth(a) == 5
        assert banded.bandwidth(CSR.from_dense(np.eye(4))) == 0

    def test_block_size_covers_band(self):
        assert banded.block_size_for(5) == 8
        assert banded.block_size_for(65) == 72
        # floored for narrow bands on large n to bound scan steps
        assert banded.block_size_for(1, 4096) >= 32

    def test_blocks_roundtrip(self):
        rng = np.random.default_rng(0)
        n, bw, nb = 37, 3, 8
        dense = _banded_spd(rng, n, bw)
        D, E = banded.band_blocks(CSR.from_dense(dense), nb)
        m = -(-n // nb)
        rebuilt = np.zeros((m * nb, m * nb), dtype=np.float32)
        for i in range(m):
            rebuilt[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb] = D[i]
            if i + 1 < m:
                rebuilt[(i + 1) * nb:(i + 2) * nb, i * nb:(i + 1) * nb] = E[i]
                rebuilt[i * nb:(i + 1) * nb,
                        (i + 1) * nb:(i + 2) * nb] = E[i].T
        np.testing.assert_allclose(rebuilt[:n, :n], dense)
        # pad region is a decoupled identity
        np.testing.assert_allclose(rebuilt[n:, n:], np.eye(m * nb - n))
        assert not rebuilt[:n, n:].any()

    def test_band_too_wide_raises(self):
        a = CSR.from_dense(_banded_spd(np.random.default_rng(1), 32, 9))
        with pytest.raises(IncorrectDimensions):
            banded.band_blocks(a, 8)


class TestFactorSolve:
    @pytest.mark.parametrize("n,bw", [(16, 1), (37, 3), (100, 7), (130, 12)])
    def test_factor_matches_dense_oracle(self, n, bw):
        rng = np.random.default_rng(n)
        dense = _banded_spd(rng, n, bw)
        fac = banded.factor_banded(CSR.from_dense(dense))
        l = banded.assemble_factor_csr(fac).todense()
        np.testing.assert_allclose(np.asarray(l), np.linalg.cholesky(dense),
                                   rtol=2e-5, atol=2e-5)

    def test_solve_matches_oracle_multi_rhs(self):
        rng = np.random.default_rng(7)
        dense = _banded_spd(rng, 75, 5)
        b = rng.standard_normal((75, 4)).astype(np.float32)
        x = banded.solve_banded(CSR.from_dense(dense), b)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                                   rtol=2e-4, atol=2e-4)

    def test_solve_1d_rhs_shape(self):
        rng = np.random.default_rng(8)
        dense = _banded_spd(rng, 20, 2)
        b = rng.standard_normal(20).astype(np.float32)
        x = banded.solve_banded(CSR.from_dense(dense), b)
        assert np.asarray(x).shape == (20,)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                                   rtol=2e-4, atol=2e-4)

    def test_single_block(self):
        # n <= nb: degenerate m == 1, empty subdiagonal scan
        rng = np.random.default_rng(9)
        dense = _banded_spd(rng, 8, 2)
        x = banded.solve_banded(CSR.from_dense(dense),
                                np.ones(8, dtype=np.float32), nb=8)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(dense, np.ones(8)),
                                   rtol=2e-4, atol=2e-4)

    def test_laplacian_2d_via_rcm(self):
        # the headline shape: 2D Laplacian, RCM-banded, through solve_sparse
        from basic_sparse_matrix_tpu.ops.reorder import (
            permute_symmetric,
            rcm_permutation,
        )

        dense = _laplacian_2d(12)
        a = CSR.from_dense(dense)
        perm = rcm_permutation(a)
        ap = permute_symmetric(a, perm)
        assert banded.banded_block_choice(ap) is not None
        rng = np.random.default_rng(3)
        b = rng.standard_normal((144, 3)).astype(np.float32)
        x = banded.solve_banded(ap, np.asarray(b)[perm])
        xp = np.empty_like(np.asarray(x))
        xp[perm] = np.asarray(x)
        np.testing.assert_allclose(xp, np.linalg.solve(dense, b),
                                   rtol=5e-4, atol=5e-4)


class TestDispatch:
    def _with_cfg(self, **kw):
        return Config(**{**get_config().__dict__, **kw})

    def test_solve_sparse_routes_banded(self, monkeypatch):
        # shrink thresholds so the 12x12-grid Laplacian takes the banded path
        # (scan backend here so the factor_banded spy sees it; the default
        # BCR backend's dispatch is covered in test_bcr.py)
        old = get_config()
        set_config(self._with_cfg(banded_min_steps=2, banded_solver="scan"))
        try:
            called = {}
            orig = banded.factor_banded

            def spy(a, nb=None):
                called["nb"] = nb
                return orig(a, nb)

            monkeypatch.setattr(banded, "factor_banded", spy)
            dense = _laplacian_2d(12)
            rng = np.random.default_rng(5)
            b = rng.standard_normal((144, 2)).astype(np.float32)
            x = solve_sparse(CSR.from_dense(dense), b)
            assert called, "solve_sparse did not dispatch to the banded path"
            np.testing.assert_allclose(np.asarray(x),
                                       np.linalg.solve(dense, b),
                                       rtol=5e-4, atol=5e-4)
        finally:
            set_config(old)

    def test_cholesky_auto_routes_banded(self):
        old = get_config()
        set_config(self._with_cfg(dense_cholesky_max_n=16,
                                  dense_cholesky_min_density=1.0,
                                  banded_min_steps=2))
        try:
            rng = np.random.default_rng(11)
            dense = _banded_spd(rng, 96, 5)
            l = cholesky_auto(CSR.from_dense(dense))
            np.testing.assert_allclose(l.todense(),
                                       np.linalg.cholesky(dense),
                                       rtol=2e-5, atol=2e-5)
        finally:
            set_config(old)

    def test_wide_band_rejected(self):
        rng = np.random.default_rng(13)
        a = CSR.from_dense(_random_dense_spd(rng, 64))
        old = get_config()
        set_config(self._with_cfg(banded_max_block=16))
        try:
            assert banded.banded_block_choice(a) is None
        finally:
            set_config(old)

    def test_disabled_by_config(self):
        a = CSR.from_dense(_laplacian_1d(64))
        old = get_config()
        set_config(self._with_cfg(banded_max_block=0))
        try:
            assert banded.banded_block_choice(a) is None
        finally:
            set_config(old)


def _random_dense_spd(rng, n):
    m = rng.standard_normal((n, n)).astype(np.float32)
    return m @ m.T + n * np.eye(n, dtype=np.float32)


def _laplacian_3d(k):
    n = k ** 3
    a = np.zeros((n, n), dtype=np.float32)
    idx = lambda i, j, l: (i * k + j) * k + l  # noqa: E731
    for i in range(k):
        for j in range(k):
            for l in range(k):
                r = idx(i, j, l)
                a[r, r] = 6.0
                for d in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                          (0, 0, 1), (0, 0, -1)):
                    ii, jj, ll = i + d[0], j + d[1], l + d[2]
                    if 0 <= ii < k and 0 <= jj < k and 0 <= ll < k:
                        a[r, idx(ii, jj, ll)] = -1.0
    return a


class TestLadder3D:
    def test_solve_sparse_3d_every_rung(self):
        """3D Laplacian through the full factorization ladder: banded
        (default config), then banded disabled (supernodal/scatter) — all
        must match the dense oracle."""
        dense = _laplacian_3d(6)  # n=216, bandwidth 36 after natural order
        a = CSR.from_dense(dense)
        rng = np.random.default_rng(17)
        b = rng.standard_normal((216, 2)).astype(np.float32)
        oracle = np.linalg.solve(dense, b)
        old = get_config()
        try:
            set_config(Config(**{**old.__dict__, "banded_min_steps": 2}))
            x_banded = np.asarray(solve_sparse(a, b))
            np.testing.assert_allclose(x_banded, oracle, rtol=2e-3, atol=2e-3)
            set_config(Config(**{**old.__dict__, "banded_max_block": 0}))
            x_level = np.asarray(solve_sparse(a, b))
            np.testing.assert_allclose(x_level, oracle, rtol=2e-3, atol=2e-3)
        finally:
            set_config(old)


def test_banded_factor_checkpoint_roundtrip(tmp_path):
    from basic_sparse_matrix_tpu.runtime import checkpoint as cp

    rng = np.random.default_rng(23)
    dense = _banded_spd(rng, 50, 4)
    fac = banded.factor_banded(CSR.from_dense(dense))
    p = str(tmp_path / "fac.npz")
    cp.save_banded(p, fac)
    fac2 = cp.load_banded(p)
    b = rng.standard_normal((50, 2)).astype(np.float32)
    x1 = np.asarray(banded.solve_factored_banded(fac, b))
    x2 = np.asarray(banded.solve_factored_banded(fac2, b))
    np.testing.assert_array_equal(x1, x2)


def test_banded_vmapped_values():
    """Batched factorization over value sets sharing one block pattern —
    the banded analogue of the supernodal vmap tests."""
    rng = np.random.default_rng(29)
    nb, m, batch = 8, 5, 3
    n = nb * m
    denses = np.stack([_banded_spd(rng, n, 4) for _ in range(batch)])
    Ds, Es = [], []
    for d in denses:
        D, E = banded.band_blocks(CSR.from_dense(d), nb)
        Ds.append(D), Es.append(E)
    Ds, Es = np.stack(Ds), np.stack(Es)
    Lb, Fb = jax.vmap(banded.cholesky_banded_blocks)(
        np.asarray(Ds, np.float32), np.asarray(Es, np.float32))
    for i in range(batch):
        fac = banded.BandedFactor(L=Lb[i], F=Fb[i], n=n)
        l = np.asarray(banded.assemble_factor_csr(fac).todense())
        np.testing.assert_allclose(l, np.linalg.cholesky(denses[i]),
                                   rtol=2e-5, atol=2e-5)
