"""Distributed direct-solver tests (components D3/D4) on the simulated
8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import analyze
from basic_sparse_matrix_tpu.models.sparse_triangular import build_schedule
from basic_sparse_matrix_tpu.parallel.cholesky import (
    cholesky_sparse_distributed,
    factorize_sharded,
)
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.triangular import (
    solve_sparse_distributed,
    solve_triangular_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    return row_mesh(8)


def _lap2d(k):
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


def test_distributed_cholesky_matches_dense(mesh8):
    a = _lap2d(6)
    l = cholesky_sparse_distributed(CSR.from_dense(a), mesh8)
    ref = np.linalg.cholesky(a.astype(np.float64))
    assert np.allclose(np.asarray(l.todense()), ref, rtol=1e-4, atol=1e-4)


def test_distributed_cholesky_reference_golden(mesh8):
    # reference cholesky_decomposition_0 (sparse.rs:1031-1060)
    a = CSR.from_dense(np.asarray(
        [[4.0, 12, -16], [12, 37, -43], [-16, -43, 98]], dtype=np.float32))
    l = cholesky_sparse_distributed(a, mesh8)
    ref = np.asarray([[2.0, 0, 0], [6, 1, 0], [-8, 5, 3]])
    assert np.allclose(np.asarray(l.todense()), ref, rtol=1e-4, atol=1e-4)


def test_distributed_triangular_solve(mesh8):
    rng = np.random.default_rng(0)
    a = _lap2d(5)
    lref = np.linalg.cholesky(a.astype(np.float64)).astype(np.float32)
    l = CSR.from_dense(lref)
    b = rng.standard_normal((25, 3)).astype(np.float32)
    x = np.asarray(solve_sparse_distributed(l, b, mesh8, lower=True))
    oracle = np.linalg.solve(lref.astype(np.float64), b)
    assert np.allclose(x, oracle, rtol=1e-3, atol=1e-3)


def test_distributed_full_solve_pipeline(mesh8):
    # distributed chol + distributed fwd/bwd vs reference solve golden
    # (lib.rs:120-138)
    a = CSR.from_dense(np.asarray(
        [[8.0, 0, 0, 0], [0, 7, 1, 0], [0, 1, 3, 0], [0, 0, 0, 2]],
        dtype=np.float32))
    b = np.asarray([[5.0], [2.0], [8.0], [1.0]], dtype=np.float32)
    l = cholesky_sparse_distributed(a, mesh8)
    y = solve_sparse_distributed(l, b, mesh8, lower=True)
    x = np.asarray(
        solve_sparse_distributed(l.transpose(), y, mesh8, lower=False))
    assert np.allclose(x.ravel(), [0.625, -0.1, 2.6999998, 0.5], rtol=1e-4)


def test_sharded_factorize_equals_single(mesh8):
    a = _lap2d(4)
    csr = CSR.from_dense(a)
    sched = analyze(csr)
    from basic_sparse_matrix_tpu.models.sparse_cholesky import factorize

    single = np.asarray(factorize(sched, csr.values))
    dist = np.asarray(factorize_sharded(sched, csr.values, mesh8))
    assert np.allclose(single, dist, rtol=1e-5, atol=1e-6)


def test_sharded_triangular_vector_rhs(mesh8):
    l = CSR.from_dense(np.asarray(
        [[5.0, 0, 0], [8, 2, 0], [3, 7, 1]], dtype=np.float32))
    sched = build_schedule(l, lower=True)
    y = np.asarray(solve_triangular_sharded(
        sched, np.asarray([7.0, 3.0, 1.0], dtype=np.float32), mesh8))
    assert np.allclose(y, [7 / 5, -4.1, 25.5], rtol=1e-5)


def test_distributed_supernodal_matches_single(mesh8):
    from basic_sparse_matrix_tpu.models.supernodal import cholesky_supernodal
    from basic_sparse_matrix_tpu.parallel.supernodal import (
        cholesky_supernodal_distributed,
    )

    a = CSR.from_dense(_lap2d(6))
    l_single = cholesky_supernodal(a)
    l_dist = cholesky_supernodal_distributed(a, mesh8)
    assert np.allclose(np.asarray(l_single.todense()),
                       np.asarray(l_dist.todense()), rtol=1e-5, atol=1e-6)
    ref = np.linalg.cholesky(_lap2d(6).astype(np.float64))
    assert np.allclose(np.asarray(l_dist.todense()), ref, rtol=1e-4,
                       atol=1e-4)


def test_distributed_supernodal_dense_and_arrow(mesh8):
    from basic_sparse_matrix_tpu.parallel.supernodal import (
        cholesky_supernodal_distributed,
    )

    rng = np.random.default_rng(7)
    m = rng.standard_normal((16, 16))
    spd = (m @ m.T + 16 * np.eye(16)).astype(np.float32)
    l = cholesky_supernodal_distributed(CSR.from_dense(spd), mesh8)
    assert np.allclose(np.asarray(l.todense()),
                       np.linalg.cholesky(spd.astype(np.float64)),
                       rtol=1e-4, atol=1e-4)


def test_block_jacobi_pcg_matches_dense(mesh8):
    from basic_sparse_matrix_tpu.parallel.pcg import (
        build_block_jacobi,
        pcg_solve_sharded,
    )
    from basic_sparse_matrix_tpu.parallel.sharded import (
        put_sharded,
        shard_csr,
        unshard_rows,
    )

    rng = np.random.default_rng(3)
    a = _lap2d(6)
    b = rng.standard_normal(a.shape[0]).astype(np.float32)
    sa = put_sharded(shard_csr(CSR.from_dense(a), 8), mesh8)
    lfac = build_block_jacobi(sa, mesh8)
    x = pcg_solve_sharded(sa, jnp.asarray(b), mesh8, iters=60, lfac=lfac)
    xr = np.asarray(unshard_rows(x, a.shape[0]))
    ref = np.linalg.solve(a.astype(np.float64), b)
    assert np.allclose(xr, ref, rtol=1e-3, atol=1e-3)


def test_block_jacobi_pcg_beats_plain_cg(mesh8):
    from basic_sparse_matrix_tpu.parallel.cg import cg_solve_sharded
    from basic_sparse_matrix_tpu.parallel.pcg import pcg_solve_sharded
    from basic_sparse_matrix_tpu.parallel.sharded import (
        put_sharded,
        shard_csr,
        unshard_rows,
    )

    rng = np.random.default_rng(4)
    a = _lap2d(8)
    n = a.shape[0]
    b = rng.standard_normal(n).astype(np.float32)
    sa = put_sharded(shard_csr(CSR.from_dense(a), 8), mesh8)
    iters = 10
    xp = np.asarray(unshard_rows(
        pcg_solve_sharded(sa, jnp.asarray(b), mesh8, iters=iters), n))
    xc = np.asarray(unshard_rows(
        cg_solve_sharded(sa, jnp.asarray(b), mesh8, iters=iters), n))
    res_p = np.linalg.norm(a @ xp - b)
    res_c = np.linalg.norm(a @ xc - b)
    assert res_p < res_c


def test_tsqr_sharded_matches_single(mesh8):
    from basic_sparse_matrix_tpu.models.qr import tsqr
    from basic_sparse_matrix_tpu.parallel.tsqr import tsqr_sharded

    rng = np.random.default_rng(11)
    a = rng.standard_normal((640, 24)).astype(np.float32)
    q, r = tsqr_sharded(a, mesh8)
    q, r = np.asarray(q), np.asarray(r)
    assert np.abs(np.triu(r) - r).max() < 1e-5
    assert np.abs(q.T @ q - np.eye(24)).max() < 1e-4
    assert np.abs(q @ r - a).max() < 1e-4
    # R agrees with the single-device factorization up to row signs
    _, r1 = tsqr(a)
    s = np.sign(np.diagonal(r)) * np.sign(np.diagonal(np.asarray(r1)))
    assert np.abs(r * s[:, None] - np.asarray(r1)).max() < 2e-3


def test_distributed_supernodal_chunked_matches_whole(mesh8):
    """chunk_groups splits the schedule into bounded programs; results
    must match the whole-program path bit-for-bit semantics (same level
    math, same psum merges)."""
    import jax

    from basic_sparse_matrix_tpu.models.supernodal import analyze_supernodal
    from basic_sparse_matrix_tpu.parallel.supernodal import (
        factorize_supernodal_sharded,
    )

    a = CSR.from_dense(_lap2d(6))
    sched = analyze_supernodal(a)
    whole = np.asarray(jax.device_get(
        factorize_supernodal_sharded(sched, a.values, mesh8)))
    chunked = np.asarray(jax.device_get(
        factorize_supernodal_sharded(sched, a.values, mesh8,
                                     chunk_groups=2)))
    assert np.allclose(whole, chunked, rtol=1e-6, atol=1e-7)
