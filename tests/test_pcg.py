"""IC(0)-preconditioned CG tests."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.pcg import PCGSetup, pcg_solve
from basic_sparse_matrix_tpu.models.sparse_cholesky import analyze, factorize


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


def test_ic0_pattern_no_fill():
    # IC(0) factor must not introduce entries outside A's lower pattern
    a_dense = _lap2d(5)
    a = CSR.from_dense(a_dense)
    sched = analyze(a, incomplete=True)
    import jax

    lvals = np.asarray(jax.device_get(factorize(sched, a.values)))
    cols = np.repeat(np.arange(25), np.diff(sched.l_col_ptr))
    pat_a = a_dense != 0
    for v, r, c in zip(lvals, sched.l_row_idx, cols):
        if v != 0:
            assert pat_a[r, c], f"fill at ({r},{c}) in IC(0) factor"


def test_ic0_exact_when_no_fill_needed():
    # tridiagonal: full Cholesky has no fill, so IC(0) == exact factor
    n = 20
    a_dense = (4.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
               ).astype(np.float32)
    a = CSR.from_dense(a_dense)
    import jax

    s_full = analyze(a)
    s_ic = analyze(a, incomplete=True)
    lv_full = np.asarray(jax.device_get(factorize(s_full, a.values)))
    lv_ic = np.asarray(jax.device_get(factorize(s_ic, a.values)))
    assert np.allclose(np.sort(lv_full), np.sort(lv_ic), rtol=1e-6)


@pytest.mark.parametrize("k", [5, 8])
def test_pcg_solves_laplacian(k):
    a_dense = _lap2d(k)
    n = k * k
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(np.float32)
    x, iters, res = pcg_solve(CSR.from_dense(a_dense), b, tol=1e-6,
                              max_iters=500)
    assert res < 1e-5
    assert np.allclose(a_dense @ np.asarray(x), b, rtol=1e-3, atol=1e-3)
    assert iters < n  # preconditioning must beat the dimension bound


def test_pcg_setup_reuse():
    a_dense = _lap2d(4)
    a = CSR.from_dense(a_dense)
    setup = PCGSetup.build(a)
    rng = np.random.default_rng(1)
    for _ in range(2):
        b = rng.standard_normal(16).astype(np.float32)
        x, _, res = pcg_solve(a, b, setup=setup)
        assert res < 1e-5
        assert np.allclose(a_dense @ np.asarray(x), b, rtol=1e-3, atol=1e-3)


def test_pcg_beats_unpreconditioned_iterations():
    # IC(0) should cut iteration count vs plain CG on an ill-conditioned SPD
    k = 10
    a_dense = _lap2d(k)
    n = k * k
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n).astype(np.float32)
    _, iters_pcg, _ = pcg_solve(CSR.from_dense(a_dense), b, tol=1e-8,
                                max_iters=2000)
    # plain CG on the normal equations of the same system for comparison:
    # run pcg with identity-ish preconditioner by using a diagonal matrix
    diag = CSR.from_dense(np.diag(np.diag(a_dense)))
    from basic_sparse_matrix_tpu.models.pcg import PCGSetup as PS

    setup_diag = PS.build(diag)
    setup_diag = PS(a=CSR.from_dense(a_dense), fwd=setup_diag.fwd,
                    bwd=setup_diag.bwd)
    _, iters_jacobi, _ = pcg_solve(CSR.from_dense(a_dense), b, tol=1e-8,
                                   max_iters=2000, setup=setup_diag)
    assert iters_pcg <= iters_jacobi
