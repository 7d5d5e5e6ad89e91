"""Factorization & solver tests ported from the reference.

Sources: Cholesky sparse.rs:1031-1080, QR sparse.rs:1369-1381, eigenvalues
sparse.rs:1424-1441, substitutions/solve lib.rs:69-139. Reference asserts
exact f32 equality; per SURVEY.md §4 we use allclose at 1e-5 rtol because XLA
fma/reduction order differs.
"""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import (
    CSR,
    Dense,
    NonSquareMatrix,
    backward_substitution,
    cholesky,
    eigen_values,
    forward_substitution,
    qr_decomp,
    solve,
)
from basic_sparse_matrix_tpu.ops import l2_norm, mul_sparse, sub_sparse


def test_cholesky_decomposition_0():
    # sparse.rs:1031-1060 — classic 3×3 SPD with integer factor
    m = CSR.from_dense([
        [4.0, 12.0, -16.0],
        [12.0, 37.0, -43.0],
        [-16.0, -43.0, 98.0],
    ])
    lower_ref = CSR.from_dense([
        [2.0, 0.0, 0.0],
        [6.0, 1.0, 0.0],
        [-8.0, 5.0, 3.0],
    ])
    upper_ref = CSR.from_dense([
        [2.0, 6.0, -8.0],
        [0.0, 1.0, 5.0],
        [0.0, 0.0, 3.0],
    ])
    lower = cholesky(m)
    assert lower.allclose(lower_ref)
    assert lower.transpose().allclose(upper_ref)


def test_cholesky_decomposition_1():
    # sparse.rs:1063-1080 — pinned literals 2.828427, 0.37796451, 1.6903086,
    # 1.4142135
    m = CSR.from_dense([
        [8.0, 0.0, 0.0, 0.0],
        [0.0, 7.0, 1.0, 0.0],
        [0.0, 1.0, 3.0, 0.0],
        [0.0, 0.0, 0.0, 2.0],
    ])
    lower_ref = CSR.from_dense([
        [2.828427, 0.0, 0.0, 0.0],
        [0.0, 2.6457512, 0.0, 0.0],
        [0.0, 0.37796451, 1.6903086, 0.0],
        [0.0, 0.0, 0.0, 1.4142135],
    ])
    assert cholesky(m).allclose(lower_ref)


def test_cholesky_non_square():
    # sparse.rs:683-685
    with pytest.raises(NonSquareMatrix):
        cholesky(CSR.from_dense([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]))


def test_forward_substitution():
    # lib.rs:74-94 — expected y = [7/5, -4.1, 25.5]
    b = Dense.from_data([[7.0, 3.0, 1.0]])
    l = CSR.from_dense([
        [5.0, 0.0, 0.0],
        [8.0, 2.0, 0.0],
        [3.0, 7.0, 1.0],
    ])
    y = forward_substitution(l, b)
    assert np.allclose(
        np.asarray(y).ravel(), [7.0 / 5.0, -4.1, 25.5], rtol=1e-5
    )


def test_backward_substitution():
    # lib.rs:97-117 — expected x = [-32/35, 2.6, 0.6]
    y = Dense.from_data([[1.0, 7.0, 3.0]])
    l_star = CSR.from_dense([
        [7.0, 1.0, 8.0],
        [0.0, 2.0, 3.0],
        [0.0, 0.0, 5.0],
    ])
    x = backward_substitution(l_star, y)
    assert np.allclose(
        np.asarray(x).ravel(), [-32.0 / 35.0, 2.6, 0.6], rtol=1e-5
    )


def test_solve():
    # lib.rs:120-138 — expected x = [0.625, -0.1, 2.6999998, 0.5]
    b = Dense.from_data([[5.0, 2.0, 8.0, 1.0]])
    a = CSR.from_dense([
        [8.0, 0.0, 0.0, 0.0],
        [0.0, 7.0, 1.0, 0.0],
        [0.0, 1.0, 3.0, 0.0],
        [0.0, 0.0, 0.0, 2.0],
    ])
    x = solve(a, b)
    assert np.allclose(
        np.asarray(x).ravel(), [0.625, -0.1, 2.6999998, 0.5], rtol=1e-5
    )


def test_solve_multi_rhs():
    # multi-RHS as batched dim (reference loops columns, lib.rs:31)
    rng = np.random.default_rng(5)
    m = rng.standard_normal((6, 6))
    a_dense = (m @ m.T + 6 * np.eye(6)).astype(np.float32)
    b = rng.standard_normal((6, 3)).astype(np.float32)
    x = solve(CSR.from_dense(a_dense), b)
    assert np.allclose(a_dense @ np.asarray(x), b, rtol=1e-3, atol=1e-3)


def test_qr_decomp():
    # sparse.rs:1369-1381 — residual-based assertion ‖A − QR‖₂ < 0.1
    a = CSR.from_dense([
        [12.0, -51.0, 4.0],
        [6.0, 167.0, -68.0],
        [-4.0, 24.0, -41.0],
    ])
    q, r = qr_decomp(a)
    qr = mul_sparse(q, r)
    assert float(l2_norm(sub_sparse(a, qr))) < 0.1


def test_get_eigen_vals():
    # sparse.rs:1424-1441 — reference only prints the error; we assert
    # convergence to its reference values [-34.196675, 16.05999094,
    # 156.13668406] after enough iterations.
    a = CSR.from_dense([
        [12.0, -51.0, 4.0],
        [6.0, 167.0, -68.0],
        [-4.0, 24.0, -41.0],
    ])
    vals = np.sort(np.asarray(eigen_values(a, 50)))
    ref = np.sort([-34.196675, 16.05999094, 156.13668406])
    assert np.allclose(vals, ref, rtol=1e-3)


def test_solve_against_numpy_oracle():
    rng = np.random.default_rng(11)
    for n in (4, 16, 33):
        m = rng.standard_normal((n, n))
        a = (m @ m.T + n * np.eye(n)).astype(np.float32)
        b = rng.standard_normal((n,)).astype(np.float32)
        x = np.asarray(solve(CSR.from_dense(a), b)).ravel()
        assert np.allclose(x, np.linalg.solve(a, b), rtol=1e-3, atol=1e-3)


def test_tsqr_matches_householder():
    """TSQR (batched block QR + log-depth R tree) reproduces a valid
    reduced QR: Q orthonormal, R upper-triangular, QR = A — across block
    counts incl. non-pow2 and single-block edge cases."""
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.models.qr import tsqr

    rng = np.random.default_rng(3)
    for m, n, br in [(1000, 16, 128), (513, 8, 64), (96, 12, 100),
                     (2048, 64, 256)]:
        a = rng.standard_normal((m, n)).astype(np.float32)
        q, r = tsqr(a, block_rows=br)
        q, r = np.asarray(q), np.asarray(r)
        assert q.shape == (m, n) and r.shape == (n, n)
        assert np.abs(np.triu(r) - r).max() < 1e-5, "R not triangular"
        assert np.abs(q.T @ q - np.eye(n)).max() < 1e-4, "Q not orthonormal"
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(q @ r - a).max() / scale < 1e-4, (m, n, br)


def test_qr_decomp_tall_routes_tsqr():
    """qr_decomp on a tall sparse operand (rows >= 4*cols) goes through the
    TSQR tree and still satisfies the reference's residual contract."""
    rng = np.random.default_rng(4)
    d = (rng.random((400, 20)) < 0.2) * rng.standard_normal((400, 20))
    d = d.astype(np.float32)
    a = CSR.from_dense(d)
    q, r = qr_decomp(a)
    qd, rd = np.asarray(q.todense()), np.asarray(r.todense())
    assert np.abs(qd @ rd - d).max() < 1e-4
    assert np.abs(qd.T @ qd - np.eye(20)).max() < 1e-4
