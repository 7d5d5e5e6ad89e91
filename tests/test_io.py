"""Matrix Market I/O tests + the SuiteSparse-config pipeline on synthetic
bcsstk-like SPD matrices."""

import numpy as np

from basic_sparse_matrix_tpu import CSR, solve
from basic_sparse_matrix_tpu.models.solve import solve_sparse
from basic_sparse_matrix_tpu.runtime.io import (
    bcsstk_like,
    read_matrix_market,
    write_matrix_market,
)


def test_mm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = ((rng.random((12, 9)) < 0.3)
         * rng.standard_normal((12, 9))).astype(np.float32)
    a = CSR.from_dense(d)
    p = str(tmp_path / "m.mtx")
    write_matrix_market(p, a, comment="roundtrip test")
    b = read_matrix_market(p)
    assert b.shape == a.shape
    assert np.allclose(np.asarray(b.todense()), d, rtol=1e-6)


def test_mm_symmetric_expansion(tmp_path):
    p = str(tmp_path / "sym.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% lower triangle only\n")
        f.write("3 3 4\n")
        f.write("1 1 2.0\n2 1 -1.0\n2 2 2.0\n3 3 5.0\n")
    a = read_matrix_market(p)
    dense = np.asarray(a.todense())
    ref = np.asarray([[2, -1, 0], [-1, 2, 0], [0, 0, 5]], dtype=np.float32)
    assert np.allclose(dense, ref)


def test_mm_pattern(tmp_path):
    p = str(tmp_path / "pat.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 2\n1 1\n2 2\n")
    a = read_matrix_market(p)
    assert np.allclose(np.asarray(a.todense()), np.eye(2))


def test_mm_gzip(tmp_path):
    a = CSR.from_dense(np.eye(4, dtype=np.float32) * 3)
    p = str(tmp_path / "m.mtx.gz")
    write_matrix_market(p, a)
    b = read_matrix_market(p)
    assert b.allclose(a)


def test_bcsstk_like_pipeline():
    # BASELINE config 2 stand-in: banded SPD matrix → both solve pipelines
    a = bcsstk_like(n=60, bandwidth=5, seed=3)
    dense = np.asarray(a.todense())
    assert np.allclose(dense, dense.T)  # symmetric
    rng = np.random.default_rng(1)
    b = rng.standard_normal(60).astype(np.float32)
    x_dense = np.asarray(solve(a, b)).ravel()
    x_sparse = np.asarray(solve_sparse(a, b)).ravel()
    oracle = np.linalg.solve(dense.astype(np.float64), b)
    assert np.allclose(x_dense, oracle, rtol=1e-2, atol=1e-2)
    assert np.allclose(x_sparse, oracle, rtol=1e-2, atol=1e-2)


def test_committed_beam_mtx_end_to_end():
    """Load the committed MatrixMarket fixture (clamped-beam biharmonic
    stiffness, SuiteSparse nos*-family problem; see the file's comments —
    generated locally since this environment cannot fetch the genuine
    collection) and run the full factor+solve pipeline against scipy."""
    import os

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from basic_sparse_matrix_tpu.models.cholesky import cholesky_auto

    path = os.path.join(os.path.dirname(__file__), "data",
                        "beam_stiffness_100.mtx")
    a = read_matrix_market(path)
    assert a.shape == (100, 100)
    dense = np.asarray(a.todense()).astype(np.float64)
    assert np.allclose(dense, dense.T)
    # symmetric-expansion check against scipy's own mmread
    from scipy.io import mmread

    ref = mmread(path).toarray()
    assert np.allclose(dense, ref)

    # factor: cholesky_auto vs numpy
    l = cholesky_auto(a)
    assert np.allclose(np.asarray(l.todense()), np.linalg.cholesky(dense),
                       rtol=1e-4, atol=1e-5)

    # solve: both pipelines vs scipy spsolve (cond ~3e6 → float32 gives
    # ~cond*eps relative error; compare via residual instead of x)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(100).astype(np.float32)
    A = sp.csr_matrix(ref)
    x_ref = spla.spsolve(A.tocsc(), b.astype(np.float64))
    for x in (np.asarray(solve(a, b)).ravel(),
              np.asarray(solve_sparse(a, b)).ravel()):
        res = np.linalg.norm(dense @ x - b) / np.linalg.norm(b)
        res_ref = np.linalg.norm(dense @ x_ref - b) / np.linalg.norm(b)
        assert res < 1e-2, (res, res_ref)
