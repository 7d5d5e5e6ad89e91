"""Property tests: random matrices across shapes/densities/dtypes checked
against scipy/numpy oracles (SURVEY.md §4: "add what the reference lacks:
property tests vs scipy.sparse")."""

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.ops import (
    add_sparse,
    mul_dense,
    mul_sparse,
    mul_scalar,
    mul_vector,
    spmm_to_csr,
    sub_sparse,
    sum_elements,
    transpose,
)
from basic_sparse_matrix_tpu.ops.interop import from_scipy

CASES = [
    # (seed, rows, cols, density)
    (0, 1, 1, 1.0),
    (1, 1, 17, 0.4),
    (2, 23, 1, 0.4),
    (3, 40, 40, 0.05),
    (4, 64, 32, 0.2),
    (5, 13, 57, 0.5),
    (6, 100, 100, 0.01),
    (7, 9, 9, 0.0),
]


def _rand(seed, rows, cols, density):
    s = scipy_sparse.random(rows, cols, density=density, format="csr",
                            random_state=seed, dtype=np.float64)
    s = s.astype(np.float32)
    return from_scipy(s), s


@pytest.mark.parametrize("seed,rows,cols,density", CASES)
def test_roundtrip_and_transpose(seed, rows, cols, density):
    a, s = _rand(seed, rows, cols, density)
    assert np.allclose(np.asarray(a.todense()), s.toarray(), rtol=1e-6)
    assert np.allclose(np.asarray(transpose(a).todense()),
                       s.T.toarray(), rtol=1e-6)


@pytest.mark.parametrize("seed,rows,cols,density", CASES)
def test_add_sub_scalar(seed, rows, cols, density):
    a, s1 = _rand(seed, rows, cols, density)
    b, s2 = _rand(seed + 100, rows, cols, density)
    assert np.allclose(np.asarray(add_sparse(a, b).todense()),
                       (s1 + s2).toarray(), rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(sub_sparse(a, b).todense()),
                       (s1 - s2).toarray(), rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(mul_scalar(a, 2.5).todense()),
                       (s1 * 2.5).toarray(), rtol=1e-6)
    assert np.isclose(float(sum_elements(a)), s1.sum(), rtol=1e-4,
                      atol=1e-4)


@pytest.mark.parametrize("seed,rows,cols,density", CASES)
def test_spmm_spmv(seed, rows, cols, density):
    a, s = _rand(seed, rows, cols, density)
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((cols, 5)).astype(np.float32)
    v = rng.standard_normal(cols).astype(np.float32)
    assert np.allclose(np.asarray(mul_dense(a, d)), s @ d,
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(mul_vector(a, v)), s @ v,
                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed,rows,cols,density", CASES[:6])
def test_spgemm(seed, rows, cols, density):
    a, s1 = _rand(seed, rows, cols, density)
    b, s2 = _rand(seed + 200, cols, max(rows // 2, 1), density)
    got = np.asarray(mul_sparse(a, b).todense())
    want = (s1 @ s2).toarray()
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed,rows,cols,density", CASES[3:6])
def test_spmm_to_csr_nnz_semantics(seed, rows, cols, density):
    # reference quirk: CSR-shaped SpMM result drops exact zeros
    a, s = _rand(seed, rows, cols, density)
    rng = np.random.default_rng(seed)
    d = rng.integers(0, 3, (cols, 4)).astype(np.float32)
    out = spmm_to_csr(a, d)
    dense = np.asarray(out.todense())
    assert out.get_nnz() == int(np.count_nonzero(dense))


def test_accessors_match_scipy():
    a, s = _rand(11, 30, 40, 0.2)
    dense = s.toarray()
    for i in (0, 7, 29):
        assert np.allclose(a.get_row_complete(i), dense[i], rtol=1e-6)
    for j in (0, 15, 39):
        assert np.allclose(a.get_col_complete(j), dense[:, j], rtol=1e-6)
    sub = a.take_submatrix((3, 5), (20, 30))
    assert np.allclose(np.asarray(sub.todense()), dense[3:20, 5:30],
                       rtol=1e-6)
