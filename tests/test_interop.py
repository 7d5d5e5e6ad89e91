"""Ecosystem interop tests (BCOO / scipy)."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.ops.interop import from_bcoo, to_bcoo


def _mat():
    rng = np.random.default_rng(0)
    return ((rng.random((15, 20)) < 0.25)
            * rng.standard_normal((15, 20))).astype(np.float32)


def test_bcoo_roundtrip():
    d = _mat()
    a = CSR.from_dense(d)
    m = to_bcoo(a)
    assert m.shape == (15, 20)
    assert np.allclose(np.asarray(m.todense()), d)
    b = from_bcoo(m)
    assert b.allclose(a)


def test_scipy_roundtrip():
    sp = pytest.importorskip("scipy.sparse")
    from basic_sparse_matrix_tpu.ops.interop import from_scipy, to_scipy

    d = _mat()
    a = CSR.from_dense(d)
    s = to_scipy(a)
    assert np.allclose(s.toarray(), d)
    b = from_scipy(s)
    assert b.allclose(a)


def test_scipy_oracle_ops():
    sp = pytest.importorskip("scipy.sparse")
    from basic_sparse_matrix_tpu.ops import add_sparse, mul_sparse, transpose
    from basic_sparse_matrix_tpu.ops.interop import from_scipy

    rng = np.random.default_rng(1)
    s1 = sp.random(30, 30, density=0.1, format="csr", random_state=1,
                   dtype=np.float32)
    s2 = sp.random(30, 30, density=0.1, format="csr", random_state=2,
                   dtype=np.float32)
    a, b = from_scipy(s1), from_scipy(s2)
    assert np.allclose(np.asarray(add_sparse(a, b).todense()),
                       (s1 + s2).toarray(), rtol=1e-5)
    assert np.allclose(np.asarray(transpose(a).todense()),
                       s1.T.toarray(), rtol=1e-5)
    assert np.allclose(np.asarray(mul_sparse(a, b).todense()),
                       (s1 @ s2).toarray(), rtol=1e-4, atol=1e-5)
