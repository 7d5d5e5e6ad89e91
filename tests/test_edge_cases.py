"""Edge-case battery: empty matrices, single elements, extreme shapes,
dtype behaviour — the places sparse libraries rot."""

import jax.numpy as jnp
import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR, Dense
from basic_sparse_matrix_tpu.ops import (
    add_sparse,
    l2_norm,
    mul_dense,
    mul_scalar,
    mul_sparse,
    mul_vector,
    sub_sparse,
    sum_elements,
    transpose,
)


class TestEmpty:
    def test_empty_construction(self):
        a = CSR.from_dense(np.zeros((5, 7), dtype=np.float32))
        assert a.stored == 0 and a.get_nnz() == 0
        assert a.get_density() == 0.0

    def test_empty_ops(self):
        a = CSR.from_dense(np.zeros((5, 7), dtype=np.float32))
        t = transpose(a)
        assert t.shape == (7, 5) and t.stored == 0
        b = CSR.from_dense(np.zeros((5, 7), dtype=np.float32))
        assert add_sparse(a, b).stored == 0
        assert sub_sparse(a, b).stored == 0
        assert float(sum_elements(a)) == 0.0
        assert float(l2_norm(a)) == 0.0
        out = mul_dense(a, jnp.ones((7, 3)))
        assert np.asarray(out).sum() == 0.0

    def test_empty_spgemm(self):
        a = CSR.from_dense(np.zeros((4, 6), dtype=np.float32))
        b = CSR.from_dense(np.zeros((6, 3), dtype=np.float32))
        c = mul_sparse(a, b)
        assert c.shape == (4, 3) and c.stored == 0

    def test_empty_rows_accessors(self):
        a = CSR.from_dense(np.zeros((3, 3), dtype=np.float32))
        assert a.get_row_compact(1) == []
        assert a.get_row_complete(1).tolist() == [0, 0, 0]
        assert a.get_col_compact(2) == []
        assert a.get_val_at((0, 0)) is None
        assert list(a) == []


class TestSingle:
    def test_1x1(self):
        a = CSR.from_dense([[3.0]])
        assert float(sum_elements(a)) == 3.0
        assert transpose(a).allclose(a)
        assert np.asarray(mul_dense(a, jnp.asarray([[2.0]]))).item() == 6.0
        assert mul_scalar(a, 2.0).allclose(CSR.from_dense([[6.0]]))

    def test_row_vector_times_col_vector(self):
        row = CSR.from_dense([[1.0, 2.0, 3.0]])
        col = CSR.from_dense([[4.0], [5.0], [6.0]])
        inner = mul_sparse(row, col)
        assert inner.shape == (1, 1)
        assert float(np.asarray(inner.todense())) == 32.0
        outer = mul_sparse(col, row)
        assert outer.shape == (3, 3)
        assert np.asarray(outer.todense())[2, 2] == 18.0


class TestShapes:
    def test_tall_skinny(self):
        rng = np.random.default_rng(0)
        d = ((rng.random((500, 3)) < 0.3)
             * rng.standard_normal((500, 3))).astype(np.float32)
        a = CSR.from_dense(d)
        b = rng.standard_normal((3, 2)).astype(np.float32)
        assert np.allclose(np.asarray(mul_dense(a, b)), d @ b, rtol=1e-4)

    def test_short_wide(self):
        rng = np.random.default_rng(1)
        d = ((rng.random((2, 400)) < 0.2)
             * rng.standard_normal((2, 400))).astype(np.float32)
        a = CSR.from_dense(d)
        v = rng.standard_normal(400).astype(np.float32)
        assert np.allclose(np.asarray(mul_vector(a, v)), d @ v, rtol=1e-4,
                           atol=1e-4)


class TestDtypes:
    def test_int_matrix_ops(self):
        a = CSR.from_dense(np.asarray([[1, 2], [3, 0]], dtype=np.int32))
        assert a.dtype == jnp.int32
        s = mul_scalar(a, 3)
        assert np.asarray(s.todense()).tolist() == [[3, 6], [9, 0]]
        assert int(sum_elements(a)) == 6
        t = transpose(a)
        assert np.asarray(t.todense()).tolist() == [[1, 3], [2, 0]]

    def test_mixed_dtype_spmm(self):
        a = CSR.from_dense(np.asarray([[1, 0], [0, 2]], dtype=np.int32))
        out = mul_dense(a, jnp.asarray([[1.5], [2.5]], dtype=jnp.float32))
        assert np.asarray(out).ravel().tolist() == [1.5, 5.0]


class TestDuplicatesAndZeros:
    def test_capacity_padded_roundtrip(self):
        a = CSR.from_dense([[1.0, -1.0], [2.0, 0.0]])
        b = CSR.from_dense([[-1.0, 1.0], [0.0, 3.0]])
        c = add_sparse(a, b)  # exact cancellation at (0,0),(0,1)
        assert np.allclose(np.asarray(c.todense()), [[0, 0], [2, 3]])
        compact = c.compacted()
        assert compact.stored == 2
        # ops on the padded result still work
        t = transpose(c)
        assert np.allclose(np.asarray(t.todense()), [[0, 2], [0, 3]])

    def test_dense_wrapper_empty(self):
        d = Dense.new_default_with_dims(0, 3)
        assert d.dims.rows == 3 and d.dims.cols == 0


class TestLargeShapeIndexing:
    def test_merge_no_int32_overflow(self):
        # shape product exceeds int32: combined-key sorts would overflow
        n = 200_000
        a = CSR.from_coo_arrays((n, n), [0, n - 1], [n - 1, 0], [1.0, 2.0])
        b = CSR.from_coo_arrays((n, n), [0, n - 1], [n - 1, 0], [3.0, 4.0])
        c = add_sparse(a, b)
        assert c.get_val_at((0, n - 1)) == 4.0
        assert c.get_val_at((n - 1, 0)) == 6.0


class TestLargeSpgemm:
    def test_spgemm_large_shape_sparse_path(self):
        # shape too large to densify: must route through the bounded path
        n = 40_000  # 40k x 40k dense would be 6.4 GB
        rng = np.random.default_rng(0)
        nnz = 2000
        import basic_sparse_matrix_tpu.ops.spgemm as G

        a = CSR.from_coo_arrays(
            (n, n), rng.integers(0, n, nnz), rng.integers(0, n, nnz),
            rng.standard_normal(nnz).astype(np.float32))
        b = CSR.from_coo_arrays(
            (n, n), rng.integers(0, n, nnz), rng.integers(0, n, nnz),
            rng.standard_normal(nnz).astype(np.float32))
        c = mul_sparse(a, b)
        assert c.shape == (n, n)
        # oracle via scipy on the same operands
        scipy_sparse = pytest.importorskip("scipy.sparse")
        from basic_sparse_matrix_tpu.ops.interop import to_scipy

        want = (to_scipy(a) @ to_scipy(b)).tocoo()
        got = to_scipy(c).tocoo()
        gd = {(int(r), int(cc)): float(v)
              for r, cc, v in zip(got.row, got.col, got.data) if v != 0}
        wd = {(int(r), int(cc)): float(v)
              for r, cc, v in zip(want.row, want.col, want.data)
              if abs(v) > 1e-12}
        assert set(gd) == set(wd)
        for k in wd:
            assert abs(gd[k] - wd[k]) < 1e-4

    def test_todense_overflow_guard(self):
        from basic_sparse_matrix_tpu.utils.errors import IncorrectDimensions
        import pytest as _pytest

        n = 100_000
        a = CSR.from_coo_arrays((n, n), [0], [0], [1.0])
        with _pytest.raises(IncorrectDimensions):
            a.todense()
