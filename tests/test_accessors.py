"""Accessor tests ported from the reference (sparse.rs:871-1017, 1326-1421)."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.utils.errors import (
    IncorrectDimensions,
    PaddingSizeSmallerThanOriginal,
)

M_6COL = [
    [10, 20, 0, 0, 0, 0],
    [0, 30, 0, 40, 0, 0],
    [0, 0, 50, 60, 70, 0],
    [0, 0, 0, 0, 0, 80],
]


def test_get_row_by_index_0():
    # sparse.rs:871-886
    m = CSR.from_dense(M_6COL)
    assert m.get_row_complete(2).tolist() == [0, 0, 50, 60, 70, 0]
    compact = [(int(e.v), e.row_index, e.col_index)
               for e in m.get_row_compact(2)]
    assert compact == [(50, 2, 2), (60, 2, 3), (70, 2, 4)]


def test_get_col_by_index_0():
    # sparse.rs:889-916
    m = CSR.from_dense(M_6COL)
    assert m.get_col_complete(1).tolist() == [20, 30, 0, 0]
    assert m.get_col_complete(4).tolist() == [0, 0, 70, 0]

    compact1 = [(int(e.v), e.row_index, e.col_index)
                for e in m.get_col_compact(1)]
    assert compact1 == [(20, 0, 1), (30, 1, 1)]
    compact4 = [(int(e.v), e.row_index, e.col_index)
                for e in m.get_col_compact(4)]
    assert compact4 == [(70, 2, 4)]

    c = m.get_col(3)
    c_ref = CSR.from_dense([[0], [40], [60], [0]])
    assert c.allclose(c_ref)


def test_get_row_by_index_1():
    # sparse.rs:919-952
    m = CSR.from_dense([
        [5, 6, 7, 8, 9],
        [0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0],
    ])
    assert m.get_row_complete(0).tolist() == [5, 6, 7, 8, 9]
    assert m.get_row_complete(1).tolist() == [0, 0, 0, 0, 0]
    assert m.get_row_complete(2).tolist() == [0, 0, 0, 0, 1]
    assert m.get_row_complete(3).tolist() == [1, 0, 0, 0, 0]

    assert [(int(e.v), e.col_index) for e in m.get_row_compact(0)] == [
        (5, 0), (6, 1), (7, 2), (8, 3), (9, 4)
    ]
    assert m.get_row_compact(1) == []
    assert [(int(e.v), e.col_index) for e in m.get_row_compact(2)] == [(1, 4)]
    assert [(int(e.v), e.col_index) for e in m.get_row_compact(3)] == [(1, 0)]


def test_get_row_by_index_single():
    # sparse.rs:955-966
    m = CSR.from_coo_arrays((5, 5), [0], [0], [2.0], dtype=np.float32)
    v = m.get_row_complete(0)
    assert v[0] == 2.0


def test_get_val_at():
    # sparse.rs:170-180
    m = CSR.from_dense(M_6COL)
    assert m.get_val_at((1, 3)) == 40
    assert m.get_val_at((0, 3)) is None


def test_transpose_1x1():
    # sparse.rs:969-974
    m = CSR.from_dense([[10]])
    assert m.transpose().allclose(CSR.from_dense([[10]]))


def test_transpose_nxn():
    # sparse.rs:977-995
    m = CSR.from_dense([
        [10, 5, 7, 9, 2],
        [10, 8, 5, 9, 3],
        [0, 5, 4, 6, 2],
        [1, 2, 7, 9, 2],
    ])
    ref = CSR.from_dense([
        [10, 10, 0, 1],
        [5, 8, 5, 2],
        [7, 5, 4, 7],
        [9, 9, 6, 9],
        [2, 3, 2, 2],
    ])
    assert m.transpose().allclose(ref)


def test_transpose_mxn():
    # sparse.rs:998-1017
    m = CSR.from_dense(M_6COL)
    ref = CSR.from_dense([
        [10, 0, 0, 0],
        [20, 30, 0, 0],
        [0, 0, 50, 0],
        [0, 40, 60, 0],
        [0, 0, 70, 0],
        [0, 0, 0, 80],
    ])
    t = m.transpose()
    assert t.allclose(ref)
    # round trip
    assert t.transpose().allclose(m)
    # pair_with_transpose (sparse.rs:320-323)
    a, at = m.pair_with_transpose()
    assert a.allclose(m) and at.allclose(ref)


def test_transpose_indices_sorted():
    # transposed CSR must itself be a valid sorted CSR
    rng = np.random.default_rng(0)
    d = (rng.random((13, 29)) < 0.2) * rng.integers(1, 9, (13, 29))
    t = CSR.from_dense(d).transpose()
    indptr, indices, _ = t.numpy()
    for r in range(t.rows):
        seg = indices[indptr[r]:indptr[r + 1]]
        assert (np.diff(seg) > 0).all()
    assert np.array_equal(np.asarray(t.todense()), d.T)


def test_submatrix():
    # sparse.rs:1326-1367
    a = CSR.from_dense([
        [5, 6, 7, 8, 9],
        [0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0],
    ])
    b = a.take_submatrix((0, 0), (3, 3))
    assert b.allclose(CSR.from_dense([[5, 6, 7], [0, 0, 0], [0, 0, 0]]))

    b = a.take_submatrix((1, 2), (4, 5))
    assert b.allclose(CSR.from_dense([[0, 0, 0], [0, 0, 1], [0, 0, 0]]))

    b = a.take_submatrix((0, 2), (3, 5))
    assert b.allclose(CSR.from_dense([[7, 8, 9], [0, 0, 0], [0, 0, 1]]))


def test_add_padding():
    # sparse.rs:1401-1421
    a = CSR.from_dense([
        [1, 1, 1],
        [1, 0, 0],
        [1, 0, 0],
    ])
    padded = a.add_padding((5, 5), (2, 2))
    ref = CSR.from_dense([
        [0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0],
        [0, 0, 1, 1, 1],
        [0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0],
    ])
    assert padded.allclose(ref)


def test_add_padding_errors():
    # sparse.rs:655-667
    a = CSR.from_dense([[1, 1], [1, 1]])
    with pytest.raises(PaddingSizeSmallerThanOriginal):
        a.add_padding((1, 1), (0, 0))
    with pytest.raises(IncorrectDimensions):
        a.add_padding((3, 3), (2, 2))


def test_display():
    # Display/Debug smoke (sparse.rs:777-805); reference's display_mat is
    # #[ignore]d but the impls exist.
    m = CSR.from_dense([[4.0, 12.0], [12.0, 37.0]])
    assert "12.0" in str(m)
    dbg = m.debug_str()
    assert "col_index" in dbg and "row_index" in dbg
