"""Dense wrapper tests ported from the reference (dense.rs:65-91,
dense_static.rs:71-97)."""

import numpy as np

from basic_sparse_matrix_tpu import Dense, DenseS


def test_init():
    # dense.rs:68-79 — note reference arg order (cols, rows)
    a = Dense.new_default_with_dims(5, 7)
    b = Dense.from_data([[0] * 7] * 5)
    assert a == b
    assert a.dims.rows == 7 and a.dims.cols == 5


def test_get_col():
    # dense.rs:81-90
    a = Dense.from_data([
        [1, 2, 3],
        [4, 5, 6],
        [7, 8, 9],
    ])
    assert np.asarray(a.get_col(2)).tolist() == [7, 8, 9]


def test_dense_static_alias():
    # dense_static.rs:71-97 — static shapes are jit-specialised shapes; DenseS
    # is the same type
    assert DenseS is Dense
    a = DenseS.from_data([
        [1, 2, 3],
        [4, 5, 6],
        [7, 8, 9],
    ])
    assert np.asarray(a.get_col(2)).tolist() == [7, 8, 9]


def test_set_col():
    a = Dense.new_default_with_dims(2, 3)
    b = a.set_col(1, [1, 2, 3])
    assert np.asarray(b.get_col(1)).tolist() == [1, 2, 3]
    assert np.asarray(a.get_col(1)).tolist() == [0, 0, 0]  # immutable
