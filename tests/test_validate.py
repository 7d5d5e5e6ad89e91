"""Validation subsystem tests."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.cholesky import cholesky
from basic_sparse_matrix_tpu.runtime.validate import (
    NumericalError,
    check_finite,
    check_spd_result,
    validate_csr,
)
from basic_sparse_matrix_tpu.utils.errors import IncorrectDimensions


def test_validate_good_csr():
    a = CSR.from_dense([[1, 0, 2], [0, 3, 0]])
    validate_csr(a)


def test_validate_catches_bad_indices():
    import jax.numpy as jnp

    bad = CSR(
        indptr=jnp.asarray([0, 1], dtype=jnp.int32),
        indices=jnp.asarray([7], dtype=jnp.int32),  # out of range for cols=3
        values=jnp.asarray([1.0], dtype=jnp.float32),
        rows=1, cols=3,
    )
    with pytest.raises(IncorrectDimensions):
        validate_csr(bad)


def test_validate_catches_bad_indptr():
    import jax.numpy as jnp

    bad = CSR(
        indptr=jnp.asarray([0, 2, 1], dtype=jnp.int32),  # not monotone
        indices=jnp.asarray([0, 1], dtype=jnp.int32),
        values=jnp.asarray([1.0, 2.0], dtype=jnp.float32),
        rows=2, cols=3,
    )
    with pytest.raises(IncorrectDimensions):
        validate_csr(bad)


def test_check_finite():
    check_finite(np.asarray([1.0, 2.0]))
    with pytest.raises(NumericalError):
        check_finite(np.asarray([1.0, np.nan]))


def test_spd_guard_converts_silent_nan():
    # reference behaviour: non-SPD input → NaN factor, no error
    # (sparse.rs:704); the guard turns it into a typed error
    l = cholesky(CSR.from_dense([[1.0, 2.0], [2.0, 1.0]]))
    with pytest.raises(NumericalError):
        check_spd_result(l)
    good = cholesky(CSR.from_dense([[4.0, 0.0], [0.0, 9.0]]))
    assert check_spd_result(good) is good


def test_with_val_at():
    a = CSR.from_dense([[1, 0], [0, 2]])
    b = a.with_val_at((0, 1), 5)
    assert np.asarray(b.todense()).tolist() == [[1, 5], [0, 2]]
    c = a.with_val_at((1, 1), 7)  # update existing
    assert np.asarray(c.todense()).tolist() == [[1, 0], [0, 7]]
    # original untouched (immutability)
    assert np.asarray(a.todense()).tolist() == [[1, 0], [0, 2]]
