"""Validation and failure-detection utilities (SURVEY.md §5).

The reference's failure story is ``Result<_, MatErr>`` plus panics; here:
construction-time structural validation of sparse formats, finite-value
checks for numeric phases (the reference silently produces NaN on non-SPD
Cholesky input, sparse.rs:704 — ``check_spd_result`` turns that into a
typed error when wanted), and jit-compatible guards via ``checkify``.
"""

from __future__ import annotations

import numpy as np

from ..ops.csr import CSR
from ..utils.errors import IncorrectDimensions, MatErr, check


class NumericalError(MatErr):
    """NaN/Inf detected where a finite result was required."""


def validate_csr(a: CSR, *, require_sorted: bool = True,
                 allow_duplicates: bool = True) -> None:
    """Structural invariants: indptr monotone with correct endpoints,
    indices in range, rows sorted (optionally strictly)."""
    indptr, indices, values = a.numpy()
    check(indptr.shape[0] == a.rows + 1, IncorrectDimensions,
          f"indptr length {indptr.shape[0]} != rows+1")
    check(int(indptr[0]) == 0 and int(indptr[-1]) == a.stored,
          IncorrectDimensions, "indptr endpoints invalid")
    check(bool((np.diff(indptr) >= 0).all()), IncorrectDimensions,
          "indptr not monotone")
    check(indices.shape[0] == values.shape[0] == a.stored,
          IncorrectDimensions, "indices/values length mismatch")
    if a.stored:
        check(bool((indices >= 0).all() and (indices < a.cols).all()),
              IncorrectDimensions, "column index out of range")
    if require_sorted and a.stored:
        rows = np.repeat(np.arange(a.rows), np.diff(indptr))
        keys = rows.astype(np.int64) * a.cols + indices
        diffs = np.diff(keys)
        ok = (diffs >= 0).all() if allow_duplicates else (diffs > 0).all()
        check(bool(ok), IncorrectDimensions, "entries not row-major sorted")


def check_finite(x, what: str = "result") -> None:
    """Raise :class:`NumericalError` if ``x`` (array or CSR) contains
    NaN/Inf. Host-side."""
    arr = np.asarray(x.values if isinstance(x, CSR) else x)
    if not np.isfinite(arr).all():
        bad = int((~np.isfinite(arr)).sum())
        raise NumericalError(f"{what} contains {bad} non-finite values")


def check_spd_result(l: CSR) -> CSR:
    """Validate a Cholesky factor: finite with positive diagonal —
    converting the reference's silent-NaN behaviour on non-SPD input into a
    typed error."""
    check_finite(l, "cholesky factor")
    diag = np.asarray(l.todense()).diagonal()
    if not (diag > 0).all():
        raise NumericalError(
            "cholesky factor has non-positive diagonal (input not SPD?)"
        )
    return l


def checkified(fn):
    """Wrap a jittable function with ``checkify`` NaN/div checks; returns
    ``(err, out)`` — the jit-compatible guard for long-running kernels."""
    import jax
    from jax.experimental import checkify

    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.user_checks
    )
