"""Interop with the JAX ecosystem's sparse types and scipy.

``jax.experimental.sparse.BCOO`` is the ecosystem's batched-COO type; these
converters let users move between it and this framework's CSR (and
scipy.sparse on the host) without round-tripping through dense.
"""

from __future__ import annotations

import numpy as np

from .csr import CSR


def to_bcoo(a: CSR):
    """CSR → ``jax.experimental.sparse.BCOO`` (sorted indices)."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    rows = a.row_ids()
    indices = jnp.stack([rows, a.indices], axis=1)
    return jsparse.BCOO(
        (a.values, indices), shape=a.shape, indices_sorted=True,
        unique_indices=True,
    )


def from_bcoo(m) -> CSR:
    """``BCOO`` → CSR (host conversion; duplicates summed)."""
    indices = np.asarray(m.indices)
    values = np.asarray(m.data)
    return CSR.from_coo_arrays(
        m.shape, indices[:, 0], indices[:, 1], values,
        sum_duplicates=True, drop_zeros=False,
    )


def to_scipy(a: CSR):
    """CSR → ``scipy.sparse.csr_matrix`` (if scipy is available)."""
    from scipy import sparse as sp  # optional dependency

    indptr, indices, values = a.numpy()
    return sp.csr_matrix((values, indices, indptr), shape=a.shape)


def from_scipy(m) -> CSR:
    """Any scipy sparse matrix → CSR."""
    m = m.tocsr()
    rows = np.repeat(np.arange(m.shape[0]), np.diff(m.indptr))
    return CSR.from_coo_arrays(
        m.shape, rows, m.indices, m.data,
        sum_duplicates=False, drop_zeros=False,
    )
