"""CSR transpose as an XLA sort — O(nnz log nnz), jit-compiled.

Reference counterpart: ``Csr::transpose`` (``/root/reference/src/
sparse.rs:296-318``), which for every output column scans *all* entries —
O(cols·nnz). Here: expand row ids, stable-argsort by column id (stability
preserves the row order within a column, giving sorted CSC = transposed CSR),
and rebuild ``indptr`` with a bincount + cumsum. Everything is static-shape,
so the whole thing fuses into a handful of XLA ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .csr import CSR


@jax.jit
def transpose(a: CSR) -> CSR:
    rows = a.row_ids()
    perm = jnp.argsort(a.indices, stable=True)
    counts = jnp.zeros(a.cols, dtype=jnp.int32).at[a.indices].add(1)
    indptr = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    return CSR(
        indptr=indptr,
        indices=rows[perm],
        values=a.values[perm],
        rows=a.cols,
        cols=a.rows,
    )
