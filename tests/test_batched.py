"""Batched-values capability: one symbolic schedule, many numeric systems —
the jax-native way to factor/solve families of matrices sharing a pattern
(vmap over the value array). No reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import analyze, factorize
from basic_sparse_matrix_tpu.ops.spmm import spmm


def test_vmapped_factorization():
    # family of tridiagonal SPD matrices with shared pattern
    n, batch = 16, 5
    base = (4 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(
        np.float32)
    a = CSR.from_dense(base)
    sched = analyze(a)
    rng = np.random.default_rng(0)
    scales = (1.0 + rng.random(batch)).astype(np.float32)
    batched_vals = jnp.asarray(scales)[:, None] * a.values[None, :]

    lvals_batch = jax.vmap(lambda v: factorize(sched, v))(batched_vals)
    assert lvals_batch.shape[0] == batch
    for i, s in enumerate(scales):
        ref = np.linalg.cholesky((s * base).astype(np.float64))
        from basic_sparse_matrix_tpu.models.sparse_cholesky import (
            csc_to_csr_l,
        )

        l = csc_to_csr_l(sched, np.asarray(lvals_batch[i]))
        assert np.allclose(np.asarray(l.todense()), ref, rtol=1e-4,
                           atol=1e-5)


def test_vmapped_spmm():
    rng = np.random.default_rng(1)
    d = ((rng.random((20, 30)) < 0.2)
         * rng.standard_normal((20, 30))).astype(np.float32)
    a = CSR.from_dense(d)
    batch_b = jnp.asarray(rng.standard_normal((4, 30, 8)).astype(np.float32))
    out = jax.vmap(lambda bb: spmm(a, bb))(batch_b)
    for i in range(4):
        assert np.allclose(np.asarray(out[i]), d @ np.asarray(batch_b[i]),
                           rtol=1e-4, atol=1e-4)


def test_vmapped_values_spmm():
    # same pattern, batched values
    rng = np.random.default_rng(2)
    d = ((rng.random((15, 15)) < 0.3)
         * rng.standard_normal((15, 15))).astype(np.float32)
    a = CSR.from_dense(d)
    b = jnp.asarray(rng.standard_normal((15, 4)).astype(np.float32))
    vals_batch = jnp.asarray(
        rng.standard_normal((3, a.stored)).astype(np.float32))

    def run(v):
        return spmm(CSR(a.indptr, a.indices, v, a.rows, a.cols), b)

    out = jax.vmap(run)(vals_batch)
    indptr, indices, _ = a.numpy()
    rows = np.repeat(np.arange(15), np.diff(indptr))
    for i in range(3):
        dense = np.zeros((15, 15), dtype=np.float32)
        dense[rows, indices] = np.asarray(vals_batch[i])
        assert np.allclose(np.asarray(out[i]), dense @ np.asarray(b),
                           rtol=1e-4, atol=1e-4)
