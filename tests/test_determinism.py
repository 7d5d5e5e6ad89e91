"""Determinism tests — the SPMD analogue of race detection (SURVEY.md §5):
same inputs ⇒ bitwise-identical results across runs, including through the
distributed paths where a nondeterministic reduction order would show up as
run-to-run drift."""

import jax.numpy as jnp
import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import (
    analyze,
    factorize,
)
from basic_sparse_matrix_tpu.ops import add_sparse, spmm, transpose
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.sharded import put_sharded, shard_csr
from basic_sparse_matrix_tpu.parallel.spmm import spmm_ring, spmm_sharded


def _mat(seed=0, rows=64, cols=80, density=0.15):
    rng = np.random.default_rng(seed)
    d = ((rng.random((rows, cols)) < density)
         * rng.standard_normal((rows, cols))).astype(np.float32)
    return CSR.from_dense(d), d


def test_spmm_bitwise_deterministic():
    a, _ = _mat()
    b = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((80, 16)).astype(np.float32))
    o1 = np.asarray(spmm(a, b))
    o2 = np.asarray(spmm(a, b))
    assert np.array_equal(o1, o2)


def test_transpose_add_deterministic():
    a, _ = _mat(2)
    b, _ = _mat(3)
    t1, t2 = np.asarray(transpose(a).values), np.asarray(transpose(a).values)
    assert np.array_equal(t1, t2)
    c1 = np.asarray(add_sparse(a, b).values)
    c2 = np.asarray(add_sparse(a, b).values)
    assert np.array_equal(c1, c2)


def test_factorize_bitwise_deterministic():
    rng = np.random.default_rng(4)
    m = rng.standard_normal((24, 24)).astype(np.float32)
    spd = m @ m.T + 24 * np.eye(24, dtype=np.float32)
    a = CSR.from_dense(spd)
    sched = analyze(a)
    l1 = np.asarray(factorize(sched, a.values))
    l2 = np.asarray(factorize(sched, a.values))
    assert np.array_equal(l1, l2)


def test_distributed_spmm_deterministic():
    a, _ = _mat(5, rows=96, cols=96)
    b = jnp.asarray(np.random.default_rng(6)
                    .standard_normal((96, 8)).astype(np.float32))
    mesh = row_mesh(8)
    sa = put_sharded(shard_csr(a, 8), mesh)
    o1 = np.asarray(spmm_sharded(sa, b, mesh))
    o2 = np.asarray(spmm_sharded(sa, b, mesh))
    assert np.array_equal(o1, o2)
    r1 = np.asarray(spmm_ring(sa, b, mesh))
    r2 = np.asarray(spmm_ring(sa, b, mesh))
    assert np.array_equal(r1, r2)
