"""Distributed level-scheduled sparse Cholesky (component D3).

No reference counterpart. The scatter-list numeric phase of
:mod:`models.sparse_cholesky` parallelises naturally: within one etree
fan-in level, both the update triples and the column finalisations are
independent, so each device applies its slice and one ``psum`` per level
merges the disjoint contributions into the replicated factor value array.
This is the fan-out elimination-tree schedule of BASELINE.json's north star
in its simplest mesh form (updates sharded; column-panel broadcast ≡ the
psum-replicated factor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.sparse_cholesky import CholeskySchedule, analyze, csc_to_csr_l
from ..ops.csr import CSR
from .mesh import ROWS


def _split(a: np.ndarray, num: int, pad_value) -> np.ndarray:
    """(nlev, M, ...) → (nlev, num, M'/num, ...) padded with ``pad_value``."""
    nlev, m = a.shape[0], a.shape[1]
    pad = (-m) % num
    if pad:
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
        a = np.pad(a, widths, constant_values=pad_value)
    m = a.shape[1]
    return a.reshape((nlev, num, m // num) + a.shape[2:])


def factorize_sharded(sched: CholeskySchedule, a_values, mesh) -> jax.Array:
    """Distributed numeric phase: returns L's CSC value array (replicated)."""
    num = mesh.shape[ROWS]
    scratch = sched.nnz_l
    upd_dst = jnp.asarray(_split(np.asarray(sched.upd_dst), num, scratch))
    upd_a = jnp.asarray(_split(np.asarray(sched.upd_a), num, scratch))
    upd_b = jnp.asarray(_split(np.asarray(sched.upd_b), num, scratch))
    col_pos = jnp.asarray(_split(np.asarray(sched.col_pos), num, scratch))
    nlev = upd_dst.shape[0]

    a_vals = jnp.asarray(a_values)

    def body(upd_dst, upd_a, upd_b, col_pos, a_vals):
        lvals = jnp.zeros(sched.nnz_l + 1, dtype=jnp.float32)
        lvals = lvals.at[sched.a_src_pos].add(
            a_vals[sched.a_vals_idx].astype(jnp.float32)
        )

        def level_step(lv, lvals):
            # Each device applies its slice of this level's update triples;
            # destinations are disjoint across slices only in aggregate, so
            # merge the *deltas* with a psum.
            delta_vec = jnp.zeros_like(lvals)
            delta = lvals[upd_a[lv, 0]] * lvals[upd_b[lv, 0]]
            delta_vec = delta_vec.at[upd_dst[lv, 0]].add(-delta)
            delta_vec = delta_vec.at[-1].set(0.0)
            lvals = lvals + jax.lax.psum(delta_vec, ROWS)
            # Column finalisation: disjoint columns per device; publish the
            # changed entries via psum of (new - old).
            pos = col_pos[lv, 0]
            colv = lvals[pos]
            diag = jnp.sqrt(colv[:, 0])
            inv = jnp.where(diag > 0, 1.0 / jnp.maximum(diag, 1e-30), 0.0)
            new = jnp.concatenate(
                [diag[:, None], colv[:, 1:] * inv[:, None]], axis=1
            )
            fix = jnp.zeros_like(lvals).at[pos].add(new - colv)
            fix = fix.at[-1].set(0.0)
            return lvals + jax.lax.psum(fix, ROWS)

        lvals = jax.lax.fori_loop(0, nlev, level_step, lvals)
        return lvals[:-1]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, ROWS), P(None, ROWS), P(None, ROWS),
                  P(None, ROWS), P()),
        out_specs=P(),
    )
    return jax.jit(f)(upd_dst, upd_a, upd_b, col_pos, a_vals)


def cholesky_sparse_distributed(a: CSR, mesh) -> CSR:
    """End-to-end distributed sparse Cholesky."""
    sched = analyze(a)
    lvals = jax.device_get(factorize_sharded(sched, a.values, mesh))
    return csc_to_csr_l(sched, lvals)
