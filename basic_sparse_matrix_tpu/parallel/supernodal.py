"""Distributed supernodal Cholesky (panel-granular D3).

The supernodal numeric phase (:mod:`models.supernodal`) parallelises the
same way as the scalar scatter-list one (:mod:`parallel.cholesky`): within a
fan-in level, both the panel-update batch and the panel finalisations are
independent, so each device takes a slice of the level's update list and of
its panel list, and one ``psum`` per phase merges the disjoint
contributions. The per-update work here is a dense outer product (MXU) —
this is the "fan-out elimination-tree schedule with column-panel broadcasts"
of BASELINE.json's north star, with the broadcast realised as the
psum-replicated factor value array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.supernodal import (
    SupernodalSchedule,
    analyze_supernodal,
    assemble_factor,
)
from ..ops.csr import CSR
from .mesh import ROWS


def _split(a: np.ndarray, num: int, pad_value) -> np.ndarray:
    """Pad axis 1 (the group's update/panel batch; axis 0 is the group's
    level count) to a multiple of ``num`` devices and expose the device
    axis: (g, M, ...) → (g, num, M/num, ...)."""
    g, m = a.shape[0], a.shape[1]
    pad = (-m) % num
    if pad:
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
        a = np.pad(a, widths, constant_values=pad_value)
    m = a.shape[1]
    return a.reshape((g, num, m // num) + a.shape[2:])


def factorize_supernodal_sharded(sched: SupernodalSchedule, a_values,
                                 mesh) -> jax.Array:
    num = mesh.shape[ROWS]
    scratch = sched.nnz_l
    uga = tuple(jnp.asarray(_split(np.asarray(t), num, scratch))
                for t in sched.upd_gather_a)
    ugb = tuple(jnp.asarray(_split(np.asarray(t), num, scratch))
                for t in sched.upd_gather_b)
    usc = tuple(jnp.asarray(_split(np.asarray(t), num, scratch))
                for t in sched.upd_scatter)
    tpos = tuple(jnp.asarray(_split(np.asarray(t), num, scratch))
                 for t in sched.top_pos)
    bpos = tuple(jnp.asarray(_split(np.asarray(t), num, scratch))
                 for t in sched.below_pos)
    tval = tuple(jnp.asarray(_split(np.asarray(t), num, False))
                 for t in sched.top_valid)
    nlev = len(uga)
    a_vals = jnp.asarray(a_values)

    def level_step(lvals, tabs):
        ga, gb, sc, tp, bp, tv = tabs
        # local slice of this level's panel-update batch → psum merge
        A = lvals[ga]
        B = lvals[gb]
        U = jnp.einsum("uiw,ujw->uij", A, B,
                       precision=jax.lax.Precision.HIGHEST)
        delta = jnp.zeros_like(lvals).at[sc].add(-U)
        delta = delta.at[-1].set(0.0)
        lvals = lvals + jax.lax.psum(delta, ROWS)

        # local slice of this level's panels → psum publish
        T = lvals[tp]
        eye = jnp.eye(T.shape[-1], dtype=T.dtype)
        Tsym = T + jnp.where(tv[:, :, None] & tv[:, None, :], 0.0, eye)
        Lt = jnp.linalg.cholesky(
            Tsym + jnp.triu(jnp.swapaxes(Tsym, 1, 2), 1))
        Bp = lvals[bp]
        Bn = jax.scipy.linalg.solve_triangular(
            Lt, jnp.swapaxes(Bp, 1, 2), lower=True)
        Bn = jnp.swapaxes(Bn, 1, 2)
        newT = jnp.where(jnp.isfinite(Lt), jnp.tril(Lt), 0.0)
        fix = jnp.zeros_like(lvals).at[tp].add(newT - T)
        fix = fix.at[bp].add(Bn - Bp)
        fix = fix.at[-1].set(0.0)
        return lvals + jax.lax.psum(fix, ROWS)

    def body(uga, ugb, usc, tpos, bpos, tval, a_vals):
        lvals = jnp.zeros(sched.nnz_l + 1, dtype=jnp.float32)
        lvals = lvals.at[sched.a_src_pos].add(
            a_vals[sched.a_vals_idx].astype(jnp.float32))

        for gi in range(nlev):
            # local tables: (g, 1, U_local, ...) → scan over g, drop the
            # local device axis
            tabs = tuple(t[gi][:, 0]
                         for t in (uga, ugb, usc, tpos, bpos, tval))
            if tabs[0].shape[0] == 1:
                lvals = level_step(lvals, tuple(t[0] for t in tabs))
            else:
                lvals, _ = jax.lax.scan(
                    lambda lv, t: (level_step(lv, t), None), lvals, tabs)

        return lvals[:-1]

    spec = lambda tables: tuple(P(None, ROWS) for _ in tables)  # noqa: E731
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec(uga), spec(ugb), spec(usc),
                  spec(tpos), spec(bpos), spec(tval), P()),
        out_specs=P(),
    )
    return jax.jit(f)(uga, ugb, usc, tpos, bpos, tval, a_vals)


def cholesky_supernodal_distributed(a: CSR, mesh, *, relax: int = 0) -> CSR:
    sched = analyze_supernodal(a, relax=relax)
    lvals = np.asarray(
        jax.device_get(factorize_supernodal_sharded(sched, a.values, mesh)))
    return assemble_factor(a, lvals, sched)
