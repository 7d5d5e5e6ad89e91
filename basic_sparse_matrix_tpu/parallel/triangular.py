"""Distributed level-scheduled sparse triangular solve (component D4).

No reference counterpart — ``forward_substitution``/``backward_substitution``
(``/root/reference/src/lib.rs:28-65``) are strictly sequential. Here the
per-level independent rows of :class:`models.sparse_triangular.
TriangularSchedule` are split across the ``"rows"`` mesh axis: each device
solves its slice of a level locally, and one ``psum`` per level merges the
disjoint row updates back into the replicated solution vector. The level
barrier *is* the algorithmic dependency — SURVEY.md §5's "level-set batches
with inter-level dependency sync".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.sparse_triangular import TriangularSchedule, build_schedule
from ..ops.csr import CSR
from .mesh import ROWS


def _pad_axis(a: np.ndarray, axis: int, mult: int) -> np.ndarray:
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    # rows_by_level pads with n (scratch row), others with 0 — caller fixes.
    return np.pad(a, widths)


def shard_schedule(sched: TriangularSchedule, num: int):
    """Split each level's row batch across ``num`` devices (host-side)."""
    rbl = np.asarray(sched.rows_by_level)
    dc = np.asarray(sched.dep_cols)
    dv = np.asarray(sched.dep_vals)
    idg = np.asarray(sched.inv_diag)
    nlev, mr = rbl.shape
    pad = (-mr) % num
    if pad:
        rbl = np.pad(rbl, ((0, 0), (0, pad)), constant_values=sched.n)
        dc = np.pad(dc, ((0, 0), (0, pad), (0, 0)),
                    constant_values=sched.n)
        dv = np.pad(dv, ((0, 0), (0, pad), (0, 0)))
        idg = np.pad(idg, ((0, 0), (0, pad)))
    mr = rbl.shape[1]
    per = mr // num
    shape2 = (nlev, num, per)
    return (
        jnp.asarray(rbl.reshape(shape2)),
        jnp.asarray(dc.reshape(shape2 + dc.shape[2:])),
        jnp.asarray(dv.reshape(shape2 + dv.shape[2:])),
        jnp.asarray(idg.reshape(shape2)),
    )


def solve_triangular_sharded(sched: TriangularSchedule, b, mesh) -> jax.Array:
    """Distributed solve of the (lower-triangular) system encoded by
    ``sched``. ``b`` is replicated; returns the replicated solution."""
    num = mesh.shape[ROWS]
    rbl, dc, dv, idg = shard_schedule(sched, num)
    nlev = rbl.shape[0]
    n = sched.n
    b = jnp.asarray(b, dtype=jnp.float32)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]

    def body(rbl, dc, dv, idg, b):
        # local shapes: (nlev, 1, per[, D])
        x = jnp.concatenate(
            [b, jnp.zeros((1, b.shape[1]), dtype=b.dtype)]
        )

        def level_step(lv, x):
            rows = rbl[lv, 0]
            cols = dc[lv, 0]
            vals = dv[lv, 0]
            inv = idg[lv, 0]
            acc = jnp.einsum("rd,rdk->rk", vals, x[cols],
                             precision=jax.lax.Precision.HIGHEST)
            new = (x[rows] - acc) * inv[:, None]
            delta = jnp.zeros_like(x).at[rows].add(new - x[rows])
            # Disjoint rows per device → psum merges all level updates and
            # re-replicates x for the next (dependent) level.
            delta = jax.lax.psum(delta, ROWS)
            return x + delta

        x = jax.lax.fori_loop(0, nlev, level_step, x)
        return x[:n]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, ROWS), P(None, ROWS), P(None, ROWS),
                  P(None, ROWS), P()),
        out_specs=P(),
    )
    out = jax.jit(f)(rbl, dc, dv, idg, b)
    return out[:, 0] if squeeze else out


def solve_sparse_distributed(l: CSR, b, mesh, *, lower: bool = True):
    """Convenience wrapper: build the schedule for ``l`` then solve across
    the mesh."""
    sched = build_schedule(l, lower=lower)
    b = jnp.asarray(b)
    if not sched.lower:
        rev = jnp.flip(b, axis=0)
        return jnp.flip(solve_triangular_sharded(sched, rev, mesh), axis=0)
    return solve_triangular_sharded(sched, b, mesh)
