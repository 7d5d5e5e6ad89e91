"""Preconditioned conjugate gradient with an IC(0) preconditioner.

The scalable iterative companion to the reference's direct ``solve``
(``/root/reference/src/lib.rs:11-24``): same inputs (SPD sparse A, dense b),
but built from this framework's own primitives —

* SpMV: gather/segment kernel (``ops/spmm.spmv``)
* preconditioner: IC(0) factor from the level-scheduled scatter-list
  Cholesky (``models/sparse_cholesky.analyze(incomplete=True)``)
* preconditioner application: two level-set-parallel triangular solves per
  iteration (``models/sparse_triangular``)

Everything after setup is one jit-compiled ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSR
from ..utils.errors import NonSquareMatrix, check
from . import sparse_cholesky as sc
from .sparse_triangular import TriangularSchedule, build_schedule


@dataclasses.dataclass(frozen=True)
class PCGSetup:
    """Host-side preparation: IC(0) factor, both triangular schedules, and
    (when the padding overhead permits) an ELL view of A so the per-
    iteration matvec runs the scatter-free unrolled gather+FMA kernel."""

    a: CSR
    fwd: TriangularSchedule
    bwd: TriangularSchedule
    ell: Optional["ELL"] = None

    @staticmethod
    def build(a: CSR) -> "PCGSetup":
        check(a.rows == a.cols, NonSquareMatrix, f"pcg needs square {a.dims}")
        sched = sc.analyze(a, incomplete=True)
        lvals = sc.factorize(sched, a.values)
        l = sc.csc_to_csr_l(sched, np.asarray(jax.device_get(lvals)))
        fwd = build_schedule(l, lower=True)
        bwd = build_schedule(l.transpose(), lower=False)
        from ..ops.ell import csr_to_ell, ell_overhead
        from ..utils.config import get_config

        ell = None
        if a.stored and ell_overhead(a) <= get_config().ell_max_overhead:
            ell = csr_to_ell(a)
        return PCGSetup(a=a, fwd=fwd, bwd=bwd, ell=ell)


@partial(jax.jit, static_argnums=(3,))
def _pcg_loop(setup: PCGSetup, b: jax.Array, tol: jax.Array,
              max_iters: int):
    from ..ops.spmm import spmv
    from .sparse_triangular import _solve_scheduled

    a = setup.a

    def apply_m_inv(r):
        y = _solve_scheduled(setup.fwd, r)
        # bwd schedule encodes the mirrored problem: flip in, flip out.
        return jnp.flip(_solve_scheduled(setup.bwd, jnp.flip(y, 0)), 0)

    x = jnp.zeros_like(b)
    r = b
    z = apply_m_inv(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        x, r, p, z, rz, it = state
        return jnp.logical_and(it < max_iters,
                               jnp.linalg.norm(r) / bnorm > tol)

    def body(state):
        x, r, p, z, rz, it = state
        if setup.ell is not None:
            from ..ops.ell import spmv_ell

            ap = spmv_ell(setup.ell, p)
        else:
            ap = spmv(a, p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        z = apply_m_inv(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, z, rz_new, it + 1

    x, r, p, z, rz, it = jax.lax.while_loop(
        cond, body, (x, r, p, z, rz, jnp.zeros((), jnp.int32)))
    return x, it, jnp.linalg.norm(r) / bnorm


jax.tree_util.register_dataclass(
    PCGSetup, data_fields=["a", "fwd", "bwd", "ell"], meta_fields=[],
)


def pcg_solve(a: CSR, b, *, tol: float = 1e-6, max_iters: int = 1000,
              setup: Optional[PCGSetup] = None
              ) -> Tuple[jax.Array, int, float]:
    """Solve ``A x = b`` (SPD) by IC(0)-preconditioned CG. Returns
    (x, iterations, final relative residual). Pass a prebuilt ``setup`` to
    amortise the symbolic work across solves."""
    if setup is None:
        setup = PCGSetup.build(a)
    b = jnp.asarray(b, dtype=jnp.float32)
    x, it, res = _pcg_loop(setup, b, jnp.float32(tol), max_iters)
    return x, int(it), float(res)
