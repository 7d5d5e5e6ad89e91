"""Linear-system solver: Cholesky → forward → backward substitution.

Reference counterpart: ``solve`` (``/root/reference/src/lib.rs:11-24``):
``A = L·Lᵀ``; ``L y = b``; ``Lᵀ x = y``. The reference transposes L
explicitly and loops columns of b; here the pipeline is one jit-compiled
device program (transpose folded into ``solve_triangular``'s trans flag, RHS
batched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.csr import CSR
from ..ops.dense import Dense
from ..utils.errors import IncorrectDimensions, NonSquareMatrix, check
from .triangular import _as_array


@jax.jit
def solve_dense(a: jax.Array, b: jax.Array) -> jax.Array:
    """Jittable SPD solve on dense operands: one fused factor+solve
    pipeline."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    l = jnp.linalg.cholesky(a)
    y = jsl.solve_triangular(l, b, lower=True)
    return jsl.solve_triangular(l, y, lower=True, trans=1)


def solve(a: CSR, b) -> jax.Array:
    """Solve ``A x = b`` for SPD sparse ``A`` — reference ``solve``
    (lib.rs:11-24). ``b`` may be a Dense wrapper, 1D vector, or (n, k)
    array; returns an (n, k) array."""
    check(a.rows == a.cols, NonSquareMatrix,
          f"solve requires square A, got {a.dims}")
    rhs = _as_array(b)
    check(rhs.shape[0] == a.rows, IncorrectDimensions,
          f"solve: A {a.dims} vs b {rhs.shape}")
    return solve_dense(a.todense(), rhs)


def solve_sparse(a: CSR, b, *, reorder: bool = True) -> jax.Array:
    """Fully sparse solve pipeline: fill-reducing preordering (config
    ``ordering``: auto picks the lower predicted fill of RCM vs nested
    dissection — internal, the returned x is for the original system) →
    level-scheduled Cholesky factorization (symbolic analysis in the native
    runtime) → level-set-parallel forward/backward substitution. The
    scalable counterpart of :func:`solve` for matrices where densifying is
    wasteful."""
    from ..ops.reorder import (
        apply_perm,
        best_permutation,
        nd_permutation,
        permute_symmetric,
        rcm_permutation,
    )
    from ..utils.config import get_config
    from .sparse_cholesky import cholesky_sparse
    from .sparse_triangular import solve_triangular_sparse

    check(a.rows == a.cols, NonSquareMatrix,
          f"solve_sparse requires square A, got {a.dims}")
    rhs = _as_array(b)
    check(rhs.shape[0] == a.rows, IncorrectDimensions,
          f"solve_sparse: A {a.dims} vs b {rhs.shape}")
    perm = None
    if reorder:
        ordering = get_config().ordering
        if ordering == "auto":
            perm, _ = best_permutation(a)
        elif ordering == "rcm":
            perm = rcm_permutation(a)
        elif ordering == "nd":
            perm = nd_permutation(a)
        if perm is not None:
            a = permute_symmetric(a, perm)
            rhs = apply_perm(rhs, perm)
    # factorization choice, cheapest check first:
    # 1. banded block-tridiagonal scan when the (reordered) bandwidth fits a
    #    small block — one shape for the whole factorization + both solves;
    # 2. supernodal panel phase when the pattern amalgamates into panels
    #    (measured 3.9-8.1x the scatter-list phase on TPU at width ~9);
    # 3. scalar scatter-list path otherwise. The supernodal dispatch uses
    #    the cheap partition-only pass; the full schedule is built only when
    #    it wins, and both share one chol_symbolic via the instance cache.
    from . import banded as _bd

    nb = _bd.banded_block_choice(a)
    if nb is not None:
        x = _bd.solve_banded(a, rhs, nb)
        if perm is not None:
            x = apply_perm(x, perm, inverse=True)
        return x
    from ..utils.config import get_config
    from . import supernodal as _sn

    width, _ = _sn.supernode_stats(a, relax=get_config().supernodal_relax)
    if width >= 2.0:
        import jax as _jax
        import numpy as _np

        sched = _sn.analyze_supernodal(
            a, relax=get_config().supernodal_relax)
        lvals = _np.asarray(_jax.device_get(
            _sn.factorize_supernodal(sched, a.values)))
        l = _sn.assemble_factor(a, lvals, sched)
    else:
        l = cholesky_sparse(a)
    y = solve_triangular_sparse(l, rhs, lower=True)
    x = solve_triangular_sparse(l.transpose(), y, lower=False)
    if perm is not None:
        x = apply_perm(x, perm, inverse=True)
    return x


def solve_auto(a: CSR, b) -> jax.Array:
    """Dispatch between the dense XLA pipeline (small or dense-ish A) and
    the sparse level-scheduled pipeline (large sparse A) — mirroring
    ``cholesky_auto``'s policy."""
    from ..utils.config import get_config

    cfg = get_config()
    if (a.rows <= cfg.dense_cholesky_max_n
            or a.get_density() > cfg.dense_cholesky_min_density):
        return solve(a, b)
    return solve_sparse(a, b)
