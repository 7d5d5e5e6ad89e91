"""Checkpoint / resume for sparse matrices and factorizations.

The reference has **no** serialization of any kind (SURVEY.md §5; no serde
dep, ``/root/reference/Cargo.toml:8``). Here: ``.npz`` save/load of CSR
triples and Cholesky factors, plus mid-factorization checkpointing so a long
level-scheduled factorization can resume from the last completed level —
the elastic-recovery story for large SPD solves.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..ops.csr import CSR


def save_csr(path: str, a: CSR) -> None:
    indptr, indices, values = a.numpy()
    np.savez_compressed(
        path, indptr=indptr, indices=indices, values=values,
        rows=a.rows, cols=a.cols, kind="csr",
    )


def load_csr(path: str) -> CSR:
    with np.load(path) as z:
        return CSR.from_coo_arrays(
            (int(z["rows"]), int(z["cols"])),
            np.repeat(np.arange(int(z["rows"])), np.diff(z["indptr"])),
            z["indices"],
            z["values"],
            sum_duplicates=False,
            drop_zeros=False,
        )


def save_banded(path: str, fac) -> None:
    """Persist a banded direct-solve factor: a
    :class:`models.banded.BandedFactor` (scan backend) is saved as its L/F
    blocks; a :class:`models.bcr.BCRSolver` (the default ``bcr`` backend) is
    saved as its D/E operand blocks — the elimination state is a tuple of
    per-level stacks, so persistence stores the blocks and re-runs the
    (sub-millisecond) ``factor_bcr`` on load."""
    import jax

    from ..models.bcr import BCRSolver

    if isinstance(fac, BCRSolver):
        np.savez_compressed(
            path, D=np.asarray(jax.device_get(fac.D)),
            E=np.asarray(jax.device_get(fac.E)), n=fac.n, nb=fac.nb,
            kind="bcr-blocks",
        )
        return
    np.savez_compressed(
        path, L=np.asarray(jax.device_get(fac.L)),
        F=np.asarray(jax.device_get(fac.F)), n=fac.n, kind="banded",
    )


def load_banded(path: str):
    import jax.numpy as jnp

    from ..models.banded import BandedFactor

    with np.load(path) as z:
        if "kind" in z and str(z["kind"]) == "bcr-blocks":
            from ..models.bcr import BCRSolver, factor_bcr

            D, E = jnp.asarray(z["D"]), jnp.asarray(z["E"])
            return BCRSolver(fac=factor_bcr(D, E), D=D, E=E,
                             n=int(z["n"]), nb=int(z["nb"]))
        return BandedFactor(L=jnp.asarray(z["L"]), F=jnp.asarray(z["F"]),
                            n=int(z["n"]))


def save_direct(path: str, solver) -> None:
    """Persist a prepared :class:`models.solve.DirectSolver` INCLUDING its
    internal fill-reducing permutation (the banded factor alone lives in
    permuted space — reloading it without ``perm`` solves the wrong
    system). Banded backends only; the supernodal/scatter schedules are
    cheap to rebuild via ``prepare_direct`` and are not serialised."""
    import jax

    from ..models.bcr import BCRSolver

    perm = (np.asarray(solver.perm) if solver.perm is not None
            else np.empty(0, dtype=np.int64))
    if solver.kind == "banded-bcr":
        f = solver._banded
        np.savez_compressed(
            path, perm=perm, n=solver.n, nb=f.nb, kind="direct-bcr",
            D=np.asarray(jax.device_get(f.D)),
            E=np.asarray(jax.device_get(f.E)),
        )
    elif solver.kind == "banded":
        f = solver._banded
        np.savez_compressed(
            path, perm=perm, n=solver.n, kind="direct-banded",
            L=np.asarray(jax.device_get(f.L)),
            F=np.asarray(jax.device_get(f.F)),
        )
    else:
        raise ValueError(
            f"save_direct supports the banded backends, not {solver.kind!r};"
            " rebuild via prepare_direct instead")


def load_direct(path: str):
    """Reload a :func:`save_direct` checkpoint as a ready
    :class:`models.solve.DirectSolver`."""
    import jax.numpy as jnp

    from ..models.banded import BandedFactor
    from ..models.bcr import BCRSolver, factor_bcr
    from ..models.solve import DirectSolver

    with np.load(path) as z:
        s = DirectSolver.__new__(DirectSolver)
        s.n = int(z["n"])
        perm = z["perm"]
        s.perm = perm if perm.size else None
        s._l = s._fwd = s._bwd = None
        if str(z["kind"]) == "direct-bcr":
            D, E = jnp.asarray(z["D"]), jnp.asarray(z["E"])
            s.kind = "banded-bcr"
            s._banded = BCRSolver(fac=factor_bcr(D, E), D=D, E=E,
                                  n=s.n, nb=int(z["nb"]))
        else:
            s.kind = "banded"
            s._banded = BandedFactor(L=jnp.asarray(z["L"]),
                                     F=jnp.asarray(z["F"]), n=s.n)
        return s


def save_factor_state(path: str, lvals: np.ndarray, level_done: int,
                      meta: Optional[dict] = None) -> None:
    """Persist a partially-completed numeric factorization: the factor value
    array plus the index of the last fully-applied level."""
    np.savez_compressed(
        path, lvals=np.asarray(lvals), level_done=level_done,
        **(meta or {}),
    )


def load_factor_state(path: str) -> Tuple[np.ndarray, int]:
    with np.load(path) as z:
        return z["lvals"], int(z["level_done"])


def checkpointed_factorize(sched, a_values, path: str,
                           every: int = 64) -> np.ndarray:
    """Run the level-scheduled Cholesky numeric phase with periodic
    host-side checkpoints; resumes from ``path`` if present.

    Uses the same level-step kernel as ``models.sparse_cholesky.factorize``
    but drives the level loop from the host in ``every``-level chunks so the
    factor state can be snapshotted between chunks.
    """
    import jax
    import jax.numpy as jnp

    from ..models.sparse_cholesky import CholeskySchedule  # noqa: F401

    nlev = sched.upd_dst.shape[0]
    start = 0
    if os.path.exists(path):
        lvals_np, start = load_factor_state(path)
        lvals = jnp.asarray(lvals_np)
    else:
        lvals = jnp.zeros(sched.nnz_l + 1, dtype=jnp.float32)
        lvals = lvals.at[sched.a_src_pos].add(
            jnp.asarray(a_values)[sched.a_vals_idx].astype(jnp.float32)
        )

    @jax.jit
    def run_chunk(lvals, lo, hi):
        def level_step(lv, lvals):
            delta = lvals[sched.upd_a[lv]] * lvals[sched.upd_b[lv]]
            lvals = lvals.at[sched.upd_dst[lv]].add(-delta)
            lvals = lvals.at[-1].set(0.0)
            pos = sched.col_pos[lv]
            colv = lvals[pos]
            diag = jnp.sqrt(colv[:, 0])
            inv = jnp.where(diag > 0, 1.0 / jnp.maximum(diag, 1e-30), 0.0)
            new = jnp.concatenate(
                [diag[:, None], colv[:, 1:] * inv[:, None]], axis=1
            )
            lvals = lvals.at[pos].set(new)
            return lvals.at[-1].set(0.0)

        return jax.lax.fori_loop(lo, hi, level_step, lvals)

    lv = start
    while lv < nlev:
        hi = min(lv + every, nlev)
        lvals = run_chunk(lvals, lv, hi)
        lv = hi
        if lv < nlev:
            save_factor_state(path, np.asarray(lvals), lv)
    return np.asarray(lvals)[:-1]
