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
    """Persist a :class:`models.banded.BandedFactor` (block factor)."""
    import jax

    np.savez_compressed(
        path, L=np.asarray(jax.device_get(fac.L)),
        F=np.asarray(jax.device_get(fac.F)), n=fac.n, kind="banded",
    )


def load_banded(path: str):
    import jax.numpy as jnp

    from ..models.banded import BandedFactor

    with np.load(path) as z:
        return BandedFactor(L=jnp.asarray(z["L"]), F=jnp.asarray(z["F"]),
                            n=int(z["n"]))


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
