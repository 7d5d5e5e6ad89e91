"""Supernodal sparse Cholesky — panel-granular, MXU-driven numeric phase.

The scatter-list factorization (:mod:`models.sparse_cholesky`) spends one
int32 triple per flop and runs updates on the VPU. This module raises the
granularity to **supernode panels**: columns with identical below-diagonal
structure (fundamental supernodes, ``runtime/symbolic.supernodes``) factor
as one dense panel, and every inter-supernode update is a dense outer
product ``L_d[I,:] @ L_d[J,:]ᵀ`` — a batched MXU matmul across all updates
of a level. Panel finalisation is a batched dense Cholesky + triangular
solve over the level's supernodes.

Schedule (host, numpy):
* full symbolic pattern → CSC (diagonal-first columns)
* fundamental supernode partition; panel row set F_s = [c0..c1) + below rows
  (identical for every column in the panel by the fundamental property)
* supernode etree → fan-in levels (update sources always in earlier levels)
* per level, padded index tables into L's flat CSC value array for
  - update gathers (source panel row/col slices) and scatters (targets)
  - panel top-triangle and below-block gathers/scatters

Numeric (device, one jit): ``lax.fori_loop`` over levels; each level does
one batched ``einsum('uiw,ujw->uij')`` + scatter-add, then a batched
``cholesky``/``solve_triangular`` over panels. All padding lands in a
scratch slot that is re-zeroed each step.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSR
from ..runtime import symbolic
from ..utils.errors import NonSquareMatrix, check


@dataclasses.dataclass(frozen=True)
class SupernodalSchedule:
    # A scatter (same as scalar path)
    a_src_pos: jax.Array
    a_vals_idx: jax.Array
    # per-level update tables
    upd_gather_a: jax.Array   # (nlev, maxU, maxI, maxW) int32 → lvals
    upd_gather_b: jax.Array   # (nlev, maxU, maxJ, maxW)
    upd_scatter: jax.Array    # (nlev, maxU, maxI, maxJ)
    # per-level panel tables
    top_pos: jax.Array        # (nlev, maxS, maxw, maxw) lower-tri positions
    below_pos: jax.Array      # (nlev, maxS, maxr, maxw)
    top_valid: jax.Array      # (nlev, maxS, maxw) bool: real panel column?
    nnz_l: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))


jax.tree_util.register_dataclass(
    SupernodalSchedule,
    data_fields=["a_src_pos", "a_vals_idx", "upd_gather_a", "upd_gather_b",
                 "upd_scatter", "top_pos", "below_pos", "top_valid"],
    meta_fields=["nnz_l", "n"],
)


def analyze_supernodal(a: CSR, *, relax: int = 0) -> SupernodalSchedule:
    """``relax > 0`` amalgamates near-identical columns into wider panels by
    EXPANDING the factor pattern (explicit zeros): every column of a
    supernode takes the union row structure, restoring the fundamental
    property by construction. More padding, fewer/fatter MXU panels — the
    TPU-friendly trade."""
    check(a.rows == a.cols, NonSquareMatrix, f"needs square, got {a.dims}")
    n = a.rows
    indptr, indices, values = a.numpy()
    rows = np.repeat(np.arange(n), np.diff(indptr))
    low = indices < rows
    low_indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(low_indptr[1:], rows[low], 1)
    low_indptr = np.cumsum(low_indptr)
    parent, l_indptr, l_indices = symbolic.chol_symbolic(
        n, low_indptr, indices[low])

    # CSC pattern, diagonal first per column.
    l_rows = np.repeat(np.arange(n), np.diff(l_indptr))
    order = np.lexsort((l_rows, l_indices))
    csc_rows, csc_cols = l_rows[order], l_indices[order]
    nnz_l = csc_rows.shape[0]
    col_ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(col_ptr[1:], csc_cols, 1)
    col_ptr = np.cumsum(col_ptr)
    csc_keys = csc_cols * n + csc_rows

    def pos(i, j):
        return np.searchsorted(csc_keys, j * n + i)

    def pos_vec(i_arr, j_arr):
        return np.searchsorted(csc_keys, np.asarray(j_arr) * n
                               + np.asarray(i_arr))

    # Supernode partition.
    sid = symbolic.supernodes(col_ptr, csc_rows, parent, relax=relax)
    nsn = int(sid.max()) + 1 if n else 0
    col_of = [np.nonzero(sid == s)[0] for s in range(nsn)]
    c0 = np.asarray([c[0] for c in col_of])
    c1 = np.asarray([c[-1] + 1 for c in col_of])

    if relax > 0:
        # Pattern expansion: every column of a supernode takes the union of
        # the panel's below rows (plus its panel tail). Restores the
        # fundamental property; added slots are explicit zeros and all
        # their update contributions are exactly zero.
        new_rows, new_cols = [], []
        for sId in range(nsn):
            lo, hi = int(c0[sId]), int(c1[sId])
            u = np.unique(csc_rows[col_ptr[lo]:col_ptr[hi]])
            below_u = u[u >= hi]
            for j in range(lo, hi):
                rows_j = np.concatenate(
                    [np.arange(j, hi, dtype=np.int64), below_u])
                new_rows.append(rows_j)
                new_cols.append(np.full(rows_j.size, j, dtype=np.int64))
        csc_rows = np.concatenate(new_rows)
        csc_cols = np.concatenate(new_cols)
        order = np.lexsort((csc_rows, csc_cols))
        csc_rows, csc_cols = csc_rows[order], csc_cols[order]
        nnz_l = csc_rows.shape[0]
        col_ptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(col_ptr[1:], csc_cols, 1)
        col_ptr = np.cumsum(col_ptr)
        csc_keys = csc_cols * n + csc_rows

    # A scatter positions (lower incl diagonal) — AFTER any pattern
    # expansion so positions index the final value array.
    keep = indices <= rows
    a_src_pos = pos_vec(rows[keep], indices[keep])
    a_vals_idx = np.nonzero(keep)[0]

    # below rows of each supernode = below-diag rows of its LAST column
    # (fundamental property: first column's rows = panel cols + these)
    below = [csc_rows[col_ptr[c1[s] - 1] + 1 : col_ptr[c1[s]]]
             for s in range(nsn)]

    # supernode etree + fan-in levels
    sparent = np.full(nsn, -1, dtype=np.int64)
    for s in range(nsn):
        p = parent[c1[s] - 1]
        if p != -1:
            sparent[s] = sid[p]
    slevel = np.zeros(nsn, dtype=np.int64)
    for s in range(nsn):
        p = sparent[s]
        if p != -1:
            slevel[p] = max(slevel[p], slevel[s] + 1)
    nlev = int(slevel.max()) + 1 if nsn else 1

    # ---------------- update lists ----------------
    # source supernode d sends one update per distinct target supernode
    # among its below rows
    updates: List[List[Tuple[np.ndarray, np.ndarray, int]]] = [
        [] for _ in range(nlev)
    ]
    for d in range(nsn):
        rd = below[d]
        if rd.size == 0:
            continue
        tgt = sid[rd]
        boundaries = np.nonzero(np.diff(tgt))[0] + 1
        groups = np.split(np.arange(rd.size), boundaries)
        for g in groups:
            s = int(tgt[g[0]])
            j_rows = rd[g]                      # rows inside s's columns
            i_rows = rd[g[0]:]                  # suffix: all rows ≥ first j
            updates[int(slevel[s])].append((i_rows, j_rows, d))

    w_of = (c1 - c0).astype(np.int64)
    maxW = int(w_of.max()) if nsn else 1
    maxU = max((len(u) for u in updates), default=0)
    maxI = 1
    maxJ = 1
    for u in updates:
        for i_rows, j_rows, d in u:
            maxI = max(maxI, i_rows.size)
            maxJ = max(maxJ, j_rows.size)
    maxU = max(maxU, 1)

    scratch = nnz_l
    upd_ga = np.full((nlev, maxU, maxI, maxW), scratch, dtype=np.int32)
    upd_gb = np.full((nlev, maxU, maxJ, maxW), scratch, dtype=np.int32)
    upd_sc = np.full((nlev, maxU, maxI, maxJ), scratch, dtype=np.int32)
    for lv in range(nlev):
        for u, (i_rows, j_rows, d) in enumerate(updates[lv]):
            cols_d = np.arange(c0[d], c1[d])
            wd = cols_d.size
            # gather positions of L_d[i_rows, cols_d] / L_d[j_rows, cols_d]
            gi = pos_vec(np.repeat(i_rows, wd), np.tile(cols_d, i_rows.size)
                         ).reshape(i_rows.size, wd)
            gj = pos_vec(np.repeat(j_rows, wd), np.tile(cols_d, j_rows.size)
                         ).reshape(j_rows.size, wd)
            upd_ga[lv, u, : i_rows.size, :wd] = gi
            upd_gb[lv, u, : j_rows.size, :wd] = gj
            # scatter targets: (i, j) for i ≥ j only (lower triangle of the
            # leading J×J block + the full below-block); invalid pairs land
            # in the scratch slot
            ii = np.repeat(i_rows, j_rows.size).reshape(i_rows.size,
                                                        j_rows.size)
            jj = np.tile(j_rows, i_rows.size).reshape(i_rows.size,
                                                      j_rows.size)
            valid = ii >= jj
            sc = np.full(ii.shape, scratch, dtype=np.int64)
            sc[valid] = pos_vec(ii[valid], jj[valid])
            upd_sc[lv, u, : i_rows.size, : j_rows.size] = sc

    # ---------------- panel tables ----------------
    sn_of_level = [np.nonzero(slevel == lv)[0] for lv in range(nlev)]
    maxS = max((len(s) for s in sn_of_level), default=1) or 1
    maxR = max((int(b.size) for b in below), default=1) or 1
    top_pos = np.full((nlev, maxS, maxW, maxW), scratch, dtype=np.int32)
    below_pos = np.full((nlev, maxS, maxR, maxW), scratch, dtype=np.int32)
    top_valid = np.zeros((nlev, maxS, maxW), dtype=bool)
    for lv in range(nlev):
        for k, s in enumerate(sn_of_level[lv]):
            w = int(w_of[s])
            cols_s = np.arange(c0[s], c1[s])
            top_valid[lv, k, :w] = True
            # top triangle: (c0+i, c0+j) for i ≥ j
            for jloc in range(w):
                i_rows = cols_s[jloc:]
                top_pos[lv, k, jloc:w, jloc] = pos_vec(
                    i_rows, np.full(i_rows.size, cols_s[jloc]))
            rb = below[s]
            if rb.size:
                gb = pos_vec(np.repeat(rb, w), np.tile(cols_s, rb.size)
                             ).reshape(rb.size, w)
                below_pos[lv, k, : rb.size, :w] = gb

    sched = SupernodalSchedule(
        a_src_pos=jnp.asarray(a_src_pos.astype(np.int32)),
        a_vals_idx=jnp.asarray(a_vals_idx.astype(np.int32)),
        upd_gather_a=jnp.asarray(upd_ga),
        upd_gather_b=jnp.asarray(upd_gb),
        upd_scatter=jnp.asarray(upd_sc),
        top_pos=jnp.asarray(top_pos),
        below_pos=jnp.asarray(below_pos),
        top_valid=jnp.asarray(top_valid),
        nnz_l=nnz_l,
        n=n,
    )
    # host-only metadata (not pytree fields)
    object.__setattr__(sched, "avg_panel_width", n / max(nsn, 1))
    object.__setattr__(sched, "l_pattern", (csc_rows, csc_cols))
    return sched


@jax.jit
def factorize_supernodal(sched: SupernodalSchedule,
                         a_values: jax.Array) -> jax.Array:
    """Numeric phase; returns L's flat CSC value array (length nnz_l)."""
    lvals = jnp.zeros(sched.nnz_l + 1, dtype=jnp.float32)
    lvals = lvals.at[sched.a_src_pos].add(
        a_values[sched.a_vals_idx].astype(jnp.float32))
    nlev = sched.upd_gather_a.shape[0]

    def level_step(lv, lvals):
        # 1) batched panel-outer-product updates on the MXU
        A = lvals[sched.upd_gather_a[lv]]          # (U, I, W)
        B = lvals[sched.upd_gather_b[lv]]          # (U, J, W)
        U = jnp.einsum("uiw,ujw->uij", A, B,
                       precision=jax.lax.Precision.HIGHEST)
        lvals = lvals.at[sched.upd_scatter[lv]].add(-U)
        lvals = lvals.at[-1].set(0.0)

        # 2) batched panel finalisation
        T = lvals[sched.top_pos[lv]]               # (S, W, W) lower part
        valid = sched.top_valid[lv]                # (S, W)
        eye = jnp.eye(T.shape[-1], dtype=T.dtype)
        # make padded columns well-posed: unit diagonal, zero elsewhere
        Tsym = T + jnp.where(valid[:, :, None] & valid[:, None, :],
                             0.0, eye)
        Lt = jnp.linalg.cholesky(
            Tsym + jnp.triu(jnp.swapaxes(Tsym, 1, 2), 1))
        Bp = lvals[sched.below_pos[lv]]            # (S, R, W)
        # solve Bp_new·Ltᵀ = Bp → Bp_new = Bp·Lt^{-T}
        Bn = jax.scipy.linalg.solve_triangular(
            Lt, jnp.swapaxes(Bp, 1, 2), lower=True)
        Bn = jnp.swapaxes(Bn, 1, 2)
        lvals = lvals.at[sched.top_pos[lv]].set(
            jnp.where(jnp.isfinite(Lt), jnp.tril(Lt), 0.0), mode="drop")
        lvals = lvals.at[sched.below_pos[lv]].set(Bn, mode="drop")
        return lvals.at[-1].set(0.0)

    lvals = jax.lax.fori_loop(0, nlev, level_step, lvals)
    return lvals[:-1]


def assemble_factor(a: CSR, lvals: np.ndarray,
                    sched: "SupernodalSchedule" = None) -> CSR:
    """Assemble L's CSR from the flat CSC values (host)."""
    if sched is not None and hasattr(sched, "l_pattern"):
        csc_rows, csc_cols = sched.l_pattern
    else:
        n = a.rows
        indptr, indices, _ = a.numpy()
        rows = np.repeat(np.arange(n), np.diff(indptr))
        low = indices < rows
        low_indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(low_indptr[1:], rows[low], 1)
        low_indptr = np.cumsum(low_indptr)
        _, l_indptr, l_indices = symbolic.chol_symbolic(
            n, low_indptr, indices[low])
        l_rows = np.repeat(np.arange(n), np.diff(l_indptr))
        order = np.lexsort((l_rows, l_indices))
        csc_rows, csc_cols = l_rows[order], l_indices[order]
    if len(lvals) != len(csc_rows):
        raise ValueError(
            f"assemble_factor: lvals length {len(lvals)} does not match the "
            f"factor pattern ({len(csc_rows)} entries) — with an expanded "
            f"(relax > 0) schedule, pass sched so the expanded pattern is "
            f"used")
    return CSR.from_coo_arrays((a.rows, a.rows), csc_rows, csc_cols, lvals,
                               sum_duplicates=False, drop_zeros=False)


def cholesky_supernodal(a: CSR) -> CSR:
    """End-to-end supernodal sparse Cholesky."""
    sched = analyze_supernodal(a)
    lvals = np.asarray(jax.device_get(factorize_supernodal(sched, a.values)))
    return assemble_factor(a, lvals, sched)
