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
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSR
from ..runtime import symbolic
from ..utils.errors import NonSquareMatrix, check

# Max update-table buckets per fan-in level (see the bucketing comment in
# analyze_supernodal): more buckets bound padding tighter but add dispatch
# steps; 3 keeps ND separator levels from inflating leaf-update tables.
# Levels whose single-stack tables are under _BUCKET_MIN_VOLUME entries (or
# within 2x of the bucketed volume) are never split.
_MAX_BUCKETS = 3
_BUCKET_MIN_VOLUME = 1 << 20


# Per-group table names, in _group_tabs order. Each is stored packed in
# one of the three flat device buffers (see SupernodalSchedule.layout);
# host-side numpy copies are kept on the ORIGINAL analyze instance under
# these names (resolved by __getattr__) for the distributed splitter and
# inspection.
_TABLE_NAMES = ("upd_base", "upd_meta", "upd_irows", "upd_ibelow",
                "upd_jrows", "upd_jcp", "panel_cp", "panel_r", "top_valid",
                "tgt_cp", "tgt_nrows", "tgt_w", "upd_seg")
_TABLE_INDEX = {name: i for i, name in enumerate(_TABLE_NAMES)}


@dataclasses.dataclass(frozen=True)
class SupernodalSchedule:
    """Level tables padded PER LEVEL (not globally — under nested-dissection
    orderings the top separator panels are 10-100x the leaf panels, and
    global padding blew the tables up ~150x: 66 s host analyze at n=4096 in
    round 1 vs <0.3 s now), then consecutive same-shape levels are stacked
    into GROUPS. The numeric phase unrolls over groups and ``lax.scan``s
    within each: chain-like etrees (RCM orderings — hundreds of identical
    levels) compile as a few scanned groups instead of a hundreds-deep
    unrolled graph, while heterogeneous ND levels keep their own shapes.

    Tables (13 per group, see ``_TABLE_NAMES``; every table's leading axis
    is the group's level count g) are PACKED into three flat device
    buffers, one per dtype, with a static ``layout`` describing each
    table's (buffer, offset, shape). On the tunneled single-chip transport
    every host->device transfer costs ~ms of fixed latency, and a 263-group
    n=36k schedule has ~3,400 tables — per-table uploads dominated the
    33.5 s on-chip analyze (host compute is <5 s). Packing makes the
    upload 3 transfers; ``_group_tabs`` slices tables back out at TRACE
    time (static offsets — free inside the numeric programs).

    Compact-table semantics (why the tables are small): the full
    (U, I, W)/(U, J, W)/(U, I, J) update position arrays are O(flops) and
    measured 3 GB at n=36k; positions are affine-or-gathered functions of
    O(I+J+W) per-update vectors, so the numeric phase rebuilds them IN
    REGISTER (see _upd_positions) instead of reading them from HBM.
    upd_base (g,U,W) source col base; upd_meta (g,U,4) = (ni,nj,hi_s,c0_s);
    upd_irows/_ibelow (g,U,I) target rows / below ranks; upd_jrows/_jcp
    (g,U,J) target cols / col_ptr; panel_cp (g,S,W) col_ptr, panel_r (g,S)
    below counts, top_valid (g,S,W); tgt_cp (g,St,Wt), tgt_nrows/tgt_w
    (g,St), upd_seg (g,U) — the delta-scatter target-panel tables."""

    # A scatter (same as scalar path)
    a_src_pos: jax.Array
    a_vals_idx: jax.Array
    # packed per-group tables (see class docstring / _TABLE_NAMES)
    flat_i32: jax.Array
    flat_u16: jax.Array
    flat_bool: jax.Array
    # static: per group, per table: (buffer id, flat offset, shape)
    layout: Tuple = dataclasses.field(metadata=dict(static=True))
    # static per-group max below-row count (the rebuilt below-block's R
    # axis — a shape, so it lives in meta, not data)
    panel_rmax: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))
    # static per-group target-rect row count (delta formulation) and the
    # host's per-group formulation choice (True = delta wins the
    # scatter-element count comparison)
    delta_rmax: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))
    use_delta: Tuple[bool, ...] = dataclasses.field(
        metadata=dict(static=True))
    # static per-group: pallas add-back eligibility (bounded VMEM window)
    use_pallas: Tuple[bool, ...] = dataclasses.field(
        metadata=dict(static=True))
    # static per-group: VMEM-resident add-back (ops.pallas.addback_resident)
    # kernel shape class (CQ, col_pad) where the temps FIT, else None, and
    # the host's cost-model choice (auto mode routes through vmem only
    # where it WINS). Shapes are quantized per MATRIX (1-3 classes) so the
    # whole factorization costs 1-3 Mosaic compiles.
    vmem_shape: Tuple = dataclasses.field(metadata=dict(static=True))
    use_vmem: Tuple[bool, ...] = dataclasses.field(
        metadata=dict(static=True))
    # static matrix-level kernel-read class table ((l_pad, crq), ...) for
    # ops.pallas.runs_read — empty when the factor array does not fit
    # VMEM. Non-empty => config supernodal_gather auto routes ALL reads
    # through the resident-run kernel (~10-100 ns per run vs ~0.8 us per
    # vmapped-dynamic_slice window issue, ~6 ns/elem element gathers).
    kread: Tuple = dataclasses.field(metadata=dict(static=True))
    # static per-group: window gathers win the read side (long runs; a
    # window issue costs ~0.8 us vs ~6 ns per element, break-even around
    # I+J ~ 144 — measured on chip, see BENCH_RESULTS r4)
    use_window: Tuple[bool, ...] = dataclasses.field(
        metadata=dict(static=True))
    nnz_l: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_groups(self) -> int:
        return len(self.layout)

    def __getattr__(self, name):
        # Host-side numpy table access by the pre-pack field names
        # (distributed splitter, tests, size accounting). Available on the
        # instance analyze_supernodal returned; pytree reconstruction
        # (e.g. inside jit) drops host-only attributes.
        ti = _TABLE_INDEX.get(name)
        if ti is not None:
            tabs = self.__dict__.get("_host_tabs")
            if tabs is None:
                raise AttributeError(
                    f"{name}: host tables unavailable on reconstructed "
                    f"schedules (use _group_tabs for device access)")
            return tabs[ti]
        raise AttributeError(name)


jax.tree_util.register_dataclass(
    SupernodalSchedule,
    data_fields=["a_src_pos", "a_vals_idx", "flat_i32", "flat_u16",
                 "flat_bool"],
    meta_fields=["layout", "panel_rmax", "delta_rmax", "use_delta",
                 "use_pallas", "use_window", "nnz_l", "n", "vmem_shape",
                 "use_vmem", "kread"],
)

# Scatter-element floor below which the pallas add-back cannot amortise
# its DMA issues (+ per-shape Mosaic compiles); see analyze's choice.
_PALLAS_MIN_ELEMENTS = 1 << 20

# VMEM-resident add-back (ops.pallas.addback_resident) budgets: the whole
# factor value array plus the padded sheared-delta block must sit in
# scoped VMEM together (the kernel raises the scope to 120 MB).
_VMEM_LVALS_BUDGET = 60 * 2**20          # nnz_l * 4 bytes
_VMEM_PSH_BUDGET = 24 * 2**20            # unpadded St*Wt*col_pad*4 bytes
_VMEM_COL_CLASSES = (512, 2048, 8192)    # col_pad quantisation
_VMEM_CQ_CAP = {512: 1 << 14, 2048: 1 << 12, 8192: 1 << 10}

# Rect-merge temp budget (elements): levels whose one-hot merge temps
# exceed this scan U-chunks instead (see _delta_scatter).
_MERGE_CHUNK_ELEMS = 1 << 27

# Kernel-read (ops.pallas.runs_read) run-length classes and the run-count
# cap (SMEM start-table budget). Same lvals VMEM budget as the scatter.
# pow2 classes: the kernel's Mosaic compile is ~0.5 s/shape (measured
# r5), so class count is not the constraint — per-run roll work and
# out-block writes scale with the class, so keep it tight.
_KREAD_CLASSES = (128, 256, 512, 1024, 2048, 4096, 8192)
_KREAD_CR_CAP = 1 << 17


def _kread_lpad(L: int):
    for c in _KREAD_CLASSES:
        if c >= max(int(L), 1):
            return c
    return None


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _colq(rd: int) -> int:
    """Pallas add-back column-buffer length for a group's rect rows.
    Mosaic tiles 1D f32 memrefs at 1024 elements and requires DMA slice
    SHAPES to be tiling-aligned (offsets may be arbitrary — measured on
    chip r4: a 512-long slice of the flat lvals array fails to compile
    with "slice shape must be aligned to tiling (1024)"), so the buffer
    is 1024-aligned, then pow2-quantised to bound distinct kernel
    shapes."""
    return _pow2(-(-rd // 1024) * 1024)


def _upd_positions(base, meta, irows, ibelow, jrows, jcp, scratch,
                   build_gathers: bool = True, build_scatter: bool = True):
    """Rebuild the (U, I, W)/(U, J, W)/(U, I, J) update position arrays
    from the compact per-update vectors — integer VPU work, no HBM tables.
    Source-panel gathers are affine (pos = base[col] + rank); the scatter
    is affine in-panel and one precomputed below-rank otherwise. Padding
    slots all land on ``scratch`` (gathers read the re-zeroed slot,
    scatters drop/are re-zeroed). The flags skip unneeded outputs (the
    window-read and delta-scatter paths each replace one side)."""
    U_, W = base.shape
    I = irows.shape[1]
    J = jrows.shape[1]
    # Row/rank tables ride HBM (and the host->device upload) as uint16 when
    # n fits (analyze narrows them); widen in register for the arithmetic.
    irows = irows.astype(jnp.int32)
    ibelow = ibelow.astype(jnp.int32)
    jrows = jrows.astype(jnp.int32)
    ii = jnp.arange(I, dtype=jnp.int32)
    jj = jnp.arange(J, dtype=jnp.int32)
    ni = meta[:, 0]
    nj = meta[:, 1]
    his = meta[:, 2]
    ga = gb = sc = None
    if build_gathers:
        vb = base != scratch                                 # (U, W)
        ga = jnp.where(
            (ii[None, :, None] < ni[:, None, None]) & vb[:, None, :],
            base[:, None, :] + ii[None, :, None], scratch)
        gb = jnp.where(
            (jj[None, :, None] < nj[:, None, None]) & vb[:, None, :],
            base[:, None, :] + jj[None, :, None], scratch)
    if build_scatter:
        ir = irows[:, :, None]                               # (U, I, 1)
        jr = jrows[:, None, :]                               # (U, 1, J)
        cpj = jcp[:, None, :]
        valid = ((ii[None, :, None] < ni[:, None, None])
                 & (jj[None, None, :] < nj[:, None, None])
                 & (ir >= jr))
        in_panel = ir < his[:, None, None]
        pos = jnp.where(in_panel, cpj + ir - jr,
                        cpj + (his[:, None, None] - jr)
                        + ibelow[:, :, None])
        sc = jnp.where(valid, pos, scratch)
    return ga, gb, sc


def _win(lvals, starts, L: int):
    """Batched contiguous-window gather: one gather issue per start
    (lowered from vmapped dynamic_slice) instead of one per ELEMENT —
    the supernodal numeric phase's gathers are all ``base + rank`` runs,
    so this replaces U·I·W scalar issues with U·W."""
    return jax.vmap(jax.vmap(
        lambda s: jax.lax.dynamic_slice(lvals, (s,), (L,))))(starts)


def _win_k(lvals, starts, L: int, kread):
    """Run reads through the VMEM-resident kernel when the matrix has a
    class for this run length (``kread`` is the schedule's static class
    table); vmapped-dynamic_slice windows otherwise. The ~0.8 us/issue
    window dispatch vs ~10-100 ns/run in the kernel is the r5 read-side
    lever (PERF_NOTES)."""
    if kread:
        lp = _kread_lpad(L)
        u, w = starts.shape
        if lp is not None and u * w <= _KREAD_CR_CAP:
            from ..ops.pallas.runs_read import win_kernel

            return win_kernel(lvals, starts, L, lp)
    return _win(lvals, starts, L)


def _upd_windows(lvals, base, meta, scratch, I: int, J: int, kread=()):
    """Window-gather form of the update reads (A, B operands of the level
    einsum). ``lvals`` must carry >= max(I, J) zero padding past the
    scratch slot so clamped slices stay in the pad; lanes beyond each
    update's (ni, nj) or on padded columns are masked to zero (window
    spill past a short source run is masked the same way)."""
    ni = meta[:, 0]
    nj = meta[:, 1]
    vb = base != scratch
    ii = jnp.arange(I, dtype=jnp.int32)
    jj = jnp.arange(J, dtype=jnp.int32)
    sbase = jnp.where(vb, base, -1)   # kernel skips dead runs; mask below
    A = jnp.swapaxes(_win_k(lvals, sbase, I, kread), 1, 2)  # (U, I, W)
    A = jnp.where((ii[None, :, None] < ni[:, None, None])
                  & vb[:, None, :], A, 0.0)
    B = jnp.swapaxes(_win_k(lvals, sbase, J, kread), 1, 2)  # (U, J, W)
    B = jnp.where((jj[None, :, None] < nj[:, None, None])
                  & vb[:, None, :], B, 0.0)
    return A, B


def _panel_windows(lvals, cp, tv, r_tab, R: int, kread=()):
    """Window-gather form of the panel reads (top triangle + below block).
    T[s, i, j] = lvals[cp[s, j] + i - j] → per-(s, j) window at cp - j;
    B[s, r, j] = lvals[cp[s, j] + w_s - j + r] → window at cp + w_s - j."""
    S, W = cp.shape
    il = jnp.arange(W, dtype=jnp.int32)
    w = tv.sum(axis=-1).astype(jnp.int32)
    T = jnp.swapaxes(_win_k(lvals, cp - il[None, :], W, kread),
                     1, 2)                                     # (S, i, j)
    tri = tv[:, :, None] & tv[:, None, :] & (
        il[:, None] >= il[None, :])[None]
    T = jnp.where(tri, T, 0.0)
    Bp = jnp.swapaxes(
        _win_k(lvals, cp + w[:, None] - il[None, :], R, kread),
        1, 2)                                                  # (S, R, W)
    bmask = tv[:, None, :] & (
        jnp.arange(R, dtype=jnp.int32)[None, :, None]
        < r_tab[:, None, None])
    Bp = jnp.where(bmask, Bp, 0.0)
    return T, Bp


def _panel_positions(cp, r_tab, tv, R, scratch):
    """Rebuild the (S, W, W) top-triangle and (S, R, W) below-block
    position arrays from per-panel col_ptr vectors (affine in both
    ranks)."""
    S, W = cp.shape
    il = jnp.arange(W, dtype=jnp.int32)
    rr = jnp.arange(R, dtype=jnp.int32)
    w = tv.sum(axis=-1).astype(jnp.int32)                    # (S,)
    tri_mask = tv[:, :, None] & tv[:, None, :] & (
        il[:, None] >= il[None, :])[None]
    tp = jnp.where(tri_mask, cp[:, None, :] + (il[:, None] - il[None, :]),
                   scratch)
    bp_mask = tv[:, None, :] & (rr[None, :, None] < r_tab[:, None, None])
    bp = jnp.where(bp_mask,
                   cp[:, None, :] + (w[:, None, None] - il[None, None, :])
                   + rr[None, :, None],
                   scratch)
    return tp, bp


def supernode_stats(a: CSR, *, relax: int = 0):
    """Cheap partition-only analysis — enough to decide supernodal-vs-scalar
    dispatch WITHOUT building the (much more expensive) full schedule.
    Returns ``(avg_panel_width, parts)``; memoised per (matrix, relax).
    ``parts`` carries everything :func:`analyze_supernodal` needs:
    (parent, col_ptr, csc_rows, sid, c0, c1)."""
    check(a.rows == a.cols, NonSquareMatrix, f"needs square, got {a.dims}")
    cache = getattr(a, "_sn_stats_cache", None)
    if cache is not None and cache[0] == relax:
        return cache[1], cache[2]
    n = a.rows
    parent, l_indptr, l_indices = symbolic.chol_symbolic_csr(a)

    # CSC pattern, diagonal first per column.
    l_rows = np.repeat(np.arange(n), np.diff(l_indptr))
    order = np.lexsort((l_rows, l_indices))
    csc_rows = l_rows[order]
    col_ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(col_ptr[1:], l_indices[order], 1)
    col_ptr = np.cumsum(col_ptr)

    sid = symbolic.supernodes(col_ptr, csc_rows, parent, relax=relax)
    nsn = int(sid.max()) + 1 if n else 0
    # sid is non-decreasing: supernode column ranges by binary search
    c0 = np.searchsorted(sid, np.arange(nsn))
    c1 = np.searchsorted(sid, np.arange(nsn), side="right")
    width = n / max(nsn, 1)
    parts = (parent, col_ptr, csc_rows, sid, c0, c1)
    object.__setattr__(a, "_sn_stats_cache", (relax, width, parts))
    return width, parts


def analyze_supernodal(a: CSR, *, relax: int = 0) -> SupernodalSchedule:
    """``relax > 0`` amalgamates near-identical columns into wider panels by
    EXPANDING the factor pattern (explicit zeros): every column of a
    supernode takes the union row structure, restoring the fundamental
    property by construction. More padding, fewer/fatter MXU panels — the
    TPU-friendly trade.

    Construction cost: with the (possibly expanded) pattern satisfying the
    fundamental property, every column of a panel is exactly
    ``[tail | below]`` sorted ascending, so all gather/panel positions are
    AFFINE in (column, rank) — no searches. Only the update scatter needs a
    ``searchsorted`` into the target panel's below rows. Symbolic results
    are shared with the scatter-list path via
    ``symbolic.chol_symbolic_csr``; partition/expansion run in the native
    runtime (csparse.cpp)."""
    _, parts = supernode_stats(a, relax=relax)
    parent, col_ptr, csc_rows, sid, c0, c1 = parts
    n = a.rows
    nsn = c0.shape[0]
    indptr, indices, values = a.numpy()
    rows = np.repeat(np.arange(n), np.diff(indptr))

    if relax > 0:
        # native pattern expansion (explicit zeros restore the fundamental
        # property); sid/c0/c1 are unchanged by construction
        col_ptr, csc_rows = symbolic.expand_pattern(
            n, col_ptr, csc_rows, c0, c1)
    csc_cols = np.repeat(np.arange(n), np.diff(col_ptr))
    nnz_l = csc_rows.shape[0]
    csc_keys = csc_cols * n + csc_rows

    # A scatter positions (lower incl diagonal) — AFTER any pattern
    # expansion so positions index the final value array.
    keep = indices <= rows
    # indices may be int32 from CSR storage: the key must widen BEFORE the
    # multiply (int32*n overflows at n > 65535 under NumPy-2 promotion).
    a_src_pos = np.searchsorted(
        csc_keys, indices[keep].astype(np.int64) * n + rows[keep])
    a_vals_idx = np.nonzero(keep)[0]

    # supernode etree + fan-in levels
    last_parent = parent[c1 - 1] if nsn else np.empty(0, dtype=np.int64)
    sparent = np.where(last_parent != -1,
                       sid[np.clip(last_parent, 0, max(n - 1, 0))], -1)
    slevel = np.zeros(nsn, dtype=np.int64)
    for s in range(nsn):       # sparent[s] > s: one ascending pass suffices
        p = sparent[s]
        if p != -1:
            slevel[p] = max(slevel[p], slevel[s] + 1)
    nlev = int(slevel.max()) + 1 if nsn else 1
    scratch = nnz_l
    w_of = (c1 - c0).astype(np.int64)

    # ---------------- update lists, grouped by target level ----------------
    # Update gather positions are affine: within source panel d, column
    # c's rows are [c..hi) ++ below_d, so pos(below_d[r], c) =
    # col_ptr[c] + (hi - c) + r.
    updates: List[List[Tuple[int, int, int, int]]] = [[] for _ in range(nlev)]
    for d in range(nsn):
        last = int(c1[d]) - 1
        rd = csc_rows[col_ptr[last] + 1: col_ptr[last + 1]]
        if rd.size == 0:
            continue
        tgt = sid[rd]
        bounds = np.nonzero(np.diff(tgt))[0] + 1
        g0s = np.concatenate([[0], bounds])
        g1s = np.concatenate([bounds, [rd.size]])
        for g0, g1 in zip(g0s, g1s):
            s = int(tgt[g0])
            updates[int(slevel[s])].append((d, int(g0), int(g1), s))

    # ---- bucket each level's updates by shape class (padding bound) ----
    # Under ND orderings a level mixes many leaf updates with a few
    # separator updates 10-100x their size; one padded (U, maxI, maxJ, W)
    # stack then charges every small update the big updates' dims — in
    # table memory, upload bytes, AND einsum flops (padding multiplies
    # real zeros). Bucket updates by the pow4 class of their I-dim into at
    # most _MAX_BUCKETS stacks per level; every bucket except the one
    # carrying the level's panel finalisation becomes an update-only
    # pseudo-level (dummy 1x1 panel tables aimed at the scratch slot, which
    # the numeric step re-zeroes anyway).
    def _upd_dims(up):
        d, g0, g1, _ = up
        last = int(c1[d]) - 1
        nrd = int(col_ptr[last + 1] - col_ptr[last] - 1)
        return nrd - g0, g1 - g0, int(w_of[d])

    def _stack_volume(ups):
        if not ups:
            return 0
        dims = [_upd_dims(up) for up in ups]
        mi = max(d[0] for d in dims)
        mj = max(d[1] for d in dims)
        mw = max(d[2] for d in dims)
        return len(ups) * (mi * mw + mj * mw + mi * mj)

    entries: List[Tuple[list, int]] = []   # (updates, panel level | -1)
    for lv in range(nlev):
        ups = updates[lv]
        buckets: dict = {}
        for up in ups:
            i_dim = max(_upd_dims(up)[0], 1)
            cls = 0
            while (1 << (2 * cls)) < i_dim:   # classes at 1, 4, 16, 64, …
                cls += 1
            buckets.setdefault(cls, []).append(up)
        classes = sorted(buckets)
        while len(classes) > _MAX_BUCKETS:    # merge the two smallest
            buckets[classes[1]] = buckets.pop(classes[0]) + buckets[classes[1]]
            classes = sorted(buckets)
        # split only when the single stack genuinely over-pads: bucketing a
        # homogeneous level just fragments the same-shape groups (RCM
        # chains measured 233 → 1075 groups, a compile-time regression)
        v1 = _stack_volume(ups)
        v2 = sum(_stack_volume(buckets[c]) for c in classes)
        if len(classes) <= 1 or v1 <= 2 * v2 or v1 < _BUCKET_MIN_VOLUME:
            entries.append((ups, lv))
        else:
            for ci, cls in enumerate(classes):
                entries.append((buckets[cls],
                                lv if ci == len(classes) - 1 else -1))

    # Compact per-update vectors only (O(I+J+W) per update, not O(I·(J+W))
    # — the full position arrays are rebuilt in-register on device by
    # _upd_positions; measured 3 GB → tens of MB at n=36k).
    upd_base, upd_meta = [], []
    upd_irows, upd_ibelow, upd_jrows, upd_jcp = [], [], [], []
    tgt_cp, tgt_nrows, tgt_w, upd_seg = [], [], [], []
    delta_rmax, use_delta, use_pallas, use_window = [], [], [], []
    vm_fit, vm_win, vm_cols, vm_colneed = [], [], [], []
    for ei, (ups, _panel_lv) in enumerate(entries):
        # Sort updates by target panel: the delta formulation's segment
        # merge wants runs, and update order within a level is arbitrary
        # (all sources live in earlier levels).
        ups = sorted(ups, key=lambda up: up[3])
        entries[ei] = (ups, _panel_lv)
        U = max(len(ups), 1)
        maxI = maxJ = maxWl = 1
        for d, g0, g1, s in ups:
            last = int(c1[d]) - 1
            nrd = int(col_ptr[last + 1] - col_ptr[last] - 1)
            maxI = max(maxI, nrd - g0)
            maxJ = max(maxJ, g1 - g0)
            maxWl = max(maxWl, int(w_of[d]))
        baset = np.full((U, maxWl), scratch, dtype=np.int64)
        metat = np.zeros((U, 4), dtype=np.int64)
        irt = np.full((U, maxI), n, dtype=np.int64)
        ibt = np.zeros((U, maxI), dtype=np.int64)
        jrt = np.full((U, maxJ), n, dtype=np.int64)
        jct = np.full((U, maxJ), scratch, dtype=np.int64)
        for u, (d, g0, g1, s) in enumerate(ups):
            lo, hi = int(c0[d]), int(c1[d])
            wd = hi - lo
            last = hi - 1
            rd = csc_rows[col_ptr[last] + 1: col_ptr[last + 1]]
            ni, nj = rd.size - g0, g1 - g0
            cols_d = np.arange(lo, hi)
            baset[u, :wd] = col_ptr[cols_d] + (hi - cols_d) + g0
            # scatter metadata: pos(i, j) for i >= j; i in rd[g0:], j in
            # rd[g0:g1] (j are columns of target panel s). Column j's rows
            # are [j..hi_s) ++ below_s → in-panel targets are affine,
            # below-panel targets need one searchsorted into below_s.
            hi_s = int(c1[s])
            last_s = hi_s - 1
            below_s = csc_rows[col_ptr[last_s] + 1: col_ptr[last_s + 1]]
            i_rows = rd[g0:]
            j_rows = rd[g0:g1]
            metat[u] = (ni, nj, hi_s, int(c0[s]))
            irt[u, :ni] = i_rows
            ibt[u, :ni] = np.searchsorted(below_s, i_rows)
            jrt[u, :nj] = j_rows
            jct[u, :nj] = col_ptr[j_rows]
        upd_base.append(baset.astype(np.int32))
        upd_meta.append(metat.astype(np.int32))
        # Row ids and below-ranks are < n (sentinel exactly n), so they fit
        # uint16 whenever n does — 70% of the schedule bytes at n=36k
        # (upload AND per-level HBM reads) halve; _upd_positions widens in
        # register. base/jcp index the nnz_l-sized value array: int32.
        row_dtype = np.uint16 if n <= 0xFFFF else np.int32
        upd_irows.append(irt.astype(row_dtype))
        upd_ibelow.append(ibt.astype(row_dtype))
        upd_jrows.append(jrt.astype(row_dtype))
        upd_jcp.append(jct.astype(np.int32))

        # -------- target-panel tables (delta-scatter formulation) --------
        # The level's distinct update targets; each target panel's storage
        # is one contiguous dense trapezoid whose (row rank r, col rank w)
        # element sits at col_ptr[c0_s + w] + (r - w) — affine for tail AND
        # below rows. Embedding every update into its target's rect via
        # one-hot MXU matmuls and scattering the merged rects replaces the
        # U·I·J element scatter with St·nrows·Wt (see _level_step).
        ts = sorted({s for _, _, _, s in ups})
        St = max(len(ts), 1)
        Wt = max((int(w_of[s]) for s in ts), default=1)
        nrows_of = {}
        for s in ts:
            hi_s = int(c1[s])
            below_ct = int(col_ptr[hi_s] - col_ptr[hi_s - 1] - 1)
            nrows_of[s] = int(w_of[s]) + below_ct
        rmax_d = max(nrows_of.values(), default=1)
        tcp = np.full((St, Wt), scratch, dtype=np.int64)
        tnr = np.zeros((St,), dtype=np.int64)
        twd = np.zeros((St,), dtype=np.int64)
        for k, s in enumerate(ts):
            lo_s, hi_s = int(c0[s]), int(c1[s])
            ws = hi_s - lo_s
            tcp[k, :ws] = col_ptr[lo_s:hi_s]
            tnr[k] = nrows_of[s]
            twd[k] = ws
        rank_of = {s: k for k, s in enumerate(ts)}
        segt = np.zeros((U,), dtype=np.int64)
        for u, (_, _, _, s) in enumerate(ups):
            segt[u] = rank_of[s]
        tgt_cp.append(tcp.astype(np.int32))
        tgt_nrows.append(tnr.astype(np.int32))
        tgt_w.append(twd.astype(np.int32))
        upd_seg.append(segt.astype(np.int32))
        delta_rmax.append(max(rmax_d, 1))
        # Host formulation choice: the scatter is issue-bound per ELEMENT
        # (~10 ns each, level_step_probe), the one-hot einsums ride the
        # MXU nearly free, so compare padded element counts with a margin
        # for the extra MXU passes and one-hot temps.
        elem_scatter = U * maxI * maxJ
        rect_scatter = St * rmax_d * Wt
        # HBM guard over EVERY delta-formulation intermediate, not just the
        # rowmap one-hot: the merge temps d (U·I·Wt) / e (U·Rd·Wt), the
        # merged rects p (St·Rd·Wt), and — on the pallas path — the sheared
        # tensor (Wt·colq(Rd)·Rd) can each independently reach multi-GB at
        # wide-target levels (ADVICE r3).
        delta_elems = max(U * maxI * rmax_d, U * maxI * Wt,
                          U * rmax_d * Wt, St * rmax_d * Wt)
        rowmap_mb = delta_elems * 4 / 2**20
        # Guard the shear temp at the PADDED shape _delta_scatter actually
        # allocates: psh is (pow2(St), pow2(Wt), colq(Rd) + 1024 window
        # slack) after panel/column quantisation (ADVICE r4 — the
        # unpadded Wt·colq(Rd)·Rd estimate under-counted near the cap).
        shear_mb = (_pow2(St) * _pow2(Wt)
                    * (_colq(rmax_d) + 1024)) * 4 / 2**20
        # pallas add-back cost = 2 DMAs per LIVE column; a DMA pair costs
        # ~2-3 us against ~10 ns per scatter element, so it pays when the
        # per-column element budget exceeds ~300 (calibrate on chip with
        # benchmarks/supernodal_scale.py). The absolute floor keeps tiny
        # levels off the pallas path (each kernel SHAPE is a ~90 s remote
        # Mosaic compile; pow2 quantisation in _delta_scatter bounds the
        # shape count, the floor bounds who pays it at all).
        live_cols = sum(int(w_of[s]) for s in ts)
        use_pallas.append(bool(ups) and rowmap_mb < 1024
                          and shear_mb < 1024
                          and min(elem_scatter, rect_scatter)
                          > _PALLAS_MIN_ELEMENTS
                          and live_cols * 300
                          < min(elem_scatter, rect_scatter))
        # Margin measured on chip (level_step_probe r3): XLA scatters per
        # ELEMENT at ~10 ns regardless of formulation, the one-hot einsums
        # are ~free, so the only real cost difference is element count
        # (+ the rowmap temp's HBM traffic, covered by the 1.2).
        use_delta.append(bool(ups) and rect_scatter * 1.2 < elem_scatter
                         and rowmap_mb < 1024)
        # Per-level gather choice (config supernodal_gather="auto"): a
        # window issue (vmapped dynamic_slice) costs ~0.8 us against
        # ~6 ns per element gather, so windows win only when the runs
        # they replace are long — break-even at I+J ≈ 144 measured on
        # chip (level_step_probe + the r4 k=33 chunk split, where
        # element beat window on the leaf chunks and lost 5× on the
        # separator chunks).
        use_window.append(bool(ups) and maxI + maxJ >= 144)
        # VMEM-resident add-back candidate (ops.pallas.addback_resident):
        # per live column ~(col_pad/128)*6 VPU ops on VMEM-resident factor
        # values instead of per-element scatter issues. Cost model per
        # level: kernel column loop + lvals/psh DMA pair (+ the merge
        # einsums where the incumbent was element mode and would not have
        # paid them). Shapes are class-quantized after grouping.
        col_need = -(-(rmax_d + 1) // 128) * 128 + 128
        vm_c = St * Wt
        einsum_macs = (U * maxI * maxJ * Wt + U * maxI * rmax_d * Wt
                       + St * U * rmax_d * Wt)
        kern_s = vm_c * (col_need // 128) * 8 * 1.06e-9
        dma_s = (nnz_l * 8 + vm_c * col_need * 4) / 700e9
        # MXU rate for the one-hot merges: ~2e13 MAC/s sustained
        # (conservative vs the 4.9e13 f32 peak — one-hot operands are
        # partly bandwidth-bound).
        extra_s = 0.0 if (use_pallas[-1] or use_delta[-1]) \
            else einsum_macs / 2e13
        incumbent_s = (rect_scatter
                       if (use_pallas[-1] or use_delta[-1])
                       else elem_scatter) * 10e-9
        # No rowmap temp gate here: _delta_scatter scans U-chunks when
        # the merge temps exceed _MERGE_CHUNK_ELEMS, so big-U separator
        # levels are vmem-eligible too (their element scatters were the
        # r5 chunk-5 residual).
        temps_ok = (St * Wt * (col_need + Wt) * 4 < 2**30
                    and vm_c * col_need * 4 <= _VMEM_PSH_BUDGET)
        vm_fit.append(bool(ups) and temps_ok and col_need <= 8192)
        vm_win.append(use_pallas[-1]
                      or (kern_s + dma_s + extra_s) * 1.2 < incumbent_s)
        vm_cols.append(vm_c)
        vm_colneed.append(col_need)

    # ------------- panel tables (compact: col_ptr vectors) -------------
    panel_cp, panel_r, top_valid = [], [], []
    for _ups, lv in entries:
        if lv == -1:
            # update-only pseudo-level: dummy panels into the scratch slot
            panel_cp.append(np.full((1, 1), scratch, dtype=np.int32))
            panel_r.append(np.zeros((1,), dtype=np.int32))
            top_valid.append(np.zeros((1, 1), dtype=bool))
            continue
        sns = np.nonzero(slevel == lv)[0]
        S = max(sns.size, 1)
        Wl = max((int(w_of[s]) for s in sns), default=1)
        cp = np.full((S, Wl), scratch, dtype=np.int64)
        rt = np.zeros((S,), dtype=np.int64)
        tv = np.zeros((S, Wl), dtype=bool)
        for k, s in enumerate(sns):
            lo, hi = int(c0[s]), int(c1[s])
            w = hi - lo
            tv[k, :w] = True
            cp[k, :w] = col_ptr[lo:hi]
            rt[k] = int(col_ptr[hi] - col_ptr[hi - 1] - 1)
        panel_cp.append(cp.astype(np.int32))
        panel_r.append(rt.astype(np.int32))
        top_valid.append(tv)

    # Group consecutive levels whose table shapes AND max below-row counts
    # all match and stack them (leading axis g): the numeric phase scans
    # within a group, so chain-shaped schedules compile O(#groups), not
    # O(#levels). panel_r's MAX is a shape (the rebuilt below-block's R
    # axis), so it must match within a group.
    per_level = [upd_base, upd_meta, upd_irows, upd_ibelow, upd_jrows,
                 upd_jcp, panel_cp, panel_r, top_valid,
                 tgt_cp, tgt_nrows, tgt_w, upd_seg]
    rmax = [int(r.max()) if r.size else 0 for r in panel_r]
    grouped = [[] for _ in per_level]
    _group_starts = []
    nent = len(entries)
    lv = 0
    while lv < nent:
        _group_starts.append(lv)
        j = lv + 1
        while (j < nent and rmax[j] == rmax[lv]
               and delta_rmax[j] == delta_rmax[lv]
               and use_delta[j] == use_delta[lv]
               and use_pallas[j] == use_pallas[lv]
               and vm_fit[j] == vm_fit[lv] and vm_win[j] == vm_win[lv]
               and all(t[j].shape == t[lv].shape for t in per_level)):
            j += 1
        for gl, t in zip(grouped, per_level):
            gl.append(np.stack(t[lv:j]))
        lv = j

    # ---- pack every table into three flat buffers (3 uploads total) ----
    # Per-table uploads (~13 x n_groups transfers) dominated the on-chip
    # analyze wall time at n=36k; the device never needs the tables as
    # separate arrays — _group_tabs re-slices them at trace time from
    # these, at static offsets (free inside the compiled programs).
    _BUF_DTYPES = (np.dtype(np.int32), np.dtype(np.uint16),
                   np.dtype(np.bool_))
    chunks = [[] for _ in _BUF_DTYPES]
    offs = [0, 0, 0]
    layout = []
    for gi in range(len(grouped[0])):
        lay = []
        for ti in range(len(grouped)):
            t = grouped[ti][gi]
            bid = _BUF_DTYPES.index(np.dtype(t.dtype))
            chunks[bid].append(t.ravel())
            lay.append((bid, offs[bid], tuple(int(s) for s in t.shape)))
            offs[bid] += t.size
        layout.append(tuple(lay))

    def _flat(bid):
        if chunks[bid]:
            return jnp.asarray(np.concatenate(chunks[bid]))
        return jnp.zeros((0,), dtype=_BUF_DTYPES[bid])

    # ---- VMEM add-back shape classes (1-3 Mosaic compiles per matrix) ----
    # col_pad classes are fixed; CQ (flattened column-slot count) is the
    # pow2 max over the class's groups so every group in a class shares
    # ONE kernel shape. The whole-lvals residency gate disables the path
    # when the factor values alone would blow the scoped-VMEM budget.
    lvals_fit = nnz_l * 4 <= _VMEM_LVALS_BUDGET
    g_class = []
    cls_max_cols: dict = {}
    for lv in _group_starts:
        cc = None
        if lvals_fit and vm_fit[lv]:
            cc = next((c for c in _VMEM_COL_CLASSES
                       if c >= vm_colneed[lv]
                       and vm_cols[lv] <= _VMEM_CQ_CAP[c]), None)
        g_class.append(cc)
        if cc is not None:
            cls_max_cols[cc] = max(cls_max_cols.get(cc, 1), vm_cols[lv])
    cls_cq = {cc: _pow2(m) for cc, m in cls_max_cols.items()}
    vmem_shape = tuple((cls_cq[cc], cc) if cc is not None else None
                       for cc in g_class)
    # Auto-route only groups whose own (cols x col_need) footprint is
    # within 8x of the class shape: a tiny group padded to the class's
    # (CQ, col_pad) pays the full psh memset/DMA + dead-column loop per
    # LEVEL (~0.3 ms measured r5 k=33 chunk 4, where class padding turned
    # the vmem win into a 35% regression); its scatter is small anyway.
    def _pad_ok(cc, lv):
        return (cls_cq[cc] * cc
                <= 8 * max(vm_cols[lv] * vm_colneed[lv], 1))
    use_vmem = tuple(cc is not None and vm_win[lv] and _pad_ok(cc, lv)
                     for cc, lv in zip(g_class, _group_starts))

    # ---- kernel-read classes (ops.pallas.runs_read) ----
    # Every read in the numeric phase is a contiguous run whose length is
    # a static table shape: A runs of I, B runs of J, panel-top runs of
    # Wl, below-block runs of R — with U*W / S*Wl runs each. Collect the
    # (run-length class -> max run count) table; the kernel needs one
    # Mosaic compile per class.
    kread_needs: dict = {}
    if lvals_fit:
        for gi in range(len(grouped[0])):
            _, U_, W_ = grouped[0][gi].shape      # upd_base (g, U, W)
            I_ = grouped[2][gi].shape[2]          # upd_irows (g, U, I)
            J_ = grouped[4][gi].shape[2]          # upd_jrows (g, U, J)
            _, S_, Wl_ = grouped[6][gi].shape     # panel_cp (g, S, Wl)
            R_ = max(rmax[_group_starts[gi]], 1)
            for L_, cr in ((I_, U_ * W_), (J_, U_ * W_),
                           (Wl_, S_ * Wl_), (R_, S_ * Wl_)):
                lp = _kread_lpad(L_)
                if lp is not None and cr <= _KREAD_CR_CAP:
                    kread_needs[lp] = max(kread_needs.get(lp, 256), cr)
    kread = tuple(sorted((lp, max(_pow2(m), 256))
                         for lp, m in kread_needs.items()))

    sched = SupernodalSchedule(
        a_src_pos=jnp.asarray(a_src_pos.astype(np.int32)),
        a_vals_idx=jnp.asarray(a_vals_idx.astype(np.int32)),
        flat_i32=_flat(0),
        flat_u16=_flat(1),
        flat_bool=_flat(2),
        layout=tuple(layout),
        panel_rmax=tuple(max(rmax[lv], 1)
                         for lv in _group_starts),
        delta_rmax=tuple(delta_rmax[lv] for lv in _group_starts),
        use_delta=tuple(use_delta[lv] for lv in _group_starts),
        use_pallas=tuple(use_pallas[lv] for lv in _group_starts),
        use_window=tuple(use_window[lv] for lv in _group_starts),
        vmem_shape=vmem_shape,
        use_vmem=use_vmem,
        kread=kread,
        nnz_l=nnz_l,
        n=n,
    )
    # host-only metadata (not pytree fields)
    object.__setattr__(sched, "_host_tabs",
                       tuple(tuple(gl) for gl in grouped))
    object.__setattr__(sched, "avg_panel_width", n / max(nsn, 1))
    object.__setattr__(sched, "l_pattern", (csc_rows, csc_cols))
    return sched


def _delta_scatter(lvals, u3, meta, irows, ibelow, jrows,
                   tcp, tnr, twd, seg, Rd: int,
                   scratch: int, mode: str = "delta", vshape=None):
    """Apply a level's updates as TARGET-PANEL RECT deltas instead of
    per-element scatters. Each target panel's storage is one contiguous
    trapezoid whose (row rank r, col rank w) element sits at
    ``col_ptr[c0_s + w] + (r - w)`` for tail AND below rows, so:

    * embed every update into its target's (Rd, Wt) rect with two one-hot
      matmuls (row rank = ``ir - c0_s`` in the tail, ``W_s + ibelow``
      below; col rank = ``jr - c0_s``) — MXU work, values copied exactly
      (one-hot rows sum a single product);
    * merge updates sharing a target with a one-hot segment matmul;
    * ``mode="delta"``: scatter the St merged rects at in-register affine
      positions — ``St·Rd·Wt`` scatter elements instead of ``U·I·J`` (the
      level scatter is issue-bound per element,
      benchmarks/level_step_probe.py);
    * ``mode="pallas"``: shear each rect to its storage image with one
      more constant one-hot einsum (``psh[s, w, q] = p[s, q + w, w]`` —
      rect column w's storage run starts at ``tcp[s, w]``) and apply it
      with the manual-DMA panel add-back
      kernel (:mod:`ops.pallas.panel_addback`): 2 DMAs + Wt vector adds
      per PANEL instead of any per-element scatter.

    Out-of-range ranks (padding lanes, upper wedge) fall out of the
    one-hot support or land on ``scratch``, which the caller re-zeroes."""
    Ucnt, I, J = u3.shape
    St, Wt = tcp.shape
    prec = jax.lax.Precision.HIGHEST
    irows = irows.astype(jnp.int32)
    ibelow = ibelow.astype(jnp.int32)
    jrows = jrows.astype(jnp.int32)
    ni, nj, his, c0s = (meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3])
    ii = jnp.arange(I, dtype=jnp.int32)
    jj = jnp.arange(J, dtype=jnp.int32)
    ws = his - c0s                                           # (U,)
    ri = jnp.where(irows < his[:, None], irows - c0s[:, None],
                   ws[:, None] + ibelow)
    ri = jnp.where(ii[None, :] < ni[:, None], ri, Rd)        # (U, I)
    rj = jnp.where(jj[None, :] < nj[:, None],
                   jrows - c0s[:, None], Wt)                 # (U, J)

    def merge_chunk(u3c, ric, rjc, sgc):
        rowmap = (ric[:, :, None]
                  == jnp.arange(Rd, dtype=jnp.int32)).astype(u3.dtype)
        colmap = (rjc[:, :, None]
                  == jnp.arange(Wt, dtype=jnp.int32)).astype(u3.dtype)
        segmap = (sgc[None, :].astype(jnp.int32)
                  == jnp.arange(St, dtype=jnp.int32)[:, None]
                  ).astype(u3.dtype)
        d = jnp.einsum("uij,ujw->uiw", u3c, colmap, precision=prec)
        e = jnp.einsum("uir,uiw->urw", rowmap, d, precision=prec)
        return jnp.einsum("su,urw->srw", segmap, e, precision=prec)

    # Bound the merge temps (rowmap (U,I,Rd) / d (U,I,Wt) / e (U,Rd,Wt))
    # by scanning U-chunks when the level is too big to merge at once —
    # this is what lets the r5 vmem path take the top separator levels
    # (U~1.8k, Rd=Wt=1293: an unchunked e-temp is 12 GB; the r4 gates
    # forced those onto ~150 ms of per-element scatters).
    per_u = max(I * Rd, I * Wt, Rd * Wt, I * J)
    uc = max(min(_MERGE_CHUNK_ELEMS // max(per_u, 1), Ucnt), 1)
    nc = -(-Ucnt // uc)
    if nc > 1:
        upad = nc * uc - Ucnt
        u3p = jnp.pad(u3, ((0, upad), (0, 0), (0, 0)))
        rip = jnp.pad(ri, ((0, upad), (0, 0)), constant_values=Rd)
        rjp = jnp.pad(rj, ((0, upad), (0, 0)), constant_values=Wt)
        sgp = jnp.pad(seg.astype(jnp.int32), (0, upad),
                      constant_values=St)
        chunks = (u3p.reshape(nc, uc, I, J), rip.reshape(nc, uc, I),
                  rjp.reshape(nc, uc, J), sgp.reshape(nc, uc))
        p, _ = jax.lax.scan(
            lambda acc, ops: (acc + merge_chunk(*ops), None),
            jnp.zeros((St, Rd, Wt), u3.dtype), chunks)
    else:
        p = merge_chunk(u3, ri, rj, seg.astype(jnp.int32))
    if mode == "vmem":
        from ..ops.pallas.addback_resident import (
            addback_resident,
            shear_reshape,
        )

        cq, col_pad = vshape
        psh = shear_reshape(-p, col_pad)               # (St, Wt, col_pad)
        psh2 = jnp.pad(psh.reshape(St * Wt, col_pad),
                       ((0, cq - St * Wt), (0, 0)))
        wv = jnp.arange(Wt, dtype=jnp.int32)[None, :]
        tcpf = jnp.where(wv < twd[:, None], tcp, -1).reshape(-1)
        tcpf = jnp.pad(tcpf, (0, cq - St * Wt), constant_values=-1)
        return addback_resident(lvals, psh2, tcpf.astype(jnp.int32))
    if mode == "pallas":
        from ..ops.pallas.panel_addback import panel_addback

        col_pad = _colq(Rd)
        qq = jnp.arange(col_pad, dtype=jnp.int32)
        wv = jnp.arange(Wt, dtype=jnp.int32)
        # constant one-hot shear: shift[w, q, r] = (r == q + w); rect rows
        # past a column's true run read p rows that are already zero
        shift = (jnp.arange(Rd, dtype=jnp.int32)[None, None, :]
                 == (qq[None, :, None] + wv[:, None, None])
                 ).astype(u3.dtype)                     # (Wt, col_pad, Rd)
        psh = jnp.einsum("wqr,srw->swq", shift, -p, precision=prec)
        # Quantize the kernel operand shapes to pow2 classes: every
        # distinct (St, Wt, col_len) is a separate ~90 s remote Mosaic
        # compile, and an ND schedule has hundreds of level shapes.
        # Padded panels/columns cost nothing (twd-bounded trip count).
        St_q = _pow2(St)
        Wt_q = _pow2(Wt)
        # +1024 trailing zeros: the kernel DMAs the enclosing 1024-aligned
        # storage window and rotates the row into place, so the row must
        # cover worst-case (window length, rotation wrap) — see
        # ops/pallas/panel_addback.
        psh = jnp.pad(psh, ((0, St_q - St), (0, Wt_q - Wt), (0, 1024)))
        tcp_q = jnp.pad(tcp, ((0, St_q - St), (0, Wt_q - Wt)))
        twd_q = jnp.pad(twd, (0, St_q - St))
        return panel_addback(lvals, psh, tcp_q, twd_q)
    rr = jnp.arange(Rd, dtype=jnp.int32)[None, :, None]
    wwt = jnp.arange(Wt, dtype=jnp.int32)[None, None, :]
    mask = ((wwt < twd[:, None, None]) & (rr >= wwt)
            & (rr < tnr[:, None, None]))
    pos = jnp.where(mask, tcp[:, None, :] + rr - wwt, scratch)
    return lvals.at[pos].add(-p)


def _level_step(lvals, tabs, R: int, Rd: int, scratch: int,
                window: bool = False, smode: str = "element",
                vshape=None, kread=()):
    """One fan-in level: batched MXU panel updates + panel finalisation.
    ``tabs`` holds the COMPACT per-level tables; the full position arrays
    are rebuilt in-register (integer VPU work instead of 3 GB-scale HBM
    table reads — see _upd_positions/_panel_positions). With
    ``window=True`` (config ``supernodal_gather="window"``) the READS use
    one gather issue per contiguous run instead of per element
    (U·W + S·W·2 issues vs U·(I+J)·W + S·W·(W+R)); ``smode`` (the host's
    per-level choice under config ``supernodal_scatter``) routes the
    update scatter through :func:`_delta_scatter` ("delta"/"pallas")
    instead of per-element positions ("element")."""
    (base, meta, irows, ibelow, jrows, jcp, cp, r_tab, tv,
     tcp, tnr, twd, seg) = tabs
    I = irows.shape[1]
    J = jrows.shape[1]
    # 1) batched panel-outer-product updates on the MXU
    if window:
        A, B = _upd_windows(lvals, base, meta, scratch, I, J, kread)
    else:
        ga, gb, _ = _upd_positions(base, meta, irows, ibelow, jrows, jcp,
                                   scratch, build_scatter=False)
        A = lvals[ga]                          # (U, I, W)
        B = lvals[gb]                          # (U, J, W)
    U = jnp.einsum("uiw,ujw->uij", A, B,
                   precision=jax.lax.Precision.HIGHEST)
    if smode in ("delta", "pallas", "vmem"):
        lvals = _delta_scatter(lvals, U, meta, irows, ibelow, jrows,
                               tcp, tnr, twd, seg, Rd, scratch, smode,
                               vshape)
    else:
        _, _, sc = _upd_positions(base, meta, irows, ibelow, jrows, jcp,
                                  scratch, build_gathers=False)
        lvals = lvals.at[sc].add(-U)
    lvals = lvals.at[scratch].set(0.0)

    # 2) batched panel finalisation
    tp, bp = _panel_positions(cp, r_tab, tv, R, scratch)
    if window:
        T, Bp = _panel_windows(lvals, cp, tv, r_tab, R, kread)
    else:
        T = lvals[tp]                          # (S, W, W) lower part
        Bp = lvals[bp]                         # (S, R, W)
    eye = jnp.eye(T.shape[-1], dtype=T.dtype)
    # make padded columns well-posed: unit diagonal, zero elsewhere
    Tsym = T + jnp.where(tv[:, :, None] & tv[:, None, :], 0.0, eye)
    Lt = jnp.linalg.cholesky(
        Tsym + jnp.triu(jnp.swapaxes(Tsym, 1, 2), 1))
    # solve Bp_new·Ltᵀ = Bp → Bp_new = Bp·Lt^{-T}
    Bn = jax.scipy.linalg.solve_triangular(
        Lt, jnp.swapaxes(Bp, 1, 2), lower=True)
    Bn = jnp.swapaxes(Bn, 1, 2)
    lvals = lvals.at[tp].set(
        jnp.where(jnp.isfinite(Lt), jnp.tril(Lt), 0.0), mode="drop")
    lvals = lvals.at[bp].set(Bn, mode="drop")
    return lvals.at[scratch].set(0.0)


def _group_tabs(sched: SupernodalSchedule, gi: int):
    """Slice group ``gi``'s 13 tables out of the packed flat buffers.
    Offsets/shapes are static (``sched.layout``), so under a trace this is
    free slicing fused into the program — no transfers, no dispatches."""
    bufs = (sched.flat_i32, sched.flat_u16, sched.flat_bool)
    out = []
    for bid, off, shape in sched.layout[gi]:
        size = 1
        for s in shape:
            size *= s
        out.append(jax.lax.slice(bufs[bid], (off,),
                                 (off + size,)).reshape(shape))
    return tuple(out)


def _tab_shape(sched: SupernodalSchedule, gi: int, name: str):
    return sched.layout[gi][_TABLE_INDEX[name]][2]


def _win_pad(sched: SupernodalSchedule) -> int:
    """Zero padding past the scratch slot so window gathers never clamp
    into live data: the longest window any group issues. Kernel-read
    windows extend to the run-length class + one extra vreg row."""
    pad = 1
    for gi in range(sched.n_groups):
        pad = max(pad, _tab_shape(sched, gi, "upd_irows")[2],
                  _tab_shape(sched, gi, "upd_jrows")[2],
                  _tab_shape(sched, gi, "panel_cp")[2],
                  sched.panel_rmax[gi])
    if sched.kread:
        pad = max(pad, max(lp for lp, _ in sched.kread) + 256)
    return pad


@partial(jax.jit, static_argnums=(2,))
def _init_lvals(sched: SupernodalSchedule, a_values: jax.Array,
                pad: int = 1) -> jax.Array:
    lvals = jnp.zeros(sched.nnz_l + pad, dtype=jnp.float32)
    return lvals.at[sched.a_src_pos].add(
        a_values[sched.a_vals_idx].astype(jnp.float32))


def _run_group(lvals, tabs, R: int, Rd: int, scratch: int,
               window: bool, smode: str, vshape=None, kread=()):
    if tabs[0].shape[0] == 1:
        return _level_step(lvals, tuple(t[0] for t in tabs), R, Rd,
                           scratch, window, smode, vshape, kread)
    lvals, _ = jax.lax.scan(
        lambda lv, t, _R=R, _Rd=Rd: (
            _level_step(lv, t, _R, _Rd, scratch, window, smode, vshape,
                        kread),
            None),
        lvals, tabs)
    return lvals


@partial(jax.jit, static_argnums=(2, 3, 4))
def _groups_chunk(sched, lvals, gis, smodes, window=False):
    """One device program covering a bounded slice of the group schedule.
    ``gis`` (static tuple of group indices) selects the slice; tables are
    sliced from the schedule's packed buffers at trace time. ``window``
    is a bool or "auto" (per-group host choice, _group_window)."""
    scratch = sched.nnz_l
    for gi, sm in zip(gis, smodes):
        win, kr = _group_read(sched, gi, window)
        lvals = _run_group(lvals, _group_tabs(sched, gi),
                           sched.panel_rmax[gi], sched.delta_rmax[gi],
                           scratch, win, sm,
                           sched.vmem_shape[gi] if sm == "vmem" else None,
                           kr)
    return lvals


def _group_window(sched: SupernodalSchedule, gi: int, window) -> bool:
    """Resolve the per-group gather formulation under config
    supernodal_gather: True/False ("window"/"element") force one path for
    every group; "auto" takes the host's per-group choice (window where
    the replaced runs are long enough to amortise the ~0.8 us window
    issue — use_window)."""
    if window == "auto":
        return bool(sched.use_window[gi])
    return bool(window)


def _group_read(sched: SupernodalSchedule, gi: int, window):
    """Resolve (window?, kread table) per group. When the matrix has
    kernel-read classes (``sched.kread`` non-empty — lvals fits VMEM)
    and config is "auto"/"kernel", EVERY group reads through the
    resident-run kernel: a kernel run costs ~10-100 ns against ~6 ns per
    ELEMENT gather, so runs of >= a few elements always win — the
    element/window break-even that `use_window` encodes only applies to
    the 0.8 us vmapped-dynamic_slice dispatch."""
    if window in ("auto", "kernel") and sched.kread:
        return True, sched.kread
    if window == "kernel":   # forced but matrix has no classes
        return True, ()
    return _group_window(sched, gi, window), ()


def _group_delta(sched: SupernodalSchedule, gi: int, mode: str) -> str:
    """Resolve the per-group formulation under config supernodal_scatter:
    "element" forces per-element positions, "delta" forces the rect
    scatter, "pallas" forces the manual-DMA panel add-back (where the
    window budget admits it, falling back to the rect scatter), "auto"
    takes the host's per-group choice (pallas where eligible, else rect
    where it wins the element count, else element)."""
    if mode == "element":
        return "element"
    if mode == "delta":
        return "delta"
    if mode == "pallas":
        # Forced pallas is honoured regardless of the _PALLAS_MIN_ELEMENTS
        # floor (the floor gates "auto" only) so tests can actually drive
        # panel_addback at suite-sized matrices (ADVICE r3).
        return "pallas"
    if mode == "vmem":
        # Forced vmem needs a kernel shape class; groups analyze deemed
        # ineligible (temps/budgets) fall back to the auto ladder.
        if sched.vmem_shape[gi] is not None:
            return "vmem"
    if sched.use_vmem[gi]:
        return "vmem"
    if sched.use_pallas[gi]:
        return "pallas"
    return "delta" if sched.use_delta[gi] else "element"


def _pallas_pad(sched: SupernodalSchedule, mode: str) -> int:
    """lvals padding needed so every pallas/vmem add-back column window
    (padded and quantised) stays in bounds."""
    pads = [0]
    for gi in range(sched.n_groups):
        gm = _group_delta(sched, gi, mode)
        if gm == "pallas":
            pads.append(_colq(sched.delta_rmax[gi]) + 1024)
        elif gm == "vmem":
            pads.append(sched.vmem_shape[gi][1])
    return max(pads)


def _needs_win_pad(sched: SupernodalSchedule, window) -> bool:
    if window in ("auto", "kernel"):
        return any(sched.use_window) or bool(sched.kread)
    return bool(window)


@partial(jax.jit, static_argnums=(2, 3))
def _factorize_supernodal_whole(sched: SupernodalSchedule,
                                a_values: jax.Array,
                                window=False,
                                scatter_mode: str = "auto") -> jax.Array:
    pad = 1 + (_win_pad(sched) if _needs_win_pad(sched, window) else 0) \
        + _pallas_pad(sched, scatter_mode)
    lvals = _init_lvals(sched, a_values, pad)
    scratch = sched.nnz_l
    for gi in range(sched.n_groups):
        sm = _group_delta(sched, gi, scatter_mode)
        win, kr = _group_read(sched, gi, window)
        lvals = _run_group(lvals, _group_tabs(sched, gi),
                           sched.panel_rmax[gi], sched.delta_rmax[gi],
                           scratch, win, sm,
                           sched.vmem_shape[gi] if sm == "vmem" else None,
                           kr)
    return lvals[: sched.nnz_l]


def factorize_supernodal(sched: SupernodalSchedule,
                         a_values: jax.Array) -> jax.Array:
    """Numeric phase; returns L's flat CSC value array (length nnz_l).
    Unrolled over shape groups, ``lax.scan`` within each group — graph size
    O(#distinct level shapes). Schedules whose group count exceeds
    ``config.supernodal_groups_per_program`` are executed as a sequence of
    bounded device programs with ``lvals`` device-resident between them
    (dispatch pipelines asynchronously): the n=35937 3D-ND schedule's 263
    heterogeneous groups, compiled as ONE program, OOM-killed the XLA
    compile process — program size must stay bounded as n grows. Under an
    outer trace (e.g. a timing fori_loop) the whole-program form is used
    regardless, since a host-side chunk loop cannot run inside jit."""
    from ..utils.config import get_config

    cfg = get_config()
    window = ("auto" if cfg.supernodal_gather == "auto"
              else cfg.supernodal_gather == "window")
    mode = cfg.supernodal_scatter
    n_g = sched.n_groups
    G = cfg.supernodal_groups_per_program
    if (not G or n_g <= G
            or isinstance(a_values, jax.core.Tracer)):
        return _factorize_supernodal_whole(sched, a_values, window, mode)
    pad = 1 + (_win_pad(sched) if _needs_win_pad(sched, window) else 0) \
        + _pallas_pad(sched, mode)
    lvals = _init_lvals(sched, a_values, pad)
    for c0 in range(0, n_g, G):
        gis = tuple(range(c0, min(c0 + G, n_g)))
        smodes = tuple(_group_delta(sched, gi, mode) for gi in gis)
        lvals = _groups_chunk(sched, lvals, gis, smodes, window)
    return lvals[: sched.nnz_l]


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
