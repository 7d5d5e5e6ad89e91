"""VMEM-streaming SpMM kernel — the hypersparse formulation that beats the
random-gather issue bound.

The gather formulation of hypersparse SpMM (``ops.ell``) is bound by the
chip's random-row-gather ISSUE rate (~23 ns per row, ~86 GB/s useful —
PERF_NOTES), because every stored entry turns into one random HBM read of a
B row. This kernel inverts the dataflow so NOTHING random touches HBM:

* the output C is tiled ``(tile_m, n)`` and each tile stays RESIDENT in
  VMEM across the contraction;
* B streams through VMEM in ``(tile_k, n)`` tiles, sequentially — HBM sees
  only streaming reads at the ~707 GB/s triad rate;
* the per-entry work ``C[i_loc, :] += v * B[k_loc, :]`` is a dynamic-index
  VMEM load-FMA-store, measured at **1.456 ns/entry** at 128 lanes on this
  chip (``benchmarks/entry_fma_probe.py``) — far under the ~23 ns gather
  issue it replaces.

Host plan (:func:`build_stream_plan`, memoised per matrix): entries are
binned by ``(row tile, k tile)`` cell, padded per cell to the max cell
population with ``(i=0, k=0, v=0)`` sentinels (adding zero to row 0 — no
scratch row needed), and laid out as ``(ncells, cellmax)`` arrays. Local
indices ride in SMEM; the fori_loop trip count is the static ``cellmax``
(sentinel iterations are cheaper than a scalar-prefetch dynamic bound).

Grid ``(rt, kt)`` with kt innermost: the C tile is zeroed at ``kt == 0``
and revisited across the kt sweep; B tiles double-buffer behind compute.
Reference workload: the 1M-row SpMM roofline config (BASELINE.md config 3),
reference bench ``/root/reference/benches/sparse_dense_mul.rs`` scaled up.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured r4 (stream_spmm_bench, 100k×32×512): 4096×2048 is best by a
# hair (23.4 vs 24.6 ms at 2048²) and tile size is otherwise flat — the
# kernel is issue-bound, not bandwidth-bound. 4096-row C tiles need the
# raised scoped-VMEM limit the pallas_call now sets.
DEFAULT_TILE_M = 4096
DEFAULT_TILE_K = 2048


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamPlan:
    """Cell-binned entry layout for the streaming kernel."""

    ii: jax.Array        # (ncells, 1, cellmax) int32 — tile-local row index
    kk: jax.Array        # (ncells, 1, cellmax) int32 — tile-local col index
    vv: jax.Array        # (ncells, 1, cellmax) f32 — value (0 = sentinel)
    rows: int = dataclasses.field(metadata=dict(static=True))
    cols: int = dataclasses.field(metadata=dict(static=True))
    tile_m: int = dataclasses.field(metadata=dict(static=True))
    tile_k: int = dataclasses.field(metadata=dict(static=True))
    n_rt: int = dataclasses.field(metadata=dict(static=True))
    n_kt: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cellmax(self) -> int:
        return int(self.ii.shape[-1])

    @property
    def pad_factor(self) -> float:
        return self.ii.shape[0] * self.ii.shape[-1] / max(self.nnz, 1)

    @property
    def pk(self) -> jax.Array:
        """Packed ``(i << 16) | k`` indices for the ``vregp`` layout —
        built lazily ON DEVICE (one elementwise op, no host upload) the
        first time the packed-index kernel runs, and memoised on the
        instance. Default-layout plans never pay for it."""
        cached = self.__dict__.get("_pk")
        if cached is None:
            if not (self.tile_m < 32768 and self.tile_k <= 65536):
                raise ValueError(
                    f"vregp packing needs tile_m < 2^15 and tile_k <= "
                    f"2^16; got ({self.tile_m}, {self.tile_k})")
            cached = jax.jit(lambda i, k: (i << 16) | k)(self.ii, self.kk)
            object.__setattr__(self, "_pk", cached)
        return cached


def build_stream_plan(rows_idx: np.ndarray, cols_idx: np.ndarray,
                      vals: np.ndarray, rows: int, cols: int,
                      tile_m: int = DEFAULT_TILE_M,
                      tile_k: int = DEFAULT_TILE_K) -> StreamPlan:
    """Bin entries by (row tile, k tile) cell (host, O(nnz log nnz), done
    once per matrix). Zero-valued entries are dropped (they include ELL
    padding slots)."""
    rows_idx = np.asarray(rows_idx).ravel()
    cols_idx = np.asarray(cols_idx).ravel()
    vals = np.asarray(vals).ravel()
    live = vals != 0
    rows_idx, cols_idx, vals = rows_idx[live], cols_idx[live], vals[live]
    nnz = vals.shape[0]
    n_rt = max(-(-rows // tile_m), 1)
    n_kt = max(-(-cols // tile_k), 1)
    cell = (rows_idx // tile_m).astype(np.int64) * n_kt \
        + cols_idx // tile_k
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    counts = np.bincount(cell, minlength=n_rt * n_kt)
    cellmax = max(int(counts.max()) if nnz else 0, 1)
    cellmax = -(-cellmax // 16) * 16   # support loop unrolls up to 16
    ncells = n_rt * n_kt
    slot = np.arange(nnz) - np.concatenate(
        [[0], np.cumsum(counts)])[cell]
    # (ncells, 1, cellmax): Mosaic requires a block's last TWO dims to be
    # 8/128-divisible or equal to the array's — (1, cellmax) blocks of a
    # 2D (ncells, cellmax) array violate that; a singleton middle axis
    # makes the block's trailing dims exactly the array's.
    ii = np.zeros((ncells, 1, cellmax), dtype=np.int32)
    kk = np.zeros((ncells, 1, cellmax), dtype=np.int32)
    vv = np.zeros((ncells, 1, cellmax), dtype=vals.dtype)
    ii[cell, 0, slot] = (rows_idx[order] % tile_m).astype(np.int32)
    kk[cell, 0, slot] = (cols_idx[order] % tile_k).astype(np.int32)
    vv[cell, 0, slot] = vals[order]
    return StreamPlan(
        ii=jnp.asarray(ii), kk=jnp.asarray(kk), vv=jnp.asarray(vv),
        rows=rows, cols=cols, tile_m=tile_m, tile_k=tile_k,
        n_rt=n_rt, n_kt=n_kt, nnz=nnz)


def _make_stream_kernel3(cellmax: int, unroll: int):
    """Sublane-packed variant: B and C carry the RHS axis as
    ``(n // 128, 128)`` so a logical row is a vreg-aligned block — the
    row-FMA touches all 8 sublanes instead of 1 of 8 per vector op (the
    (1, n) row layout spends a full vreg op per 128 columns at 1/8
    sublane utilisation; this was the issue-chain bound named in r3)."""
    def kernel(ii_ref, kk_ref, vv_ref, b_ref, o_ref):
        kt = pl.program_id(1)

        @pl.when(kt == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def body(e, _):
            for u in range(unroll):
                i = ii_ref[0, 0, e * unroll + u]
                k = kk_ref[0, 0, e * unroll + u]
                v = vv_ref[0, 0, e * unroll + u]
                o_ref[pl.ds(i, 1)] += v * b_ref[pl.ds(k, 1)]
            return 0

        jax.lax.fori_loop(0, cellmax // unroll, body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _spmm_stream3(plan: StreamPlan, b_padded: jax.Array,
                  unroll: int) -> jax.Array:
    """Sublane-packed launch: reshapes the (K, n) RHS to (K, n/128, 128)
    outside the kernel (one XLA layout copy) and back."""
    tm, tk = plan.tile_m, plan.tile_k
    n = b_padded.shape[1]
    ns = n // 128
    b3 = b_padded.reshape(b_padded.shape[0], ns, 128)
    cellmax = plan.cellmax
    grid = (plan.n_rt, plan.n_kt)
    nkt = plan.n_kt
    cell_spec = pl.BlockSpec((1, 1, cellmax),
                             lambda rt, kt: (rt * nkt + kt, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_stream_kernel3(cellmax, unroll),
        grid=grid,
        in_specs=[
            cell_spec,
            cell_spec,
            cell_spec,
            pl.BlockSpec((tk, ns, 128), lambda rt, kt: (kt, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, ns, 128), lambda rt, kt: (rt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((plan.n_rt * tm, ns, 128),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.nnz * n,
            bytes_accessed=plan.n_rt * plan.n_kt * tk * n * 4
            + plan.n_rt * tm * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # The 16 MB scoped-VMEM default blocks C tiles > 2048 rows at
            # 512-col RHS; larger C tiles are the main lever on total B
            # streaming traffic (n_rt sweeps of ALL of B), so raise it.
            vmem_limit_bytes=100 * 1024 * 1024,
            # Plan indices are host-validated (< tile_m / tile_k by
            # construction); per-entry dynamic-index bounds checks cost
            # cycles on the issue-bound chain.
            disable_bounds_checks=True,
        ),
        interpret=_interpret(),
    )(plan.ii, plan.kk, plan.vv, b3)
    return out.reshape(plan.n_rt * tm, n)


def _make_stream_kernel3p(cellmax: int, unroll: int):
    """Packed-index variant of the sublane-packed kernel: one SMEM scalar
    read per entry ((i << 16) | k) plus two scalar-core ALU ops, instead
    of two SMEM reads — the per-entry chain is issue-bound, so every
    issue slot counts."""
    def kernel(pk_ref, vv_ref, b_ref, o_ref):
        kt = pl.program_id(1)

        @pl.when(kt == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def body(e, _):
            for u in range(unroll):
                p = pk_ref[0, 0, e * unroll + u]
                v = vv_ref[0, 0, e * unroll + u]
                i = p >> 16
                k = p & 0xFFFF
                o_ref[pl.ds(i, 1)] += v * b_ref[pl.ds(k, 1)]
            return 0

        jax.lax.fori_loop(0, cellmax // unroll, body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(3,))
def _spmm_stream3p(plan: StreamPlan, pk: jax.Array, b_padded: jax.Array,
                   unroll: int) -> jax.Array:
    tm, tk = plan.tile_m, plan.tile_k
    n = b_padded.shape[1]
    ns = n // 128
    b3 = b_padded.reshape(b_padded.shape[0], ns, 128)
    cellmax = plan.cellmax
    grid = (plan.n_rt, plan.n_kt)
    nkt = plan.n_kt
    cell_spec = pl.BlockSpec((1, 1, cellmax),
                             lambda rt, kt: (rt * nkt + kt, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_stream_kernel3p(cellmax, unroll),
        grid=grid,
        in_specs=[
            cell_spec,
            cell_spec,
            pl.BlockSpec((tk, ns, 128), lambda rt, kt: (kt, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, ns, 128), lambda rt, kt: (rt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((plan.n_rt * tm, ns, 128),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.nnz * n,
            bytes_accessed=plan.n_rt * plan.n_kt * tk * n * 4
            + plan.n_rt * tm * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            disable_bounds_checks=True,
        ),
        interpret=_interpret(),
    )(pk, plan.vv, b3)
    return out.reshape(plan.n_rt * tm, n)


def _make_stream_kernel(cellmax: int, unroll: int):
    def kernel(ii_ref, kk_ref, vv_ref, b_ref, o_ref):
        kt = pl.program_id(1)

        @pl.when(kt == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def body(e, _):
            for u in range(unroll):
                i = ii_ref[0, 0, e * unroll + u]
                k = kk_ref[0, 0, e * unroll + u]
                v = vv_ref[0, 0, e * unroll + u]
                o_ref[pl.ds(i, 1), :] += v * b_ref[pl.ds(k, 1), :]
            return 0

        jax.lax.fori_loop(0, cellmax // unroll, body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _spmm_stream(plan: StreamPlan, b_padded: jax.Array,
                 unroll: int) -> jax.Array:
    tm, tk = plan.tile_m, plan.tile_k
    n = b_padded.shape[1]
    cellmax = plan.cellmax
    grid = (plan.n_rt, plan.n_kt)
    nkt = plan.n_kt
    cell_spec = pl.BlockSpec((1, 1, cellmax),
                             lambda rt, kt: (rt * nkt + kt, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_stream_kernel(cellmax, unroll),
        grid=grid,
        in_specs=[
            cell_spec,
            cell_spec,
            cell_spec,
            pl.BlockSpec((tk, n), lambda rt, kt: (kt, 0)),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda rt, kt: (rt, 0)),
        out_shape=jax.ShapeDtypeStruct((plan.n_rt * tm, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.nnz * n,
            bytes_accessed=plan.n_rt * plan.n_kt * tk * n * 4
            + plan.n_rt * tm * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(plan.ii, plan.kk, plan.vv, b_padded)
    return out


def spmm_stream(plan: StreamPlan, b: jax.Array,
                unroll: int = 1, layout: str = "vreg") -> jax.Array:
    """SpMM against a pre-binned streaming plan. Pads B to tile/lane
    multiples, runs the kernel, slices the true output. ``layout="vreg"``
    (default) packs the RHS axis into (n/128, 128) sublane blocks so each
    per-entry row FMA uses full vregs; ``"row"`` is the r3 (1, n) form."""
    k_pad = plan.n_kt * plan.tile_k - b.shape[0]
    n_pad = (-b.shape[1]) % 128
    b_padded = jnp.pad(b.astype(jnp.float32), ((0, k_pad), (0, n_pad)))
    if layout == "vregp":
        out = _spmm_stream3p(plan, plan.pk, b_padded, unroll)
    elif layout == "vreg":
        out = _spmm_stream3(plan, b_padded, unroll)
    else:
        out = _spmm_stream(plan, b_padded, unroll)
    return out[: plan.rows, : b.shape[1]]


def pick_tile_m(rows: int, n_rhs: int) -> int:
    """C-tile height by matrix size and RHS width. B re-streams once per
    ROW TILE, so at 1M rows the tile height is the lever on HBM traffic:
    measured on chip (r5, 1M x 32 x 512 RHS) tile_m 4096 loses to the
    ELL gather path (0.695 s vs 0.402 — 245 B sweeps), 16384 wins 1.64x
    (0.244 s, 62 sweeps), 32768 OOMs VMEM (the C tile is double-buffered:
    2*(tile_m + tile_k)*ns*4 bytes must fit the 128 MB scope). At 100k
    rows tile size measured flat (issue-bound) — keep the 4096 default."""
    ns = -(-max(n_rhs, 128) // 128) * 128
    budget = 110 * 2**20
    cand = (16384, 8192, 4096) if rows >= (1 << 19) else (4096,)
    for tm in cand:
        if 2 * (tm + DEFAULT_TILE_K) * ns * 4 <= budget:
            return tm
    return 2048


def stream_plan_from_ell(ell, n_rhs: int = 512) -> Optional[StreamPlan]:
    """Build (and memoise on the ELL instance, per C-tile height) a
    streaming plan.

    The plan is built from the HOST mirrors ``csr_to_ell`` caches on the
    ELL — never from a device fetch: device->host transfers beyond a few
    KB hang on this transport (CLAUDE.md), and the entry arrays are tens
    of MB at the target 1M-row shape. Returns ``None`` (caller falls back
    to the gather path) when no host mirror exists."""
    tile_m = pick_tile_m(ell.n_rows, n_rhs)
    plans = getattr(ell, "_stream_plans", None)
    if plans is None:
        plans = {}
        object.__setattr__(ell, "_stream_plans", plans)
    plan = plans.get(tile_m)
    if plan is None:
        cols = getattr(ell, "_host_cols", None)
        vals = getattr(ell, "_host_vals", None)
        if cols is None or vals is None:
            return None
        rows = np.repeat(np.arange(ell.n_rows), cols.shape[1])
        plan = build_stream_plan(rows, cols.ravel(), vals.ravel(),
                                 ell.n_rows, ell.n_cols, tile_m=tile_m)
        plans[tile_m] = plan
    return plan
