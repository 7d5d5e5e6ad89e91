"""Panel-window add-back kernel for the supernodal delta scatter.

The delta formulation (``models/supernodal._delta_scatter``) merges a
level's updates into per-target-panel dense rects with one-hot MXU
matmuls — nearly free (level_step_probe r3: ~1 ms at the mid_leaf shape
including a constant one-hot SHEAR einsum) — but XLA applies the merged
rect to the factor value array with a per-ELEMENT scatter at ~10 ns each,
and neither ``lax.scatter_add`` over contiguous windows nor a scan of
``dynamic_update_slice`` RMWs does better (both measured ~10-15 ns/elem:
XLA scatter does not vectorize on this target).

This kernel finishes the job with DMAs instead. A rect column w of target
panel s images onto ONE contiguous storage run starting at ``tcp[s, w]``
(the sheared delta row). Mosaic constrains HBM DMAs to tiling-aligned
slice shapes AND provably tiling-aligned dynamic starts (measured on chip
r4: an arbitrary ``pl.ds(st, 512)`` fails with "slice shape must be
aligned to tiling (1024)" and ``pl.ds(st, 1024)`` with "failed to prove
that a tile index … is divisible by the tiling"), while storage runs
start at arbitrary offsets. So per (panel, live column) the kernel

* DMAs the enclosing ALIGNED storage window ``[st0, st0 + col_len)``
  (``st0 = (st // 1024) · 1024``, provably aligned; the window is viewed
  two-dimensionally as ``(col_len/128, 128)`` vreg rows) from HBM into a
  VMEM buffer,
* rotates the zero-padded sheared delta row into window position
  ``rem = st - st0`` — a flat element roll decomposed into two dynamic
  sublane rolls + one dynamic lane roll + a lane-boundary select
  (Mosaic's ``tpu.dynamic_rotate`` supports 2D arrays on both axes but
  rejects 1D vectors) — and adds it with aligned vector ops,
* DMAs the window back.

Cost: 2 DMA issues + ~5 vector passes over the window per LIVE COLUMN
(``sum(twd)`` per level) — replacing ``St·Rd·Wt`` scatter-element issues.
Grid steps and the in-step column loop run in program order with
semaphore waits; reads go through the ALIASED output buffer so backward-
extending windows observe earlier columns' writes (true on hardware
either way; interpret mode keeps the input ref stale).

``lvals`` must carry ``col_len`` zero padding past the live values so the
last column's fixed-size window stays in bounds (``models/supernodal``
sizes the pad).

Reference workload: the supernodal numeric phase of
``/root/reference/src/cholesky.rs`` (scalar fused triple loop there; here
the fan-in update application), at BASELINE.md config 2 scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_TILE = 1024  # Mosaic 1D f32 memref tiling (elements)
_LANES = 128


def _make_kernel(r2: int):
    """``r2`` = window rows (window length / 128, a multiple of 8)."""
    def kernel(tcp_ref, twd_ref, lv_in, p_ref, lv_out,
               buf, sem_in, sem_out):
        del lv_in  # aliased with lv_out; reads go through the output ref
        s = pl.program_id(0)
        nw = twd_ref[s]

        def body(w, _):
            st = tcp_ref[s, w]
            row0 = (st // _TILE) * (_TILE // _LANES)
            rem = st - (st // _TILE) * _TILE
            a = rem // _LANES
            b = rem % _LANES
            cp_in = pltpu.make_async_copy(
                lv_out.at[pl.ds(row0, r2)], buf, sem_in)
            cp_in.start()
            cp_in.wait()
            # Flat element roll by rem over the (r2, 128) window view:
            # out[r, l] = flat[r·128 + l − rem] =
            #   prow[r − a,     l − b]        for l >= b
            #   prow[r − a − 1, l − b + 128]  for l <  b
            # The wrap zones read only the row's >= 1024 trailing zeros.
            prow = p_ref[0, w]
            y1 = pltpu.roll(pltpu.roll(prow, a, 0), b, 1)
            y2 = pltpu.roll(pltpu.roll(prow, a + 1, 0), b, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (r2, _LANES), 1)
            buf[:] += jnp.where(lane < b, y2, y1)
            cp_out = pltpu.make_async_copy(
                buf, lv_out.at[pl.ds(row0, r2)], sem_out)
            cp_out.start()
            cp_out.wait()
            return 0

        jax.lax.fori_loop(0, nw, body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit)
def panel_addback(lvals: jax.Array, psh: jax.Array, tcp: jax.Array,
                  twd: jax.Array) -> jax.Array:
    """Add sheared per-panel delta columns into their storage runs.

    Args:
      lvals: (nnz_l + pad,) f32 — pad >= psh.shape[-1] so every column
        window is in bounds (``models/supernodal`` sizes the pad).
      psh: (St, Wt, col_len) f32 sheared deltas; col_len must be a
        multiple of the 1024-element tiling (``models/supernodal._colq``
        + 1024 window slack). The run data sits at offset 0 with >= 1024
        trailing zeros; zero lanes land in neighbouring runs (or the
        lvals pad) where adding zero is harmless.
      tcp: (St, Wt) int32 — column storage start (absolute into lvals).
      twd: (St,) int32 — live column count per panel (trailing padded
        columns are skipped).
    """
    st_count, n_cols, col_len = psh.shape
    n = lvals.shape[0]
    # 2D vreg view (rows of 128 lanes): Mosaic's dynamic_rotate rejects
    # 1D vectors, and the (8, 128)-tiled 2D view is the same physical
    # layout. Pad the tail so the view divides evenly and the last
    # window stays in bounds.
    n_pad = (-n) % _TILE
    lv2 = jnp.pad(lvals, (0, n_pad)).reshape(-1, _LANES)
    p4 = psh.reshape(st_count, n_cols, col_len // _LANES, _LANES)
    # Plain grid + SMEM index operands: PrefetchScalarGridSpec measured
    # ~300 us/call dispatch overhead vs ~2 us for a plain GridSpec
    # (PERF_NOTES r1); the index tables are only read inside the kernel
    # body, never by BlockSpec index maps, so prefetch buys nothing.
    out = pl.pallas_call(
        _make_kernel(col_len // _LANES),
        grid=(st_count,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_cols, col_len // _LANES, _LANES),
                         lambda s: (s, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((col_len // _LANES, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct(lv2.shape, lvals.dtype),
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )(tcp, twd, lv2, p4)
    return out.reshape(-1)[:n]
