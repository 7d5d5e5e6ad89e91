"""VMEM-resident contiguous-run reads for the supernodal gather side.

The supernodal numeric phase reads every operand as ``base + rank``
storage RUNS. The r4 window path issues one vmapped ``dynamic_slice`` per
run — measured ~0.8 us PER ISSUE on this chip (XLA lowers it to a
general gather dispatch), which makes the read side the dominant cost of
the separator levels (tens of thousands of window issues per level).
This kernel reads the same runs from a VMEM-RESIDENT copy of the factor
value array at VPU speed:

* ``lvals`` (viewed ``(rows, 128)``) rides in VMEM for the whole call —
  one DMA in, nothing written back;
* per run ``c``: window rows ``st//128 ..`` loaded with one dynamic
  VMEM slice, rotated into place by ``st % 128`` lanes (static row
  shift — windows are 128-aligned by construction), ~``(L/128)*6`` VPU
  ops per run instead of a ~0.8 us gather dispatch;
* runs stream OUT through the grid in blocks of ``CB`` (the only HBM
  write traffic).

Dead slots (``stf < 0``) are SKIPPED — their output rows stay
uninitialised garbage, which callers must mask (the existing window path
already masks every lane beyond a run's live length and every padded
column, so garbage never escapes: ``models/supernodal._upd_windows``).

Kernel shapes quantize to a few per matrix ((CRQ, L_pad) classes chosen
by ``analyze_supernodal``), bounding Mosaic compiles.

Reference workload: the panel-update reads of
``/root/reference/src/sparse.rs:682-714`` at BASELINE config 2 scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_CB = 256          # runs per grid step (out-block rows)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(cb: int, rp2: int):
    """``rp2`` = run vregs (L_pad / 128); window loads rp2 + 1 rows."""
    def kernel(stf_ref, lv_ref, o_ref):
        blk = pl.program_id(0)

        def body(i, _):
            st = stf_ref[blk * cb + i]

            @pl.when(st >= 0)
            def _():
                row0 = st // _LANES
                b = st - row0 * _LANES
                w = lv_ref[pl.ds(row0, rp2 + 1)]        # (rp2+1, 128)
                # out[r, l] = flat[st + r*128 + l] =
                #   w[r,     (l+b) % 128]   for l <  128-b
                #   w[r + 1, (l+b) % 128]   for l >= 128-b
                y1 = pltpu.roll(w, _LANES - b, 1)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (rp2, _LANES), 1)
                o_ref[i] = jnp.where(lane < _LANES - b,
                                     y1[:rp2], y1[1:rp2 + 1])

            return 0

        jax.lax.fori_loop(0, cb, body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def runs_read(lvals: jax.Array, stf: jax.Array, l_pad: int) -> jax.Array:
    """Read ``stf.shape[0]`` contiguous runs of ``l_pad`` elements each.

    Args:
      lvals: (nnz_l + pad,) f32 — pad >= l_pad + 256 so every window
        stays in bounds for any live start (callers clamp starts to the
        live range; dead slots are negative).
      stf: (CRQ,) int32 — run starts (absolute into lvals), < 0 = dead
        (output row left uninitialised — MASK IT downstream).
      l_pad: static run length (multiple of 128). CRQ must be a multiple
        of 256.

    Returns (CRQ, l_pad) f32.
    """
    crq = stf.shape[0]
    n = lvals.shape[0]
    n_pad = (-n) % _LANES
    lv2 = jnp.pad(lvals, (0, n_pad)).reshape(-1, _LANES)
    rp2 = l_pad // _LANES
    out = pl.pallas_call(
        _make_kernel(_CB, rp2),
        grid=(crq // _CB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(lv2.shape, lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_CB, rp2, _LANES), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((crq, rp2, _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(stf, lv2)
    return out.reshape(crq, l_pad)


def win_kernel(lvals: jax.Array, starts: jax.Array, L: int,
               lpad: int) -> jax.Array:
    """Drop-in replacement for ``models/supernodal._win`` (vmapped
    dynamic_slice): reads each ``starts[u, w]`` run of length ``L`` via
    :func:`runs_read`. The run-slot count is the pow2 of the LIVE count
    (this kernel's Mosaic compile is ~0.5 s per (grid, lpad) — measured
    r5 — so per-call grids are cheap, and per-MATRIX slot classes made
    small levels sweep huge dead grids + write garbage out-blocks: the
    r5 k=33 mid-chunk regression). Lanes beyond ``L`` and rows beyond
    ``U*W`` are garbage exactly like the window path's out-of-run spill
    — callers mask them."""
    u, w = starts.shape
    crq = 1 << max(u * w - 1, 255).bit_length()
    stf = jnp.full((crq,), -1, jnp.int32)
    stf = jax.lax.dynamic_update_slice(
        stf, starts.reshape(-1).astype(jnp.int32), (0,))
    out = runs_read(lvals, stf, lpad)
    return out[: u * w, :L].reshape(u, w, L)
