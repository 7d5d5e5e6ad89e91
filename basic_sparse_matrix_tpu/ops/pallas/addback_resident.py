"""VMEM-resident column add-back for the supernodal update scatter.

The r4 ``panel_addback`` kernel replaced XLA's ~10 ns/element scatter with
2 HBM DMAs per live column — a win only when columns are long (the gate
kept it to the 8 biggest-scatter groups of 263 at n=35937). This kernel
removes the per-column DMAs entirely: the WHOLE factor value array rides
in VMEM for the duration of the call (nnz_l*4 bytes — 39 MB at n=35937,
under the 100 MB scoped-VMEM limit), so a column's read-modify-write is a
handful of VPU ops on resident data:

* ``lv2`` (the factor values viewed as ``(rows, 128)`` vregs) is a single
  revisited VMEM block aliased input→output — Mosaic DMAs it in once and
  writes it back once per call;
* per live column ``c``: storage start ``st = tcpf[c]`` (SMEM), window
  ``lv2[st//128 : st//128 + r2]``, and the sheared delta row
  ``psh2[c]`` rolled into place by ``st % 128`` lanes — because windows
  are 128-aligned by construction the row-shift is the STATIC 0/+1 pair
  (the r4 kernel needed dynamic sublane rolls for its 1024-aligned DMA
  windows);
* dead columns (``tcpf[c] < 0``: pow2 padding, masked panel columns) skip
  in a few scalar cycles.

Cost per level: ~``(col_pad/128)*6`` VPU ops per live column + one
lvals-sized DMA pair — replacing ``St*Rd*Wt`` (rect) or ``U*I*J``
(element) scatter issues at ~10 ns each. The kernel shape is quantized to
per-matrix ``(CQ, col_pad)`` classes (``models/supernodal`` picks them)
so a whole factorization costs only 1-3 Mosaic compiles.

``lvals`` must carry ``col_pad`` trailing zero slack (the caller sizes the
pad) so the last column's window stays in bounds; the delta rows carry
>= 128 trailing zeros so lane-wrap reads are zero.

Reference workload: the supernodal numeric phase of
``/root/reference/src/sparse.rs:682-714`` (scalar fused triple loop) at
BASELINE.md config 2 scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(cq: int, r2: int):
    """``r2`` = sheared-row vregs (col_pad / 128)."""
    def kernel(tcpf_ref, psh_ref, lv_in, lv_out):
        del lv_in  # aliased with lv_out; reads go through the output ref

        def body(c, _):
            st = tcpf_ref[c]

            @pl.when(st >= 0)
            def _():
                row0 = st // _LANES
                b = st - row0 * _LANES
                prow = psh_ref[c]                       # (r2, 128)
                # Flat element roll by b over the (r2, 128) window view:
                # win[r, l] += flat[r*128 + l - b] =
                #   prow[r,     l - b]        for l >= b
                #   prow[r - 1, l - b + 128]  for l <  b
                # (windows are 128-aligned, so the row shift is static;
                # prow's last vreg row is zero slack, so the r=0 wrap of
                # the row-shifted term reads zeros.)
                y1 = pltpu.roll(prow, b, 1)
                y2 = pltpu.roll(pltpu.roll(prow, 1, 0), b, 1)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (r2, _LANES), 1)
                lv_out[pl.ds(row0, r2)] += jnp.where(lane < b, y2, y1)

            return 0

        jax.lax.fori_loop(0, cq, body, 0, unroll=False)

    return kernel


@jax.jit
def addback_resident(lvals: jax.Array, psh2: jax.Array,
                     tcpf: jax.Array) -> jax.Array:
    """Add sheared delta columns into their storage runs, VMEM-resident.

    Args:
      lvals: (nnz_l + pad,) f32 — pad >= psh2.shape[-1] so every window
        stays in bounds (``models/supernodal`` sizes the pad).
      psh2: (CQ, col_pad) f32 — one sheared (already negated) delta row
        per flattened (panel, column) slot, >= 128 trailing zeros each.
      tcpf: (CQ,) int32 — column storage start (absolute into lvals),
        -1 for dead slots.
    """
    cq, col_pad = psh2.shape
    n = lvals.shape[0]
    n_pad = (-n) % _LANES
    lv2 = jnp.pad(lvals, (0, n_pad)).reshape(-1, _LANES)
    r2 = col_pad // _LANES
    p3 = psh2.reshape(cq, r2, _LANES)
    out = pl.pallas_call(
        _make_kernel(cq, r2),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((cq, r2, _LANES), lambda _: (0, 0, 0)),
            pl.BlockSpec(lv2.shape, lambda _: (0, 0)),
        ],
        out_specs=pl.BlockSpec(lv2.shape, lambda _: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(lv2.shape, lvals.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            # lvals (nnz_l*4) + psh must both sit in VMEM; the caller
            # gates eligibility at _VMEM_BUDGET.
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(tcpf, p3, lv2)
    return out.reshape(-1)[:n]


def shear_reshape(p_neg: jax.Array, col_pad: int) -> jax.Array:
    """Shear merged rects to storage-image rows by PURE RESHAPE.

    ``p_neg`` is (St, Rd, Wt) (already negated deltas). The storage image
    of rect column ``w`` is ``p[s, q + w, w]`` for ``q in [0, col_pad)``.
    Transposing to (St, Wt, Rd) and padding each (Wt, L) row-plane with Wt
    extra elements makes the shift-by-w fall out of a row-major reshape:

        flat[s, w*L + r] = pT[s, w, r]          (L = col_pad + Wt)
        out[s, w, q]     = flat[s, w*(L+1) + q] = pT[s, w, q + w]

    For q < col_pad the read offset ``q + w`` stays inside row ``w``
    (q + w < col_pad + Wt = L), so no wraparound garbage — provided pT is
    zero beyond the live Rd rows, which the transpose pad guarantees.
    Bandwidth-only: one transpose + pad + reshape, no gather, no one-hot
    einsum (the r4 shear einsum materialised a (Wt, col_pad, Rd) one-hot
    — GBs at separator shapes)."""
    st, rd, wt = p_neg.shape
    L = col_pad + wt
    pt = jnp.swapaxes(p_neg, 1, 2)                     # (St, Wt, Rd)
    pt = jnp.pad(pt, ((0, 0), (0, 0), (0, L - rd)))    # zero rows past Rd
    flat = jnp.pad(pt.reshape(st, wt * L), ((0, 0), (0, wt)))
    return flat.reshape(st, wt, L + 1)[:, :, :col_pad]
