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
(the sheared delta row), so per (panel, live column) it

* DMAs the column run from HBM into a lane-aligned VMEM column buffer
  (DMA engines take arbitrary element offsets; vector ops do not — Mosaic
  rejects dynamic unaligned VMEM indexing, so the add happens at offset 0
  of the buffer),
* adds the sheared delta row with one aligned vector add,
* DMAs the run back.

Cost: 2 DMA issues + one vector add per LIVE COLUMN (``sum(twd)`` per
level) — replacing ``St·Rd·Wt`` scatter-element issues. Grid steps and
the in-step column loop run in program order with semaphore waits, so
the read-modify-write of adjacent column runs is race-free.

``lvals`` must carry ``col_len`` zero padding past the live values so the
last column's fixed-size run stays in bounds (``models/supernodal`` sizes
the pad).

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


def _make_kernel(n_cols: int, col_len: int):
    def kernel(tcp_ref, twd_ref, lv_in, p_ref, lv_out,
               buf, sem_in, sem_out):
        s = pl.program_id(0)
        nw = twd_ref[s]

        def body(w, _):
            st = tcp_ref[s, w]
            cp_in = pltpu.make_async_copy(
                lv_in.at[pl.ds(st, col_len)], buf, sem_in)
            cp_in.start()
            cp_in.wait()
            buf[:] += p_ref[0, w, :]
            cp_out = pltpu.make_async_copy(
                buf, lv_out.at[pl.ds(st, col_len)], sem_out)
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
        run is in bounds (``models/supernodal`` sizes the pad).
      psh: (St, Wt, col_len) f32 sheared deltas; lanes past a column's
        true run length must be zero (they land in the next run of the
        same panel — or the lvals pad — where adding zero is harmless).
      tcp: (St, Wt) int32 — column storage start (absolute into lvals).
      twd: (St,) int32 — live column count per panel (trailing padded
        columns are skipped).
    """
    st_count, n_cols, col_len = psh.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(st_count,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_cols, col_len), lambda s, *_: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((col_len,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(n_cols, col_len),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(lvals.shape, lvals.dtype),
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )(tcp, twd, lvals, psh)
