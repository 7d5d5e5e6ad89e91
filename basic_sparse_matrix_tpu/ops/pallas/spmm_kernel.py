"""Block-sparse SpMM Pallas kernel (BSR layout, scalar-prefetched indices).

This is the TPU-native re-expression of the reference's scalar triple-loop
``mul_dense`` (``/root/reference/src/sparse.rs:426-446``). Instead of walking
CSR entries, the matrix is re-laid-out on the host into **BSR**: dense
``(bm × bk)`` tiles (MXU-aligned) kept only where nonzero, stored as a flat
list sorted by block-row. The kernel grid iterates ``(rhs N-tile, stored
block)``; the per-block row/column ids ride in SMEM via
``PrefetchScalarGridSpec`` so the BlockSpec index maps steer each grid step's
DMA to the right tile of B and the right output tile. Output tiles are
revisited consecutively (blocks sorted by row), accumulated in VMEM, zeroed
at first visit.

Tile-size selection is the first-order performance lever: each grid step
costs a fixed overhead (~1 µs measured on v5e) plus the B-panel DMA, so
denser matrices want fat tiles (fewer steps, MXU-bound) while hypersparse
ones want thin tiles (less zero-padding). :func:`pick_tiles` chooses from
density; callers can override.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..csr import CSR

# Default (thin) tiles — f32 minimum alignment (8 sublanes × 128 lanes).
BM = 8
BK = 128
BN = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pick_tiles(rows: int, cols: int, nnz: int) -> Tuple[int, int]:
    """Choose (bm, bk) from density. Fat tiles amortise per-step grid
    overhead and keep the MXU fed; thin tiles avoid padding waste when
    blocks would be mostly empty."""
    density = nnz / max(rows * cols, 1)
    if density >= 0.05:
        return 256, 512
    if density >= 0.005:
        return 64, 256
    return 8, 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSR:
    """Flat block-sparse layout: ``blocks[t]`` is the dense (bm, bk) tile at
    block coordinates ``(block_rows[t], block_cols[t])``; sorted by block
    row. Every block-row index in range appears at least once (the kernel
    writes output tiles only for visited blocks)."""

    blocks: jax.Array       # (nblocks, bm, bk)
    block_rows: jax.Array   # (nblocks,) int32, sorted
    block_cols: jax.Array   # (nblocks,) int32
    rows: int = dataclasses.field(metadata=dict(static=True))
    cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def bm(self) -> int:
        return int(self.blocks.shape[1])

    @property
    def bk(self) -> int:
        return int(self.blocks.shape[2])

    @property
    def nblocks(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def padded_rows(self) -> int:
        return -(-self.rows // self.bm) * self.bm

    @property
    def padded_cols(self) -> int:
        return -(-self.cols // self.bk) * self.bk


def csr_to_bsr(a: CSR, bm: Optional[int] = None,
               bk: Optional[int] = None) -> BSR:
    """Host-side CSR → BSR conversion. O(nnz) numpy; done once per matrix."""
    indptr, indices, values = a.numpy()
    if bm is None or bk is None:
        bm, bk = pick_tiles(a.rows, a.cols, a.stored)
    rows = np.repeat(np.arange(a.rows), np.diff(indptr))
    brow = rows // bm
    bcol = indices // bk
    ncb = -(-a.cols // bk)
    nrb = -(-a.rows // bm)
    bkey = brow.astype(np.int64) * ncb + bcol
    # Every block-row must appear at least once: the kernel writes output
    # tiles only for visited blocks, so an absent block-row would leave its
    # output tile uninitialised. Seed a zero block at column 0 of each row.
    bkey = np.concatenate([bkey, np.arange(nrb, dtype=np.int64) * ncb])
    uniq, inv = np.unique(bkey, return_inverse=True)
    inv = inv[: rows.shape[0]]
    nblocks = int(uniq.shape[0])
    blocks = np.zeros((nblocks, bm, bk), dtype=values.dtype)
    np.add.at(blocks, (inv, rows % bm, indices % bk), values)
    block_rows = (uniq // ncb).astype(np.int32)
    block_cols = (uniq % ncb).astype(np.int32)
    return BSR(
        blocks=jnp.asarray(blocks),
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        rows=a.rows,
        cols=a.cols,
    )


def _make_kernel(precision):
    def _spmm_bsr_kernel(brows_ref, bcols_ref, a_ref, b_ref, o_ref):
        t = pl.program_id(1)
        prev = brows_ref[jnp.maximum(t - 1, 0)]
        first = jnp.logical_or(t == 0, brows_ref[t] != prev)

        @pl.when(first)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(
            a_ref[0], b_ref[:], preferred_element_type=o_ref.dtype,
            precision=precision,
        )

    return _spmm_bsr_kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _spmm_bsr(bsr: BSR, b_padded: jax.Array, n_padded: int,
              bn: int, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Padded-shape kernel entry. ``precision`` trades MXU passes for
    accuracy: HIGHEST (multi-pass, ~f32-exact, the default) or DEFAULT
    (single-pass bf16 inputs, f32 accumulate — exact when inputs fit bf16's
    8-bit mantissa, e.g. small integers). Mosaic supports only these two."""
    nblocks = bsr.nblocks
    bm, bk = bsr.bm, bsr.bk
    n_tiles = n_padded // bn
    out_dtype = jnp.promote_types(bsr.blocks.dtype, b_padded.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, bm, bk),
                lambda j, t, brows, bcols: (t, 0, 0),
            ),
            pl.BlockSpec(
                (bk, bn),
                lambda j, t, brows, bcols: (bcols[t], j),
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn),
            lambda j, t, brows, bcols: (brows[t], j),
        ),
    )
    flops = 2 * nblocks * bm * bk * n_padded
    bytes_accessed = (
        bsr.blocks.size * bsr.blocks.dtype.itemsize * n_tiles
        + nblocks * bk * bn * 4 * n_tiles
        + bsr.padded_rows * n_padded * 4
    )
    return pl.pallas_call(
        _make_kernel(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bsr.padded_rows, n_padded), out_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=_interpret(),
    )(bsr.block_rows, bsr.block_cols, bsr.blocks.astype(out_dtype),
      b_padded.astype(out_dtype))


def spmm_bsr(bsr: BSR, b: jax.Array, bn: Optional[int] = None,
             precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """SpMM against a pre-converted BSR operand. Pads B's dims to tile
    multiples, runs the kernel, slices the true output."""
    if bn is None:
        bn = BN if b.shape[1] <= BN else min(
            512, -(-b.shape[1] // 128) * 128)
    k_pad = bsr.padded_cols - b.shape[0]
    n_padded = -(-b.shape[1] // bn) * bn
    n_pad = n_padded - b.shape[1]
    b_padded = jnp.pad(b, ((0, k_pad), (0, n_pad)))
    out = _spmm_bsr(bsr, b_padded, n_padded, bn, precision)
    return out[: bsr.rows, : b.shape[1]]


def spmm_bsr_from_csr(a: CSR, b: jax.Array) -> jax.Array:
    """CSR entry point with one-shot memoised BSR conversion (stored on the
    CSR instance; frozen dataclass, so via object.__setattr__)."""
    bsr = getattr(a, "_bsr_cache", None)
    if bsr is None:
        bsr = csr_to_bsr(a)
        object.__setattr__(a, "_bsr_cache", bsr)
    return spmm_bsr(bsr, b)


def bsr_profitable(a: CSR, n: int, *, force: bool = False) -> bool:
    """Heuristic dispatch: BSR/MXU wins when block fill is high enough that
    the padded dense-block FLOPs beat the gather path's HBM traffic, and only
    on real TPU backends with concrete (non-traced) operands. ``force=True``
    bypasses the backend gate (tests exercise the fill logic + interpret-mode
    kernel on CPU)."""
    if _interpret() and not force:
        return False
    if isinstance(a.values, jax.core.Tracer) or not hasattr(a, "numpy"):
        return False
    if a.stored == 0 or n < 64:
        return False
    from ...utils.config import get_config

    bsr = getattr(a, "_bsr_cache", None)
    if bsr is not None:
        fill = a.stored / (bsr.nblocks * bsr.bm * bsr.bk)
    else:
        bm, bk = pick_tiles(a.rows, a.cols, a.stored)
        indptr, indices, _ = a.numpy()
        rows = np.repeat(np.arange(a.rows), np.diff(indptr))
        bkey = (rows // bm).astype(np.int64) * (-(-a.cols // bk)) \
            + indices // bk
        nblocks = int(np.unique(bkey).shape[0])
        fill = a.stored / (nblocks * bm * bk)
    return fill >= get_config().bsr_min_fill
