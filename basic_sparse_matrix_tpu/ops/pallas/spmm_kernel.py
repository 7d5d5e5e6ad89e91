"""Block-sparse SpMM Pallas kernel (BSR layout, scalar-prefetched indices).

This is the TPU-native re-expression of the reference's scalar triple-loop
``mul_dense`` (``/root/reference/src/sparse.rs:426-446``). Instead of walking
CSR entries, the matrix is re-laid-out on the host into **BSR**: dense
``(BM × BK)`` tiles (MXU-aligned: 8×128 for f32) kept only where nonzero,
stored as a flat list sorted by block-row. The kernel grid iterates
``(rhs N-tile, stored block)``; the per-block row/column ids ride in SMEM via
``PrefetchScalarGridSpec`` so the BlockSpec index maps can steer each grid
step's DMA to the right tile of B and the right output tile — compute-only
steps, no gather. Output tiles are revisited consecutively (blocks sorted by
row), accumulated in VMEM, and zeroed at first visit.

Roofline: each grid step is one ``(BM×BK) @ (BK×BN)`` MXU matmul; bytes moved
per step ≈ ``BM·BK·4`` (A block) + ``BK·BN·4`` (B tile, pipelined). For
block-fill φ the kernel moves ``nnz·4/φ`` bytes of A — profitable versus the
gather path when φ is high enough that MXU utilisation beats the VPU
segment-sum (see :func:`bsr_profitable`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..csr import CSR

# MXU-aligned tile sizes for f32 (sublane 8 × lane 128).
BM = 8
BK = 128
BN = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSR:
    """Flat block-sparse layout: ``blocks[t]`` is the dense (BM, BK) tile at
    block coordinates ``(block_rows[t], block_cols[t])``; sorted by block
    row."""

    blocks: jax.Array       # (nblocks, BM, BK)
    block_rows: jax.Array   # (nblocks,) int32, sorted
    block_cols: jax.Array   # (nblocks,) int32
    rows: int = dataclasses.field(metadata=dict(static=True))
    cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nblocks(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def padded_rows(self) -> int:
        return -(-self.rows // BM) * BM

    @property
    def padded_cols(self) -> int:
        return -(-self.cols // BK) * BK


def csr_to_bsr(a: CSR) -> BSR:
    """Host-side CSR → BSR conversion. O(nnz) numpy; done once per matrix."""
    indptr, indices, values = a.numpy()
    rows = np.repeat(np.arange(a.rows), np.diff(indptr))
    brow = rows // BM
    bcol = indices // BK
    ncb = -(-a.cols // BK)
    nrb = -(-a.rows // BM)
    bkey = brow.astype(np.int64) * ncb + bcol
    # Every block-row must appear at least once: the kernel writes output
    # tiles only for visited blocks, so an absent block-row would leave its
    # output tile uninitialised. Seed a zero block at column 0 of each row.
    bkey = np.concatenate([bkey, np.arange(nrb, dtype=np.int64) * ncb])
    uniq, inv = np.unique(bkey, return_inverse=True)
    inv = inv[: rows.shape[0]]
    nblocks = int(uniq.shape[0])
    blocks = np.zeros((nblocks, BM, BK), dtype=values.dtype)
    np.add.at(blocks, (inv, rows % BM, indices % BK), values)
    block_rows = (uniq // ncb).astype(np.int32)
    block_cols = (uniq % ncb).astype(np.int32)
    return BSR(
        blocks=jnp.asarray(blocks),
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        rows=a.rows,
        cols=a.cols,
    )


def _spmm_bsr_kernel(brows_ref, bcols_ref, a_ref, b_ref, o_ref):
    t = pl.program_id(1)
    prev = brows_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, brows_ref[t] != prev)

    @pl.when(first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(
        a_ref[0], b_ref[:], preferred_element_type=o_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnums=(2,))
def _spmm_bsr(bsr: BSR, b_padded: jax.Array, n_padded: int) -> jax.Array:
    nblocks = bsr.nblocks
    n_tiles = n_padded // BN
    out_dtype = jnp.promote_types(bsr.blocks.dtype, b_padded.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, BM, BK),
                lambda j, t, brows, bcols: (t, 0, 0),
            ),
            pl.BlockSpec(
                (BK, BN),
                lambda j, t, brows, bcols: (bcols[t], j),
            ),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN),
            lambda j, t, brows, bcols: (brows[t], j),
        ),
    )
    flops = 2 * nblocks * BM * BK * n_padded
    bytes_accessed = (
        bsr.blocks.size * bsr.blocks.dtype.itemsize
        + b_padded.size * b_padded.dtype.itemsize * max(1, nblocks // max(n_tiles, 1))
        + bsr.padded_rows * n_padded * 4
    )
    return pl.pallas_call(
        _spmm_bsr_kernel,
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


def spmm_bsr(bsr: BSR, b: jax.Array) -> jax.Array:
    """SpMM against a pre-converted BSR operand. Pads B's dims to tile
    multiples, runs the kernel, slices the true output."""
    k_pad = bsr.padded_cols - b.shape[0]
    n_padded = -(-b.shape[1] // BN) * BN
    n_pad = n_padded - b.shape[1]
    b_padded = jnp.pad(b, ((0, k_pad), (0, n_pad)))
    out = _spmm_bsr(bsr, b_padded, n_padded)
    return out[: bsr.rows, : b.shape[1]]


def spmm_bsr_from_csr(a: CSR, b: jax.Array) -> jax.Array:
    """CSR entry point with one-shot memoised BSR conversion (stored on the
    CSR instance; frozen dataclass, so via object.__setattr__)."""
    bsr = getattr(a, "_bsr_cache", None)
    if bsr is None:
        bsr = csr_to_bsr(a)
        object.__setattr__(a, "_bsr_cache", bsr)
    return spmm_bsr(bsr, b)


def bsr_profitable(a: CSR, n: int) -> bool:
    """Heuristic dispatch: BSR/MXU wins when block fill is high enough that
    the padded dense-block FLOPs beat the gather path's HBM traffic, and only
    on real TPU backends with concrete (non-traced) operands."""
    if _interpret():
        return False
    if isinstance(a.values, jax.core.Tracer) or not hasattr(a, "numpy"):
        return False
    if a.stored == 0 or n < 64:
        return False
    bsr = getattr(a, "_bsr_cache", None)
    if bsr is not None:
        nblocks = bsr.nblocks
    else:
        indptr, indices, _ = a.numpy()
        rows = np.repeat(np.arange(a.rows), np.diff(indptr))
        bkey = (rows // BM).astype(np.int64) * (-(-a.cols // BK)) + indices // BK
        nblocks = int(np.unique(bkey).shape[0])
    fill = a.stored / (nblocks * BM * BK)
    return fill >= 0.02
