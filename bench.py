"""Benchmark harness — prints ONE JSON line for the driver.

Replays the reference's headline criterion workload ``sd_mul``
(``/root/reference/benches/sparse_dense_mul.rs:6-35``): a 1000×1000 sparse
matrix at the largest sweep point (900k random inserts, duplicates kept —
exactly the reference generator's semantics, which pushes random (row,col)
pairs through ``insert`` without dedup) multiplied by a dense RHS. The RHS is
widened from the reference's 10 columns to 128 (one TPU lane tile);
throughput is normalised per inserted element like criterion's
``Throughput::Elements``.

Implementation notes:
* The workload is generated **on device** (jax.random + on-device sort) and
  the result never leaves the device — this benches the chip, not the
  host↔device link (which on tunneled single-chip setups is slow and must
  not sit on the timed path).
* On TPU the SpMM runs the BSR/MXU path with the block layout built on
  device (at this density every 8×128 block is occupied, so the block grid
  is static); elsewhere the gather/segment path.
* ``vs_baseline``: achieved fraction of the single-chip speed-of-light bound
  max(HBM time, MXU time) — the reference publishes no numbers (BASELINE.md),
  so roofline fraction is the honest denominator.
"""

import json
import time

N = 1000
INSERTS = 900_000
N_RHS = 128
SEED = 1000

# v5e-class single-chip peaks (roofline denominator only).
HBM_BW = 819e9
MXU_F32 = 4.9e13

BM, BK = 8, 128


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def make_workload(key):
        krow, kcol, kval, kb = jax.random.split(key, 4)
        rows = jax.random.randint(krow, (INSERTS,), 0, N, dtype=jnp.int32)
        cols = jax.random.randint(kcol, (INSERTS,), 0, N, dtype=jnp.int32)
        vals = jax.random.randint(kval, (INSERTS,), 0, 255,
                                  dtype=jnp.int32).astype(jnp.float32)
        order = jnp.argsort(rows * N + cols, stable=True)
        rows, cols, vals = rows[order], cols[order], vals[order]
        counts = jnp.zeros(N, dtype=jnp.int32).at[rows].add(1)
        indptr = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
        )
        b = jax.random.randint(kb, (N, N_RHS), 0, 255,
                               dtype=jnp.int32).astype(jnp.float32)
        return indptr, rows, cols, vals, b

    key = jax.random.PRNGKey(SEED)
    indptr, rows, cols, vals, b = jax.block_until_ready(make_workload(key))

    n_row_blocks = -(-N // BM)
    n_col_blocks = -(-N // BK)
    nblocks = n_row_blocks * n_col_blocks

    if on_tpu:
        from basic_sparse_matrix_tpu.ops.pallas.spmm_kernel import (
            BSR,
            spmm_bsr,
        )
        import numpy as np

        @jax.jit
        def to_bsr_blocks(rows, cols, vals):
            bid = (rows // BM) * n_col_blocks + cols // BK
            blocks = jnp.zeros((nblocks, BM, BK), dtype=jnp.float32)
            return blocks.at[bid, rows % BM, cols % BK].add(vals)

        blocks = jax.block_until_ready(to_bsr_blocks(rows, cols, vals))
        block_rows = jnp.asarray(
            np.repeat(np.arange(n_row_blocks, dtype=np.int32), n_col_blocks)
        )
        block_cols = jnp.asarray(
            np.tile(np.arange(n_col_blocks, dtype=np.int32), n_row_blocks)
        )
        bsr = BSR(blocks=blocks, block_rows=block_rows,
                  block_cols=block_cols, rows=N, cols=N)
        run = jax.jit(lambda bb: spmm_bsr(bsr, bb))
    else:
        @jax.jit
        def run(bb):
            row_ids = jnp.repeat(
                jnp.arange(N, dtype=jnp.int32), jnp.diff(indptr),
                total_repeat_length=INSERTS,
            )
            gathered = bb[cols] * vals[:, None]
            return jax.ops.segment_sum(gathered, row_ids, num_segments=N,
                                       indices_are_sorted=True)

    out = jax.block_until_ready(run(b))  # compile + warmup
    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    elements_per_s = INSERTS / dt

    # Speed-of-light bound for the BSR formulation of this workload.
    a_bytes = nblocks * BM * BK * 4
    b_bytes = N * N_RHS * 4
    c_bytes = n_row_blocks * BM * N_RHS * 4
    t_mem = (a_bytes + b_bytes + c_bytes) / HBM_BW
    t_mxu = 2 * nblocks * BM * BK * N_RHS / MXU_F32
    t_sol = max(t_mem, t_mxu)
    vs = t_sol / dt

    print(json.dumps({
        "metric": "spmm_sd_mul_elements_per_s",
        "value": float(f"{elements_per_s:.4g}"),
        "unit": "elements/s",
        "vs_baseline": float(f"{vs:.4g}"),
    }))


if __name__ == "__main__":
    main()
