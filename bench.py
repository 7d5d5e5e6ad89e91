"""Benchmark harness — prints ONE JSON line for the driver.

Replays the reference's headline criterion workload ``sd_mul``
(``/root/reference/benches/sparse_dense_mul.rs:6-35``): a 1000×1000 sparse
matrix with the largest sweep point's element count (900k inserted; dedup'd
per SURVEY.md §6 since the reference generator silently keeps duplicates)
multiplied by a dense RHS. The RHS is widened from the reference's 10 columns
to 128 (one TPU lane tile) — reported throughput is normalised per nnz so the
numbers stay comparable, and the wide RHS is the shape the roofline targets.

Metric: stored-nnz processed per second through the SpMM kernel.
``vs_baseline``: fraction of the single-chip speed-of-light bound, where the
bound is max(HBM-bandwidth time, MXU time) for the BSR formulation — the
reference publishes no numbers (BASELINE.md), so roofline fraction is the
honest denominator.
"""

import json
import time

import numpy as np


# v5e-class single-chip peaks (used only for the roofline denominator).
HBM_BW = 819e9          # bytes/s
MXU_F32 = 4.9e13        # f32 FLOP/s (bf16 pass-based f32 matmul)


def build_workload(n=1000, inserts=900_000, n_rhs=128, seed=1000):
    from basic_sparse_matrix_tpu import CSR

    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, inserts)
    cols = rng.integers(0, n, inserts)
    vals = (rng.integers(0, 255, inserts) % 255).astype(np.float32)
    a = CSR.from_coo_arrays((n, n), rows, cols, vals)
    b = rng.integers(0, 255, (n, n_rhs)).astype(np.float32)
    return a, b


def main():
    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops.pallas import spmm_kernel as K
    from basic_sparse_matrix_tpu.ops.spmm import spmm

    a, b_np = build_workload()
    b = jnp.asarray(b_np)
    nnz = a.stored
    n_rhs = b.shape[1]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        bsr = K.csr_to_bsr(a)
        run = jax.jit(lambda bb: K.spmm_bsr(bsr, bb))
    else:
        run = jax.jit(lambda bb: spmm(a, bb))

    out = run(b)
    out.block_until_ready()  # warmup + compile
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    nnz_per_s = nnz / dt

    # Speed-of-light for the BSR formulation on this input.
    if on_tpu:
        nblocks = bsr.nblocks
        a_bytes = nblocks * K.BM * K.BK * 4
        b_bytes = b.shape[0] * n_rhs * 4
        c_bytes = bsr.padded_rows * n_rhs * 4
        t_mem = (a_bytes + b_bytes + c_bytes) / HBM_BW
        t_mxu = 2 * nblocks * K.BM * K.BK * n_rhs / MXU_F32
        t_sol = max(t_mem, t_mxu)
    else:
        t_sol = (nnz * (4 + 4) + nnz * n_rhs * 4 + b.size * 4) / 100e9
    vs = t_sol / dt  # fraction of speed-of-light achieved

    print(json.dumps({
        "metric": "spmm_sd_mul_nnz_per_s",
        "value": float(f"{nnz_per_s:.4g}"),
        "unit": "nnz/s",
        "vs_baseline": float(f"{vs:.4g}"),
    }))


if __name__ == "__main__":
    main()
