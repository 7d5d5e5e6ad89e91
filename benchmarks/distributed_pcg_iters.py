"""Iteration-count comparison of the distributed iterative solvers.

Run on the simulated 8-device CPU mesh:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/distributed_pcg_iters.py

Wall-clock on the simulated mesh is meaningless; the quantity that
transfers to a real pod is the *iteration count* at equal per-iteration
communication (every solver does exactly one tiled all_gather per step).
"""

import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.operator import DistributedOperator


def lap2d(k):
    n = k * k
    a = np.zeros((n, n), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            r = i * k + j
            a[r, r] = 4.0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < k and 0 <= jj < k:
                    a[r, ii * k + jj] = -1.0
    return a


def main():
    k = 32
    a = lap2d(k)
    n = a.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(np.float32)
    bn = np.linalg.norm(b)
    op = DistributedOperator(CSR.from_dense(a), row_mesh(8))

    print(f"2D Laplacian {k}x{k} (n={n}), 8 row shards "
          f"(block size {op.sa.rows_per_shard})")
    print(f"{'iters':>6} {'cg':>10} {'pcg(bj)':>10} {'chebyshev':>10}")
    for iters in (10, 20, 40, 80, 160):
        row = [iters]
        for solver in (op.solve_cg, op.solve_pcg, op.solve_chebyshev):
            x = np.asarray(solver(b, iters=iters))
            row.append(np.linalg.norm(a @ x - b) / bn)
        print(f"{row[0]:>6} {row[1]:>10.2e} {row[2]:>10.2e} {row[3]:>10.2e}")


if __name__ == "__main__":
    main()
