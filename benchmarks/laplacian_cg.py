"""2D-Laplacian distributed solve study (BASELINE.json config 4: "2D
Laplacian 4096² grid: row-partitioned SpMM + distributed triangular solve").

Builds the 5-point-stencil SPD operator for a k×k grid (n = k² rows,
nnz ≈ 5n) host-side in O(n), row-shards it over the available mesh, and runs
the distributed CG solver (all-gather matvec over ICI). Direct level-set
factorization of this operator at 4096² needs supernodal tiles (future
round); CG is the production path at this scale.

Usage: python benchmarks/laplacian_cg.py [--k 512] [--iters 100]
       (k=4096 is the BASELINE config; default is sized for quick runs)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def laplacian_2d_csr(k: int):
    """5-point stencil CSR triplets for a k×k grid, vectorised O(n)."""
    n = k * k
    idx = np.arange(n, dtype=np.int64)
    i, j = idx // k, idx % k
    rows, cols, vals = [idx], [idx], [np.full(n, 4.0, np.float32)]
    for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        ii, jj = i + di, j + dj
        ok = (ii >= 0) & (ii < k) & (jj >= 0) & (jj < k)
        rows.append(idx[ok])
        cols.append((ii * k + jj)[ok])
        vals.append(np.full(int(ok.sum()), -1.0, np.float32))
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(vals), n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops.csr import CSR
    from basic_sparse_matrix_tpu.parallel.cg import cg_solve_sharded
    from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
    from basic_sparse_matrix_tpu.parallel.sharded import put_sharded, shard_csr

    rows, cols, vals, n = laplacian_2d_csr(args.k)
    a = CSR.from_coo_arrays((n, n), rows, cols, vals, sum_duplicates=False)
    num = len(jax.devices())
    mesh = row_mesh(num)
    sa = put_sharded(shard_csr(a, num), mesh)

    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(np.float32)

    # warmup/compile
    x = cg_solve_sharded(sa, jnp.asarray(b), mesh, iters=args.iters)
    fencev = float(jnp.ravel(x)[:1].sum())
    t0 = time.perf_counter()
    x = cg_solve_sharded(sa, jnp.asarray(b), mesh, iters=args.iters)
    fencev = float(jnp.ravel(x)[:1].sum())
    dt = time.perf_counter() - t0

    res = float(np.abs(
        np.asarray(a.todense() @ jnp.asarray(x)[:n] if n <= 4096 else 0)
    ).max()) if n <= 4096 else None

    print(json.dumps({
        "metric": "laplacian_cg_seconds",
        "k": args.k,
        "n": n,
        "nnz": int(vals.shape[0]),
        "iters": args.iters,
        "seconds": dt,
        "nnz_iters_per_s": float(f"{vals.shape[0] * args.iters / dt:.4g}"),
        "devices": num,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
