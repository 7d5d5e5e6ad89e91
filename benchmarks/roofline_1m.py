"""Single-chip roofline study: 1M-row hypersparse SpMM (BASELINE.json
config 3: "1M-row CSR (nnz/row≈32) × dense 512-col RHS").

At this density (32/1M per row) no block format fills, so the contender is
the gather/segment formulation. The roofline for it is gather-traffic bound:
every stored entry touches one RHS row, so bytes ≈ nnz·(8 + 4·N_RHS) + out.
Workload generated on device; fetch-fenced two-point timing.

Usage: python benchmarks/roofline_1m.py [--rows 1000000] [--nnz-per-row 32]
       [--n-rhs 512]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--nnz-per-row", type=int, default=32)
    ap.add_argument("--n-rhs", type=int, default=512)
    ap.add_argument("--i1", type=int, default=5)
    ap.add_argument("--i2", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rows, per, n_rhs = args.rows, args.nnz_per_row, args.n_rhs
    nnz = rows * per

    @jax.jit
    def make(key):
        kcol, kval, kb = jax.random.split(key, 3)
        # uniform nnz/row: indptr is affine, cols random
        cols = jax.random.randint(kcol, (nnz,), 0, rows, dtype=jnp.int32)
        vals = jax.random.normal(kval, (nnz,), dtype=jnp.float32)
        b = jax.random.normal(kb, (rows, n_rhs), dtype=jnp.float32)
        return cols, vals, b

    cols, vals, b = make(jax.random.PRNGKey(0))
    # ELL formulation (uniform rows) through the library path — gather +
    # batched reduce, row-chunked to bound the gathered intermediate
    # (ops/ell.spmm_ell, the spmm_auto dispatch choice for this shape).
    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell

    ell = ELL(cols=cols.reshape(rows, per), vals=vals.reshape(rows, per),
              n_cols=rows)

    def step(operand, carry):
        return spmm_ell(operand, carry)

    loop = make_loop(step)
    dt = measure_loop(loop, ell, b, i1=args.i1, i2=args.i2, reps=2)

    hbm_bw = 819e9
    bytes_per_iter = nnz * (4 + 4) + nnz * n_rhs * 4 + rows * n_rhs * 4
    t_roofline = bytes_per_iter / hbm_bw
    print(json.dumps({
        "metric": "spmm_1m_roofline_nnz_per_s",
        "value": float(f"{nnz / dt:.4g}"),
        "unit": "nnz/s",
        "seconds_per_iter": dt,
        "roofline_fraction": float(f"{t_roofline / dt:.4g}"),
        "gflops": float(f"{2 * nnz * n_rhs / dt / 1e9:.4g}"),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
