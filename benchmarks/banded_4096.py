"""On-chip banded (block-tridiagonal) factor+solve timing at n=4096 on the
RCM-ordered 64×64 2D Laplacian — the same workload as cholesky_4096.py, so
the numbers are directly comparable to the supernodal/scatter-list rows in
BENCH_RESULTS.md.

Factor timing feeds L·Lᵀ back as the next iteration's diagonal blocks
(numerically meaningless after a few iterations, same computation graph —
the established methodology for serialised schedule timing). Solve timing
feeds the normalised solution back as the next RHS.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop
from benchmarks.cholesky_4096 import lap2d_csr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--n-rhs", type=int, default=8)
    ap.add_argument("--i1", type=int, default=5)
    ap.add_argument("--i2", type=int, default=55)
    ap.add_argument("--bcr", action="store_true",
                    help="also time block-cyclic-reduction factor/solve on "
                         "the same blocks")
    ap.add_argument("--synthetic", type=str, default="",
                    help="'m,nb' — generate SPD block-tridiagonal blocks on "
                         "device (transfer-free scale points beyond what the "
                         "slow host↔device link can upload)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.models import banded
    from basic_sparse_matrix_tpu.ops.reorder import (
        bandwidth,
        permute_symmetric,
        rcm_permutation,
    )
    from basic_sparse_matrix_tpu.utils.config import matmul_precision

    if args.synthetic:
        m, nb = (int(x) for x in args.synthetic.split(","))

        @jax.jit
        def make(key):
            kd, ke = jax.random.split(key)
            d = jax.random.normal(kd, (m, nb, nb), jnp.float32) * 0.3
            d = d + jnp.swapaxes(d, 1, 2) + 4.0 * nb * jnp.eye(nb)
            e = jax.random.normal(ke, (m - 1, nb, nb), jnp.float32) * 0.3
            return d, e

        D, E = jax.block_until_ready(make(jax.random.PRNGKey(0)))
        rec = {"n": m * nb, "bandwidth": nb, "nb": nb, "m": m,
               "synthetic": True}
    else:
        a = lap2d_csr(args.k)
        perm = rcm_permutation(a)
        ap_ = permute_symmetric(a, perm)
        bw = bandwidth(ap_)
        nb = banded.block_size_for(bw, ap_.rows)

        t0 = time.time()
        D, E = banded.band_blocks(ap_, nb)
        build_s = time.time() - t0
        D, E = jnp.asarray(D), jnp.asarray(E)
        rec = {
            "n": ap_.rows, "bandwidth": bw, "nb": nb, "m": int(D.shape[0]),
            "block_build_s": round(build_s, 3),
        }

    prec = matmul_precision()

    def factor_step(e, d):
        L, _ = banded.cholesky_banded_blocks(d, e)
        return jnp.matmul(L, jnp.swapaxes(L, 1, 2), precision=prec)

    loop = make_loop(factor_step)
    dt = measure_loop(loop, E, D, i1=args.i1, i2=args.i2, reps=2)
    rec["factor_ms"] = round(dt * 1e3, 3)

    L, F = banded.cholesky_banded_blocks(D, E)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (int(D.shape[0]), nb, args.n_rhs),
                          dtype=jnp.float32)

    def solve_step(lf, carry):
        ll, ff = lf
        return banded.solve_banded_blocks(ll, ff, carry)

    loop = make_loop(solve_step)
    dt2 = measure_loop(loop, (L, F), b, i1=args.i1 * 4, i2=args.i2 * 4,
                       reps=2)
    rec["solve_ms"] = round(dt2 * 1e3, 3)

    if args.bcr:
        from basic_sparse_matrix_tpu.models import bcr

        fac = bcr.factor_bcr(D, E)
        bp = b
        if fac.m_padded != int(D.shape[0]):
            bp = jnp.concatenate(
                [b, jnp.zeros((fac.m_padded - int(D.shape[0]),) + b.shape[1:],
                              b.dtype)], axis=0)

        def bcr_solve_step(f, carry):
            return bcr.solve_bcr(f, carry)

        dt3 = measure_loop(make_loop(bcr_solve_step), fac, bp,
                           i1=args.i1 * 4, i2=args.i2 * 4, reps=2)
        rec["bcr_solve_ms"] = round(dt3 * 1e3, 3)

        Dp, Ep = bcr._pad_pow2(D, E)

        def bcr_refined_step(operand, carry):
            f, d, e = operand
            return bcr._solve_refined(f, d, e, carry)

        dt3r = measure_loop(make_loop(bcr_refined_step), (fac, Dp, Ep), bp,
                            i1=args.i1 * 4, i2=args.i2 * 4, reps=2)
        rec["bcr_solve_refined_ms"] = round(dt3r * 1e3, 3)

        def bcr_total_step(de, carry):
            d, e = de
            return bcr.solve_bcr(bcr.factor_bcr(d, e), carry)

        dt4 = measure_loop(make_loop(bcr_total_step), (D, E), bp,
                           i1=args.i1, i2=args.i2, reps=2)
        rec["bcr_factor_ms"] = round((dt4 - dt3) * 1e3, 3)

    rec["backend"] = jax.default_backend()
    print(json.dumps({"metric": "banded_4096", **rec}))


if __name__ == "__main__":
    main()
