"""On-chip sparse Cholesky numeric-phase comparison at n=4096 (VERDICT r1
item 6): scatter-list vs supernodal panels, RCM vs nested-dissection
orderings, on the 64×64 2D Laplacian.

Host analyze times are wall clock; device numeric times use the
fetch-fenced two-point method. Workload values ride to the device once
(tiny: ~50k floats); schedules are jit arguments.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop


def lap2d_csr(k):
    from basic_sparse_matrix_tpu import CSR

    n = k * k
    rows, cols, vals = [], [], []
    for i in range(k):
        for j in range(k):
            r = i * k + j
            rows.append(r), cols.append(r), vals.append(4.0)
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < k and 0 <= jj < k:
                    rows.append(r), cols.append(ii * k + jj)
                    vals.append(-1.0)
    return CSR.from_coo_arrays(
        (n, n), np.asarray(rows), np.asarray(cols),
        np.asarray(vals, np.float32))


def lap3d_csr(k):
    """k×k×k 7-point stencil, n = k³ — the general-path workload (its
    bandwidth ~k² exceeds banded_max_block, so the ladder lands on the
    supernodal/scatter factorizations)."""
    import numpy as np

    from basic_sparse_matrix_tpu import CSR

    n = k ** 3
    ii, jj, ll = np.meshgrid(np.arange(k), np.arange(k), np.arange(k),
                             indexing="ij")
    rid = ((ii * k + jj) * k + ll).ravel()
    rows, cols, vals = [rid], [rid], [np.full(n, 6.0, np.float32)]
    for d in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1),
              (0, 0, -1)):
        i2, j2, l2 = ii + d[0], jj + d[1], ll + d[2]
        ok = ((0 <= i2) & (i2 < k) & (0 <= j2) & (j2 < k)
              & (0 <= l2) & (l2 < k)).ravel()
        rows.append(rid[ok])
        cols.append(((i2 * k + j2) * k + l2).ravel()[ok])
        vals.append(np.full(int(ok.sum()), -1.0, np.float32))
    return CSR.from_coo_arrays((n, n), np.concatenate(rows),
                               np.concatenate(cols), np.concatenate(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--stencil", type=str, default="2d",
                    choices=("2d", "3d"))
    ap.add_argument("--relax-rcm", type=int, default=8)
    ap.add_argument("--relax-nd", type=int, default=32)
    ap.add_argument("--i1", type=int, default=2)
    ap.add_argument("--i2", type=int, default=12)
    ap.add_argument("--orderings", type=str, default="rcm,nd")
    ap.add_argument("--skip-scatter", action="store_true")
    args = ap.parse_args()

    import jax

    from basic_sparse_matrix_tpu.models import sparse_cholesky as sc
    from basic_sparse_matrix_tpu.models import supernodal as sn
    from basic_sparse_matrix_tpu.ops.reorder import (
        nd_permutation,
        permute_symmetric,
        rcm_permutation,
    )

    a = (lap2d_csr if args.stencil == "2d" else lap3d_csr)(args.k)
    results = {}
    for name in args.orderings.split(","):
        perm = (rcm_permutation if name == "rcm" else nd_permutation)(a)
        ap_ = permute_symmetric(a, perm)
        relax = args.relax_rcm if name == "rcm" else args.relax_nd
        rec = {}

        t0 = time.time()
        sched = sn.analyze_supernodal(ap_, relax=relax)
        rec["analyze_supernodal_s"] = round(time.time() - t0, 3)
        rec["panel_width"] = round(sched.avg_panel_width, 2)
        rec["nnz_l"] = sched.nnz_l
        rec["n_groups"] = len(sched.upd_base)

        # The carry (normalised factor values sliced back to A's nnz) keeps
        # iterations serialised; numerically meaningless, which is fine for
        # timing the fixed schedule.
        nnz_a = int(ap_.stored)

        def sn_step(operand, carry):
            out = sn.factorize_supernodal(operand, carry)
            return out[:nnz_a]

        loop = make_loop(sn_step)
        dt = measure_loop(loop, sched, ap_.values, i1=args.i1, i2=args.i2,
                          reps=2)
        rec["supernodal_ms"] = round(dt * 1e3, 2)

        if not args.skip_scatter:
            t0 = time.time()
            ssched = sc.analyze(ap_)
            rec["analyze_scatter_s"] = round(time.time() - t0, 3)

            def sl_step(operand, carry):
                out = sc.factorize(operand, carry)
                return out[:nnz_a]

            loop = make_loop(sl_step)
            dt2 = measure_loop(loop, ssched, ap_.values, i1=args.i1,
                               i2=args.i2, reps=2)
            rec["scatter_list_ms"] = round(dt2 * 1e3, 2)
            rec["speedup"] = round(dt2 / dt, 2)
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print(json.dumps({"metric": "cholesky_4096", "n": a.rows,
                      "results": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
