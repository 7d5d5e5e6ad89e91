"""ss_add head-to-head: reference workload, host CPU vs TPU merge paths.

The reference benches ``add_sparse`` on two 1000×1000 CSRs with ~900k
inserted entries (``/root/reference/benches/sparse_dense_mul.rs:37-67``).
This script measures, at the same recipe (seeded random, deduped COO→CSR):

* host-CPU proxies for the reference's single-core two-pointer merge:
  scipy ``A + B`` (C++ merge) and a numpy concat+lexsort merge;
* the TPU lexsort merge (round-1 shipping path);
* the TPU dense key-space merge (round-2 fast path).

TPU timings use the fetch-fenced two-point method; CPU timings are direct
best-of-N wall clock (no transport to fence).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def cpu_baselines(nnz: int, shape, reps: int = 5):
    import scipy.sparse as sp

    rng = np.random.default_rng(1000)
    rows_a = rng.integers(0, shape[0], nnz)
    cols_a = rng.integers(0, shape[1], nnz)
    vals_a = (rng.integers(0, 2**32, nnz) % 255 + 1).astype(np.float32)
    rows_b = rng.integers(0, shape[0], nnz)
    cols_b = rng.integers(0, shape[1], nnz)
    vals_b = (rng.integers(0, 2**32, nnz) % 255 + 1).astype(np.float32)
    A = sp.coo_matrix((vals_a, (rows_a, cols_a)), shape=shape).tocsr()
    B = sp.coo_matrix((vals_b, (rows_b, cols_b)), shape=shape).tocsr()
    A.sum_duplicates()
    B.sum_duplicates()

    best_scipy = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = A + B
        best_scipy = min(best_scipy, time.perf_counter() - t0)

    ra, ca, va = A.tocoo().row, A.tocoo().col, A.tocoo().data
    rb, cb, vb = B.tocoo().row, B.tocoo().col, B.tocoo().data
    best_np = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        k = np.concatenate([ra.astype(np.int64) * shape[1] + ca,
                            rb.astype(np.int64) * shape[1] + cb])
        v = np.concatenate([va, vb])
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        first = np.concatenate([[True], k[1:] != k[:-1]])
        seg = np.cumsum(first) - 1
        out = np.zeros(seg[-1] + 1, dtype=v.dtype)
        np.add.at(out, seg, v)
        best_np = min(best_np, time.perf_counter() - t0)
    return best_scipy, best_np, int(A.nnz), int(B.nnz)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=900_000)
    ap.add_argument("--i1", type=int, default=5)
    ap.add_argument("--i2", type=int, default=45)
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()
    shape = (1000, 1000)

    t_scipy, t_np, nnz_a, nnz_b = cpu_baselines(args.nnz, shape)
    results = {
        "cpu_scipy_s": float(f"{t_scipy:.4g}"),
        "cpu_numpy_lexsort_s": float(f"{t_np:.4g}"),
        "nnz_a": nnz_a, "nnz_b": nnz_b,
    }
    print(json.dumps({"baseline": results}), flush=True)
    if args.skip_tpu:
        return

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu import CSR
    from basic_sparse_matrix_tpu.ops import elementwise as ew
    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    rng = np.random.default_rng(1000)
    def gen(seed):
        r = np.random.default_rng(seed)
        return CSR.from_coo_arrays(
            shape, r.integers(0, shape[0], args.nnz),
            r.integers(0, shape[1], args.nnz),
            (r.integers(0, 2**32, args.nnz) % 255 + 1).astype(np.float32))

    a, b = gen(1000), gen(2000)
    nb = b.stored

    # planned path: symbolic plan built once (outside the timed loop, like
    # the reference bench's construction), numeric = one fused scatter-add
    plan = ew._MergePlan(a, b)

    def planned_fn(aa, bb, sign):
        vals = ew._merge_planned_vals(
            aa.values, bb.values, (plan.gather_a, plan.gather_b), plan.n, sign)
        return CSR(indptr=plan.indptr, indices=plan.indices, values=vals,
                   rows=aa.rows, cols=aa.cols)

    # chunked numeric phase: issue-coalesced row-gathers + one-hot select,
    # one variant per chunk width (plans built outside the timed loop)
    chunked_fns = {}
    for w in (16, 32, 64, 128):
        ch = ew._ChunkedMergePlan(plan, a.stored, b.stored, w=w)

        def chunked_fn(aa, bb, sign, _ch=ch):
            vals = ew._merge_chunked_vals(
                aa.values, bb.values,
                (_ch.c_a, _ch.l_a, _ch.c_b, _ch.l_b), plan.n, sign, _ch.w)
            return CSR(indptr=plan.indptr, indices=plan.indices, values=vals,
                       rows=aa.rows, cols=aa.cols)

        chunked_fns[f"chunked{w}"] = chunked_fn

    for name, fn in (("planned", planned_fn),
                     *chunked_fns.items(),
                     ("keyspace", ew._merge_keyspace_jit),
                     ("lexsort", ew._merge_jit)):
        def step(operand, carry):
            aa, bb = operand
            b2 = CSR(indptr=bb.indptr, indices=bb.indices,
                     values=carry, rows=bb.rows, cols=bb.cols)
            out = fn(aa, b2, 1)
            return out.values[:nb]

        loop = make_loop(step)
        dt = measure_loop(loop, (a, b), b.values, i1=args.i1, i2=args.i2,
                          reps=2)
        elems = a.stored + b.stored
        results[f"tpu_{name}_s"] = float(f"{dt:.4g}")
        results[f"tpu_{name}_elements_per_s"] = float(f"{elems / dt:.4g}")
        print(json.dumps({name: results[f'tpu_{name}_s']}), flush=True)

    best_tpu = min(v for k, v in results.items()
                   if k.startswith("tpu_") and k.endswith("_s"))
    results["tpu_vs_best_cpu"] = float(
        f"{min(t_scipy, t_np) / best_tpu:.4g}")
    print(json.dumps({
        "metric": "ss_add_head_to_head",
        "results": results,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
