"""RHS-split barrier-group probe at the 1M×32×512 hypersparse point.

BENCH_RESULTS.md (round 2) shows the barrier-grouped unroll is limited by
the live-temp budget: f32 group 8 OOMs (per-group gathers materialise
rows×n_rhs×4 ≈ 2 GB each), while the bf16 numbers (barrier4 0.238 →
barrier8 0.256) say more in-flight gathers per group still helps — the
kernel is gather-ISSUE-bound, not bandwidth-bound. Hypothesis: splitting
the RHS into column chunks shrinks each gather temp proportionally, so f32
can afford bigger groups at the same live-temp budget. Cost: cols/vals are
re-gathered per chunk (+8 B/nnz/chunk — noise next to the 2 KB/nnz B rows).

Variants (library `spmm_ell` group-4 path is the shipping baseline):
  lib          — ops.ell.spmm_ell (barrier4 at this shape)
  splitCxG     — column chunks of C, barrier groups of G within each chunk,
                 (acc, B) threaded through one optimization_barrier chain
  batchedCxG   — same split, but each group's G gathers issued as ONE
                 stacked gather (G·rows indices) then a width-G contraction;
                 tests whether fewer, larger gather ops beat G fused ones

Usage: python benchmarks/rhs_split_probe.py [--rows 1000000] [--i1 3 --i2 13]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--nnz-per-row", type=int, default=32)
    ap.add_argument("--n-rhs", type=int, default=512)
    ap.add_argument("--i1", type=int, default=3)
    ap.add_argument("--i2", type=int, default=13)
    ap.add_argument("--variants", type=str,
                    default="lib,split256x8,split128x16,batched256x8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rows, per, n_rhs = args.rows, args.nnz_per_row, args.n_rhs
    nnz = rows * per

    @jax.jit
    def make(key):
        kcol, kval, kb = jax.random.split(key, 3)
        cols = jax.random.randint(kcol, (rows, per), 0, rows, dtype=jnp.int32)
        vals = jax.random.normal(kval, (rows, per), dtype=jnp.float32)
        b = jax.random.normal(kb, (rows, n_rhs), dtype=jnp.float32)
        return cols, vals, b

    cols, vals, b = make(jax.random.PRNGKey(0))

    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell

    def step_lib(operand, carry):
        c, v = operand
        return spmm_ell(ELL(cols=c, vals=v, n_cols=rows), carry)

    def make_split(chunk, group):
        def step(operand, carry):
            c, v = operand
            bb = carry
            outs = []
            for s in range(0, n_rhs, chunk):
                out = None
                for q0 in range(0, per, group):
                    for k in range(q0, min(q0 + group, per)):
                        term = v[:, k, None] * bb[c[:, k], s:s + chunk]
                        out = term if out is None else out + term
                    out, bb = jax.lax.optimization_barrier((out, bb))
                outs.append(out)
            return jnp.concatenate(outs, axis=1)
        return step

    def make_batched(chunk, group):
        def step(operand, carry):
            c, v = operand
            bb = carry
            outs = []
            for s in range(0, n_rhs, chunk):
                out = None
                for q0 in range(0, per, group):
                    g = min(q0 + group, per) - q0
                    idx = c[:, q0:q0 + g].T.reshape(-1)       # (g·rows,)
                    gath = bb[idx, s:s + chunk]                # one gather
                    gath = gath.reshape(g, rows, chunk)
                    term = jnp.sum(
                        v[:, q0:q0 + g].T[:, :, None] * gath, axis=0)
                    out = term if out is None else out + term
                    out, bb = jax.lax.optimization_barrier((out, bb))
                outs.append(out)
            return jnp.concatenate(outs, axis=1)
        return step

    steps = {"lib": step_lib}
    for name in args.variants.split(","):
        if name.startswith("split"):
            chunk, group = map(int, name[len("split"):].split("x"))
            steps[name] = make_split(chunk, group)
        elif name.startswith("batched"):
            chunk, group = map(int, name[len("batched"):].split("x"))
            steps[name] = make_batched(chunk, group)

    hbm_bw = 819e9
    bytes_per_iter = nnz * 8 + nnz * n_rhs * 4 + rows * n_rhs * 4
    t_roof = bytes_per_iter / hbm_bw

    results = {}
    for name in args.variants.split(","):
        step = steps[name]
        try:
            dt = measure_loop(make_loop(step), (cols, vals), b,
                              i1=args.i1, i2=args.i2, reps=2)
            results[name] = {
                "seconds_per_iter": float(f"{dt:.4g}"),
                "roofline_fraction": float(f"{t_roof / dt:.4g}"),
                "nnz_per_s": float(f"{nnz / dt:.4g}"),
            }
        except Exception as e:  # OOM is a data point
            results[name] = {"error": type(e).__name__,
                             "msg": str(e)[:200]}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"metric": "rhs_split_probe", "rows": rows,
                      "n_rhs": n_rhs, "results": results}))


if __name__ == "__main__":
    main()
