"""Hypersparse SpMM head-to-head: VMEM-streaming kernel vs the shipping
ELL gather path, at the bench.py hypersparse shape (100k x 32/row x 512).

The ELL path is bound by the random-gather issue rate (~86 GB/s useful);
the streaming kernel replaces every random HBM read with a VMEM-local
FMA measured at 1.456 ns/entry (benchmarks/entry_fma_probe.py) plus
sequential B tile streaming. Issue arithmetic predicts ~15 ms vs the
~34 ms gather path at this shape.

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/stream_spmm_bench.py
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--per-row", type=int, default=32)
    ap.add_argument("--n-rhs", type=int, default=512)
    ap.add_argument("--tiles", type=str, default="2048,1024",
                    help="tile_m[xtile_k] list, e.g. 4096x1024,2048")
    ap.add_argument("--unrolls", type=str, default="1,2,4")
    ap.add_argument("--layouts", type=str, default="row,vreg")
    ap.add_argument("--skip-ell", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell
    from basic_sparse_matrix_tpu.ops.pallas.stream_kernel import (
        build_stream_plan,
        spmm_stream,
    )
    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    rows, per, N = args.rows, args.per_row, args.n_rhs
    nnz = rows * per
    rng = np.random.default_rng(1)
    ci = rng.integers(0, rows, (rows, per)).astype(np.int32)
    v = rng.standard_normal((rows, per)).astype(np.float32)
    ri = np.repeat(np.arange(rows), per)

    results = {"rows": rows, "per_row": per, "n_rhs": N,
               "backend": jax.default_backend()}

    # On-device oracle comparison uses a shared random B.
    kb = jax.random.PRNGKey(2)
    b = jax.random.normal(kb, (rows, N), jnp.float32)

    h_bytes = nnz * 8 + nnz * N * 4 + rows * N * 4
    spec_bw = 819e9

    if not args.skip_ell:
        ell = ELL(cols=jnp.asarray(ci), vals=jnp.asarray(v), n_cols=rows)

        def ell_step(operand, carry):
            c, vv = operand
            return spmm_ell(ELL(cols=c, vals=vv, n_cols=rows), carry)

        edt = measure_loop(make_loop(ell_step), (ell.cols, ell.vals), b,
                           i1=3, i2=13, reps=2)
        results["ell_s"] = float(f"{edt:.5g}")
        results["ell_roofline_fraction"] = float(
            f"{(h_bytes / spec_bw) / edt:.4g}")
        oracle = spmm_ell(ell, b)
        print(json.dumps({"ell_s": results["ell_s"]}), flush=True)
    else:
        oracle = None

    for spec in args.tiles.split(","):
        tm, _, tk = spec.partition("x")
        tile_m, tile_k = int(tm), int(tk or tm)
        plan = build_stream_plan(ri, ci.ravel(), v.ravel(), rows, rows,
                                 tile_m=tile_m, tile_k=tile_k)
        key = f"t{tile_m}x{tile_k}"
        results[f"{key}_pad_factor"] = float(f"{plan.pad_factor:.4g}")
        for layout in args.layouts.split(","):
            lkey = key if layout == "row" else f"{key}_{layout}"
            if oracle is not None:
                out = spmm_stream(plan, b, layout=layout)
                err = float(jnp.abs(out - oracle).max()
                            / jnp.abs(oracle).max())
                results[f"{lkey}_rel_err"] = float(f"{err:.3g}")
                assert err < 1e-5, err
            for unroll in (int(u) for u in args.unrolls.split(",")):
                # plan rides as an operand (argument), not a closure
                # constant — closure-embedded arrays measured as a dispatch
                # overhead trap in round 1 (PERF_NOTES).
                def step(operand, carry, _u=unroll, _l=layout):
                    out = spmm_stream(operand[0], carry, unroll=_u,
                                      layout=_l)
                    return out[: carry.shape[0]]

                dt = measure_loop(make_loop(step), (plan,), b, i1=2, i2=8,
                                  reps=2)
                results[f"{lkey}_u{unroll}_s"] = float(f"{dt:.5g}")
                results[f"{lkey}_u{unroll}_roofline_fraction"] = float(
                    f"{(h_bytes / spec_bw) / dt:.4g}")
                print(json.dumps({f"{lkey}_u{unroll}": dt}), flush=True)

    print(json.dumps({"metric": "stream_spmm_head_to_head",
                      "results": results}))


if __name__ == "__main__":
    main()
