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
    ap.add_argument("--stream", action="store_true",
                    help="also measure the VMEM-streaming kernel (vreg + "
                         "vregp layouts) across C-tile heights — at 1M "
                         "rows B re-streams once per ROW TILE, so tall C "
                         "tiles are the lever on HBM traffic")
    ap.add_argument("--stream-tiles", type=str, default="4096,16384,32768")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rows, per, n_rhs = args.rows, args.nnz_per_row, args.n_rhs
    nnz = rows * per

    # Entry arrays on HOST (numpy) so the stream plan can bin them without
    # any device->host fetch (uploads are cheap on this transport, fetches
    # are the hazard — CLAUDE.md); RHS generated on device.
    host_rng = np.random.default_rng(0)
    h_cols = host_rng.integers(0, rows, nnz).astype(np.int32)
    h_vals = host_rng.standard_normal(nnz).astype(np.float32)
    cols = jnp.asarray(h_cols)
    vals = jnp.asarray(h_vals)
    b = jax.jit(lambda k: jax.random.normal(
        k, (rows, n_rhs), dtype=jnp.float32))(jax.random.PRNGKey(1))
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
    }), flush=True)

    if not args.stream:
        return

    from basic_sparse_matrix_tpu.ops.pallas.stream_kernel import (
        build_stream_plan,
        spmm_stream,
    )

    h_rows = np.repeat(np.arange(rows, dtype=np.int64), per)
    for tm in (int(t) for t in args.stream_tiles.split(",")):
        plan = build_stream_plan(h_rows, h_cols, h_vals, rows, rows,
                                 tile_m=tm, tile_k=2048)
        rec = {"tile_m": tm, "cellmax": plan.cellmax,
               "pad_factor": float(f"{plan.pad_factor:.4g}"),
               "n_rt": plan.n_rt, "n_kt": plan.n_kt}
        layouts = ("vreg", "vregp") if tm < (1 << 15) else ("vreg",)
        for layout in layouts:  # vregp packs (i<<16)|k: needs tm < 2^15
            def stream_step(operand, carry, _l=layout):
                return spmm_stream(operand, carry, unroll=8, layout=_l)

            sdt = measure_loop(make_loop(stream_step), plan, b,
                               i1=2, i2=10, reps=2)
            rec[f"stream_{layout}_s"] = float(f"{sdt:.4g}")
            rec[f"stream_{layout}_roofline_fraction"] = float(
                f"{t_roofline / sdt:.4g}")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
