"""SPD validation set on hardware (BASELINE config 2; VERDICT r2 item 6).

Pulls the committed FEM-style SPD fixtures (``benchmarks/
gen_spd_fixtures.py`` — real SuiteSparse downloads are impossible here,
zero egress) through the full production path on the chip:

    runtime.io.read_matrix_market → prepare_direct (ordering +
    factorization ladder) → solve → on-device residual check

and reports per matrix: the chosen factorization tier, host prepare time
(wall), device solve time (fetch-fenced two-point), and the relative
residual ‖Ax−b‖₂/‖b‖₂ computed ON DEVICE (only the scalar is fetched).
Reference tolerance contract: /root/reference/src/lib.rs:130-136 (solve
golden values pinned at f32 exactness; here residual ≤ 1e-4 relative).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

FIXTURES = (
    "tests/data/plate2d_48.mtx",
    "tests/data/frame3d_14.mtx",
    "tests/data/beam_stiffness_2000.mtx",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i1", type=int, default=3)
    ap.add_argument("--i2", type=int, default=13)
    ap.add_argument("--n-rhs", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.models.solve import prepare_direct
    from basic_sparse_matrix_tpu.ops.spmm import spmm
    from basic_sparse_matrix_tpu.runtime.io import read_matrix_market
    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    root = __file__.rsplit("/", 2)[0]
    results = {}
    for rel in FIXTURES:
        a = read_matrix_market(os.path.join(root, rel))
        name = os.path.basename(rel).removesuffix(".mtx")
        n = a.rows

        t0 = time.time()
        ds = prepare_direct(a)
        prepare_s = time.time() - t0

        b = jax.random.normal(jax.random.PRNGKey(7), (n, args.n_rhs),
                              jnp.float32)
        x = ds.solve(b)
        # Residual on device; only scalars leave the chip.
        r = spmm(a, x) - b
        rel_res = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))

        def solve_step(operand, carry):
            return ds.solve(carry)

        dt = measure_loop(make_loop(solve_step), (), b,
                          i1=args.i1, i2=args.i2, reps=2)

        rec = {
            "n": n, "nnz": a.stored, "tier": ds.kind,
            "prepare_s": round(prepare_s, 3),
            "solve_ms": round(dt * 1e3, 3),
            "rel_residual": float(f"{rel_res:.3g}"),
            "pass": rel_res <= 1e-4,
        }
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    ok = all(r["pass"] for r in results.values())
    print(json.dumps({"metric": "spd_validation", "all_pass": ok,
                      "results": results,
                      "backend": jax.default_backend()}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
