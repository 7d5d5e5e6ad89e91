"""General-tier scale point: supernodal numeric phase at n >= 32k ON CHIP
(VERDICT r2 item 9).

The 33^3 7-point Laplacian (n = 35937) under nested dissection produces a
263-group schedule that cannot compile as one XLA program (the remote
compile helper is OOM-killed), so the shipping execution path is the
bounded chunk sequence (config ``supernodal_groups_per_program``). The
measurement mirrors that path: each chunk program is timed with the
fetch-fenced two-point method (carry = normalised factor values) and the
chunk times sum to the numeric phase; the host-dispatched end-to-end wall
time (one fence at the end, dispatches pipeline asynchronously) is
reported alongside.

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/supernodal_scale.py --k 33
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from cholesky_4096 import lap3d_csr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=33)
    ap.add_argument("--relax", type=int, default=32)
    ap.add_argument("--groups-per-program", type=int, default=0,
                    help="0 = config default")
    ap.add_argument("--i1", type=int, default=1)
    ap.add_argument("--i2", type=int, default=4)
    ap.add_argument("--wall", action="store_true",
                    help="also time the shipping factorize_supernodal wall "
                         "(22 extra remote compiles)")
    args = ap.parse_args()

    import jax

    from basic_sparse_matrix_tpu.models import supernodal as sn
    from basic_sparse_matrix_tpu.ops.reorder import (
        nd_permutation,
        permute_symmetric,
    )
    from basic_sparse_matrix_tpu.runtime.timing import (
        fence,
        make_loop,
        measure_loop,
    )
    from basic_sparse_matrix_tpu.utils.config import get_config

    G = args.groups_per_program or get_config().supernodal_groups_per_program

    rec = {"n": args.k ** 3, "backend": jax.default_backend(),
           "groups_per_program": G}
    t0 = time.time()
    a = lap3d_csr(args.k)
    perm = nd_permutation(a)
    ap_ = permute_symmetric(a, perm)
    rec["build_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    sched = sn.analyze_supernodal(ap_, relax=args.relax)
    rec["analyze_s"] = round(time.time() - t0, 2)
    rec["nnz_l"] = sched.nnz_l
    n_g = sched.n_groups
    rec["groups"] = n_g
    sched_bytes = sum(
        x.size * x.dtype.itemsize
        for x in (sched.a_src_pos, sched.a_vals_idx, sched.flat_i32,
                  sched.flat_u16, sched.flat_bool))
    rec["schedule_mb"] = round(sched_bytes / 2**20, 1)
    print(json.dumps({"analyze": rec}), flush=True)

    cfg = get_config()
    win = ("auto" if cfg.supernodal_gather == "auto"
           else cfg.supernodal_gather == "window")
    mode = cfg.supernodal_scatter
    pad = 1 + (sn._win_pad(sched) if sn._needs_win_pad(sched, win) else 0) \
        + sn._pallas_pad(sched, mode)
    lvals0 = jax.block_until_ready(
        sn._init_lvals(sched, ap_.values, pad))

    # Per-chunk two-point timing on the SHIPPING execution path.
    chunk_s = []
    lv = lvals0
    for c0 in range(0, n_g, G):
        gis = tuple(range(c0, min(c0 + G, n_g)))
        smodes = tuple(sn._group_delta(sched, gi, mode) for gi in gis)

        def step(operand, carry, _g=gis, _u=smodes):
            return sn._groups_chunk(operand, carry, _g, _u, win)

        loop = make_loop(step)
        dt = measure_loop(loop, sched, lv, i1=args.i1,
                          i2=args.i2, reps=2)
        chunk_s.append(dt)
        # advance the carry so later chunks see realistic values — via the
        # already-compiled i1 loop (a separate plain-chunk program would be
        # one more ~minutes-scale remote compile per chunk)
        lv = loop(sched, lv, args.i1)
        print(json.dumps({"chunk": c0 // G, "groups": len(gis),
                          "s": round(dt, 5)}), flush=True)
    rec["numeric_sum_ms"] = round(sum(chunk_s) * 1e3, 2)
    finite = bool(jax.jit(lambda x: jax.numpy.isfinite(x).all())(lv))
    rec["carry_finite"] = finite

    # End-to-end wall: host-dispatched chunk sequence, one fence. Opt-in:
    # the plain chunk programs are 22 MORE remote compiles on top of the
    # per-chunk timing loops.
    if args.wall:
        for _ in range(2):
            t0 = time.time()
            out = sn.factorize_supernodal(sched, ap_.values)
            fence(out)
            rec["factorize_wall_ms"] = round((time.time() - t0) * 1e3, 1)
        rec["finite"] = bool(
            jax.jit(lambda x: jax.numpy.isfinite(x).all())(out))

    print(json.dumps({"metric": "supernodal_scale", "results": rec}))


if __name__ == "__main__":
    main()
