"""Supernodal _level_step component probe — where do 25 ms/level go?

At n=35937 the numeric phase measures ~25 ms per LEVEL (sn_scale r3),
while the level's einsum flops predict well under 1 ms. Per-level element
counts point at scalar-issue-bound memory ops: the update gathers
``lvals[ga]``/``lvals[gb]`` move U·(I+J)·W random f32 ELEMENTS (~6.6 ns
per scalar-gather issue measured on the planned-merge path) and the
scatter ``lvals.at[sc].add`` another U·I·J (TPU scatter ≈ 6× a gather per
issue). But ``ga``/``gb`` are CONTIGUOUS WINDOWS (base + rank): a
vmapped ``dynamic_slice`` fetches each (u, w) column run in ONE issue —
U·W issues instead of U·I·W.

This probe times, at representative level shapes from the 33³ schedule:
  a) element-gather of (U, I, W) positions        (the shipping A-gather)
  b) window-gather: vmap(dynamic_slice) (U, W, I) (the candidate)
  c) scatter-add of (U, I, J) random positions    (the shipping update)
  d) the level einsum                             (the actual flops)

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/level_step_probe.py
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

SHAPES = {  # (U, I, J, W) from the n=35937 ND schedule
    "mid_leaf": (192, 245, 66, 48),
    "separator": (34, 566, 27, 29),
}
NNZ_L = 9_769_474


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i1", type=int, default=3)
    ap.add_argument("--i2", type=int, default=23)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop
    from basic_sparse_matrix_tpu.utils.config import matmul_precision

    prec = matmul_precision()
    results = {"backend": jax.default_backend()}

    for name, (U, I, J, W) in SHAPES.items():
        key = jax.random.PRNGKey(hash(name) % (1 << 31))
        ks = jax.random.split(key, 6)
        lvals = jax.random.normal(ks[0], (NNZ_L + 1,), jnp.float32)
        ga = jax.random.randint(ks[1], (U, I, W), 0, NNZ_L, jnp.int32)
        sc = jax.random.randint(ks[2], (U, I, J), 0, NNZ_L, jnp.int32)
        starts = jax.random.randint(ks[3], (U, W), 0, NNZ_L - I, jnp.int32)
        A = jax.random.normal(ks[4], (U, I, W), jnp.float32)
        B = jax.random.normal(ks[5], (U, J, W), jnp.float32)
        rec = {}

        def elem_gather(operand, carry):
            g, = operand
            return carry + 1e-30 * carry[g].sum()

        rec["a_elem_gather_ms"] = measure_loop(
            make_loop(elem_gather), (ga,), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        def win_gather(operand, carry):
            s, = operand
            win = jax.vmap(jax.vmap(
                lambda st: jax.lax.dynamic_slice(carry, (st,), (I,))))(s)
            return carry + 1e-30 * win.sum()

        rec["b_window_gather_ms"] = measure_loop(
            make_loop(win_gather), (starts,), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        def scatter(operand, carry):
            s, u = operand
            return carry.at[s].add(-u[..., None] * 1e-30
                                   * jnp.ones((1, 1, J), jnp.float32))

        uval = jax.random.normal(ks[1], (U, I), jnp.float32)
        rec["c_scatter_ms"] = measure_loop(
            make_loop(scatter), (sc, uval), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        def ein(operand, carry):
            a, b = operand
            u = jnp.einsum("uiw,ujw->uij", a, b, precision=prec)
            return carry + u.sum() * 1e-30

        rec["d_einsum_ms"] = measure_loop(
            make_loop(ein), (A, B), lvals, i1=args.i1, i2=args.i2,
            reps=2) * 1e3

        # e) candidate: one-hot MXU panel-delta accumulation. Embed each
        # update into its TARGET PANEL's dense (rows, cols) rect via two
        # one-hot matmuls, merge updates per panel with a third (one-hot
        # segment matmul), then ONE scatter of (S, R_, Wt) rect elements
        # whose positions are affine per panel — replacing the U·I·J
        # element scatter in (c). MXU flops are nearly free here; the win
        # is scatter-issue count: S·R_·Wt vs U·I·J.
        S = max(U // 4, 1)           # updates per target panel ~4 (est.)
        Wt = max(2 * J, 32)          # target panel width >= J
        R_ = I + Wt                  # target panel rows (tail + below)
        kk = jax.random.split(ks[0], 4)
        ri = jax.random.randint(kk[0], (U, I), 0, R_, jnp.int32)
        rj = jax.random.randint(kk[1], (U, J), 0, Wt, jnp.int32)
        seg = jnp.sort(jax.random.randint(kk[2], (U,), 0, S, jnp.int32))
        scp = jax.random.randint(kk[3], (S, R_, Wt), 0, NNZ_L, jnp.int32)
        uval3 = jax.random.normal(ks[1], (U, I, J), jnp.float32)

        def _delta(u3, ri_, rj_, seg_):
            rowmap = (ri_[:, :, None]
                      == jnp.arange(R_, dtype=jnp.int32)[None, None, :]
                      ).astype(jnp.float32)                  # (U, I, R_)
            colmap = (rj_[:, :, None]
                      == jnp.arange(Wt, dtype=jnp.int32)[None, None, :]
                      ).astype(jnp.float32)                  # (U, J, Wt)
            segmap = (seg_[None, :]
                      == jnp.arange(S, dtype=jnp.int32)[:, None]
                      ).astype(jnp.float32)                  # (S, U)
            d = jnp.einsum("uij,ujw->uiw", u3, colmap, precision=prec)
            e = jnp.einsum("uir,uiw->urw", rowmap, d, precision=prec)
            return jnp.einsum("su,urw->srw", segmap, e, precision=prec)

        def delta_ein(operand, carry):
            u3, ri_, rj_, seg_ = operand
            return carry + _delta(u3, ri_, rj_, seg_).sum() * 1e-30

        rec["e1_delta_einsums_ms"] = measure_loop(
            make_loop(delta_ein), (uval3, ri, rj, seg), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        def delta_total(operand, carry):
            u3, ri_, rj_, seg_, pos = operand
            p = _delta(u3, ri_, rj_, seg_)
            return carry.at[pos].add(p * 1e-30)

        rec["e_delta_total_ms"] = measure_loop(
            make_loop(delta_total), (uval3, ri, rj, seg, scp), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        # f) window scatter-add: one lax.scatter_add whose updates are
        # whole CONTIGUOUS windows (update_window_dims) — the delta
        # rect's storage columns are contiguous runs, so if XLA lowers
        # this at ~issue-per-window the add-back drops from St·Rd·Wt
        # element issues to St·Wt window issues.
        NW = S * Wt
        wstarts = jax.random.randint(kk[3], (NW, 1), 0, NNZ_L - R_,
                                     jnp.int32)
        wupd = jax.random.normal(kk[0], (NW, R_), jnp.float32)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))

        def win_scatter(operand, carry):
            st, up = operand
            return jax.lax.scatter_add(carry, st, up * 1e-30, dn)

        rec["f_window_scatter_ms"] = measure_loop(
            make_loop(win_scatter), (wstarts, wupd), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        # f2) the same window count via a serial scan of
        # dynamic_update_slice read-modify-writes (disjoint windows).
        def scan_rmw(operand, carry):
            st, up = operand

            def body(lv, sw):
                s0, u0 = sw
                win = jax.lax.dynamic_slice(lv, (s0[0],), (R_,))
                return jax.lax.dynamic_update_slice(
                    lv, win + u0 * 1e-30, (s0[0],)), None

            out, _ = jax.lax.scan(body, carry, (st, up))
            return out

        rec["f2_scan_window_rmw_ms"] = measure_loop(
            make_loop(scan_rmw), (wstarts, wupd), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3

        # f3) the shear einsum that would feed (f): constant one-hot
        # shift tensor contracted on the MXU.
        shift = (jnp.arange(R_, dtype=jnp.int32)[None, :, None]
                 == (jnp.arange(R_, dtype=jnp.int32)[None, None, :]
                     + jnp.arange(Wt, dtype=jnp.int32)[:, None, None])
                 ).astype(jnp.float32)          # (Wt, R_, R_)

        def shear(operand, carry):
            u3, ri_, rj_, seg_ = operand
            p = _delta(u3, ri_, rj_, seg_)
            ps = jnp.einsum("wqr,srw->sqw", shift, p, precision=prec)
            return carry + ps.sum() * 1e-30

        rec["f3_delta_plus_shear_ms"] = measure_loop(
            make_loop(shear), (uval3, ri, rj, seg), lvals,
            i1=args.i1, i2=args.i2, reps=2) * 1e3
        rec = {k: float(f"{v:.4g}") for k, v in rec.items()}
        rec["elements_gather"] = U * I * W
        rec["issues_window"] = U * W
        rec["elements_scatter"] = U * I * J
        rec["elements_delta_scatter"] = S * R_ * Wt
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print(json.dumps({"metric": "level_step_components",
                      "results": results}))


if __name__ == "__main__":
    main()
