"""ss_mul head-to-head: host CPU (scipy C++ SpGEMM) vs TPU paths.

Two regimes:
* reference scale (1000×1000, 500k inserts — the ss_mul sweep top,
  ``/root/reference/benches/sparse_sparse_mul.rs:6-37``): shipping
  dispatch is masked-dense (densify B once like reference construction,
  MXU matmul per iteration).
* large-n (100k×100k, 500k nnz each): densifying is wrong; shipping path
  is the planned exact-pattern Gustavson numeric phase (plan outside the
  loop, gather-multiply + sorted segment-sum per iteration).

CPU baselines are scipy's csr_matmat (single-core C++), best-of-N wall
clock. TPU timings use the fetch-fenced two-point method.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _gen(seed, n, nnz):
    r = np.random.default_rng(seed)
    return (r.integers(0, n, nnz), r.integers(0, n, nnz),
            (r.integers(0, 2**32, nnz) % 255 + 1).astype(np.float32))


def _loadavg():
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # pragma: no cover
        return None


def _timed_matmat(A, B, reps):
    """Pinned baseline protocol (VERDICT r4): exactly ``reps`` wall-clock
    runs, report best AND median, record 1-min loadavg before/after so
    1.x× conclusions can be checked against host-load noise (measured
    spread 225–545 ms across one r4 day)."""
    load0 = _loadavg()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = A @ B
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "best": times[0],
        "median": times[len(times) // 2],
        "reps": reps,
        "loadavg": [load0, _loadavg()],
    }


def cpu_baseline(n, nnz, seeds, reps=9):
    import scipy.sparse as sp

    mats = []
    for s in seeds:
        ra, ca, va = _gen(s, n, nnz)
        m = sp.coo_matrix((va, (ra, ca)), shape=(n, n)).tocsr()
        m.sum_duplicates()
        mats.append(m)
    A, B = mats
    stats = _timed_matmat(A, B, reps)
    return stats, int(A.nnz), int(B.nnz), int((A @ B).nnz)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=500_000)
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    results = {}
    s_ref, nnz_a, nnz_b, nnz_c = cpu_baseline(1000, args.nnz, (3000, 4000))
    t_ref = s_ref["best"]
    results["cpu_scipy_1000_s"] = float(f"{t_ref:.4g}")
    results["cpu_scipy_1000_stats"] = {
        k: (float(f"{v:.4g}") if isinstance(v, float) else v)
        for k, v in s_ref.items()}
    results["ref_nnz"] = [nnz_a, nnz_b, nnz_c]
    s_big, bnnz_a, bnnz_b, bnnz_c = cpu_baseline(100_000, args.nnz,
                                                 (5000, 6000))
    t_big = s_big["best"]
    results["cpu_scipy_100k_s"] = float(f"{t_big:.4g}")
    results["cpu_scipy_100k_stats"] = {
        k: (float(f"{v:.4g}") if isinstance(v, float) else v)
        for k, v in s_big.items()}
    results["big_nnz"] = [bnnz_a, bnnz_b, bnnz_c]
    print(json.dumps({"baseline": results}), flush=True)
    if args.skip_tpu:
        return

    import importlib

    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu import CSR
    from basic_sparse_matrix_tpu.ops.spmm import spmm
    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    _sg = importlib.import_module("basic_sparse_matrix_tpu.ops.spgemm")

    def gen_csr(seed, n):
        ra, ca, va = _gen(seed, n, args.nnz)
        return CSR.from_coo_arrays((n, n), ra, ca, va)

    # Reference scale: masked-dense (B densified outside the loop).
    ga, gb = gen_csr(3000, 1000), gen_csr(4000, 1000)
    gb_dense = jax.block_until_ready(gb.todense())

    def dense_step(operand, carry):
        return spmm(operand[0], carry)

    mdt = measure_loop(make_loop(dense_step), (ga,), gb_dense,
                       i1=20, i2=220, reps=2)
    results["tpu_masked_dense_s"] = float(f"{mdt:.4g}")
    print(json.dumps({"masked_dense": mdt}), flush=True)

    # Large-n: planned Gustavson numeric phase.
    pa, pb = gen_csr(5000, 100_000), gen_csr(6000, 100_000)
    plan = _sg._SpgemmPlan(pa, pb)
    results["plan_expansion"] = plan.expansion
    results["plan_nnz_c"] = plan.nnz_c

    def planned_step(operand, carry):
        out = _sg._spgemm_planned_vals(
            operand[0].values, carry, (plan.dst, plan.src_a, plan.src_b),
            plan.nnz_c)
        return out[: pb.stored]

    pdt = measure_loop(make_loop(planned_step), (pa,), pb.values,
                       i1=5, i2=45, reps=2)
    results["tpu_planned_100k_s"] = float(f"{pdt:.4g}")
    results["tpu_planned_vs_scipy"] = float(f"{t_big / pdt:.4g}")
    results["tpu_dense_vs_scipy"] = float(f"{t_ref / mdt:.4g}")
    results["short_row_coalescible"] = plan.coal is not None  # expect False
    print(json.dumps({"planned_100k": pdt}), flush=True)

    # Large-n LONG-ROW regime (runs >= w): the issue-coalesced numeric maps
    # apply. B has exactly 64 entries per row; A is 200k random inserts →
    # expansion ~12.6M. Head-to-head on the same plan: two scalar gathers
    # (planned) vs 4-row-gather + one-hot + one permutation (chunked).
    n_lr = 100_000
    rng = np.random.default_rng(7000)
    ra = rng.integers(0, n_lr, 200_000)
    ca = rng.integers(0, n_lr, 200_000)
    va = (rng.integers(0, 2**32, 200_000) % 255 + 1).astype(np.float32)
    rb = np.repeat(np.arange(n_lr), 64)
    cb = rng.integers(0, n_lr, 64 * n_lr)
    vb = (rng.integers(0, 2**32, 64 * n_lr) % 255 + 1).astype(np.float32)
    la = CSR.from_coo_arrays((n_lr, n_lr), ra, ca, va)
    lb = CSR.from_coo_arrays((n_lr, n_lr), rb, cb, vb)

    import scipy.sparse as sp

    A_ = sp.coo_matrix((va, (ra, ca)), shape=(n_lr, n_lr)).tocsr()
    B_ = sp.coo_matrix((vb, (rb, cb)), shape=(n_lr, n_lr)).tocsr()
    lr_stats = _timed_matmat(A_, B_, reps=9)
    best = lr_stats["best"]
    results["cpu_scipy_longrow_s"] = float(f"{best:.4g}")
    results["cpu_scipy_longrow_stats"] = {
        k: (float(f"{v:.4g}") if isinstance(v, float) else v)
        for k, v in lr_stats.items()}

    lplan = _sg._SpgemmPlan(la, lb)
    results["longrow_expansion"] = lplan.expansion
    results["longrow_coalescible"] = lplan.coal is not None
    print(json.dumps({"longrow_plan": results["longrow_expansion"],
                      "coalescible": results["longrow_coalescible"]}),
          flush=True)

    def lp_step(operand, carry):
        out = _sg._spgemm_planned_vals(
            operand[0].values, carry,
            (lplan.dst, lplan.src_a, lplan.src_b), lplan.nnz_c)
        return out[: lb.stored]

    lpdt = measure_loop(make_loop(lp_step), (la,), lb.values, i1=3, i2=23,
                        reps=2)
    results["tpu_longrow_planned_s"] = float(f"{lpdt:.4g}")
    print(json.dumps({"longrow_planned": lpdt}), flush=True)

    if lplan.coal is not None:
        coal = lplan.coal
        maps = (coal["c1"], coal["c2"], coal["e1"], coal["e2"],
                coal["boundary"], coal["local"], coal["perm"])

        def lc_step(operand, carry):
            out = _sg._spgemm_coalesced_vals(
                operand[0].values, carry, maps, lplan.dst, lplan.nnz_c,
                coal["w"])
            return out[: lb.stored]

        lcdt = measure_loop(make_loop(lc_step), (la,), lb.values, i1=3,
                            i2=23, reps=2)
        results["tpu_longrow_chunked_s"] = float(f"{lcdt:.4g}")
        results["longrow_chunked_vs_planned"] = float(f"{lpdt / lcdt:.4g}")
        results["longrow_chunked_vs_scipy"] = float(f"{best / lcdt:.4g}")

    # Merge-tree numeric (r4): coalesced source products + log2(k) rounds
    # of pairwise sorted-stream merges — no destination permutation, no
    # scalar gathers.
    mt = lplan.mergetree
    results["longrow_mergetree_rounds"] = (len(mt.rounds)
                                           if mt is not None else None)
    if mt is not None:
        coal = lplan.coal
        mmaps = ((coal["c1"], coal["c2"], coal["e1"], coal["e2"],
                  coal["boundary"], coal["local"]), mt.rounds)

        def lm_step(operand, carry):
            out = _sg._spgemm_mergetree_vals(
                operand[0].values, carry, mmaps, mt.sizes, lplan.nnz_c,
                mt.w)
            return out[: lb.stored]

        lmdt = measure_loop(make_loop(lm_step), (la,), lb.values, i1=3,
                            i2=23, reps=2)
        results["tpu_longrow_mergetree_s"] = float(f"{lmdt:.4g}")
        results["longrow_mergetree_vs_planned"] = float(
            f"{lpdt / lmdt:.4g}")
        results["longrow_mergetree_vs_scipy"] = float(f"{best / lmdt:.4g}")

    # Row-gather numeric (r4): padded B-ELL products via one row gather
    # per A entry + ONE destination permutation — ~E + nnz_a issues vs
    # the planned path's 2·E.
    rg = lplan.rowg
    results["longrow_rowgather_uniform"] = (rg["uniform"]
                                            if rg is not None else None)
    if rg is not None:
        rmaps = (rg["xa"], rg["ell_map"], rg["perm"], lplan.dst)

        def lr_step(operand, carry):
            out = _sg._spgemm_rowgather_vals(
                operand[0].values, carry, rmaps, lplan.nnz_c, rg["wB"],
                rg["uniform"])
            return out[: lb.stored]

        lrdt = measure_loop(make_loop(lr_step), (la,), lb.values, i1=3,
                            i2=23, reps=2)
        results["tpu_longrow_rowgather_s"] = float(f"{lrdt:.4g}")
        results["longrow_rowgather_vs_planned"] = float(
            f"{lpdt / lrdt:.4g}")
        results["longrow_rowgather_vs_scipy"] = float(f"{best / lrdt:.4g}")

    # UNIFORM-B long-row regime: same shape but B's 64 columns per row are
    # DISTINCT, so CSR dedup drops nothing and the B-ELL view is a free
    # reshape — the rowgather numeric's intended regime (~E + nnz_a scalar
    # issues; with ragged rows it degenerates to an E-sized element gather
    # and loses to planned, measured r5).
    cbu = np.sort(rng.integers(0, n_lr - 64, (n_lr, 64)), axis=1) \
        + np.arange(64)[None, :]
    vbu = (rng.integers(0, 2**32, 64 * n_lr) % 255 + 1).astype(np.float32)
    lbu = CSR.from_coo_arrays((n_lr, n_lr), rb, cbu.ravel(), vbu)
    Bu_ = sp.coo_matrix((vbu, (rb, cbu.ravel())),
                        shape=(n_lr, n_lr)).tocsr()
    u_stats = _timed_matmat(A_, Bu_, reps=9)
    results["cpu_scipy_uniform_s"] = float(f"{u_stats['best']:.4g}")
    results["cpu_scipy_uniform_stats"] = {
        k: (float(f"{v:.4g}") if isinstance(v, float) else v)
        for k, v in u_stats.items()}
    uplan = _sg._SpgemmPlan(la, lbu)
    results["uniform_expansion"] = uplan.expansion
    rgu = uplan.rowg
    results["uniform_rowgather_uniform"] = (rgu["uniform"]
                                            if rgu is not None else None)

    def up_step(operand, carry):
        out = _sg._spgemm_planned_vals(
            operand[0].values, carry,
            (uplan.dst, uplan.src_a, uplan.src_b), uplan.nnz_c)
        return out[: lbu.stored]

    updt = measure_loop(make_loop(up_step), (la,), lbu.values, i1=3,
                        i2=23, reps=2)
    results["tpu_uniform_planned_s"] = float(f"{updt:.4g}")
    if rgu is not None:
        urmaps = (rgu["xa"], rgu["ell_map"], rgu["perm"], uplan.dst)

        def ur_step(operand, carry):
            out = _sg._spgemm_rowgather_vals(
                operand[0].values, carry, urmaps, uplan.nnz_c, rgu["wB"],
                rgu["uniform"])
            return out[: lbu.stored]

        urdt = measure_loop(make_loop(ur_step), (la,), lbu.values, i1=3,
                            i2=23, reps=2)
        results["tpu_uniform_rowgather_s"] = float(f"{urdt:.4g}")
        results["uniform_rowgather_vs_planned"] = float(
            f"{updt / urdt:.4g}")
        results["uniform_rowgather_vs_scipy"] = float(
            f"{u_stats['best'] / urdt:.4g}")
    print(json.dumps({
        "metric": "ss_mul_head_to_head",
        "results": results,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
