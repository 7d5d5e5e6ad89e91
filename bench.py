"""Benchmark harness — prints ONE JSON line for the driver.

Replays the reference's headline criterion workload ``sd_mul``
(``/root/reference/benches/sparse_dense_mul.rs:6-35``): a 1000×1000 sparse
matrix at the largest sweep point (900k random inserts, duplicates kept —
exactly the reference generator's semantics, which pushes random (row,col)
pairs through ``insert`` without dedup) multiplied by a dense RHS. The RHS is
widened from the reference's 10 columns to 128 (one TPU lane tile);
throughput is normalised per inserted element like criterion's
``Throughput::Elements``.

Implementation notes:
* The workload is generated **on device** (jax.random + on-device sort) and
  the result never leaves the device — this benches the chip, not the
  host↔device link (which on tunneled single-chip setups is slow and must
  not sit on the timed path).
* On TPU the sd_mul point densifies A once (outside the timed region, like
  the reference bench's construction) and runs the MXU matmul — exactly
  what ``spmm_auto`` dispatches to at 59% density. ``vs_baseline`` is the
  achieved fraction of the measured same-shape dense matmul (the fastest
  any SpMM formulation of this workload can run on this chip).
* Because the dense-dispatch number alone says nothing about the sparse
  kernels, the emitted line also carries ``sparse`` sub-metrics that
  exercise them directly (and regress if they do):
  - ``hypersparse_roofline_fraction``: the library ELL path
    (``ops.ell.spmm_ell``, width-unrolled gather+FMA) at 100k rows ×
    32 nnz/row × 512-col RHS against the gather-traffic roofline at the
    819 GB/s spec HBM bandwidth (stream triad measures ~707 GB/s on this
    chip, so 0.86 is the practical ceiling).
  - ``ss_add_elements_per_s``: the planned sparse+sparse merge
    (``ops.elementwise``) at the reference ss_add workload (2×~593k
    stored), plan built once outside the loop like reference construction.
"""

import json
import time

N = 1000
INSERTS = 900_000
N_RHS = 128
SEED = 1000

# v5e-class single-chip peaks (roofline denominator only).
HBM_BW = 819e9
MXU_F32 = 4.9e13

# Fat MXU tiles: at sd_mul's top sweep point the matrix is ~60% dense, so
# the block grid is fully occupied and per-step grid overhead (≈1 µs on
# v5e) dominates with thin tiles. 256×512 tiles cut the grid from 1000 to 8
# steps (see ops/pallas/spmm_kernel.pick_tiles).
BM, BK = 256, 512


def main():
    import sys as _sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.default_backend() == "tpu"

    _t0 = time.time()
    _t_last = [_t0]
    _ticks_on = bool(__import__("os").environ.get("BSM_BENCH_TICKS"))

    def _tick(label):
        # stderr section timing, opt-in via BSM_BENCH_TICKS=1 (the stdout
        # contract is ONE json line; keep the driver-visible stream
        # identical to prior rounds by default)
        if not _ticks_on:
            return
        now = time.time()
        print(f"[bench] {label}: +{now - _t_last[0]:.1f}s "
              f"(total {now - _t0:.1f}s)", file=_sys.stderr, flush=True)
        _t_last[0] = now

    @jax.jit
    def make_workload(key):
        krow, kcol, kval, kb = jax.random.split(key, 4)
        rows = jax.random.randint(krow, (INSERTS,), 0, N, dtype=jnp.int32)
        cols = jax.random.randint(kcol, (INSERTS,), 0, N, dtype=jnp.int32)
        vals = jax.random.randint(kval, (INSERTS,), 0, 255,
                                  dtype=jnp.int32).astype(jnp.float32)
        order = jnp.argsort(rows * N + cols, stable=True)
        rows, cols, vals = rows[order], cols[order], vals[order]
        counts = jnp.zeros(N, dtype=jnp.int32).at[rows].add(1)
        indptr = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
        )
        b = jax.random.randint(kb, (N, N_RHS), 0, 255,
                               dtype=jnp.int32).astype(jnp.float32)
        return indptr, rows, cols, vals, b

    key = jax.random.PRNGKey(SEED)
    indptr, rows, cols, vals, b = jax.block_until_ready(make_workload(key))

    n_row_blocks = -(-N // BM)
    n_col_blocks = -(-N // BK)
    nblocks = n_row_blocks * n_col_blocks

    if on_tpu:
        # sd_mul's top sweep point is ~59% dense after dedup: the TPU-correct
        # algorithm at this density is one MXU matmul against the densified
        # operand (density dispatch, ops/spmm.spmm_auto). Densify once on
        # device, outside the timed region — exactly where the reference
        # bench keeps construction (benches/sparse_dense_mul.rs:13-29 builds
        # outside b.iter). Values are ints < 255, exactly representable in
        # bf16, so DEFAULT precision (f32 accumulate) loses nothing.
        @jax.jit
        def densify(rows, cols, vals):
            return jnp.zeros((N, N), jnp.float32).at[rows, cols].add(vals)

        a_dense = jax.block_until_ready(densify(rows, cols, vals))

        # IMPORTANT: operands must be jit ARGUMENTS, not closure constants —
        # closure-captured device arrays become embedded program constants
        # with a large fixed per-execution cost on this backend.
        def run(ad, bb):
            return jnp.dot(ad, bb, preferred_element_type=jnp.float32)

        operand = a_dense
    else:
        def run(operand, bb):
            indptr_, cols_, vals_ = operand
            row_ids = jnp.repeat(
                jnp.arange(N, dtype=jnp.int32), jnp.diff(indptr_),
                total_repeat_length=INSERTS,
            )
            gathered = bb[cols_] * vals_[:, None]
            return jax.ops.segment_sum(gathered, row_ids, num_segments=N,
                                       indices_are_sorted=True)

        operand = (indptr, cols, vals)

    # Measurement method (derived empirically on this tunneled setup):
    # each program execution carries a large fixed RPC/IO cost (~tens of ms)
    # that dwarfs the kernel, so iterate ON DEVICE with serialised
    # (normalised-feedback) iterations at two different counts and take the
    # difference — the fixed cost cancels exactly.
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_many(operand, bb, inner):
        # Honest serialisation: each iteration's input is the previous
        # normalised output — full-magnitude, full-rank feedback that cannot
        # be strength-reduced, rounded away in bf16, or pipelined across
        # iterations.
        def step(_, carry):
            out = run(operand, carry)
            return out * (1.0 / jnp.maximum(jnp.max(jnp.abs(out)), 1e-30))
        return jax.lax.fori_loop(0, inner, step, bb)

    def fence(out):
        # block_until_ready proved unreliable on this backend; a value fetch
        # is the only trustworthy completion fence.
        return float(jnp.sum(out[:1, :1]))

    # Wider two-point spread + more repeats than round 1: the fixed
    # per-execution transport cost jitters by ~ms, which at an 8k-iteration
    # difference was ±5% run-to-run spread on vs_baseline (0.78-1.08 across
    # nominally identical runs). 16k iterations and min-of-6 halve it for
    # ~1 s of extra wall time.
    def measure(fn, *args, i1=1000, i2=17000, reps=6):
        fence(fn(*args, i1))  # compile both variants + warm the fetch path
        fence(fn(*args, i2))
        t = {}
        for inner in (i1, i2):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fence(fn(*args, inner))
                best = min(best, time.perf_counter() - t0)
            t[inner] = best
        return max(t[i2] - t[i1], 1e-12) / (i2 - i1)

    dt = measure(run_many, operand, b)

    # Measured speed-of-light: the same harness driving a plain dense MXU
    # matmul of identical shape — the fastest any SpMM formulation of this
    # workload can possibly run on this chip. A measured bound instead of
    # spec-sheet peaks keeps vs_baseline honest across environments.
    a_sol = jnp.ones((N, N), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def sol_many(ad, bb, inner):
        def step(_, carry):
            out = jnp.dot(ad, carry, preferred_element_type=jnp.float32)
            return out * (1.0 / jnp.maximum(jnp.max(jnp.abs(out)), 1e-30))
        return jax.lax.fori_loop(0, inner, step, bb)

    dt_sol = measure(sol_many, a_sol, b)

    elements_per_s = INSERTS / dt
    vs = dt_sol / dt  # fraction of measured dense speed-of-light

    # ---- sparse-kernel sub-metrics (library paths, regress if they do) ----
    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell
    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    hrows, hper, hrhs = 100_000, 32, 512
    hnnz = hrows * hper

    @jax.jit
    def make_hyper(key):
        kc, kv, kb = jax.random.split(key, 3)
        return (jax.random.randint(kc, (hrows, hper), 0, hrows, jnp.int32),
                jax.random.normal(kv, (hrows, hper), jnp.float32),
                jax.random.normal(kb, (hrows, hrhs), jnp.float32))

    hcols, hvals, hb = make_hyper(jax.random.PRNGKey(1))

    def hyper_step(operand, carry):
        c, v = operand
        return spmm_ell(ELL(cols=c, vals=v, n_cols=hrows), carry)

    hdt = measure_loop(make_loop(hyper_step), (hcols, hvals), hb,
                       i1=3, i2=13, reps=2)
    _tick("hypersparse_ell")
    h_bytes = hnnz * 8 + hnnz * hrhs * 4 + hrows * hrhs * 4
    h_frac = (h_bytes / HBM_BW) / hdt

    # Measured random-gather reference (VERDICT r2 item 4): the naive
    # single-gather formulation of the same access pattern the hypersparse
    # kernel is made of — one (hnnz, hrhs) row gather, reduced in place so
    # no full-size temp rides HBM (traffic ≈ the gathered bytes only). The
    # spec-sheet 819 GB/s is unreachable for issue-bound random gathers;
    # this probe is the denominator that makes the hypersparse fraction
    # interpretable on this chip. Note the ELL kernel's width-grouped
    # unroll can EXCEED this reference (measured ~1.8x): many smaller
    # in-flight gathers pipeline better than one monolithic gather, which
    # is exactly the win the barriered unroll buys.
    gidx = hcols.reshape(-1)  # (hnnz,) random rows in [0, hrows)

    def gather_step(operand, carry):
        s = carry[operand].sum(axis=1)            # fused gather+reduce
        return carry + s.sum() * 1e-30

    gdt = measure_loop(make_loop(gather_step), gidx, hb, i1=2, i2=8, reps=2)
    _tick("gather_probe")
    gather_gbps = hnnz * hrhs * 4 / gdt / 1e9
    h_frac_measured = (h_bytes / hdt) / (gather_gbps * 1e9)

    # VMEM-streaming pallas kernel — the SHIPPING dispatch for concrete
    # hypersparse operands with wide RHS (config ell_stream=on, r3): C
    # tiles resident in VMEM, B streamed sequentially, per-entry work is a
    # dynamic-index VMEM row FMA instead of a random HBM gather. Measured
    # r3 head-to-head: 26.1 ms vs 34.0 ms ELL at this shape (1.30x). Plan
    # built on host once per matrix (like reference construction).
    if on_tpu:
        import numpy as _np

        from basic_sparse_matrix_tpu.ops.pallas.stream_kernel import (
            build_stream_plan, spmm_stream)
        from basic_sparse_matrix_tpu.utils.config import get_config

        _r = _np.random.default_rng(11)
        s_ci = _r.integers(0, hrows, (hrows, hper)).astype(_np.int32)
        s_v = _r.standard_normal((hrows, hper)).astype(_np.float32)
        s_plan = build_stream_plan(
            _np.repeat(_np.arange(hrows), hper), s_ci.ravel(), s_v.ravel(),
            hrows, hrows)
        _unroll = get_config().ell_stream_unroll

        def stream_step(operand, carry):
            return spmm_stream(operand[0], carry, unroll=_unroll)[:hrows]

        stdt = measure_loop(make_loop(stream_step), (s_plan,), hb,
                            i1=2, i2=8, reps=2)
        _tick("hypersparse_stream")
        stream_frac = (h_bytes / HBM_BW) / stdt
    else:
        # json null off-chip (bare NaN is invalid JSON for strict parsers)
        stdt = None
        stream_frac = None

    from basic_sparse_matrix_tpu import CSR
    from basic_sparse_matrix_tpu.ops import elementwise as ew

    import numpy as _np

    def _gen_csr(seed, n=N, inserts=INSERTS):
        r = _np.random.default_rng(seed)
        return CSR.from_coo_arrays(
            (n, n), r.integers(0, n, inserts), r.integers(0, n, inserts),
            (r.integers(0, 2**32, inserts) % 255 + 1).astype(_np.float32))

    sa, sb = _gen_csr(1000), _gen_csr(2000)
    plan = ew._MergePlan(sa, sb)
    chunked = ew._ChunkedMergePlan(plan, sa.stored, sb.stored)

    # Shipping path (config merge_numeric=chunked): issue-coalesced row
    # gathers + one-hot select. Measured r3 on chip: 0.19 ms vs 7.84 ms
    # planned (41x) vs 9.2 ms scipy single-core merge (48x).
    def add_step(operand, carry):
        va, vb = operand[0].values, carry
        return ew._merge_chunked_vals(
            va, vb, (chunked.c_a, chunked.l_a, chunked.c_b, chunked.l_b),
            plan.n, 1, chunked.w
        )[: sb.stored]

    adt = measure_loop(make_loop(add_step), (sa,), sb.values,
                       i1=20, i2=220, reps=2)
    _tick("ss_add_chunked")

    def add_planned_step(operand, carry):
        va, vb = operand[0].values, carry
        return ew._merge_planned_vals(
            va, vb, (plan.gather_a, plan.gather_b), plan.n, 1
        )[: sb.stored]

    apdt = measure_loop(make_loop(add_planned_step), (sa,), sb.values,
                        i1=5, i2=45, reps=2)
    _tick("ss_add_planned")

    # ---- ss_mul (SpGEMM) sub-metrics (VERDICT r2 item 3) ----------------
    # Reference workload: /root/reference/benches/sparse_sparse_mul.rs:6-37
    # — 1000x1000 sparse x sparse, nnz sweep 50..500k, throughput counted
    # in inserted elements. Top sweep point (500k inserts each, ~39% dense
    # after dedup): the shipping dispatch is masked-dense (ops/spgemm.spgemm
    # routes through spmm against the densified RHS); the timed step is
    # that numeric core, with B densified outside the loop like reference
    # construction.
    SS_MUL_INSERTS = 500_000
    ga, gb_csr = _gen_csr(3000, inserts=SS_MUL_INSERTS), _gen_csr(
        4000, inserts=SS_MUL_INSERTS)
    from basic_sparse_matrix_tpu.ops.spmm import spmm as _spmm

    gb_dense = jax.block_until_ready(gb_csr.todense())

    def ss_mul_dense_step(operand, carry):
        return _spmm(operand[0], carry)

    mdt = measure_loop(make_loop(ss_mul_dense_step), (ga,), gb_dense,
                       i1=20, i2=220, reps=2)
    _tick("ss_mul_dense")

    # True-sparse planned Gustavson at a scale where densifying B is the
    # wrong choice (n=100k): numeric phase = gather-multiply-scatter on the
    # memoised exact-pattern plan (ops/spgemm.spgemm_planned).
    import importlib

    _sg = importlib.import_module("basic_sparse_matrix_tpu.ops.spgemm")

    PN, PNNZ = 100_000, 500_000
    pa, pb = _gen_csr(5000, n=PN, inserts=PNNZ), _gen_csr(
        6000, n=PN, inserts=PNNZ)
    pplan = _sg._SpgemmPlan(pa, pb)

    def ss_mul_planned_step(operand, carry):
        va = operand[0].values
        out = _sg._spgemm_planned_vals(
            va, carry, (pplan.dst, pplan.src_a, pplan.src_b), pplan.nnz_c)
        return out[: pb.stored]

    pdt = measure_loop(make_loop(ss_mul_planned_step), (pa,), pb.values,
                       i1=5, i2=45, reps=2)
    _tick("ss_mul_planned")

    # Long-row regime (VERDICT r4 item 6): B has 32 entries per row,
    # E ~ 2.5M — a scaled-down replica of the 100k^2/E=12.8M workload
    # where the SpGEMM numeric frontier lives (planned vs rowgather;
    # BENCH_RESULTS r5 settles the full-size numbers and the merge
    # floor). Scaled down because the full-size host plan build + two
    # compiles cost ~5 min of bench wall (measured r5) against the
    # <10 min contract; a regression in either numeric path still moves
    # these sub-metrics. Plans build on host outside the loop; the step
    # is transfer-free.
    _lr_rng = np.random.default_rng(7000)
    _lr_n = 40_000
    _lr_a = CSR.from_coo_arrays(
        (_lr_n, _lr_n), _lr_rng.integers(0, _lr_n, 80_000),
        _lr_rng.integers(0, _lr_n, 80_000),
        (_lr_rng.integers(0, 2**32, 80_000) % 255 + 1).astype(np.float32))
    _lr_b = CSR.from_coo_arrays(
        (_lr_n, _lr_n), np.repeat(np.arange(_lr_n), 32),
        _lr_rng.integers(0, _lr_n, 32 * _lr_n),
        (_lr_rng.integers(0, 2**32, 32 * _lr_n) % 255 + 1).astype(
            np.float32))
    _lr_plan = _sg._SpgemmPlan(_lr_a, _lr_b)

    def lr_planned_step(operand, carry):
        out = _sg._spgemm_planned_vals(
            operand[0].values, carry,
            (_lr_plan.dst, _lr_plan.src_a, _lr_plan.src_b),
            _lr_plan.nnz_c)
        return out[: _lr_b.stored]

    lrdt = measure_loop(make_loop(lr_planned_step), (_lr_a,),
                        _lr_b.values, i1=1, i2=5, reps=2)
    _tick("ss_mul_longrow_planned")
    _lr_rg = _lr_plan.rowg
    rgdt = None
    if _lr_rg is not None:
        _rg_maps = (_lr_rg["xa"], _lr_rg["ell_map"], _lr_rg["perm"],
                    _lr_plan.dst)

        def lr_rowgather_step(operand, carry):
            out = _sg._spgemm_rowgather_vals(
                operand[0].values, carry, _rg_maps, _lr_plan.nnz_c,
                _lr_rg["wB"], _lr_rg["uniform"])
            return out[: _lr_b.stored]

        rgdt = measure_loop(make_loop(lr_rowgather_step), (_lr_a,),
                            _lr_b.values, i1=1, i2=5, reps=2)
        _tick("ss_mul_rowgather")

    # ---- direct-solve sub-metrics: banded scan + BCR at the n=4096 shape -
    # The flagship solve path (BENCH_RESULTS.md r2): the RCM-ordered 64x64
    # 2D Laplacian is block-tridiagonal at nb=64, m=64. SPD blocks of that
    # exact shape are generated ON DEVICE (values don't change the timing,
    # shapes do; host-built blocks would ride the slow transport, which the
    # bench contract forbids). E is carried at length m with a zero last
    # coupling — the BCR convention; the scan backend takes E[:-1].
    from basic_sparse_matrix_tpu.models import banded as _banded
    from basic_sparse_matrix_tpu.models import bcr as _bcr
    from basic_sparse_matrix_tpu.utils.config import matmul_precision

    gm = nb4 = 64

    @jax.jit
    def make_blocks(key):
        kd, ke = jax.random.split(key)
        d = jax.random.normal(kd, (gm, nb4, nb4), jnp.float32) * 0.3
        d = d + jnp.swapaxes(d, 1, 2) + 4.0 * nb4 * jnp.eye(nb4)
        e = jax.random.normal(ke, (gm, nb4, nb4), jnp.float32) * 0.3
        return d, e.at[-1].set(0.0)

    D4, E4full = jax.block_until_ready(make_blocks(jax.random.PRNGKey(3)))
    E4 = E4full[:-1]
    prec = matmul_precision()

    def factor_step(e, d):
        L, _ = _banded.cholesky_banded_blocks(d, e)
        return jnp.matmul(L, jnp.swapaxes(L, 1, 2), precision=prec)

    fdt = measure_loop(make_loop(factor_step), E4, D4, i1=5, i2=55, reps=2)
    _tick("banded_factor")

    L4, F4 = _banded.cholesky_banded_blocks(D4, E4)
    b4 = jax.random.normal(jax.random.PRNGKey(2),
                           (gm, nb4, 8), jnp.float32)

    def solve_step(lf, carry):
        return _banded.solve_banded_blocks(lf[0], lf[1], carry)

    sdt = measure_loop(make_loop(solve_step), (L4, F4), b4,
                       i1=20, i2=220, reps=2)
    _tick("banded_solve")

    # BCR (block cyclic reduction) — the shipping banded backend
    # (config banded_solver=bcr): O(log m) batched stages, timed on the
    # refined shipping path (needs the full-length E).
    bcr_fac = _bcr.factor_bcr(D4, E4full)

    def bcr_solve_step(operand, carry):
        f, d, e = operand
        return _bcr._solve_refined(f, d, e, carry)  # shipping path (1 IR)

    bsdt = measure_loop(make_loop(bcr_solve_step), (bcr_fac, D4, E4full),
                        b4, i1=20, i2=220, reps=2)

    def bcr_total_step(de, carry):
        d, e = de
        return _bcr._solve_refined(_bcr.factor_bcr(d, e), d, e, carry)

    btdt = measure_loop(make_loop(bcr_total_step), (D4, E4full), b4,
                        i1=5, i2=55, reps=2)
    _tick("bcr")

    # ---- general-tier Cholesky sub-metric (VERDICT r3 item 5) -----------
    # Supernodal numeric phase on the 14^3 7-point Laplacian (n=2744) under
    # nested dissection — the shipping general-tier path for 3D patterns
    # whose bandwidth exceeds the banded tier (reference capability:
    # /root/reference/src/sparse.rs:682-714). The schedule rides the cheap
    # host->device upload once; the timed step is the full group sequence
    # with the factor values as the carry (the supernodal_scale.py
    # protocol). A regression in the hardest kernel now moves this JSON.
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "benchmarks"))
    from cholesky_4096 import lap3d_csr as _lap3d

    from basic_sparse_matrix_tpu.models import supernodal as _sn
    from basic_sparse_matrix_tpu.ops.reorder import (
        nd_permutation as _ndp,
        permute_symmetric as _psym,
    )
    from basic_sparse_matrix_tpu.utils.config import get_config as _getcfg

    _sn_a = _psym(_lap3d(14), _ndp(_lap3d(14)))
    _t0 = time.time()
    _sn_sched = _sn.analyze_supernodal(_sn_a, relax=32)
    sn_analyze_s = time.time() - _t0
    _cfg = _getcfg()
    _sn_win = ("auto" if _cfg.supernodal_gather == "auto"
               else _cfg.supernodal_gather == "window")
    _sn_mode = _cfg.supernodal_scatter
    _n_g = _sn_sched.n_groups
    _sn_gis = tuple(range(_n_g))
    _sn_sm = tuple(_sn._group_delta(_sn_sched, gi, _sn_mode)
                   for gi in range(_n_g))
    _sn_pad = 1 + (_sn._win_pad(_sn_sched)
                   if _sn._needs_win_pad(_sn_sched, _sn_win) else 0) \
        + _sn._pallas_pad(_sn_sched, _sn_mode)
    _sn_lv0 = _sn._init_lvals(_sn_sched, _sn_a.values, _sn_pad)

    def sn_step(operand, carry):
        return _sn._groups_chunk(operand, carry, _sn_gis, _sn_sm, _sn_win)

    sndt = measure_loop(make_loop(sn_step), _sn_sched, _sn_lv0,
                        i1=2, i2=10, reps=2)
    _tick("supernodal")

    print(json.dumps({
        "metric": "spmm_sd_mul_elements_per_s",
        "value": float(f"{elements_per_s:.4g}"),
        "unit": "elements/s",
        "vs_baseline": float(f"{vs:.4g}"),
        "sparse": {
            "hypersparse_roofline_fraction": float(f"{h_frac:.4g}"),
            "hypersparse_vs_measured_gather": float(
                f"{h_frac_measured:.4g}"),
            "gather_random_GBps": float(f"{gather_gbps:.4g}"),
            "hypersparse_nnz_per_s": float(f"{hnnz / hdt:.4g}"),
            "hypersparse_stream_s": (
                float(f"{stdt:.4g}") if stdt is not None else None),
            "hypersparse_stream_roofline_fraction": (
                float(f"{stream_frac:.4g}")
                if stream_frac is not None else None),
            "ss_add_elements_per_s": float(
                f"{(sa.stored + sb.stored) / adt:.4g}"),
            "ss_add_s": float(f"{adt:.4g}"),
            "ss_add_planned_s": float(f"{apdt:.4g}"),
            "ss_mul_dense_elements_per_s": float(
                f"{SS_MUL_INSERTS / mdt:.4g}"),
            "ss_mul_dense_s": float(f"{mdt:.4g}"),
            "ss_mul_planned_elements_per_s": float(
                f"{PNNZ / pdt:.4g}"),
            "ss_mul_planned_s": float(f"{pdt:.4g}"),
            "ss_mul_longrow_planned_s": float(f"{lrdt:.4g}"),
            "ss_mul_rowgather_s": (
                float(f"{rgdt:.4g}") if rgdt is not None else None),
        },
        "solve": {
            "banded_factor_4096_ms": float(f"{fdt * 1e3:.4g}"),
            "banded_solve_4096_ms": float(f"{sdt * 1e3:.4g}"),
            "bcr_factor_4096_ms": float(f"{(btdt - bsdt) * 1e3:.4g}"),
            "bcr_solve_4096_ms": float(f"{bsdt * 1e3:.4g}"),
            "supernodal_numeric_ms": float(f"{sndt * 1e3:.4g}"),
            "supernodal_analyze_s": float(f"{sn_analyze_s:.4g}"),
        },
    }))


if __name__ == "__main__":
    main()
