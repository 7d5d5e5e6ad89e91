"""Full benchmark sweep replaying the reference's three criterion workload
recipes (SURVEY.md §6), emitting JSON lines per point.

Reference recipes (shape parameters; the Rust StdRng stream itself is not
reproducible cross-language, so we regenerate at the same seed/shape per
BASELINE.md's replication guidance):

* ``sd_mul`` — 1000×1000 CSR × dense RHS, inserted elements ∈ {100k…900k}
  (``/root/reference/benches/sparse_dense_mul.rs:6-35``)
* ``ss_add`` — sparse+sparse add, same generator
  (``sparse_dense_mul.rs:37-67``)
* ``ss_mul`` — SpGEMM, nnz ∈ {50…500k} (``sparse_sparse_mul.rs:6-37``)

All workloads are generated on device and timed with on-device iteration
loops (dispatch RPC latency on tunneled chips would otherwise dominate).

Usage: ``python benchmarks/run_all.py [--inner 50] [--out results.jsonl]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 1000
SEED = 1000


def _timeit(run_many, arg, reps, inner):
    import jax

    jax.block_until_ready(run_many(arg))  # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run_many(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * inner)


def _make_sparse(key, inserts, n=N):
    import jax
    import jax.numpy as jnp

    krow, kcol, kval = jax.random.split(key, 3)
    rows = jax.random.randint(krow, (inserts,), 0, n, dtype=jnp.int32)
    cols = jax.random.randint(kcol, (inserts,), 0, n, dtype=jnp.int32)
    vals = jax.random.randint(kval, (inserts,), 0, 255,
                              dtype=jnp.int32).astype(jnp.float32)
    order = jnp.argsort(rows * n + cols, stable=True)
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = jnp.zeros(n, dtype=jnp.int32).at[rows].add(1)
    indptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    return indptr, rows, cols, vals


def bench_sd_mul(inserts, inner, reps, n_rhs=128):
    """SpMM at one sweep point: elements/s (criterion Throughput parity)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(SEED)
    indptr, rows, cols, vals = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(key, inserts))
    b = jax.random.randint(jax.random.PRNGKey(SEED + 1), (N, n_rhs), 0, 255,
                           dtype=jnp.int32).astype(jnp.float32)

    def spmm_once(bb):
        row_ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32),
                             jnp.diff(indptr), total_repeat_length=inserts)
        gathered = bb[cols] * vals[:, None]
        return jax.ops.segment_sum(gathered, row_ids, num_segments=N,
                                   indices_are_sorted=True)

    @jax.jit
    def run_many(bb):
        def step(_, carry):
            return spmm_once(bb + carry[:1, :1] * 1e-30)
        return jax.lax.fori_loop(0, inner, step, jnp.zeros((N, n_rhs),
                                                           jnp.float32))

    dt = _timeit(run_many, b, reps, inner)
    return dt, {"elements_per_s": inserts / dt,
                "gflops": 2 * inserts * n_rhs / dt / 1e9}


def bench_ss_add(inserts, inner, reps):
    """Sparse+sparse merge at one sweep point (the jit merge used by
    elementwise.add: concat + sort + run-merge)."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(jax.random.PRNGKey(SEED))
    _, r1, c1, v1 = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(k1, inserts))
    _, r2, c2, v2 = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(k2, inserts))

    def add_once(vals1):
        rows = jnp.concatenate([r1, r2])
        cols = jnp.concatenate([c1, c2])
        vals = jnp.concatenate([vals1, v2])
        key = rows.astype(jnp.int64) * N + cols.astype(jnp.int64)
        order = jnp.argsort(key, stable=True)
        key, vals = key[order], vals[order]
        first = jnp.concatenate([jnp.ones(1, bool), key[1:] != key[:-1]])
        seg = jnp.cumsum(first) - 1
        summed = jax.ops.segment_sum(vals, seg, num_segments=vals.shape[0],
                                     indices_are_sorted=True)
        return jnp.where(first, summed[seg], 0.0)

    @jax.jit
    def run_many(v):
        def step(_, carry):
            return add_once(v + carry[: v.shape[0]] * 1e-30)
        return jax.lax.fori_loop(0, inner, step,
                                 jnp.zeros(2 * inserts, jnp.float32))

    dt = _timeit(run_many, v1, reps, inner)
    return dt, {"elements_per_s": inserts / dt}


def bench_ss_mul(nnz, inner, reps):
    """SpGEMM at one sweep point via the masked-dense path (the dispatch
    choice at 1000×1000 scale)."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(jax.random.PRNGKey(SEED))
    i1, r1, c1, v1 = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(k1, nnz))
    i2, r2, c2, v2 = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(k2, nnz))

    def spgemm_once(vals1):
        dense_b = jnp.zeros((N, N), jnp.float32).at[r2, c2].add(v2)
        row_ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32), jnp.diff(i1),
                             total_repeat_length=nnz)
        gathered = dense_b[c1] * vals1[:, None]
        return jax.ops.segment_sum(gathered, row_ids, num_segments=N,
                                   indices_are_sorted=True)

    @jax.jit
    def run_many(v):
        def step(_, carry):
            return spgemm_once(v + carry[:1, 0] * 1e-30)
        return jax.lax.fori_loop(0, inner, step,
                                 jnp.zeros((N, N), jnp.float32))

    dt = _timeit(run_many, v1, reps, inner)
    return dt, {"elements_per_s": nnz / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--groups", default="sd_mul,ss_add,ss_mul")
    args = ap.parse_args()

    import jax

    sink = open(args.out, "w") if args.out else sys.stdout
    backend = jax.default_backend()
    groups = args.groups.split(",")

    def emit(group, param, dt, extra):
        rec = {"group": group, "param": param, "seconds_per_iter": dt,
               "backend": backend, **extra}
        sink.write(json.dumps(rec) + "\n")
        sink.flush()

    if "sd_mul" in groups:
        for i in range(9):  # sparse_dense_mul.rs:8-11
            e = 10000 * (i + 1) * 10
            dt, extra = bench_sd_mul(e, args.inner, args.reps)
            emit("sd_mul", e, dt, extra)
    if "ss_add" in groups:
        for i in range(9):
            e = 10000 * (i + 1) * 10
            dt, extra = bench_ss_add(e, args.inner, args.reps)
            emit("ss_add", e, dt, extra)
    if "ss_mul" in groups:
        for i in (1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 2000, 10000):
            e = i * 50  # sparse_sparse_mul.rs:8-10
            dt, extra = bench_ss_mul(e, args.inner, args.reps)
            emit("ss_mul", e, dt, extra)
    if sink is not sys.stdout:
        sink.close()


if __name__ == "__main__":
    main()
