"""Dispatch-threshold autotuner.

Measures the crossover points between the SpMM execution paths (dense MXU
matmul / BSR kernel / ELL gather-reduce / CSR gather-segment) on the live
chip and emits tuned `Config` overrides as a JSON file plus `BSM_*` env-var
lines. Round-1 defaults in ``utils/config.py`` came from manual runs of this
procedure; re-run on new hardware.

Usage: python benchmarks/autotune.py [--n 4096] [--n-rhs 128]
       [--out tuned.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

DENSITIES = (0.001, 0.005, 0.02, 0.05, 0.2)


def measure_paths(n: int, n_rhs: int, density: float, i1: int, i2: int):
    import jax
    import jax.numpy as jnp

    nnz = max(int(n * n * density), n)
    per = max(nnz // n, 1)
    key = jax.random.PRNGKey(0)
    kcol, kval, kb = jax.random.split(key, 3)
    cols = jax.random.randint(kcol, (n, per), 0, n, dtype=jnp.int32)
    vals = jax.random.normal(kval, (n, per), dtype=jnp.float32)
    b = jax.random.normal(kb, (n, n_rhs), dtype=jnp.float32)

    results = {}

    # dense path
    @jax.jit
    def densify(cols, vals):
        out = jnp.zeros((n, n), jnp.float32)
        rows = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], cols.shape)
        return out.at[rows, cols].add(vals)

    a_dense = jax.block_until_ready(densify(cols, vals))

    def step_dense(ad, carry):
        return jnp.dot(ad, carry, preferred_element_type=jnp.float32)

    results["dense"] = measure_loop(make_loop(step_dense), a_dense, b,
                                    i1=i1, i2=i2)

    # ELL path (library dispatch: width-unrolled gather+FMA when it fits)
    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell

    def step_ell(op, carry):
        c, v = op
        return spmm_ell(ELL(cols=c, vals=v, n_cols=n), carry)

    results["ell"] = measure_loop(make_loop(step_ell), (cols, vals), b,
                                  i1=i1, i2=i2)

    # CSR gather/segment path
    flat_cols = cols.reshape(-1)
    flat_vals = vals.reshape(-1)
    row_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), per,
                         total_repeat_length=n * per)

    def step_csr(op, carry):
        fc, fv, rid = op
        g = carry[fc] * fv[:, None]
        return jax.ops.segment_sum(g, rid, num_segments=n,
                                   indices_are_sorted=True)

    results["csr"] = measure_loop(make_loop(step_csr),
                                  (flat_cols, flat_vals, row_ids), b,
                                  i1=i1, i2=i2)
    return results


def measure_overhead_crossover(n: int, n_rhs: int, per_true: int,
                               i1: int, i2: int):
    """ELL-vs-CSR crossover in PADDING OVERHEAD: rows hold ``per_true``
    entries on average but the ELL width is ``per_true * overhead`` (the
    rest padding) — exactly what ``ell_max_overhead`` gates."""
    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell

    out = {}
    for overhead in (1.5, 2.0, 3.0, 4.0, 6.0):
        width = int(per_true * overhead)
        key = jax.random.PRNGKey(1)
        kc, kv, kb, km = jax.random.split(key, 4)
        cols = jax.random.randint(kc, (n, width), 0, n, dtype=jnp.int32)
        keep = (jax.random.uniform(km, (n, width))
                < per_true / width)
        vals = jnp.where(
            keep, jax.random.normal(kv, (n, width), jnp.float32), 0.0)
        cols = jnp.where(keep, cols, 0)
        b = jax.random.normal(kb, (n, n_rhs), jnp.float32)

        def step_ell(op, carry):
            c, v = op
            return spmm_ell(ELL(cols=c, vals=v, n_cols=n), carry)

        t_ell = measure_loop(make_loop(step_ell), (cols, vals), b,
                             i1=i1, i2=i2)

        # CSR path at TRUE nnz (no padding): same entries, compacted
        import numpy as np

        ck, vk = np.asarray(cols), np.asarray(vals)
        mask = np.asarray(keep)
        rows_f = np.repeat(np.arange(n), mask.sum(axis=1))
        flat_cols = jnp.asarray(ck[mask])
        flat_vals = jnp.asarray(vk[mask])
        rid = jnp.asarray(rows_f.astype(np.int32))

        def step_csr(op, carry):
            fc, fv, r = op
            g = carry[fc] * fv[:, None]
            return jax.ops.segment_sum(g, r, num_segments=n,
                                       indices_are_sorted=True)

        t_csr = measure_loop(make_loop(step_csr),
                             (flat_cols, flat_vals, rid), b, i1=i1, i2=i2)
        out[overhead] = {"ell": t_ell, "csr": t_csr,
                         "best": "ell" if t_ell < t_csr else "csr"}
        print(json.dumps({"overhead": overhead,
                          "ell": f"{t_ell:.3e}", "csr": f"{t_csr:.3e}",
                          "best": out[overhead]["best"]}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--n-rhs", type=int, default=128)
    ap.add_argument("--i1", type=int, default=20)
    ap.add_argument("--i2", type=int, default=120)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    table = {}
    for d in DENSITIES:
        r = measure_paths(args.n, args.n_rhs, d, args.i1, args.i2)
        best = min(r, key=r.get)
        table[d] = {"seconds": r, "best": best}
        print(json.dumps({"density": d, **{k: f"{v:.3e}" for k, v in
                                           r.items()}, "best": best}),
              flush=True)

    # dense wins below this measured crossover → that's the threshold
    crossover = None
    for d in sorted(table):
        if table[d]["best"] == "dense":
            crossover = d
            break

    ocross = measure_overhead_crossover(args.n, args.n_rhs, 16,
                                        args.i1, args.i2)
    ell_max = max([o for o, r in ocross.items() if r["best"] == "ell"],
                  default=2.0)

    tuned = {
        "dense_dispatch_density": crossover if crossover is not None
        else 0.05,
        "ell_max_overhead": ell_max,
        "backend": jax.default_backend(),
        "n": args.n,
        "n_rhs": args.n_rhs,
    }
    out = json.dumps(tuned)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
        print(f"# export BSM_DENSE_DISPATCH_DENSITY="
              f"{tuned['dense_dispatch_density']}")


if __name__ == "__main__":
    main()
