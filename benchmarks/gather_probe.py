"""Raw HBM gather microprobe: does index ORDER change XLA gather speed?

Three index patterns over a (1M, 128) f32 table, 4M gathers each:
  random   — uniform random (the hypersparse SpMM access pattern)
  sorted   — same multiset, globally ascending (row-buffer locality)
  repeat   — each of 125k random rows repeated 32x consecutively
             (the access pattern a column-bucketed SpMM would produce)

If sorted/repeat run far faster than random, a locality-bucketed layout is
worth building; if not, the gather unit is insensitive to order and the
only lever is avoiding intermediate materialisation.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop


def main():
    import jax
    import jax.numpy as jnp

    rows, n_rhs, ng = 1_000_000, 128, 4_000_000

    @jax.jit
    def make(key):
        k1, k2, k3 = jax.random.split(key, 3)
        b = jax.random.normal(k1, (rows, n_rhs), dtype=jnp.float32)
        idx_random = jax.random.randint(k2, (ng,), 0, rows, dtype=jnp.int32)
        idx_sorted = jnp.sort(idx_random)
        base = jax.random.randint(k3, (ng // 32,), 0, rows, dtype=jnp.int32)
        idx_repeat = jnp.repeat(base, 32)
        return b, idx_random, idx_sorted, idx_repeat

    b, idx_random, idx_sorted, idx_repeat = make(jax.random.PRNGKey(0))

    def step(operand, carry):
        idx = operand
        # gather + cheap fold (no scatter): every gathered row is consumed,
        # carry feedback keeps iterations serialised
        g = carry[idx]                   # (ng, n_rhs)
        upd = g.reshape(ng // rows, rows, n_rhs).sum(axis=0)
        return carry + upd * 1e-20

    results = {}
    for name, idx in (("random", idx_random), ("sorted", idx_sorted),
                      ("repeat", idx_repeat)):
        loop = make_loop(step)
        dt = measure_loop(loop, idx, b, i1=2, i2=8, reps=2)
        gbps = ng * n_rhs * 4 / dt / 1e9
        results[name] = {"seconds": float(f"{dt:.4g}"),
                         "gather_GBps": float(f"{gbps:.4g}")}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"metric": "gather_probe", "results": results}))


if __name__ == "__main__":
    main()
