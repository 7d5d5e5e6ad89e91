"""Scatter-add vs sorted segment-sum on chip, at the two shapes that
matter:

* densify (todense / masked-dense SpGEMM): 393k sorted positions into a
  1M-cell flat accumulator;
* planned-SpGEMM reduce: 2.5M dst-sorted contributions into 2.5M output
  slots.

XLA TPU scatter was measured ~6x slower than the equivalent gather
(PERF_NOTES); ``segment_sum(indices_are_sorted=True)`` may lower to a
faster one-pass reduction. This probe decides whether todense and the
spgemm numeric phase should flip formulation.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    results = {}

    # --- densify shape: 393k sorted keys -> 1e6 cells -------------------
    n, nnz = 1000, 393_000
    rng = np.random.default_rng(0)
    pos = np.sort(rng.integers(0, n * n, nnz)).astype(np.int32)
    posj = jnp.asarray(pos)

    def scat_step(operand, carry):
        flat = jnp.zeros(n * n, jnp.float32).at[operand].add(carry)
        return flat[:nnz]

    def seg_step(operand, carry):
        flat = jax.ops.segment_sum(carry, operand, num_segments=n * n,
                                   indices_are_sorted=True)
        return flat[:nnz]

    vals = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    for name, step in (("densify_scatter", scat_step),
                       ("densify_segsum", seg_step)):
        dt = measure_loop(make_loop(step), posj, vals, i1=10, i2=110, reps=2)
        results[name + "_ms"] = float(f"{dt*1e3:.4g}")
        print(json.dumps({name: dt}), flush=True)

    # --- spgemm reduce shape: 2.5M sorted dst -> 2.5M slots -------------
    m = 2_500_000
    dst = np.sort(rng.integers(0, m, m)).astype(np.int32)
    dstj = jnp.asarray(dst)
    mvals = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def scat2(operand, carry):
        return jnp.zeros(m, jnp.float32).at[operand].add(carry)

    def seg2(operand, carry):
        return jax.ops.segment_sum(carry, operand, num_segments=m,
                                   indices_are_sorted=True)

    for name, step in (("reduce_scatter", scat2), ("reduce_segsum", seg2)):
        dt = measure_loop(make_loop(step), dstj, mvals, i1=5, i2=45, reps=2)
        results[name + "_ms"] = float(f"{dt*1e3:.4g}")
        print(json.dumps({name: dt}), flush=True)

    print(json.dumps({"metric": "scatter_vs_segsum", "results": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
