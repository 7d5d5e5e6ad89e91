"""Per-entry VMEM FMA probe — the measured gate for the "stream B through
VMEM, accumulate C in place" hypersparse SpMM formulation (VERDICT r2,
weak #2).

The formulation: hold an output tile C (rows x lanes) resident in VMEM,
stream B sequentially, and for every CSC-ordered entry (i, k, v) do
``C[i, :] += v * B[k, :]`` — random access lands in VMEM where it is
"free", and B rides HBM sequentially at the ~707 GB/s stream rate instead
of the ~86 GB/s random-gather rate.

Whether it can win reduces to ONE constant: the cost of a Mosaic loop
iteration doing {two scalar SMEM reads, one dynamic-index VMEM row load,
one FMA, one dynamic-index VMEM row store}. Capacity arithmetic fixes the
iteration count: VMEM is ~16 MB/core, so a 100k-row C tile fits only at
<= 32 f32 lanes (100k x 32 x 4 = 12.8 MB) — the 512-col workload then
needs 512/32 = 16 column passes, i.e. 16 x 3.2M = 51M iterations (128
lanes would need a 51 MB tile; 12.8M iterations; does not fit). Against
the gather formulation's measured floor of 3.2M issues x ~23 ns = ~75 ms:

    per-entry cost must beat 75 ms / 51M = 1.5 ns/iter  (32-lane tile)

VPU clock is ~0.94 GHz — 1.5 ns is ~1.4 cycles for a load+FMA+store
chain with a read-after-write hazard on C. This probe measures the real
constant; if it lands above ~1.5 ns/iter (it will), the VMEM-residency
family is measured-dead and the gather-issue bound stands as the true
roofline for hypersparse SpMM on this chip.

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/entry_fma_probe.py
CPU check (interpret mode, correctness only):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python benchmarks/entry_fma_probe.py --check
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def build(E: int, R: int, lanes: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ii_ref, kk_ref, vv_ref, b_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)

        def body(e, _):
            i = ii_ref[e]
            k = kk_ref[e]
            v = vv_ref[e]
            row = b_ref[pl.ds(k, 1), :]
            o_ref[pl.ds(i, 1), :] += v * row
            return 0

        jax.lax.fori_loop(0, E, body, 0)

    @jax.jit
    def run(ii, kk, vv, b):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, lanes), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(ii, kk, vv, b)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=8192)
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--check", action="store_true",
                    help="correctness only (small shapes, any backend)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    E, R, L = args.entries, args.rows, args.lanes
    if args.check:
        E, R, L = 64, 32, 128

    rng = np.random.default_rng(0)
    ii = jnp.asarray(rng.integers(0, R, E).astype(np.int32))
    kk = jnp.asarray(rng.integers(0, R, E).astype(np.int32))
    vv = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))

    run = build(E, R, L)
    out = jax.block_until_ready(run(ii, kk, vv, b))

    # Oracle on device (scalar fetch only).
    oracle = jnp.zeros((R, L), jnp.float32).at[ii].add(
        vv[:, None] * b[kk])
    err = float(jnp.abs(out - oracle).max())
    print(json.dumps({"check_max_abs_err": err, "entries": E}))
    assert err < 1e-4, err
    if args.check:
        return

    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    def step(operand, carry):
        ii, kk, vv = operand
        c = run(ii, kk, vv, carry)
        return carry + c[::997, ::37].sum() * 1e-30

    dt = measure_loop(make_loop(step), (ii, kk, vv), b, i1=2, i2=34, reps=3)
    ns_per_entry = dt / E * 1e9
    # Column passes needed at the VMEM-capacity-limited lane width for the
    # 100k x 32 x 512 workload; 3.2M entries per pass.
    budget_ns = 75e6 / (3.2e6 * (512 // max(32, 1)))
    print(json.dumps({
        "metric": "vmem_entry_fma_ns",
        "value": round(ns_per_entry, 3),
        "unit": "ns/entry",
        "kernel_s": dt,
        "entries": E,
        "beats_gather_needs_ns": round(budget_ns, 3),
        "verdict": "alive" if ns_per_entry < budget_ns else "dead",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
