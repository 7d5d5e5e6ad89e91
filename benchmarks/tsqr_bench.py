"""TSQR vs XLA Householder QR on tall operands (VERDICT r4 item 7).

Reference counterpart: ``qr_decomp`` (``/root/reference/src/
sparse.rs:716-756``) — Householder deflation via repeated SpGEMMs. Our
dense routing (``models/qr.qr_decomp``) sends tall operands
(rows >= TSQR_MIN_ASPECT * cols) through the blocked TSQR tree
(``models/qr.tsqr_dense``); this bench measures both paths across aspect
ratios to place that threshold with a number instead of a guess.

Workloads: the headline tall-skinny shape 2^20 x 64 plus an aspect sweep
at n=256 (rows 1k..64k) bracketing the routing threshold. Operands are
generated ON DEVICE (values don't affect QR cost, shapes do); timing is
the fetch-fenced two-point loop; only scalars leave the chip.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.models.qr import qr_dense, tsqr_dense
    from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop

    shapes = [
        (1 << 20, 64),     # headline tall-skinny
        (1 << 16, 256),    # aspect 256
        (1 << 14, 256),    # aspect 64
        (1 << 12, 256),    # aspect 16
        (1 << 11, 256),    # aspect 8
        (1 << 10, 256),    # aspect 4 (current routing threshold)
    ]

    def qr_step(operand, carry):
        q, _ = qr_dense(carry)
        return q

    def tsqr_step(operand, carry):
        q, _ = tsqr_dense(carry)
        return q

    results = []
    for m, n in shapes:
        key = jax.random.PRNGKey(m ^ n)
        a = jax.random.normal(key, (m, n), dtype=jnp.float32)
        a.block_until_ready()
        iters = (2, 8) if m >= (1 << 18) else (2, 14)
        t_qr = measure_loop(make_loop(qr_step), (), a,
                            i1=iters[0], i2=iters[1], reps=2)
        t_ts = measure_loop(make_loop(tsqr_step), (), a,
                            i1=iters[0], i2=iters[1], reps=2)
        row = {
            "m": m, "n": n, "aspect": m // n,
            "qr_s": float(f"{t_qr:.4g}"),
            "tsqr_s": float(f"{t_ts:.4g}"),
            "tsqr_speedup": float(f"{t_qr / t_ts:.4g}"),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "tsqr_bench", "rows": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
