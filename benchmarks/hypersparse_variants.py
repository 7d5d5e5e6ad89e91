"""Hypersparse SpMM formulation shootout (round-2, VERDICT item 2).

The ELL einsum path measured 0.14-0.26 of the gather roofline. Hypothesis:
``einsum('rp,rpn->rn', vals, b[cols])`` is a dot_general, and XLA cannot fuse
a gather into an MXU contraction — the (rows, width, n_rhs) gathered
intermediate materialises in HBM, tripling traffic (gather-write + re-read).
An unrolled sum over the width dimension expresses the same computation as
width separate gather+multiply+add terms — all elementwise-fuseable, so XLA
can emit one fused loop that gathers and accumulates without materialising.

Variants measured (fetch-fenced two-point timing):
  ell       — library spmm_ell (row-chunked einsum) [round-1 shipping path]
  unroll    — sum_k vals[:,k,None] * b[cols[:,k],:]
  unroll_bf16 — same with B gathered in bf16 (halves gather traffic;
                accuracy trade, informational)
  sorted    — unroll with entries sorted by column within each row
              (ascending gather addresses per slice)

Usage: python benchmarks/hypersparse_variants.py [--rows 100000]
       [--nnz-per-row 32] [--n-rhs 128]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from basic_sparse_matrix_tpu.runtime.timing import make_loop, measure_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--nnz-per-row", type=int, default=32)
    ap.add_argument("--n-rhs", type=int, default=128)
    ap.add_argument("--i1", type=int, default=5)
    ap.add_argument("--i2", type=int, default=25)
    ap.add_argument("--variants", type=str,
                    default="ell,unroll,unroll_bf16,sorted")
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rows, per, n_rhs = args.rows, args.nnz_per_row, args.n_rhs
    nnz = rows * per

    @jax.jit
    def make(key):
        kcol, kval, kb = jax.random.split(key, 3)
        cols = jax.random.randint(kcol, (rows, per), 0, rows, dtype=jnp.int32)
        vals = jax.random.normal(kval, (rows, per), dtype=jnp.float32)
        b = jax.random.normal(kb, (rows, n_rhs), dtype=jnp.float32)
        return cols, vals, b

    cols, vals, b = make(jax.random.PRNGKey(0))

    from basic_sparse_matrix_tpu.ops.ell import ELL, spmm_ell

    def step_ell(operand, carry):
        c, v = operand
        return spmm_ell(ELL(cols=c, vals=v, n_cols=rows), carry)

    def step_unroll(operand, carry):
        c, v = operand
        out = v[:, 0, None] * carry[c[:, 0], :]
        for k in range(1, per):
            out = out + v[:, k, None] * carry[c[:, k], :]
        return out

    def step_unroll_bf16(operand, carry):
        c, v = operand
        cb = carry.astype(jnp.bfloat16)
        out = (v[:, 0, None] * cb[c[:, 0], :].astype(jnp.float32))
        for k in range(1, per):
            out = out + v[:, k, None] * cb[c[:, k], :].astype(jnp.float32)
        return out

    def make_step_chunked(chunk):
        nchunks = -(-rows // chunk)

        def step(operand, carry):
            c, v = operand
            pad = nchunks * chunk - rows
            cp = jnp.pad(c, ((0, pad), (0, 0))).reshape(nchunks, chunk, per)
            vp = jnp.pad(v, ((0, pad), (0, 0))).reshape(nchunks, chunk, per)

            def one(cv):
                cc, vv = cv
                out = vv[:, 0, None] * carry[cc[:, 0], :]
                for k in range(1, per):
                    out = out + vv[:, k, None] * carry[cc[:, k], :]
                return out

            out = jax.lax.map(one, (cp, vp))
            return out.reshape(nchunks * chunk, n_rhs)[:rows]

        return step

    import numpy as np

    hbm_bw = 819e9
    bytes_per_iter = nnz * (4 + 4) + nnz * n_rhs * 4 + rows * n_rhs * 4
    t_roof = bytes_per_iter / hbm_bw

    sorted_ops = None
    results = {}
    for name in args.variants.split(","):
        if name == "ell":
            step, operand = step_ell, (cols, vals)
        elif name == "unroll":
            step, operand = step_unroll, (cols, vals)
        elif name == "unroll_bf16":
            step, operand = step_unroll_bf16, (cols, vals)
        elif name.startswith("nsplit"):
            # sequential N-column sections, each a full unrolled sum over
            # (rows, nc) — bounds temps to width × rows × nc and exploits
            # the measured higher per-byte rate of narrower gather rows.
            # Sections are chained by a scalar data dependency so XLA
            # cannot overlap their temp lifetimes.
            nc = int(name[len("nsplit"):])

            def make_nsplit(nc):
                nsec = n_rhs // nc

                def step(operand, carry):
                    cc, vv = operand
                    pieces = []
                    dep = jnp.float32(0)
                    for q in range(nsec):
                        bq = carry[:, q * nc:(q + 1) * nc] * (1 + 0 * dep)
                        out = vv[:, 0, None] * bq[cc[:, 0], :]
                        for k in range(1, per):
                            out = out + vv[:, k, None] * bq[cc[:, k], :]
                        pieces.append(out)
                        dep = out[0, 0]
                    return jnp.concatenate(pieces, axis=1)

                return step

            step, operand = make_nsplit(nc), (cols, vals)
        elif name.startswith("barrier"):
            # straight-line width terms with an optimization_barrier between
            # groups of G: within a group the gathers fuse into the FMA
            # chain (the unroll win); between groups XLA cannot hoist or
            # overlap temp lifetimes (B is threaded through the barrier, so
            # later gathers depend on it) — bounds live temps to G terms
            # without lax.scan's per-step acc read/write.
            bf16 = name.endswith("_bf16")
            g = int(name[len("barrier"):-5] if bf16 else name[len("barrier"):])

            def make_barrier(G, bf16):
                ngroups = -(-per // G)

                def step(operand, carry):
                    cc, vv = operand
                    bb = carry.astype(jnp.bfloat16) if bf16 else carry
                    out = None
                    for q in range(ngroups):
                        for k in range(q * G, min((q + 1) * G, per)):
                            term = vv[:, k, None] * bb[cc[:, k], :].astype(
                                jnp.float32)
                            out = term if out is None else out + term
                        if q + 1 < ngroups:
                            out, bb = jax.lax.optimization_barrier((out, bb))
                    return out

                return step

            step, operand = make_barrier(g, bf16), (cols, vals)
        elif name.startswith("scang"):
            # lax.scan over width-groups of G: bounds live temps to G full-
            # row gathers, pays acc read/write per step
            g = int(name[len("scang"):])

            def make_scang(G):
                ngroups = per // G

                def step(operand, carry):
                    cc, vv = operand
                    cg = cc.reshape(rows, ngroups, G).transpose(1, 0, 2)
                    vg = vv.reshape(rows, ngroups, G).transpose(1, 0, 2)

                    def body(acc, cv):
                        c1, v1 = cv
                        for k in range(G):
                            acc = acc + v1[:, k, None] * carry[c1[:, k], :]
                        return acc, None

                    acc0 = jnp.zeros((rows, n_rhs), jnp.float32)
                    acc, _ = jax.lax.scan(body, acc0, (cg, vg))
                    return acc

                return step

            step, operand = make_scang(g), (cols, vals)
        elif name.startswith("punroll"):
            # python-unrolled row chunks in ONE jit graph (no lax.map):
            # all gathers stay visible to the XLA scheduler, temps bounded
            # by the chunk size
            c = int(name[len("punroll"):]) if len(name) > 7 else args.chunk

            def make_punroll(chunk):
                def step(operand, carry):
                    cc, vv = operand
                    pieces = []
                    for r0 in range(0, rows, chunk):
                        r1 = min(r0 + chunk, rows)
                        out = (vv[r0:r1, 0, None]
                               * carry[cc[r0:r1, 0], :])
                        for k in range(1, per):
                            out = out + (vv[r0:r1, k, None]
                                         * carry[cc[r0:r1, k], :])
                        pieces.append(out)
                    return jnp.concatenate(pieces, axis=0)
                return step

            step, operand = make_punroll(c), (cols, vals)
        elif name.startswith("chunked"):
            # chunked16384 / chunked65536 ... (default --chunk)
            c = int(name[len("chunked"):]) if len(name) > 7 else args.chunk
            step, operand = make_step_chunked(c), (cols, vals)
        elif name == "sorted":
            if sorted_ops is None:
                order = jnp.argsort(cols, axis=1)
                sorted_ops = (jnp.take_along_axis(cols, order, axis=1),
                              jnp.take_along_axis(vals, order, axis=1))
            step, operand = step_unroll, sorted_ops
        else:
            raise SystemExit(f"unknown variant {name}")
        loop = make_loop(step)
        dt = measure_loop(loop, operand, b, i1=args.i1, i2=args.i2, reps=2)
        results[name] = {
            "nnz_per_s": float(f"{nnz / dt:.4g}"),
            "seconds_per_iter": float(f"{dt:.4g}"),
            "roofline_fraction": float(f"{t_roof / dt:.4g}"),
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    print(json.dumps({
        "metric": "hypersparse_variants",
        "rows": rows, "nnz": nnz, "n_rhs": n_rhs,
        "results": results,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
