"""Pallas BSR SpMM kernel tests (interpret mode on the CPU backend; the
same kernel compiles for TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.ops.pallas.spmm_kernel import (
    BM,
    BK,
    BSR,
    bsr_profitable,
    csr_to_bsr,
    spmm_bsr,
    spmm_bsr_from_csr,
)


def _case(rng, rows, cols, density, n_rhs):
    d = ((rng.random((rows, cols)) < density)
         * rng.standard_normal((rows, cols))).astype(np.float32)
    b = rng.standard_normal((cols, n_rhs)).astype(np.float32)
    return d, b


@pytest.mark.parametrize(
    "rows,cols,density,n_rhs",
    [
        (128, 256, 0.05, 128),   # tile-aligned
        (100, 200, 0.1, 64),     # unaligned everything
        (8, 128, 1.0, 128),      # single dense block
        (1000, 1000, 0.01, 10),  # reference bench shape
        (64, 64, 0.0, 32),       # empty matrix
    ],
)
def test_bsr_kernel_matches_oracle(rows, cols, density, n_rhs):
    rng = np.random.default_rng(42)
    d, b = _case(rng, rows, cols, density, n_rhs)
    a = CSR.from_dense(d)
    bsr = csr_to_bsr(a)
    out = np.asarray(spmm_bsr(bsr, jnp.asarray(b)))
    assert out.shape == (rows, n_rhs)
    assert np.allclose(out, d @ b, rtol=1e-4, atol=1e-4)


def test_bsr_structure():
    # block decomposition bookkeeping
    d = np.zeros((16, 256), dtype=np.float32)
    d[0, 0] = 1.0       # block (0, 0)
    d[9, 130] = 2.0     # block (1, 1)
    d[15, 255] = 3.0    # block (1, 1)
    bsr = csr_to_bsr(CSR.from_dense(d))
    # 2 data blocks + 1 seeded zero block at (1, 0) so every block-row's
    # output tile gets written
    assert bsr.nblocks == 3
    rows = np.asarray(bsr.block_rows).tolist()
    cols = np.asarray(bsr.block_cols).tolist()
    assert rows == [0, 1, 1] and cols == [0, 0, 1]
    blocks = np.asarray(bsr.blocks)
    assert blocks[0, 0, 0] == 1.0
    assert np.all(blocks[1] == 0)
    assert blocks[2, 9 % BM, 130 % BK] == 2.0
    assert blocks[2, 15 % BM, 255 % BK] == 3.0


def test_memoised_csr_entrypoint():
    rng = np.random.default_rng(1)
    d, b = _case(rng, 64, 128, 0.2, 128)
    a = CSR.from_dense(d)
    out1 = np.asarray(spmm_bsr_from_csr(a, jnp.asarray(b)))
    assert hasattr(a, "_bsr_cache")
    out2 = np.asarray(spmm_bsr_from_csr(a, jnp.asarray(b)))
    assert np.allclose(out1, out2)
    assert np.allclose(out1, d @ b, rtol=1e-4, atol=1e-4)


def test_profitability_heuristic():
    rng = np.random.default_rng(2)
    dense_d, _ = _case(rng, 64, 128, 0.9, 128)
    a = CSR.from_dense(dense_d)
    # on CPU backends the kernel runs interpreted → never "profitable"
    assert bsr_profitable(a, 128) == (jax.default_backend() == "tpu")


def test_stream_kernel_matches_dense_oracle():
    """VMEM-streaming SpMM (interpret mode on CPU): cell binning, sentinel
    padding, kt-sweep accumulation, and loop unrolling are all exact."""
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops.pallas.stream_kernel import (
        build_stream_plan,
        spmm_stream,
    )

    rng = np.random.default_rng(7)
    rows, cols_n, nnz, N = 200, 300, 1500, 24
    ri = rng.integers(0, rows, nnz)
    ci = rng.integers(0, cols_n, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    v[::17] = 0.0  # explicit zeros must be dropped like ELL padding
    b = rng.standard_normal((cols_n, N)).astype(np.float32)
    plan = build_stream_plan(ri, ci, v, rows, cols_n, tile_m=64, tile_k=32)
    dense = np.zeros((rows, cols_n), np.float32)
    np.add.at(dense, (ri, ci), v)
    ref = dense @ b
    for unroll in (1, 2, 4, 8, 16):
        for layout in ("row", "vreg"):
            out = np.asarray(spmm_stream(plan, jnp.asarray(b),
                                         unroll=unroll, layout=layout))
            assert np.abs(out - ref).max() < 1e-4, (unroll, layout)


def test_stream_plan_from_ell_memoised():
    from basic_sparse_matrix_tpu.ops.ell import csr_to_ell
    from basic_sparse_matrix_tpu.ops.pallas.stream_kernel import (
        stream_plan_from_ell,
    )

    rng = np.random.default_rng(3)
    d = ((rng.random((100, 100)) < 0.05)
         * rng.standard_normal((100, 100))).astype(np.float32)
    ell = csr_to_ell(CSR.from_dense(d))
    p1 = stream_plan_from_ell(ell)
    p2 = stream_plan_from_ell(ell)
    assert p1 is p2
    assert p1.nnz == int((d != 0).sum())


def test_addback_resident_matches_reference():
    """VMEM-resident add-back: random columns into random storage runs
    (incl. unaligned starts, overlapping-window neighbours, dead slots)
    must equal the explicit elementwise add."""
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops.pallas.addback_resident import (
        addback_resident,
    )

    rng = np.random.default_rng(5)
    nnz, col_pad, cq = 3000, 256, 16
    lv = rng.standard_normal(nnz + col_pad).astype(np.float32)
    lv[nnz:] = 0.0
    psh = np.zeros((cq, col_pad), np.float32)
    tcpf = np.full((cq,), -1, np.int32)
    ref = lv.copy()
    for c in range(cq - 4):  # leave some dead slots
        ln = int(rng.integers(1, col_pad - 128))
        st = int(rng.integers(0, nnz - 1))
        vals = rng.standard_normal(ln).astype(np.float32)
        psh[c, :ln] = vals
        tcpf[c] = st
        ref[st:st + ln] += vals
    out = np.asarray(addback_resident(
        jnp.asarray(lv), jnp.asarray(psh), jnp.asarray(tcpf)))
    assert np.abs(out - ref[:nnz + col_pad]).max() < 1e-5


def test_shear_reshape_matches_indexing():
    from basic_sparse_matrix_tpu.ops.pallas.addback_resident import (
        shear_reshape,
    )

    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    st_, rd, wt, col_pad = 3, 40, 7, 128
    p = np.zeros((st_, rd + 10, wt), np.float32)
    p[:, :rd] = rng.standard_normal((st_, rd, wt)).astype(np.float32)
    out = np.asarray(shear_reshape(jnp.asarray(p), col_pad))
    for s in range(st_):
        for w in range(wt):
            for q in range(col_pad):
                r = q + w
                want = p[s, r, w] if r < rd + 10 else 0.0
                assert abs(out[s, w, q] - want) < 1e-6


def test_supernodal_vmem_forced_matches_dense():
    """Forced supernodal_scatter=vmem end-to-end factorization equals the
    dense Cholesky (drives addback_resident through _delta_scatter)."""
    import jax

    from basic_sparse_matrix_tpu.models.supernodal import (
        analyze_supernodal,
        assemble_factor,
        factorize_supernodal,
    )
    import dataclasses

    from basic_sparse_matrix_tpu.utils.config import get_config, set_config

    k = 10
    n = k * k
    spd = np.zeros((n, n), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            r = i * k + j
            spd[r, r] = 4.05
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < k and 0 <= jj < k:
                    spd[r, ii * k + jj] = -1.0
    a = CSR.from_dense(spd)
    sched = analyze_supernodal(a, relax=4)
    assert any(s is not None for s in sched.vmem_shape)
    old = get_config()
    set_config(dataclasses.replace(old, supernodal_scatter="vmem"))
    try:
        lv = np.asarray(jax.device_get(
            factorize_supernodal(sched, a.values)))
    finally:
        set_config(old)
    l = assemble_factor(a, lv, sched)
    ref = np.linalg.cholesky(spd.astype(np.float64))
    assert np.allclose(np.asarray(l.todense()), ref, rtol=1e-4, atol=1e-4)
