"""ELL format tests."""

import jax.numpy as jnp
import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.ops.ell import (
    csr_to_ell,
    ell_overhead,
    spmm_ell,
    spmv_ell,
)
from basic_sparse_matrix_tpu.ops.spmm import spmm_auto


def _case(seed, rows, cols, density):
    rng = np.random.default_rng(seed)
    d = ((rng.random((rows, cols)) < density)
         * rng.standard_normal((rows, cols))).astype(np.float32)
    return d


def test_ell_roundtrip_structure():
    d = np.asarray([
        [1.0, 0, 2, 0],
        [0, 0, 0, 0],
        [3, 4, 5, 0],
    ], dtype=np.float32)
    ell = csr_to_ell(CSR.from_dense(d))
    assert ell.width == 3
    cols = np.asarray(ell.cols)
    vals = np.asarray(ell.vals)
    assert vals[0].tolist() == [1.0, 2.0, 0.0]
    assert cols[0].tolist() == [0, 2, 0]
    assert vals[1].tolist() == [0.0, 0.0, 0.0]
    assert vals[2].tolist() == [3.0, 4.0, 5.0]


def test_spmm_ell_matches_oracle():
    for rows, cols, dens in [(50, 70, 0.1), (33, 20, 0.3), (64, 64, 0.0)]:
        d = _case(1, rows, cols, dens)
        b = np.random.default_rng(2).standard_normal(
            (cols, 9)).astype(np.float32)
        out = np.asarray(spmm_ell(csr_to_ell(CSR.from_dense(d)),
                                  jnp.asarray(b)))
        assert np.allclose(out, d @ b, rtol=1e-4, atol=1e-5)


def test_spmv_ell_matches_oracle():
    d = _case(3, 40, 30, 0.2)
    x = np.random.default_rng(4).standard_normal(30).astype(np.float32)
    out = np.asarray(spmv_ell(csr_to_ell(CSR.from_dense(d)),
                              jnp.asarray(x)))
    assert np.allclose(out, d @ x, rtol=1e-4, atol=1e-5)


def test_overhead_measure():
    # one long row among short ones → high overhead
    d = np.zeros((10, 100), dtype=np.float32)
    d[0, :50] = 1.0
    d[1:, 0] = 1.0
    a = CSR.from_dense(d)
    assert ell_overhead(a) > 5

    # uniform rows → overhead 1
    d = np.ones((8, 16), dtype=np.float32)
    assert ell_overhead(CSR.from_dense(d)) == 1.0


def test_auto_dispatch_correct_every_path():
    rng = np.random.default_rng(5)
    for dens in (0.001, 0.02, 0.5):
        d = ((rng.random((256, 256)) < dens)
             * rng.standard_normal((256, 256))).astype(np.float32)
        b = rng.standard_normal((256, 8)).astype(np.float32)
        out = np.asarray(spmm_auto(CSR.from_dense(d), jnp.asarray(b)))
        assert np.allclose(out, d @ b, rtol=1e-4, atol=1e-4), dens


def test_spmm_ell_unrolled_matches_chunked():
    """The unrolled and chunked formulations must agree; exercise both by
    width (UNROLL_MAX_WIDTH boundary)."""
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops import ell as e

    rng = np.random.default_rng(5)
    for width in (4, e.UNROLL_MAX_WIDTH + 1):
        rows, n_rhs = 64, 16
        cols = rng.integers(0, rows, (rows, width)).astype(np.int32)
        vals = rng.standard_normal((rows, width)).astype(np.float32)
        b = rng.standard_normal((rows, n_rhs)).astype(np.float32)
        ellm = e.ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                     n_cols=rows)
        out = np.asarray(e.spmm_ell(ellm, jnp.asarray(b)))
        dense = np.zeros((rows, rows), np.float32)
        for r in range(rows):
            for k in range(width):
                dense[r, cols[r, k]] += vals[r, k]
        assert np.allclose(out, dense @ b, rtol=1e-4, atol=1e-4)
        # spmv too
        x = rng.standard_normal(rows).astype(np.float32)
        outv = np.asarray(e.spmv_ell(ellm, jnp.asarray(x)))
        assert np.allclose(outv, dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_ell_barriered_matches_oracle(monkeypatch):
    """The barrier-grouped unroll (the 1M×512 shipping path) must match the
    gather oracle; force dispatch to it by shrinking the temp budget, and
    drive the kernel directly at group sizes that tile and don't tile the
    width."""
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops import ell as e

    rng = np.random.default_rng(11)
    rows, width, n_rhs = 96, 7, 8
    cols = rng.integers(0, rows, (rows, width)).astype(np.int32)
    vals = rng.standard_normal((rows, width)).astype(np.float32)
    b = rng.standard_normal((rows, n_rhs)).astype(np.float32)
    ellm = e.ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals), n_cols=rows)
    dense = np.zeros((rows, rows), np.float32)
    for r in range(rows):
        for k in range(width):
            dense[r, cols[r, k]] += vals[r, k]
    oracle = dense @ b
    for group in (2, 3, 7, 16):  # non-dividing, dividing, over-wide
        out = np.asarray(e._spmm_ell_barriered(ellm, jnp.asarray(b), group))
        assert np.allclose(out, oracle, rtol=1e-4, atol=1e-4), group
    # dispatch: a budget of ~3 rows of temps forces the barriered path
    monkeypatch.setattr(e, "UNROLL_TEMP_BUDGET_BYTES",
                        3 * rows * n_rhs * 4)
    out = np.asarray(e.spmm_ell(ellm, jnp.asarray(b)))
    assert np.allclose(out, oracle, rtol=1e-4, atol=1e-4)


def test_spmm_ell_barriered_bf16_gather():
    """Opt-in bf16-gather variant: matches the oracle at quantisation
    tolerance, and the dispatch honours config ell_gather_bf16."""
    import jax.numpy as jnp

    from basic_sparse_matrix_tpu.ops import ell as e
    from basic_sparse_matrix_tpu.utils.config import (
        Config,
        get_config,
        set_config,
    )

    rng = np.random.default_rng(13)
    rows, width, n_rhs = 64, 6, 8
    cols = rng.integers(0, rows, (rows, width)).astype(np.int32)
    vals = rng.standard_normal((rows, width)).astype(np.float32)
    b = rng.standard_normal((rows, n_rhs)).astype(np.float32)
    ellm = e.ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals), n_cols=rows)
    dense = np.zeros((rows, rows), np.float32)
    for r in range(rows):
        for k in range(width):
            dense[r, cols[r, k]] += vals[r, k]
    oracle = dense @ b
    out = np.asarray(e._spmm_ell_barriered(ellm, jnp.asarray(b), 2, True))
    assert out.dtype == np.float32
    assert np.allclose(out, oracle, rtol=2e-2, atol=2e-2)
    old = get_config()
    set_config(Config(**{**old.__dict__, "ell_gather_bf16": 1}))
    try:
        budget = e.UNROLL_TEMP_BUDGET_BYTES
        e.UNROLL_TEMP_BUDGET_BYTES = 2 * rows * n_rhs * 4
        out2 = np.asarray(e.spmm_ell(ellm, jnp.asarray(b)))
        assert np.allclose(out2, oracle, rtol=2e-2, atol=2e-2)
    finally:
        e.UNROLL_TEMP_BUDGET_BYTES = budget
        set_config(old)
