"""RCM reordering tests: bandwidth and Cholesky-fill reduction."""

import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import analyze
from basic_sparse_matrix_tpu.ops.reorder import (
    apply_perm,
    bandwidth,
    permute_symmetric,
    rcm_permutation,
)


def _shuffled_banded(n=60, bw=3, seed=0):
    rng = np.random.default_rng(seed)
    a = 4.0 * np.eye(n)
    for k in range(1, bw + 1):
        a -= 0.5 ** k * (np.eye(n, k=k) + np.eye(n, k=-k))
    p = rng.permutation(n)
    return a[p][:, p].astype(np.float32)


def test_rcm_reduces_bandwidth():
    a = CSR.from_dense(_shuffled_banded())
    before = bandwidth(a)
    perm = rcm_permutation(a)
    after = bandwidth(permute_symmetric(a, perm))
    assert after < before
    assert after <= 6  # near the original band of 3


def test_rcm_reduces_cholesky_fill():
    a = CSR.from_dense(_shuffled_banded(n=80, bw=2, seed=1))
    fill_before = analyze(a).nnz_l
    perm = rcm_permutation(a)
    fill_after = analyze(permute_symmetric(a, perm)).nnz_l
    assert fill_after < fill_before


def test_permuted_solve_roundtrip():
    from basic_sparse_matrix_tpu.models.solve import solve_sparse

    a_dense = _shuffled_banded(n=40, bw=2, seed=2)
    a = CSR.from_dense(a_dense)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(40).astype(np.float32)
    perm = rcm_permutation(a)
    ap = permute_symmetric(a, perm)
    bp = apply_perm(b, perm)
    xp = np.asarray(solve_sparse(ap, bp)).ravel()
    x = np.asarray(apply_perm(xp, perm, inverse=True))
    assert np.allclose(a_dense @ x, b, rtol=1e-3, atol=1e-3)


def test_perm_is_permutation():
    a = CSR.from_dense(_shuffled_banded(n=30))
    perm = rcm_permutation(a)
    assert sorted(perm.tolist()) == list(range(30))


def _lap2d(k):
    n = k * k
    a = np.zeros((n, n), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            r = i * k + j
            a[r, r] = 4.0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < k and 0 <= jj < k:
                    a[r, ii * k + jj] = -1.0
    return a


def test_nd_is_permutation_and_reduces_fill():
    from basic_sparse_matrix_tpu.ops.reorder import chol_fill, nd_permutation

    a = CSR.from_dense(_lap2d(16))
    perm = nd_permutation(a)
    assert sorted(perm.tolist()) == list(range(256))
    assert chol_fill(a, perm) < chol_fill(a)


def test_nd_beats_rcm_on_grid():
    """The motivation for ND: on 2D grids its separator fill is
    asymptotically lower than RCM's profile fill."""
    from basic_sparse_matrix_tpu.ops.reorder import chol_fill, nd_permutation

    a = CSR.from_dense(_lap2d(24))
    assert chol_fill(a, nd_permutation(a)) < chol_fill(a, rcm_permutation(a))


def test_best_permutation_policy():
    from basic_sparse_matrix_tpu.ops.reorder import (
        ND_FILL_FACTOR,
        best_permutation,
        chol_fill,
        nd_permutation,
    )

    a = CSR.from_dense(_lap2d(12))
    perm, name = best_permutation(a)
    fills = {
        "natural": chol_fill(a),
        "rcm": chol_fill(a, rcm_permutation(a)),
        "nd": chol_fill(a, nd_permutation(a)),
    }
    # device-time-biased policy: ND only on a large fill advantage
    if fills["nd"] < ND_FILL_FACTOR * fills["rcm"]:
        assert name == "nd"
    elif fills["rcm"] <= fills["natural"]:
        assert name == "rcm"
    assert perm is None or chol_fill(a, perm) <= fills["natural"]


def test_nd_ordered_solve_matches_dense():
    from basic_sparse_matrix_tpu.models.solve import solve_sparse
    from basic_sparse_matrix_tpu.utils import config as _cfg
    import dataclasses

    a_dense = _lap2d(10)
    a = CSR.from_dense(a_dense)
    rng = np.random.default_rng(5)
    b = rng.standard_normal((100, 3)).astype(np.float32)
    old = _cfg.get_config()
    try:
        _cfg.set_config(dataclasses.replace(old, ordering="nd"))
        x = np.asarray(solve_sparse(a, b))
    finally:
        _cfg.set_config(old)
    assert np.allclose(x, np.linalg.solve(a_dense.astype(np.float64), b),
                       rtol=1e-3, atol=1e-3)


def test_disconnected_graph_orderings():
    """Both orderings must handle multiple components (block-diagonal)."""
    from basic_sparse_matrix_tpu.ops.reorder import nd_permutation

    d = np.zeros((20, 20), dtype=np.float32)
    blk = 4 * np.eye(8) - np.eye(8, k=1) - np.eye(8, k=-1)
    d[:8, :8] = blk
    d[12:, 12:] = blk
    d[8:12, 8:12] = 3 * np.eye(4)
    a = CSR.from_dense(d.astype(np.float32))
    for perm in (rcm_permutation(a), nd_permutation(a)):
        assert sorted(perm.tolist()) == list(range(20))


def test_native_matches_fallback_orderings():
    """The native C++ rcm/nd/supernodes/expand must produce exactly the
    Python fallback's output (same deterministic algorithms)."""
    import basic_sparse_matrix_tpu.runtime.symbolic as sym

    a = CSR.from_dense(_lap2d(9))
    indptr, indices, _ = a.numpy()
    lib = sym.native_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    try:
        n = a.rows
        rcm_native = sym.rcm_ordering(n, indptr, indices)
        nd_native = sym.nd_ordering(n, indptr, indices)
        sym._lib = False  # force fallback
        rcm_py = sym.rcm_ordering(n, indptr, indices)
        nd_py = sym.nd_ordering(n, indptr, indices)
    finally:
        sym._lib = lib
    assert np.array_equal(rcm_native, rcm_py)
    assert np.array_equal(nd_native, nd_py)


def test_native_matches_fallback_supernodal_pieces():
    import basic_sparse_matrix_tpu.runtime.symbolic as sym
    from basic_sparse_matrix_tpu.models.supernodal import supernode_stats

    a = CSR.from_dense(_lap2d(8))
    lib = sym.native_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    _, (parent, col_ptr, csc_rows, sid, c0, c1) = supernode_stats(
        a, relax=4)
    try:
        sid_n = sym.supernodes(col_ptr, csc_rows, parent, relax=4)
        exp_ptr_n, exp_rows_n = sym.expand_pattern(
            a.rows, col_ptr, csc_rows, c0, c1)
        sym._lib = False
        sid_p = sym.supernodes(col_ptr, csc_rows, parent, relax=4)
        exp_ptr_p, exp_rows_p = sym.expand_pattern(
            a.rows, col_ptr, csc_rows, c0, c1)
    finally:
        sym._lib = lib
    assert np.array_equal(sid_n, sid_p)
    assert np.array_equal(exp_ptr_n, exp_ptr_p)
    assert np.array_equal(exp_rows_n, exp_rows_p)


def test_native_matches_fallback_nd_edge_structures():
    """Depth-1 (star) and chain structures hit the split-level clamps —
    native and fallback must stay identical there too."""
    import basic_sparse_matrix_tpu.runtime.symbolic as sym

    lib = sym.native_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")

    def pattern(d):
        n = d.shape[0]
        rows, cols = np.nonzero(d)
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr[1:], rows, 1)
        return n, np.cumsum(indptr), cols.astype(np.int64)

    star = np.eye(101, dtype=bool)
    star[0, 1:] = star[1:, 0] = True
    chain = np.eye(150, dtype=bool)
    for i in range(149):
        chain[i, i + 1] = chain[i + 1, i] = True
    for d in (star, chain):
        n, indptr, indices = pattern(d)
        native = sym.nd_ordering(n, indptr, indices)
        try:
            sym._lib = False
            py = sym.nd_ordering(n, indptr, indices)
        finally:
            sym._lib = lib
        assert np.array_equal(native, py)
        assert sorted(native.tolist()) == list(range(n))
