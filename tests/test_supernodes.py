"""Supernode detection tests (round-2 supernodal factorization
groundwork)."""

import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.models.sparse_cholesky import analyze
from basic_sparse_matrix_tpu.runtime import symbolic as S


def _supernodes(dense, relax=0):
    a = CSR.from_dense(np.asarray(dense, dtype=np.float32))
    sch = analyze(a)
    indptr, indices, _ = a.numpy()
    rows = np.repeat(np.arange(a.rows), np.diff(indptr))
    low = indices < rows
    li = np.zeros(a.rows + 1, dtype=np.int64)
    np.add.at(li[1:], rows[low], 1)
    li = np.cumsum(li)
    parent = S.etree(a.rows, li, indices[low])
    return S.supernodes(sch.l_col_ptr, sch.l_row_idx, parent, relax=relax)


def test_dense_single_supernode():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((8, 8))
    sid = _supernodes(m @ m.T + 8 * np.eye(8))
    assert sid.tolist() == [0] * 8


def test_tridiagonal_no_merge_except_tail():
    sid = _supernodes(4 * np.eye(6) - np.eye(6, k=1) - np.eye(6, k=-1))
    # bidiagonal factor: only the final pair shares structure
    assert sid.tolist() == [0, 1, 2, 3, 4, 4]


def test_relaxation_merges():
    sid = _supernodes(4 * np.eye(6) - np.eye(6, k=1) - np.eye(6, k=-1),
                      relax=2)
    assert len(set(sid.tolist())) < 5


def test_partition_is_contiguous_nondecreasing():
    rng = np.random.default_rng(1)
    d = (rng.random((20, 20)) < 0.2)
    sym = np.tril(d) + np.tril(d).T + 20 * np.eye(20)
    sid = _supernodes(sym)
    diffs = np.diff(sid)
    assert ((diffs == 0) | (diffs == 1)).all()
