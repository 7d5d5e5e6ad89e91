"""Generate the committed SPD validation fixtures (BASELINE config 2).

Real SuiteSparse downloads (bcsstk/nos) are unavailable in this
environment (zero network egress), so the validation set is three
deterministic FEM-style SPD assemblies with bcsstk-like structure,
written as Matrix Market files under ``tests/data/`` and committed:

* ``plate2d_48.mtx``   — 13-point biharmonic plate stiffness on a 48x48
  grid (n=2304), log-normal element stiffness jumps (condition-rich, like
  the bcsstk plate problems);
* ``frame3d_14.mtx``   — 7-point 3D frame/Laplacian on 14^3 (n=2744) with
  heterogeneous member stiffness;
* ``beam_stiffness_2000.mtx`` — 4th-order beam bending stiffness
  (pentadiagonal, n=2000), the classic nos-style band problem.

Each is symmetric positive definite by construction (weighted graph
Laplacian / squared-difference assembly plus a small positive diagonal
shift). Run once; the outputs are committed, not regenerated per test.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _to_mtx(path, n, rows, cols, vals, comment):
    """Write a symmetric coordinate .mtx (lower triangle) from full COO."""
    import scipy.sparse as sp

    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    sym_err = abs(a - a.T).max()
    assert sym_err < 1e-10, sym_err
    lo = sp.tril(a).tocoo()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write(f"% {comment}\n")
        f.write(f"{n} {n} {lo.nnz}\n")
        for r, c, v in zip(lo.row, lo.col, lo.data):
            f.write(f"{r + 1} {c + 1} {v:.9g}\n")
    # SPD check: smallest eigenvalue (dense — generation-time only).
    lam_min = float(np.linalg.eigvalsh(a.toarray())[0])
    print(f"{path}: n={n} nnz={a.nnz} lam_min={lam_min:.3e}")
    assert lam_min > 0


def plate2d(k=48, seed=1):
    """Biharmonic plate: K = D^T W D with D the 5-point Laplacian stencil
    (so K is the 13-point squared stencil), W log-normal element weights."""
    import scipy.sparse as sp

    n = k * k
    rng = np.random.default_rng(seed)
    lap = sp.diags([-1, -1, 4, -1, -1], [-k, -1, 0, 1, k],
                   shape=(n, n), format="csr")
    w = sp.diags(np.exp(rng.normal(0, 0.7, n)))
    kmat = (lap.T @ w @ lap + 1e-3 * sp.eye(n)).tocoo()
    _to_mtx("tests/data/plate2d_48.mtx", n, kmat.row, kmat.col, kmat.data,
            "13-point biharmonic plate stiffness, 48x48, log-normal weights")


def frame3d(k=14, seed=2):
    """3D frame: weighted 7-point graph Laplacian + positive diagonal."""
    import scipy.sparse as sp

    n = k**3
    rng = np.random.default_rng(seed)
    idx = np.arange(n).reshape(k, k, k)
    edges = []
    for axis in range(3):
        a = np.take(idx, np.arange(k - 1), axis=axis).ravel()
        b = np.take(idx, np.arange(1, k), axis=axis).ravel()
        edges.append(np.stack([a, b], 1))
    e = np.concatenate(edges)
    w = np.exp(rng.normal(0, 1.0, e.shape[0]))
    rows = np.concatenate([e[:, 0], e[:, 1], e[:, 0], e[:, 1],
                           np.arange(n)])
    cols = np.concatenate([e[:, 1], e[:, 0], e[:, 0], e[:, 1],
                           np.arange(n)])
    vals = np.concatenate([-w, -w, w, w, np.full(n, 1e-2)])
    _to_mtx("tests/data/frame3d_14.mtx", n, rows, cols, vals,
            "weighted 7-point 3D frame Laplacian, 14^3, log-normal members")


def beam(n=2000, seed=3):
    """4th-order beam bending: pentadiagonal D2^T W D2 + axial term."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    d2 = sp.diags([1, -2, 1], [0, 1, 2], shape=(n - 2, n), format="csr")
    w = sp.diags(np.exp(rng.normal(0, 0.5, n - 2)))
    kmat = (d2.T @ w @ d2 + 1e-2 * sp.eye(n)).tocoo()
    _to_mtx("tests/data/beam_stiffness_2000.mtx", n, kmat.row, kmat.col,
            kmat.data, "pentadiagonal beam bending stiffness, n=2000")


if __name__ == "__main__":
    plate2d()
    frame3d()
    beam()
