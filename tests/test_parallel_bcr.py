"""Distributed block-cyclic-reduction solver (``parallel/bcr.py``) on the
8-device simulated CPU mesh — oracle parity and boundary-exchange checks."""

import numpy as np
import pytest

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.parallel.bcr import bcr_solve_sharded_csr
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh


def _banded_spd(rng, n, bw):
    a = np.zeros((n, n), dtype=np.float32)
    for d in range(1, bw + 1):
        vals = rng.standard_normal(n - d).astype(np.float32) * 0.3
        a += np.diag(vals, k=d) + np.diag(vals, k=-d)
    a += (2.0 * bw + 2.0) * np.eye(n, dtype=np.float32)
    return a


@pytest.mark.parametrize("ndev,n,bw,nb", [
    (8, 512, 5, 8),    # m=64: 3 local levels + 3 redundant
    (8, 64, 3, 8),     # m=8 = ndev: no local levels, all redundant
    (4, 200, 6, 8),    # m=25 -> padded to 32: pad blocks cross devices
    (2, 96, 7, 8),     # m=12 -> padded to 16
])
def test_sharded_bcr_matches_oracle(ndev, n, bw, nb):
    mesh = row_mesh(ndev)
    rng = np.random.default_rng(n + ndev)
    dense = _banded_spd(rng, n, bw)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    x = bcr_solve_sharded_csr(CSR.from_dense(dense), b, mesh, nb)
    np.testing.assert_allclose(x, np.linalg.solve(dense, b),
                               rtol=3e-4, atol=3e-4)


def test_sharded_matches_single_device_bcr():
    from basic_sparse_matrix_tpu.models import bcr as sbcr

    mesh = row_mesh(8)
    rng = np.random.default_rng(3)
    dense = _banded_spd(rng, 256, 4)
    a = CSR.from_dense(dense)
    b = rng.standard_normal((256, 2)).astype(np.float32)
    x_single = np.asarray(sbcr.prepare_bcr(a, 8).solve(b))
    x_sharded = bcr_solve_sharded_csr(a, b, mesh, 8)
    np.testing.assert_allclose(x_sharded, x_single, rtol=1e-4, atol=1e-4)


def test_sharded_bcr_1d_rhs():
    mesh = row_mesh(4)
    rng = np.random.default_rng(7)
    dense = _banded_spd(rng, 128, 2)
    x = bcr_solve_sharded_csr(CSR.from_dense(dense),
                              np.ones(128, dtype=np.float32), mesh, 8)
    assert x.shape == (128,)
    np.testing.assert_allclose(x, np.linalg.solve(dense, np.ones(128)),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("ndev", [3, 6])
def test_sharded_bcr_non_pow2_devices(ndev):
    # survivor-block count isn't a power of two -> the gathered tail must
    # pad the RHS to the gathered factor's padded size
    mesh = row_mesh(ndev)
    rng = np.random.default_rng(31 + ndev)
    dense = _banded_spd(rng, 96, 4)
    b = rng.standard_normal((96, 2)).astype(np.float32)
    x = bcr_solve_sharded_csr(CSR.from_dense(dense), b, mesh, 8)
    np.testing.assert_allclose(x, np.linalg.solve(dense, b),
                               rtol=3e-4, atol=3e-4)
