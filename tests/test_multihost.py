"""Multi-host runtime tests (single-process paths; real multi-host needs a
cluster — SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from basic_sparse_matrix_tpu import CSR
from basic_sparse_matrix_tpu.parallel.mesh import row_mesh
from basic_sparse_matrix_tpu.parallel.multihost import (
    RowBlockSpec,
    build_global_sharded_csr,
    global_row_mesh,
    initialize,
    local_row_block,
    weak_scaling_report,
)
from basic_sparse_matrix_tpu.parallel.sharded import unshard_rows
from basic_sparse_matrix_tpu.parallel.spmm import spmm_sharded


def test_initialize_noop_single_process():
    initialize()  # must be a no-op, not raise


def test_local_row_block_partition():
    spec = local_row_block(100, 60, process_id=1, process_count=3)
    assert spec.row_start == 34 and spec.row_end == 68
    # all blocks cover [0, rows) without overlap
    blocks = [local_row_block(100, 60, process_id=i, process_count=3)
              for i in range(3)]
    covered = sorted((b.row_start, b.row_end) for b in blocks)
    assert covered[0][0] == 0 and covered[-1][1] == 100
    for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
        assert e1 == s2


def test_build_global_sharded_csr_single_host():
    rng = np.random.default_rng(0)
    rows, cols = 96, 40
    dense = ((rng.random((rows, cols)) < 0.2)
             * rng.standard_normal((rows, cols))).astype(np.float32)

    def builder(spec: RowBlockSpec) -> CSR:
        return CSR.from_dense(dense[spec.row_start:spec.row_end])

    mesh = global_row_mesh()
    spec = local_row_block(rows, cols)
    sa = build_global_sharded_csr(spec, builder, mesh)
    b = rng.standard_normal((cols, 3)).astype(np.float32)
    y = np.asarray(unshard_rows(
        spmm_sharded(sa, jnp.asarray(b), mesh), rows))
    assert np.allclose(y, dense @ b, rtol=1e-4, atol=1e-4)


def test_weak_scaling_report():
    rec = weak_scaling_report(seconds=2.0, nnz_per_host=1000,
                              baseline_seconds_1host=1.8)
    assert rec["hosts"] == jax.process_count()
    assert abs(rec["weak_scaling_efficiency"] - 0.9) < 1e-9


def test_two_process_spmm():
    """REAL multi-process run: two local processes, localhost coordinator,
    4 simulated CPU devices each → 8-device global mesh. Exercises the
    ``process_count > 1`` assembly path of ``build_global_sharded_csr``
    (make_array_from_single_device_arrays) end-to-end."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}/2 OK" in out, out[-3000:]
