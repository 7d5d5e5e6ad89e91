"""Profiling, metrics, and roofline analysis.

The reference's only observability is criterion wall-time benches and stray
``println!``s (SURVEY.md §5). Here: structured per-op metrics (nnz/s,
GFLOP/s, bytes moved), a roofline calculator against per-chip peaks, timer
contexts, and ``jax.profiler`` trace hooks.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import logging
import time
from typing import Dict, Iterator, Optional

logger = logging.getLogger("basic_sparse_matrix_tpu")


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-chip peak numbers used as roofline denominators."""

    name: str
    hbm_bw: float       # bytes/s
    mxu_f32: float      # FLOP/s (f32-accurate matmul)
    mxu_bf16: float     # FLOP/s


# v5e-class defaults (single chip).
V5E = ChipSpec(name="tpu-v5e", hbm_bw=819e9, mxu_f32=4.9e13,
               mxu_bf16=1.97e14)


def detect_chip() -> ChipSpec:
    try:
        import jax

        if jax.default_backend() == "tpu":
            return V5E
    except Exception:
        pass
    return ChipSpec(name="cpu", hbm_bw=100e9, mxu_f32=1e12, mxu_bf16=2e12)


@dataclasses.dataclass
class OpMetrics:
    op: str
    seconds: float
    flops: float = 0.0
    bytes_moved: float = 0.0
    nnz: int = 0

    @property
    def gflops_per_s(self) -> float:
        return self.flops / self.seconds / 1e9 if self.seconds else 0.0

    @property
    def nnz_per_s(self) -> float:
        return self.nnz / self.seconds if self.seconds else 0.0

    def roofline_fraction(self, chip: Optional[ChipSpec] = None) -> float:
        """Achieved fraction of speed-of-light = t_bound / t_measured with
        t_bound = max(memory time, compute time)."""
        chip = chip or detect_chip()
        t_mem = self.bytes_moved / chip.hbm_bw
        t_mxu = self.flops / chip.mxu_f32
        t_bound = max(t_mem, t_mxu)
        return t_bound / self.seconds if self.seconds else 0.0

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["gflops_per_s"] = self.gflops_per_s
        d["nnz_per_s"] = self.nnz_per_s
        d["roofline_fraction"] = self.roofline_fraction()
        return json.dumps(d)


_registry: Dict[str, OpMetrics] = {}


def record(m: OpMetrics) -> OpMetrics:
    _registry[m.op] = m
    logger.info("metrics %s", m.to_json())
    return m


def all_metrics() -> Dict[str, OpMetrics]:
    return dict(_registry)


@contextlib.contextmanager
def timed(op: str, *, flops: float = 0.0, bytes_moved: float = 0.0,
          nnz: int = 0) -> Iterator[OpMetrics]:
    """Wall-clock timer context that records an :class:`OpMetrics`. Callers
    must block on device results inside the context for honest numbers."""
    m = OpMetrics(op=op, seconds=0.0, flops=flops, bytes_moved=bytes_moved,
                  nnz=nnz)
    t0 = time.perf_counter()
    try:
        yield m
    finally:
        m.seconds = time.perf_counter() - t0
        record(m)


@contextlib.contextmanager
def trace(name: str):
    """``jax.profiler`` annotation (no-op if the profiler is unavailable)."""
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


def spmm_cost(nnz: int, n_rhs: int, rows: int, cols: int,
              dtype_bytes: int = 4) -> Dict[str, float]:
    """Roofline cost model for gather-style SpMM: every stored entry reads
    one RHS row and the output is written once."""
    flops = 2.0 * nnz * n_rhs
    bytes_moved = (
        nnz * (dtype_bytes + 4)               # values + col indices
        + min(nnz, cols) * n_rhs * dtype_bytes  # RHS rows touched (≥ once)
        + rows * n_rhs * dtype_bytes          # output
    )
    return {"flops": flops, "bytes_moved": bytes_moved}
