"""Configuration system.

The reference has no config surface at all — its only knobs are function
arguments and Cargo build profiles (SURVEY.md §5). Here a frozen dataclass
carries the framework-wide knobs (tile sizes, dtype policy, dispatch
thresholds, mesh shape) with env-var overrides (``BSM_*``) and an argparse
helper for the bench/driver scripts.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # Pallas BSR kernel tiles (f32 MXU alignment: 8 sublanes × 128 lanes).
    bsr_block_rows: int = 8
    bsr_block_cols: int = 128
    rhs_tile: int = 128
    # Dispatch thresholds (measured: benchmarks/autotune.py on v5e, r2:
    # dense matmul wins from 0.5% density wherever the bytes guard admits
    # it; the unrolled ELL path beats gather/segment up to 4x padding).
    bsr_min_fill: float = 0.02      # block fill below which gather path wins
    dense_dispatch_density: float = 0.005  # densify-SpMM threshold
    dense_dispatch_max_bytes: int = 2 << 30
    ell_max_overhead: float = 4.0   # padded-slots/true-nnz cap for ELL
    # Opt-in: gather RHS rows in bfloat16 (f32 accumulate) on the barriered
    # hypersparse path — +23% measured at 1M×32×512, B-quantisation cost.
    ell_gather_bf16: int = 0
    # VMEM-streaming SpMM kernel (ops.pallas.stream_kernel) for concrete
    # hypersparse operands with wide RHS on real TPUs: "on" | "off".
    # On-chip head-to-head r3 (benchmarks/stream_spmm_bench.py, 100k rows
    # x 32/row x 512 RHS): 26.1 ms vs 34.0 ms ELL gather path (1.30x,
    # roofline fraction 0.243 -> 0.32). The gain is bounded by the
    # per-entry VMEM row FMA issue cost at 512 lanes (~4 vregs/row), not
    # by HBM: unroll saturates at 8 (u1 44 ms, u4 30.5, u8 26.1, u16
    # 25.8); a 4096-row C tile OOMs the 16 MB VMEM at 512-col RHS.
    ell_stream: str = "on"
    ell_stream_unroll: int = 8
    dense_cholesky_max_n: int = 2048
    dense_cholesky_min_density: float = 0.05
    supernodal_relax: int = 8       # per-panel padding budget (amalgamation)
    # Max schedule groups compiled into one supernodal numeric program;
    # larger schedules run as a sequence of bounded programs with the
    # factor values device-resident (the 263-group n=35937 3D-ND schedule
    # OOM-killed the XLA compile process as a single program). 0 = always
    # one program.
    supernodal_groups_per_program: int = 48
    # Supernodal numeric READS: "element" (positions rebuilt in-register,
    # one scalar gather per element), "window" (one dynamic-slice issue
    # per contiguous base+rank run — U·W instead of U·(I+J)·W issues), or
    # "auto" (host picks per level: window when I+J >= 144, the measured
    # break-even between the ~0.8 us window issue and ~6 ns element
    # gathers). Measured r4 at n=35937 (BENCH_RESULTS): window/auto
    # numeric 3.26 s vs 6.24 s r3 element baseline; element additionally
    # cannot compile 48-group programs at this scale (per-element
    # position rebuilds OOM the compile helper), window/auto can.
    # element | window | kernel | auto. "kernel" (r5) reads runs from a
    # VMEM-resident factor array (ops/pallas/runs_read) — auto uses it
    # whenever the schedule built classes for it (lvals fits VMEM).
    supernodal_gather: str = "auto"
    # Supernodal update SCATTER: "element" (per-element positions rebuilt
    # in-register — U·I·J scatter issues at ~10 ns each), "delta" (embed
    # updates into their target panels' dense trapezoid rects via one-hot
    # MXU matmuls, merge per target, ONE affine rect scatter — St·Rd·Wt
    # issues), "pallas" (per-column DMA add-back), "vmem" (whole factor
    # array VMEM-resident, per-column roll+add — r5,
    # ops/pallas/addback_resident), or "auto" (host picks per level by a
    # cost model; see models/supernodal). Gate on chip with
    # benchmarks/level_step_probe.py before changing the default.
    supernodal_scatter: str = "auto"
    ordering: str = "auto"          # fill ordering: auto|rcm|nd|natural
    # Banded (block-tridiagonal) factorization dispatch: used when the
    # (reordered) half-bandwidth fits a block size <= banded_max_block and
    # the dense band storage stays under banded_max_bytes. 0 disables.
    # Measured on chip (BENCH_RESULTS r2): even nb=1024 blocks factor n=16k
    # in 8.5 ms — far below the supernodal path at equal n — so the cap is
    # set by the storage guard in practice, not by block-size economics.
    # Raised 1024 → 2048 in r3: band storage O(n·nb) + batched potrf of
    # nb² blocks stay MXU-friendly, and the bytes guard (not block-size
    # economics) remains the binding constraint; this extends the banded/
    # BCR tier to regular 3D patterns at n ≥ 32k (bandwidth ~n^(2/3)).
    banded_max_block: int = 2048
    banded_max_bytes: int = 1 << 30
    banded_min_steps: int = 4       # need >= this many block rows to pay off
    # Banded backend: "bcr" (block cyclic reduction, O(log m) batched
    # stages — measured 1.8-2.6x the scan at m=64 and 1.6x at m=512) or
    # "scan" (the sequential block scan).
    banded_solver: str = "bcr"
    # Planned-merge numeric phase: "chunked" (issue-coalesced row gathers +
    # one-hot select contracted on the MXU; see ops.elementwise
    # MERGE_CHUNK_W) or "planned" (two scalar inverse gathers). Measured on
    # chip r3 (benchmarks/ss_add_bench.py, reference ss_add workload):
    # chunked w=32 0.19 ms vs planned 7.84 ms (41x) vs scipy 9.2 ms (48x).
    merge_numeric: str = "chunked"
    # spgemm_planned numeric phase: "chunked" (the merge kernel's
    # issue-coalescing generalised to Gustavson expansion — source-order
    # runs served by 4 aligned row gathers + one-hot select, then ONE
    # permutation gather to destination order; ~2x fewer scalar issues)
    # or "planned" (two scalar gathers in destination order). "chunked"
    # silently falls back per plan when any expansion chunk spans >2
    # matched B rows (short-row operands, where coalescing cannot help).
    # "mergetree" (r4): coalesced source-order products, then log2(max A
    # row nnz) rounds of pairwise sorted-stream merges on the ss_add chunk
    # kernel — no destination permutation and no scalar gathers at all;
    # falls back like "chunked" when streams are too short.
    # "rowgather" (r4): expansion products from a padded B-ELL via one ROW
    # gather per A entry (free reshape when B rows are uniform), then ONE
    # permutation gather to destination order — ~E + nnz_a issues vs the
    # planned path's 2·E; falls back when B is too skewed to ELL-pad.
    spgemm_numeric: str = "planned"
    # Numerics.
    matmul_precision: str = "highest"  # this env quantizes default matmuls
    solve_dtype: str = "float32"
    # Distribution.
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = 1D over all devices

    @staticmethod
    def from_env(base: Optional["Config"] = None) -> "Config":
        cfg = base or Config()
        overrides = {}
        for f in dataclasses.fields(Config):
            env = os.environ.get(f"BSM_{f.name.upper()}")
            if env is None:
                continue
            if f.type in ("int", int):
                overrides[f.name] = int(env)
            elif f.type in ("float", float):
                overrides[f.name] = float(env)
            else:
                overrides[f.name] = env
        return dataclasses.replace(cfg, **overrides)

    def add_cli_args(self, parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(Config):
            default = getattr(self, f.name)
            parser.add_argument(
                f"--{f.name.replace('_', '-')}", default=default,
                type=type(default) if default is not None else str,
            )

    @staticmethod
    def from_args(args: argparse.Namespace) -> "Config":
        names = {f.name for f in dataclasses.fields(Config)}
        return Config(**{k: v for k, v in vars(args).items() if k in names})


_config = Config.from_env()


def get_config() -> Config:
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg


def matmul_precision():
    """The configured jax matmul precision (lax.Precision)."""
    import jax

    name = get_config().matmul_precision.upper()
    return getattr(jax.lax.Precision, name, jax.lax.Precision.HIGHEST)
