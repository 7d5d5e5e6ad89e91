"""Prepared linear operator — the serving-path convenience wrapper.

Production use reuses one matrix across many multiplies/solves. A
:class:`SparseOperator` prepares everything once (format conversions,
factorization schedules, preconditioner) and exposes cheap repeated calls —
the deployment-shaped API the reference's one-shot functions don't offer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.csr import CSR
from ..ops.spmm import mul_dense, mul_vector


@dataclasses.dataclass
class SparseOperator:
    """Wraps a CSR with memoised fast-path state.

    ``matmul``/``matvec`` reuse the dispatch caches on the CSR instance;
    ``solve`` lazily builds and caches the direct-solve schedules (sparse
    Cholesky + triangular solves); ``solve_cg`` lazily builds the IC(0)-PCG
    setup.
    """

    a: CSR
    _direct: Optional[tuple] = None
    _pcg: Optional[object] = None
    _lanczos: Optional[object] = None

    # ------------------------------------------------------------------ #
    def matmul(self, b) -> jax.Array:
        return mul_dense(self.a, b)

    def matvec(self, x) -> jax.Array:
        return mul_vector(self.a, x)

    def matmul_sparse(self, other: CSR) -> CSR:
        """Sparse×sparse product (dispatching SpGEMM; the planned Gustavson
        path memoises its symbolic plan on ``self.a`` per RHS pattern)."""
        from ..ops.spgemm import spgemm

        return spgemm(self.a, other)

    __matmul__ = matmul

    # ------------------------------------------------------------------ #
    def _ensure_direct(self):
        if self._direct is None:
            from .solve import prepare_direct

            self._direct = prepare_direct(self.a)
        return self._direct

    def solve(self, b) -> jax.Array:
        """Direct SPD solve; ordering, factorization (banded / supernodal /
        scatter-list — :class:`models.solve.DirectSolver` dispatch), and
        solve schedules are computed once and reused for every subsequent
        right-hand side."""
        return self._ensure_direct().solve(b)

    def solve_cg(self, b, tol: float = 1e-6, max_iters: int = 1000):
        """IC(0)-preconditioned CG; the preconditioner is built once."""
        from .pcg import PCGSetup, pcg_solve

        if self._pcg is None:
            self._pcg = PCGSetup.build(self.a)
        return pcg_solve(self.a, b, tol=tol, max_iters=max_iters,
                         setup=self._pcg)

    def solve_chebyshev(self, b, iters: int = 100):
        """Chebyshev semi-iteration (SPD; reduction-free inner loop).
        Spectral bounds come from the shared Lanczos setup, built once.
        Returns (x, final relative residual)."""
        from .chebyshev import chebyshev_solve

        return chebyshev_solve(self.a, b, iters=iters,
                               setup=self._ensure_lanczos())

    # ------------------------------------------------------------------ #
    def _ensure_lanczos(self):
        if self._lanczos is None:
            from .lanczos import LanczosSetup

            self._lanczos = LanczosSetup.build(self.a)
        return self._lanczos

    def eigen_values(self, k: int = 32) -> jax.Array:
        """k Ritz values (ascending; symmetric operand) — Lanczos, no
        densification; the ELL view is built once and reused."""
        from .lanczos import eigen_values_lanczos

        return eigen_values_lanczos(self.a, k, setup=self._ensure_lanczos())

    def condition_estimate(self, k: int = 32) -> float:
        """2-norm condition estimate (SPD operand) — predicts ``solve_cg``
        iteration counts and refinement needs."""
        from .lanczos import condition_estimate

        return condition_estimate(self.a, k, setup=self._ensure_lanczos())
