"""Chebyshev semi-iterative solver — the dot-product-free companion to CG.

CG (``models/pcg.py``) pays two global reductions per iteration; on a
device mesh each is a collective. Chebyshev iteration replaces them with a
fixed scalar recurrence derived from spectral bounds [λ_min, λ_max] — every
iteration is one SpMV plus axpys, NO inner products, so the distributed
variant (``parallel/chebyshev.py``) runs with zero psums in its loop. The
bounds come from this framework's own Lanczos (``models/lanczos.py``),
closing the loop: estimate once, iterate reduction-free forever.

Recurrence (Chebyshev acceleration of Richardson iteration; standard
three-term form): with θ = (λ_max+λ_min)/2, δ = (λ_max−λ_min)/2,
σ₁ = θ/δ:

    ρ₀ = 1/σ₁,  d₀ = r₀/θ
    x ← x + d;  r ← r − A d
    ρ_k = 1/(2σ₁ − ρ_{k−1})
    d ← ρ_k ρ_{k−1} d + (2ρ_k/δ) r

Convergence factor (√κ−1)/(√κ+1) per step — CG-rate without CG's
reductions, at the price of needing the spectral interval up front.
Fixed iteration count keeps the whole loop one compiled ``fori_loop``
(no data-dependent control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.csr import CSR
from ..utils.errors import NonSquareMatrix, check
from .lanczos import LanczosSetup, _matvec, eigen_values_lanczos


def spectral_bounds(a: CSR, k: int = 32, *,
                    setup: Optional[LanczosSetup] = None,
                    seed: int = 0) -> Tuple[float, float]:
    """Safe [λ_min, λ_max] interval for Chebyshev from k-step Lanczos.
    Ritz values under/over-shoot the true extremes from inside, so the
    interval is widened: λ_max by 1%, λ_min toward zero by 5%."""
    ritz = eigen_values_lanczos(a, k, setup=setup, seed=seed)
    lo, hi = float(ritz[0]), float(ritz[-1])
    if lo <= 0.0:
        raise ValueError(
            f"chebyshev needs SPD: smallest Ritz value {lo} <= 0")
    return 0.95 * lo, 1.01 * hi


@partial(jax.jit, static_argnums=(4,))
def _cheby_loop(setup: LanczosSetup, b: jax.Array, lam_min: jax.Array,
                lam_max: jax.Array, iters: int):
    theta = (lam_max + lam_min) / 2.0
    delta = jnp.maximum((lam_max - lam_min) / 2.0, 1e-30)
    sigma1 = theta / delta

    x = jnp.zeros_like(b)
    r = b
    d = r / theta
    rho = 1.0 / sigma1

    def step(_, carry):
        x, r, d, rho = carry
        x = x + d
        r = r - _matvec(setup, d)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * r
        return x, r, d, rho_new

    x, r, d, rho = jax.lax.fori_loop(0, iters, step, (x, r, d, rho))
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)
    return x, jnp.linalg.norm(r) / bnorm


def chebyshev_solve(a: CSR, b, *, iters: int = 100,
                    bounds: Optional[Tuple[float, float]] = None,
                    lanczos_k: int = 32,
                    setup: Optional[LanczosSetup] = None
                    ) -> Tuple[jax.Array, float]:
    """Solve SPD ``A x = b`` by Chebyshev semi-iteration. Returns
    (x, final relative residual). ``bounds`` = (λ_min, λ_max); when omitted
    they are estimated by ``spectral_bounds`` (one Lanczos run, amortised
    via ``setup`` across solves). One SpMV per iteration, no reductions."""
    check(a.rows == a.cols, NonSquareMatrix,
          f"chebyshev_solve needs square matrix, got {a.dims}")
    if setup is None:
        setup = LanczosSetup.build(a)
    if bounds is None:
        bounds = spectral_bounds(a, lanczos_k, setup=setup)
    b = jnp.asarray(b, dtype=jnp.float32)
    x, res = _cheby_loop(setup, b, jnp.float32(bounds[0]),
                         jnp.float32(bounds[1]), iters)
    return x, float(res)
