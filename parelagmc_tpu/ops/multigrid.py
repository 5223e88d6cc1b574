"""Geometric multigrid V-cycle preconditioner.

The TPU-native replacement for hypre BoomerAMG/ADS/AMS (reference solver
configs, e.g. src/PDESampler_Legacy.cpp:210-235): the MLMC hierarchy already
provides nested levels with exact finite-element transfer operators, so the
preconditioner is a Galerkin-quality geometric V-cycle built entirely from
precomputed static ELL operators:

* per-level operator A_l (rediscretized on level l's mesh; exact Galerkin
  for unit coefficients by nestedness - tests/test_fem.py),
* damped-Jacobi smoothing (symmetric: same sweeps pre and post, so the
  V-cycle is an SPD operator and a valid CG preconditioner),
* dense coarsest-level inverse applied as a batched matmul (MXU-friendly).

The recursion over levels is a Python loop over a static tuple, unrolled at
trace time - no dynamic control flow.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from parelagmc_tpu.ops.ell import ELL, ell_apply, pack_csr_to_ell


class MGLevel(NamedTuple):
    A: ELL
    inv_diag: jnp.ndarray  # (n,)
    P: ELL  # prolongation (rows: fine dofs of the NEXT level up? see below)
    Pt: ELL  # restriction


class MGHierarchy(NamedTuple):
    # levels[l] holds operator of level l plus transfer to level l+1
    levels: Tuple[MGLevel, ...]
    coarse_A: ELL
    coarse_inv: jnp.ndarray  # (nc, nc) dense inverse ((0,0) if unused)
    omega: float
    coarse_inv_diag: jnp.ndarray  # (nc,) Jacobi fallback for the coarsest
    coarse_sweeps: int  # 0 => dense solve; else Jacobi sweeps at coarsest


def _spectral_omega(A, dinv: np.ndarray, iters: int = 30) -> float:
    """1 / lambda_max(D^{-1} A) by host power iteration: guarantees the
    damped-Jacobi smoother is a contraction (eigenvalues of omega D^{-1}A
    in (0, 1]), hence an SPD V-cycle - essential for operators whose
    diagonally-scaled spectrum exceeds 2 (e.g. divergence-dominated
    reduced H(div) systems, where a fixed 0.7 makes the cycle indefinite
    and CG breaks down)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    lam = 1.0
    for _ in range(iters):
        y = dinv * (A @ x)
        lam = float(np.linalg.norm(y))
        if lam <= 0:
            return 1.0
        x = y / lam
    return 1.0 / (1.05 * lam)  # small safety margin


def build_mg_hierarchy(
    mats,  # list of scipy sparse per level, [0] = finest
    prolongators,  # list of scipy sparse, P[l]: level l+1 -> level l
    dtype=jnp.float32,
    omega=0.7,  # float, or "spectral" for per-level 1/lambda_max damping
    coarse_sweeps: int = 0,  # 0: dense coarsest inverse; >0: Jacobi sweeps
) -> MGHierarchy:
    spectral = omega == "spectral"
    levels = []
    for l in range(len(mats) - 1):
        A = mats[l].tocsr()
        d = np.asarray(A.diagonal())
        d = np.where(d == 0.0, 1.0, d)
        dinv = 1.0 / d
        if spectral:
            # Fold the per-level damping into inv_diag (global omega = 1).
            dinv = dinv * _spectral_omega(A, dinv)
        P = prolongators[l].tocsr()
        levels.append(
            MGLevel(
                A=pack_csr_to_ell(A, dtype),
                inv_diag=jnp.asarray(dinv, dtype=dtype),
                P=pack_csr_to_ell(P, dtype),
                Pt=pack_csr_to_ell(P.T.tocsr(), dtype),
            )
        )
    Ac = mats[-1].tocsr()
    if coarse_sweeps > 0:
        coarse_inv = np.zeros((0, 0))
    else:
        coarse_inv = np.linalg.inv(Ac.toarray())
    dc = np.asarray(Ac.diagonal())
    dc = np.where(dc == 0.0, 1.0, dc)
    dcinv = 1.0 / dc
    if spectral and coarse_sweeps > 0:
        dcinv = dcinv * _spectral_omega(Ac, dcinv)
    return MGHierarchy(
        levels=tuple(levels),
        coarse_A=pack_csr_to_ell(Ac, dtype),
        coarse_inv=jnp.asarray(coarse_inv, dtype=dtype),
        omega=1.0 if spectral else omega,
        coarse_inv_diag=jnp.asarray(dcinv, dtype=dtype),
        coarse_sweeps=int(coarse_sweeps),
    )


def _smooth(level: MGLevel, x: jnp.ndarray, b: jnp.ndarray, sweeps: int, omega: float):
    for _ in range(sweeps):
        r = b - ell_apply(level.A, x)
        x = x + omega * level.inv_diag * r
    return x


def v_cycle(
    mg: MGHierarchy, b: jnp.ndarray, sweeps: int = 2, level: int = 0
) -> jnp.ndarray:
    """One V(sweeps, sweeps) cycle applied to b (zero initial guess)."""
    if level == len(mg.levels):
        if mg.coarse_sweeps > 0:
            # Jacobi sweeps at the coarsest (dense matmuls inside lax loop
            # bodies have crashed the TPU worker at scale; see CLAUDE.md).
            x = mg.omega * mg.coarse_inv_diag * b
            for _ in range(mg.coarse_sweeps - 1):
                x = x + mg.omega * mg.coarse_inv_diag * (b - ell_apply(mg.coarse_A, x))
            return x
        # Coarsest: dense solve via batched matmul.
        return b @ mg.coarse_inv.T
    lvl = mg.levels[level]
    x = _smooth(lvl, jnp.zeros_like(b), b, sweeps, mg.omega)
    r = b - ell_apply(lvl.A, x)
    rc = ell_apply(lvl.Pt, r)
    xc = v_cycle(mg, rc, sweeps, level + 1)
    x = x + ell_apply(lvl.P, xc)
    x = _smooth(lvl, x, b, sweeps, mg.omega)
    return x


def make_preconditioner(mg: MGHierarchy, sweeps: int = 2) -> Callable:
    def prec(r: jnp.ndarray) -> jnp.ndarray:
        return v_cycle(mg, r, sweeps=sweeps)

    return prec
