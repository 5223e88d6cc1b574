"""Single-level samplers and Darcy solver on unstructured simplicial meshes.

Brings the reference's unstructured-mesh configurations (square.mesh,
cube_tet.mesh, circle.mesh, ... - the meshes its CTest suite runs on) into
the framework: the SPDE Matern sampler and the mixed Darcy forward model on
triangles/tets, on top of fem.simplicial's operator bundles and the generic
batched device machinery (ELL gathers + PCG/MINRES). Single level for now:
agglomerated multilevel hierarchies on unstructured meshes (ParELAG AMGe)
are planned work, so these classes expose the same MLSampler /
solver APIs with nlevels == 1 and compose with MCManager and the
single-level Bayesian managers.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem.simplicial import SimplicialLevel, build_simplicial_level
from parelagmc_tpu.mesh.mfem_io import GeneralMesh
from parelagmc_tpu.ops.ell import (
    coef_diag_structure,
    coef_ell_apply,
    ell_apply,
    pack_coef_ell,
    pack_csr_to_ell,
)
from parelagmc_tpu.ops.solvers import minres, pcg
from parelagmc_tpu.samplers.base import MLSampler
from parelagmc_tpu.utils.special import matern_spde_scaling


def label_box_boundaries(level: SimplicialLevel, tol: float = 1e-8) -> None:
    """Relabel boundary faces of an axis-aligned box domain with the MFEM
    generated-mesh attribute convention (3D: z=0 -> 1, y=0 -> 2, x=max -> 3,
    y=max -> 4, x=0 -> 5, z=max -> 6; 2D: y=0/x=max/y=max/x=0 -> 1..4), so
    box-domain tet/tri meshes (cube_tet.mesh, inline_tri) take the same
    BC/QoI configs as the structured path."""
    gm = level.mesh
    d = gm.dim
    lo = gm.vertices.min(axis=0)
    hi = gm.vertices.max(axis=0)
    from parelagmc_tpu.mesh.structured import _mfem_bdr_attr

    on_bdr = np.nonzero(level.bdr_attr > 0)[0]
    # Face centroids from the owner cell's opposite-vertex structure:
    # recover face vertex sets from cell_faces (any adjacent cell).
    conn = np.stack(gm.elements)
    nloc = conn.shape[1]
    local_faces = [[j for j in range(nloc) if j != i] for i in range(nloc)]
    face_verts = np.zeros((level.n_u, d), dtype=np.int64)
    for i, lf in enumerate(local_faces):
        face_verts[level.cell_faces[:, i]] = conn[:, lf]
    for f in on_bdr:
        c = gm.vertices[face_verts[f]].mean(axis=0)
        for a in range(d):
            if abs(c[a] - lo[a]) < tol:
                level.bdr_attr[f] = _mfem_bdr_attr(d, a, 0)
            elif abs(c[a] - hi[a]) < tol:
                level.bdr_attr[f] = _mfem_bdr_attr(d, a, 1)


class UnstructuredSPDESampler(MLSampler):
    """SPDE Matern sampler on a simplicial mesh (single level): the same
    reduced SPD system as the tensor path (A_u = M + (1/alpha) B^T W^-1 B,
    u.n = 0 everywhere), solved with batched Jacobi-PCG instead of the
    spectral factorization (reference analog: PDESampler_Legacy's CG+ADS
    reduced solve, src/PDESampler_Legacy.cpp:169-235)."""

    def __init__(self, level: SimplicialLevel, config: ProblemConfig, dtype=jnp.float32):
        self.level = level
        self.config = config
        self.dtype = dtype
        d = level.mesh.dim
        self.corlen = float(config.correlation_length)
        self.alpha = 1.0 / self.corlen ** 2
        self.g = matern_spde_scaling(self.corlen, d)
        self.sigma = math.sqrt(float(config.variance))
        self.lognormal = bool(config.lognormal)
        ess = np.ones(level.n_u, dtype=bool) & (level.bdr_attr > 0)
        A = self._spde_csr(ess)
        self.A = pack_csr_to_ell(A, dtype)
        dinv = 1.0 / np.maximum(A.diagonal(), 1e-300)
        self.dinv = jnp.asarray(dinv, dtype=dtype)
        self.w_sqrt = jnp.asarray(level.w_sqrt, dtype=dtype)
        self.winv = jnp.asarray(1.0 / level.W, dtype=dtype)
        signs = np.where(ess[level.cell_faces], 0.0, level.cell_signs)
        self.cell_faces = jnp.asarray(level.cell_faces, dtype=jnp.int32)
        self.cell_signs = jnp.asarray(signs, dtype=dtype)
        fs = level.face_signs.copy()
        fs[ess, :] = 0.0
        self.face_cells = jnp.asarray(level.face_cells, dtype=jnp.int32)
        self.face_signs = jnp.asarray(fs, dtype=dtype)
        self.solver_cfg = config.sampler_solver

    def _spde_csr(self, ess: np.ndarray) -> sp.csr_matrix:
        lvl = self.level
        M = lvl.mass_csr()
        B = lvl.b_csr()
        Winv = sp.diags(1.0 / lvl.W)
        A = (M + (1.0 / self.alpha) * (B.T @ Winv @ B)).tolil()
        idx = np.nonzero(ess)[0]
        A[idx, :] = 0.0
        A[:, idx] = 0.0
        A[idx, idx] = 1.0
        return A.tocsr()

    # -- MLSampler API (single level) -----------------------------------------
    def sample_size(self, level: int = 0) -> int:
        return self.level.n_s

    def field_size(self, level: int = 0) -> int:
        return self.level.n_s

    def sample(self, level: int, key, nsamples: int) -> jnp.ndarray:
        from parelagmc_tpu.ops.prng import sample_normals

        return self.sigma * sample_normals(
            key, (nsamples, self.level.n_s), dtype=self.dtype
        )

    def eval(self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None):
        # rhs_u = -(g/alpha) B^T W^{-1/2} xi; s = (1/alpha)(W^{-1} B u + g W^{-1/2} xi).
        b = self.g * self.w_sqrt * xi
        bt = jnp.sum(
            jnp.take(self.winv * b, self.face_cells.reshape(-1), axis=-1).reshape(
                b.shape[:-1] + self.face_cells.shape
            )
            * self.face_signs,
            axis=-1,
        )
        rhs_u = -(1.0 / self.alpha) * bt
        u, info = pcg(
            lambda v: ell_apply(self.A, v),
            rhs_u,
            prec=lambda r: r * self.dinv,
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
            restart_every=self.solver_cfg.restart_every,
        )
        Bu = jnp.sum(
            jnp.take(u, self.cell_faces.reshape(-1), axis=-1).reshape(
                u.shape[:-1] + self.cell_faces.shape
            )
            * self.cell_signs,
            axis=-1,
        )
        s = (1.0 / self.alpha) * (self.winv * Bu + self.g * xi / self.w_sqrt)
        return jnp.exp(s) if self.lognormal else s

    def nnz(self, level: int = 0) -> int:
        return int(np.sum(np.asarray(self.A.vals) != 0))


class UnstructuredDarcySolver:
    """Mixed Darcy forward model on a simplicial mesh (single level):
    batched MINRES on the saddle system with a Jacobi/approximate-Schur
    block-diagonal preconditioner (the reference's MINRES-BJ-GS analog for
    unstructured meshes; the tensor fast paths don't apply here)."""

    def __init__(self, level: SimplicialLevel, config: ProblemConfig, dtype=jnp.float32):
        self.level = level
        self.config = config
        self.dtype = dtype
        d = level.mesh.dim
        nb = max(int(level.bdr_attr.max()), 1)

        def attr_vec(v):
            out = np.zeros(nb, dtype=np.int64)
            out[: min(len(v), nb)] = np.asarray(v[:nb], dtype=np.int64)
            return out

        ess_attr = attr_vec(config.ess_attr)
        obs_attr = attr_vec(config.obs_attr)
        inflow_attr = attr_vec(config.inflow_attr)
        ess = level.ess_faces(ess_attr)
        self.ess = jnp.asarray(ess)

        m_vals = level.m_vals.copy()
        m_vals[ess, :] = 0.0
        m_vals = np.where(ess[level.m_cols], 0.0, m_vals)
        self.m_op = pack_coef_ell(level.m_cols, m_vals, level.m_cells, dtype)
        self.m_diag = coef_diag_structure(level.m_cols, m_vals, level.m_cells, dtype)
        signs = np.where(ess[level.cell_faces], 0.0, level.cell_signs)
        self.cell_faces = jnp.asarray(level.cell_faces, dtype=jnp.int32)
        self.cell_signs = jnp.asarray(signs, dtype=dtype)
        fs = level.face_signs.copy()
        fs[ess, :] = 0.0
        self.face_cells = jnp.asarray(level.face_cells, dtype=jnp.int32)
        self.face_signs = jnp.asarray(fs, dtype=dtype)

        # rhs and QoI functionals (boundary dofs are owner-outward => +1).
        on = level.bdr_attr > 0
        attr0 = np.maximum(level.bdr_attr - 1, 0)
        rhs_u = np.zeros(level.n_u)
        sel_in = on & (inflow_attr[attr0] == 1)
        rhs_u[sel_in] = -1.0  # weak pressure p_bar = 1 on the inflow boundary
        rhs_u[ess] = 0.0
        obs = np.zeros(level.n_u + level.n_s)
        if config.qoi == "eff_perm":
            sel_obs = on & (obs_attr[attr0] == 1)
            obs[: level.n_u][sel_obs] = 1.0
        elif config.qoi == "p_int":
            obs[level.n_u:] = -level.W
        elif config.qoi == "local_avg_p":
            conn = np.stack(level.mesh.elements)
            centers = level.mesh.vertices[conn].mean(axis=1)
            mask = (
                np.abs(centers - np.asarray(config.qoi_point)[None, :d]).max(axis=1)
                <= config.qoi_eps
            )
            obs[level.n_u:] = np.where(mask, -level.W, 0.0)
        else:
            raise ValueError(f"unknown QoI '{config.qoi}'")
        self.rhs = jnp.asarray(np.concatenate([rhs_u, np.zeros(level.n_s)]), dtype=dtype)
        self.obs_func = jnp.asarray(obs, dtype=dtype)
        self.solver_cfg = config.darcy_solver

    def num_dofs(self, level: int = 0) -> int:
        return self.level.n_u + self.level.n_s

    def nnz(self, level: int = 0) -> int:
        return int(np.sum(np.asarray(self.m_op.mvals) != 0)) + 2 * int(
            np.sum(np.asarray(self.cell_signs) != 0)
        )

    def solve_fwd(self, level: int, w: jnp.ndarray, return_pressure: bool = False):
        n_u, n_s = self.level.n_u, self.level.n_s
        ess = self.ess

        def apply_A(x):
            u, p = x[..., :n_u], x[..., n_u:]
            Mu = coef_ell_apply(self.m_op, w, u)
            Btp = jnp.sum(
                jnp.take(p, self.face_cells.reshape(-1), axis=-1).reshape(
                    p.shape[:-1] + self.face_cells.shape
                )
                * self.face_signs,
                axis=-1,
            )
            yu = jnp.where(ess, u, Mu + Btp)
            Bu = jnp.sum(
                jnp.take(u, self.cell_faces.reshape(-1), axis=-1).reshape(
                    u.shape[:-1] + self.cell_faces.shape
                )
                * self.cell_signs,
                axis=-1,
            )
            return jnp.concatenate([yu, Bu], axis=-1)

        dM = jnp.where(ess, 1.0, self.m_diag(w))
        inv_dM = 1.0 / dM
        # diag of the approximate Schur B diag(M)^-1 B^T.
        gathered = jnp.take(inv_dM, self.cell_faces.reshape(-1), axis=-1).reshape(
            inv_dM.shape[:-1] + self.cell_faces.shape
        )
        dS = jnp.sum(gathered * (self.cell_signs ** 2), axis=-1)
        inv_dS = 1.0 / jnp.maximum(dS, 1e-30)

        def prec(r):
            return jnp.concatenate(
                [r[..., :n_u] * inv_dM, r[..., n_u:] * inv_dS], axis=-1
            )

        b = jnp.broadcast_to(self.rhs, w.shape[:-1] + self.rhs.shape)
        x, info = minres(
            apply_A,
            b,
            prec=prec,
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
        )
        Q = jnp.sum(x * self.obs_func, axis=-1)
        cost = float(n_u + n_s)
        if return_pressure:
            return Q, cost, info, -x[..., n_u:]
        return Q, cost, info
