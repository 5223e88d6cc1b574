"""Samplers and Darcy solver on unstructured simplicial meshes.

Brings the reference's unstructured-mesh configurations (square.mesh,
cube_tet.mesh, circle.mesh, ... - the meshes its CTest suite runs on) into
the framework: the SPDE Matern sampler and the mixed Darcy forward model on
triangles/tets, on top of fem.simplicial's operator bundles and the generic
batched device machinery (ELL gathers + PCG/MINRES). Multilevel hierarchies
come from nested uniform refinement (fem/simplicial_hierarchy.py) with
exact RT0/P0 interlevel embeddings, so these classes compose with the full
MLMC and Bayesian manager stack; true algebraic agglomeration of a *given*
fine mesh (ParELAG AMGe) remains planned work.

Both classes accept either a SimplicialHierarchy or a single
SimplicialLevel (treated as a 1-level hierarchy).
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem.simplicial import SimplicialLevel
from parelagmc_tpu.fem.simplicial_hierarchy import SimplicialHierarchy
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


def label_box_boundaries_gm(gm: GeneralMesh, tol: float = 1e-8) -> bool:
    """Relabel a GeneralMesh's boundary attributes with the MFEM box-side
    convention (by face-centroid position on the bounding box; 3D: z=0 -> 1,
    y=0 -> 2, x=max -> 3, y=max -> 4, x=0 -> 5, z=max -> 6; 2D: 1..4), so
    box-domain tet/tri meshes (cube_tet.mesh, inline_tri) take the same
    BC/QoI configs as the structured path. Apply to the base mesh BEFORE
    building a hierarchy; refinement preserves attributes.

    Curved domains (circle.mesh, cylinder.mesh, ...) are detected - some
    boundary face does not lie on the bounding box - and left untouched
    (returns False): their native attributes drive BCs/QoIs, like the
    reference's attribute-vector parameters."""
    from parelagmc_tpu.mesh.structured import _mfem_bdr_attr

    d = gm.dim
    lo = gm.vertices.min(axis=0)
    hi = gm.vertices.max(axis=0)
    new_attr = np.array(gm.boundary_attributes, copy=True)
    for k, bf in enumerate(gm.boundary):
        c = gm.vertices[bf].mean(axis=0)
        on_box = False
        for a in range(d):
            if abs(c[a] - lo[a]) < tol:
                new_attr[k] = _mfem_bdr_attr(d, a, 0)
                on_box = True
            elif abs(c[a] - hi[a]) < tol:
                new_attr[k] = _mfem_bdr_attr(d, a, 1)
                on_box = True
        if not on_box:
            return False  # curved domain: keep native attributes
    gm.boundary_attributes[:] = new_attr
    return True


def label_box_boundaries(level: SimplicialLevel, tol: float = 1e-8) -> None:
    """Level-local variant of label_box_boundaries_gm (rewrites the level's
    bdr_attr array in place)."""
    gm = level.mesh
    d = gm.dim
    lo = gm.vertices.min(axis=0)
    hi = gm.vertices.max(axis=0)
    from parelagmc_tpu.mesh.structured import _mfem_bdr_attr

    on_bdr = np.nonzero(level.bdr_attr > 0)[0]
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


def _as_hierarchy(h) -> SimplicialHierarchy:
    if isinstance(h, SimplicialHierarchy):
        return h
    return SimplicialHierarchy(levels=[h], parent=[], P_rt=[])


def _bt_gather(face_cells, face_signs, p):
    return jnp.sum(
        jnp.take(p, face_cells.reshape(-1), axis=-1).reshape(
            p.shape[:-1] + face_cells.shape
        )
        * face_signs,
        axis=-1,
    )


def _b_gather(cell_faces, cell_signs, u):
    return jnp.sum(
        jnp.take(u, cell_faces.reshape(-1), axis=-1).reshape(
            u.shape[:-1] + cell_faces.shape
        )
        * cell_signs,
        axis=-1,
    )


class UnstructuredSPDESampler(MLSampler):
    """SPDE Matern sampler on simplicial meshes: the same reduced SPD system
    as the tensor path (A_u = M + (1/alpha) B^T W^-1 B, u.n = 0 everywhere),
    solved with batched Jacobi-PCG instead of the spectral factorization
    (reference analog: PDESampler_Legacy's CG+ADS reduced solve,
    src/PDESampler_Legacy.cpp:169-235). MLMC coupling: the white-noise load
    is restricted to coarser levels through P_l2^T."""

    def __init__(
        self,
        hierarchy: Union[SimplicialHierarchy, SimplicialLevel],
        config: ProblemConfig,
        dtype=jnp.float32,
    ):
        self.hierarchy = _as_hierarchy(hierarchy)
        self.config = config
        self.dtype = dtype
        d = self.hierarchy.levels[0].mesh.dim
        self.corlen = float(config.correlation_length)
        self.alpha = 1.0 / self.corlen ** 2
        self.g = matern_spde_scaling(self.corlen, d)
        self.sigma = math.sqrt(float(config.variance))
        self.lognormal = bool(config.lognormal)
        self.solver_cfg = config.sampler_solver

        self._lv = []
        for lvl in self.hierarchy.levels:
            ess = lvl.bdr_attr > 0
            M = lvl.mass_csr()
            B = lvl.b_csr()
            Winv = sp.diags(1.0 / lvl.W)
            A = (M + (1.0 / self.alpha) * (B.T @ Winv @ B)).tolil()
            idx = np.nonzero(ess)[0]
            A[idx, :] = 0.0
            A[:, idx] = 0.0
            A[idx, idx] = 1.0
            A = A.tocsr()
            fs = lvl.face_signs.copy()
            fs[ess, :] = 0.0
            self._lv.append(
                dict(
                    A=pack_csr_to_ell(A, dtype),
                    dinv=jnp.asarray(1.0 / np.maximum(A.diagonal(), 1e-300), dtype=dtype),
                    w_sqrt=jnp.asarray(lvl.w_sqrt, dtype=dtype),
                    winv=jnp.asarray(1.0 / lvl.W, dtype=dtype),
                    cell_faces=jnp.asarray(lvl.cell_faces, dtype=jnp.int32),
                    cell_signs=jnp.asarray(
                        np.where(ess[lvl.cell_faces], 0.0, lvl.cell_signs), dtype=dtype
                    ),
                    face_cells=jnp.asarray(lvl.face_cells, dtype=jnp.int32),
                    face_signs=jnp.asarray(fs, dtype=dtype),
                )
            )
        # P_l2^T restrictions as ELLs (coarse rows <- fine entries).
        self._restrict = [
            pack_csr_to_ell(self.hierarchy.p_l2(l).T.tocsr(), dtype)
            for l in range(self.hierarchy.nlevels - 1)
        ]

    # -- MLSampler API -----------------------------------------------------------
    def sample_size(self, level: int) -> int:
        return self.hierarchy.levels[level].n_s

    def field_size(self, level: int) -> int:
        return self.hierarchy.levels[level].n_s

    def sample(self, level: int, key, nsamples: int) -> jnp.ndarray:
        from parelagmc_tpu.ops.prng import sample_normals

        return self.sigma * sample_normals(
            key, (nsamples, self.sample_size(level)), dtype=self.dtype
        )

    def eval(self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None):
        s = self._eval_gaussian(level, xi, xi_level)
        return jnp.exp(s) if self.lognormal else s

    def _eval_gaussian(
        self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None
    ):
        if xi_level is None:
            xi_level = level
        assert xi_level <= level
        # White-noise load b = g W^{1/2} xi at xi_level, restricted to level.
        b = self.g * self._lv[xi_level]["w_sqrt"] * xi
        for l in range(xi_level, level):
            b = ell_apply(self._restrict[l], b)
        L = self._lv[level]
        rhs_u = -(1.0 / self.alpha) * _bt_gather(
            L["face_cells"], L["face_signs"], L["winv"] * b
        )
        u, info = pcg(
            lambda v: ell_apply(L["A"], v),
            rhs_u,
            prec=lambda r: r * L["dinv"],
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
            restart_every=self.solver_cfg.restart_every,
        )
        Bu = _b_gather(L["cell_faces"], L["cell_signs"], u)
        return (1.0 / self.alpha) * (L["winv"] * (Bu + b))

    def nnz(self, level: int = 0) -> int:
        return int(np.sum(np.asarray(self._lv[level]["A"].vals) != 0))


class UnstructuredProjectionSPDESampler(UnstructuredSPDESampler):
    """Non-matching-mesh embedded SPDE sampler on unstructured simplicial
    meshes (the reference's flagship L2ProjectionPDESampler,
    src/L2ProjectionPDESampler.cpp, on its actual tet/tri meshes like
    cube_tet.mesh vs cube_tet_enlarge.mesh): the field is solved on an
    independently meshed enlarged domain and projected to the original mesh
    by the P0 mortar coupling s = W_orig^{-1} G s_embed, with G assembled
    per level by the native C++ intersection kernels
    (parelagmc_tpu/native/geometry.cc) - exact convex-cell clipping with a
    hash-grid broad phase, at setup time only."""

    def __init__(
        self,
        orig_hierarchy: Union[SimplicialHierarchy, SimplicialLevel],
        embed_hierarchy: Union[SimplicialHierarchy, SimplicialLevel],
        config: ProblemConfig,
        dtype=jnp.float32,
    ):
        super().__init__(embed_hierarchy, config, dtype)
        from parelagmc_tpu.native import mortar_p0_couple

        self.orig_hierarchy = _as_hierarchy(orig_hierarchy)
        assert self.orig_hierarchy.nlevels == self.hierarchy.nlevels
        self.G = []
        self.winv_orig = []
        for l in range(self.orig_hierarchy.nlevels):
            om = self.orig_hierarchy.levels[l]
            em = self.hierarchy.levels[l]
            G = mortar_p0_couple(om.mesh, em.mesh)
            covered = np.asarray(G.sum(axis=1)).ravel()
            if not np.allclose(covered, om.W, rtol=1e-8):
                raise ValueError("No intersection, no transfer! (level %d)" % l)
            self.G.append(pack_csr_to_ell(G, dtype))
            self.winv_orig.append(jnp.asarray(1.0 / om.W, dtype=dtype))

    def field_size(self, level: int) -> int:
        return self.orig_hierarchy.levels[level].n_s

    def project(self, level: int, s_embed: jnp.ndarray) -> jnp.ndarray:
        return self.winv_orig[level] * ell_apply(self.G[level], s_embed)

    transfer = project  # reference: L2ProjectionPDESampler::Transfer

    def eval(self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None):
        # Project the Gaussian field, then exponentiate (the reference
        # applies exp after the projection, L2ProjectionPDESampler.cpp
        # :595-611).
        s = self.project(level, self._eval_gaussian(level, xi, xi_level))
        return jnp.exp(s) if self.lognormal else s

    def embed_eval(self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None):
        s = self._eval_gaussian(level, xi, xi_level)
        return jnp.exp(s) if self.lognormal else s


class UnstructuredDarcySolver:
    """Mixed Darcy forward model on simplicial meshes: batched MINRES on the
    saddle system with a Jacobi/approximate-Schur block-diagonal
    preconditioner (the reference's MINRES-BJ-GS analog for unstructured
    meshes). QoI functionals and forcing are assembled on the finest level
    and restricted through the exact block prolongator transposes, like the
    structured DarcySolver."""

    def __init__(
        self,
        hierarchy: Union[SimplicialHierarchy, SimplicialLevel],
        config: ProblemConfig,
        dtype=jnp.float32,
    ):
        self.hierarchy = _as_hierarchy(hierarchy)
        self.config = config
        self.dtype = dtype
        levels = self.hierarchy.levels
        d = levels[0].mesh.dim
        nb = max(int(max(l.bdr_attr.max() for l in levels)), 1)

        def attr_vec(v):
            out = np.zeros(nb, dtype=np.int64)
            out[: min(len(v), nb)] = np.asarray(v[:nb], dtype=np.int64)
            return out

        ess_attr = attr_vec(config.ess_attr)
        obs_attr = attr_vec(config.obs_attr)
        inflow_attr = attr_vec(config.inflow_attr)

        # Finest-level rhs and QoI functionals.
        fine = levels[0]
        on = fine.bdr_attr > 0
        attr0 = np.maximum(fine.bdr_attr - 1, 0)
        rhs_u0 = np.zeros(fine.n_u)
        rhs_u0[on & (inflow_attr[attr0] == 1)] = -1.0  # weak p_bar = 1 inflow
        obs0 = np.zeros(fine.n_u + fine.n_s)
        if config.qoi == "eff_perm":
            obs0[: fine.n_u][on & (obs_attr[attr0] == 1)] = 1.0
        elif config.qoi == "p_int":
            obs0[fine.n_u:] = -fine.W
        elif config.qoi == "local_avg_p":
            conn = np.stack(fine.mesh.elements)
            centers = fine.mesh.vertices[conn].mean(axis=1)
            mask = (
                np.abs(centers - np.asarray(config.qoi_point)[None, :d]).max(axis=1)
                <= config.qoi_eps
            )
            obs0[fine.n_u:] = np.where(mask, -fine.W, 0.0)
        else:
            raise ValueError(f"unknown QoI '{config.qoi}'")

        rhs_np = [np.concatenate([rhs_u0, np.zeros(fine.n_s)])]
        obs_np = [obs0]
        for l in range(self.hierarchy.nlevels - 1):
            P_rt = self.hierarchy.P_rt[l]
            P_l2 = self.hierarchy.p_l2(l)
            for vecs in (rhs_np, obs_np):
                vu = P_rt.T @ vecs[l][: levels[l].n_u]
                vp = P_l2.T @ vecs[l][levels[l].n_u:]
                vecs.append(np.concatenate([vu, vp]))

        self._lv = []
        for l, lvl in enumerate(levels):
            ess = lvl.ess_faces(ess_attr)
            m_vals = lvl.m_vals.copy()
            m_vals[ess, :] = 0.0
            m_vals = np.where(ess[lvl.m_cols], 0.0, m_vals)
            fs = lvl.face_signs.copy()
            fs[ess, :] = 0.0
            r = rhs_np[l].copy()
            r[: lvl.n_u][ess] = 0.0
            self._lv.append(
                dict(
                    n_u=lvl.n_u,
                    n_s=lvl.n_s,
                    ess=jnp.asarray(ess),
                    m_op=pack_coef_ell(lvl.m_cols, m_vals, lvl.m_cells, dtype),
                    m_diag=coef_diag_structure(lvl.m_cols, m_vals, lvl.m_cells, dtype),
                    cell_faces=jnp.asarray(lvl.cell_faces, dtype=jnp.int32),
                    cell_signs=jnp.asarray(
                        np.where(ess[lvl.cell_faces], 0.0, lvl.cell_signs), dtype=dtype
                    ),
                    face_cells=jnp.asarray(lvl.face_cells, dtype=jnp.int32),
                    face_signs=jnp.asarray(fs, dtype=dtype),
                    rhs=jnp.asarray(r, dtype=dtype),
                    obs=jnp.asarray(obs_np[l], dtype=dtype),
                )
            )
        self.solver_cfg = config.darcy_solver

    def num_dofs(self, level: int = 0) -> int:
        L = self._lv[level]
        return int(L["n_u"] + L["n_s"])

    def nnz(self, level: int = 0) -> int:
        L = self._lv[level]
        return int(np.sum(np.asarray(L["m_op"].mvals) != 0)) + 2 * int(
            np.sum(np.asarray(L["cell_signs"]) != 0)
        )

    def solve_fwd(self, level: int, w: jnp.ndarray, return_pressure: bool = False):
        L = self._lv[level]
        n_u = int(L["n_u"])
        ess = L["ess"]

        def apply_A(x):
            u, p = x[..., :n_u], x[..., n_u:]
            Mu = coef_ell_apply(L["m_op"], w, u)
            Btp = _bt_gather(L["face_cells"], L["face_signs"], p)
            yu = jnp.where(ess, u, Mu + Btp)
            Bu = _b_gather(L["cell_faces"], L["cell_signs"], u)
            return jnp.concatenate([yu, Bu], axis=-1)

        dM = jnp.where(ess, 1.0, L["m_diag"](w))
        inv_dM = 1.0 / dM
        gathered = jnp.take(inv_dM, L["cell_faces"].reshape(-1), axis=-1).reshape(
            inv_dM.shape[:-1] + L["cell_faces"].shape
        )
        dS = jnp.sum(gathered * (L["cell_signs"] ** 2), axis=-1)
        inv_dS = 1.0 / jnp.maximum(dS, 1e-30)

        def prec(r):
            return jnp.concatenate(
                [r[..., :n_u] * inv_dM, r[..., n_u:] * inv_dS], axis=-1
            )

        b = jnp.broadcast_to(L["rhs"], w.shape[:-1] + L["rhs"].shape)
        x, info = minres(
            apply_A,
            b,
            prec=prec,
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
        )
        Q = jnp.sum(x * L["obs"], axis=-1)
        cost = float(self.num_dofs(level))
        if return_pressure:
            return Q, cost, info, -x[..., n_u:]
        return Q, cost, info
