"""Samplers and Darcy solver on unstructured simplicial meshes.

Brings the reference's unstructured-mesh configurations (square.mesh,
cube_tet.mesh, circle.mesh, ... - the meshes its CTest suite runs on) into
the framework: the SPDE Matern sampler and the mixed Darcy forward model on
triangles/tets, on top of fem.simplicial's operator bundles and the generic
batched device machinery (ELL gathers + PCG/MINRES). Multilevel hierarchies
come from nested uniform refinement (fem/simplicial_hierarchy.py) with
exact RT0/P0 interlevel embeddings, so these classes compose with the full
MLMC and Bayesian manager stack; algebraic agglomeration of a *given* fine
mesh (the ParELAG AMGe analog, with minimum-energy coarse RT bases) lives
in fem/agglomeration.py and plugs in through the same hierarchy duck type
(config.unstructured_coarsening).

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
        A_csr: List[sp.csr_matrix] = []
        ess_list: List[np.ndarray] = []
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
            A_csr.append(A)
            ess_list.append(ess)
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
        # Geometric-MG preconditioner over the hierarchy's own exact RT
        # prolongators (reference analog: CG + hypre ADS on the reduced
        # H(div) system, src/PDESampler_Legacy.cpp:169-235). The V-cycle for
        # level l runs over levels l..L with essential rows/cols masked out
        # of the interlevel transfers.
        self._mg = [None] * self.hierarchy.nlevels
        if self.solver_cfg.name == "cg-mg" and self.hierarchy.nlevels > 1:
            from parelagmc_tpu.ops.multigrid import build_mg_hierarchy

            P_masked = []
            for l, P in enumerate(self.hierarchy.P_rt):
                Zf = sp.diags((~ess_list[l]).astype(np.float64))
                Zc = sp.diags((~ess_list[l + 1]).astype(np.float64))
                P_masked.append((Zf @ P @ Zc).tocsr())
            for l in range(self.hierarchy.nlevels - 1):
                # GALERKIN coarse operators (RAP of the fine assembled A):
                # the assembled coarse systems are NOT variationally
                # consistent with these transfers - the reduced system's
                # B^T W^{-1} B term projects to B_c^T (P_l2^T W^{-1} P_l2)
                # B_c, which differs from the assembled W_c^{-1} scaling by
                # the agglomerate cell count; using assembled coarse mats
                # makes the V-cycle diverge on agglomerated hierarchies.
                mats = [A_csr[l]]
                for P in P_masked[l:]:
                    Ac = (P.T @ mats[-1] @ P).tocsr()
                    # Re-pin eliminated coarse dofs (zero rows after RAP).
                    dz = np.asarray(Ac.diagonal()) == 0.0
                    if dz.any():
                        Ac = Ac + sp.diags(dz.astype(np.float64))
                    mats.append(Ac)
                self._mg[l] = build_mg_hierarchy(
                    mats, P_masked[l:], dtype, omega="spectral",
                    coarse_sweeps=self.solver_cfg.mg_coarse_sweeps,
                )
        # P_l2^T restrictions as ELLs (coarse rows <- fine entries).
        self._restrict = [
            pack_csr_to_ell(self.hierarchy.p_l2(l).T.tocsr(), dtype)
            for l in range(self.hierarchy.nlevels - 1)
        ]
        # RT prolongations (fine faces <- coarse faces) for warm-started
        # coupled pair evaluations (reference: PDESampler.cpp:451-516 seeds
        # the fine solve with the prolongated coarse solution).
        self._prolong_rt = [
            pack_csr_to_ell(P.tocsr(), dtype) for P in self.hierarchy.P_rt
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

    def _noise_load(self, level: int, xi: jnp.ndarray, xi_level: int):
        """White-noise load b = g W^{1/2} xi at xi_level, restricted to level."""
        b = self.g * self._lv[xi_level]["w_sqrt"] * xi
        for l in range(xi_level, level):
            b = ell_apply(self._restrict[l], b)
        return b

    def _solve_u(self, level: int, b: jnp.ndarray, x0=None):
        L = self._lv[level]
        rhs_u = -(1.0 / self.alpha) * _bt_gather(
            L["face_cells"], L["face_signs"], L["winv"] * b
        )
        if self._mg[level] is not None:
            from parelagmc_tpu.ops.multigrid import v_cycle

            mg = self._mg[level]
            prec = lambda r: v_cycle(mg, r)
        else:
            prec = lambda r: r * L["dinv"]
        u, info = pcg(
            lambda v: ell_apply(L["A"], v),
            rhs_u,
            prec=prec,
            x0=x0,
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
            restart_every=self.solver_cfg.restart_every,
        )
        return u

    def _field_from(self, level: int, u: jnp.ndarray, b: jnp.ndarray):
        L = self._lv[level]
        Bu = _b_gather(L["cell_faces"], L["cell_signs"], u)
        return (1.0 / self.alpha) * (L["winv"] * (Bu + b))

    def _eval_gaussian(
        self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None
    ):
        if xi_level is None:
            xi_level = level
        assert xi_level <= level
        b = self._noise_load(level, xi, xi_level)
        u = self._solve_u(level, b)
        return self._field_from(level, u, b)

    def _eval_gaussian_pair(self, level: int, xi: jnp.ndarray):
        """Coupled (fine, coarse) Gaussian fields with shared noise: the
        coarse system is solved first and its velocity prolongated as the
        fine solve's initial iterate (reference PDESampler.cpp:451-516) -
        a free reduction in fine PCG iterations."""
        b_f = self._noise_load(level, xi, level)
        b_c = ell_apply(self._restrict[level], b_f)
        u_c = self._solve_u(level + 1, b_c)
        u0 = ell_apply(self._prolong_rt[level], u_c)
        ess = self._lv[level]["face_signs"][:, 0] == 0.0  # eliminated rows
        u0 = jnp.where(ess, 0.0, u0)
        u_f = self._solve_u(level, b_f, x0=u0)
        return (
            self._field_from(level, u_f, b_f),
            self._field_from(level + 1, u_c, b_c),
        )

    def eval_pair(self, level: int, xi: jnp.ndarray):
        s_f, s_c = self._eval_gaussian_pair(level, xi)
        if self.lognormal:
            return jnp.exp(s_f), jnp.exp(s_c)
        return s_f, s_c

    def nnz(self, level: int = 0) -> int:
        return int(np.sum(np.asarray(self._lv[level]["A"].vals) != 0))


class UnstructuredEmbeddedSPDESampler(UnstructuredSPDESampler):
    """Matching-mesh embedded SPDE sampler on unstructured meshes: the SPDE
    is solved on the enlarged mesh and the field restricted to the original
    domain by the per-level materialId 0/1 selection - the reference's
    EmbeddedPDESampler (src/EmbeddedPDESampler.cpp:58-89: embedded cells
    with attribute 1 correspond 1:1, in element order, to the original
    mesh). Removes the boundary variance inflation of the plain sampler
    without any mortar geometry.

    `selection[l]` maps original-mesh cell -> embedded-mesh cell at level l
    (built by build_embedded_simplicial_hierarchies)."""

    def __init__(
        self,
        orig_hierarchy: Union[SimplicialHierarchy, SimplicialLevel],
        embed_hierarchy: Union[SimplicialHierarchy, SimplicialLevel],
        selection: List[np.ndarray],
        config: ProblemConfig,
        dtype=jnp.float32,
    ):
        super().__init__(embed_hierarchy, config, dtype)
        self.orig_hierarchy = _as_hierarchy(orig_hierarchy)
        assert self.orig_hierarchy.nlevels == self.hierarchy.nlevels == len(selection)
        self.selection = [jnp.asarray(s, dtype=jnp.int32) for s in selection]

    def field_size(self, level: int) -> int:
        return self.orig_hierarchy.levels[level].n_s

    def eval(self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None):
        s = jnp.take(
            self._eval_gaussian(level, xi, xi_level), self.selection[level], axis=-1
        )
        return jnp.exp(s) if self.lognormal else s

    def embed_eval(self, level: int, xi: jnp.ndarray, xi_level: Optional[int] = None):
        s = self._eval_gaussian(level, xi, xi_level)
        return jnp.exp(s) if self.lognormal else s

    def eval_pair(self, level: int, xi: jnp.ndarray):
        s_f, s_c = self._eval_gaussian_pair(level, xi)
        s_f = jnp.take(s_f, self.selection[level], axis=-1)
        s_c = jnp.take(s_c, self.selection[level + 1], axis=-1)
        if self.lognormal:
            return jnp.exp(s_f), jnp.exp(s_c)
        return s_f, s_c


def match_embedded_cells(orig: GeneralMesh, embed: GeneralMesh, tol=1e-10) -> np.ndarray:
    """Original cell -> embedded cell map via materialId 1 (the reference's
    in-element-order correspondence, src/MeshUtilities.cpp:186-266),
    verified geometrically by centroid agreement."""
    sel = np.nonzero(embed.attributes == 1)[0]
    if sel.size != len(orig.elements):
        raise ValueError(
            f"embedded mesh has {sel.size} material-1 cells, original has "
            f"{len(orig.elements)}: not a matching embedding"
        )
    oc = orig.vertices[np.stack(orig.elements)].mean(axis=1)
    ec = embed.vertices[np.stack(embed.elements)].mean(axis=1)
    err = float(np.abs(ec[sel] - oc).max())
    if err > tol:
        raise ValueError(
            f"material-1 cells do not match the original mesh in element "
            f"order (max centroid error {err:.2e})"
        )
    return sel


def build_embedded_simplicial_hierarchies(
    orig_gm: GeneralMesh,
    embed_gm: GeneralMesh,
    nlevels: int,
    unstructured_coarsening: bool = False,
    coarsening_factor: int = 8,
):
    """Aligned (orig, embed) hierarchies + per-level selection maps.

    * Refinement mode: both meshes refine in lockstep; children enumerate
      parent-major, so the fine selection is sel_f[o*nc + k] = sel_c[o]*nc + k.
    * Agglomeration mode (the reference's EmbeddedBuildTopology with
      material-interface-preserving LogicalPartitioner,
      src/Utilities.cpp:42-123): partition the embedded fine mesh with
      material-crossing edges removed, so every agglomerate is purely
      inside or outside; the original hierarchy inherits the induced
      partition of its twin cells and the coarse selection maps original
      agglomerate -> embedded agglomerate.
    """
    from parelagmc_tpu.fem.agglomeration import (
        _cell_adjacency,
        _level_cell_centers,
        agglomerate_level,
        partition_cells,
    )
    from parelagmc_tpu.fem.simplicial import build_simplicial_level
    from parelagmc_tpu.fem.simplicial_hierarchy import build_simplicial_hierarchy

    sel0 = match_embedded_cells(orig_gm, embed_gm)

    if not unstructured_coarsening:
        orig_h = build_simplicial_hierarchy(orig_gm, nlevels)
        embed_h = build_simplicial_hierarchy(embed_gm, nlevels)
        d = orig_gm.dim
        nc = 4 if d == 2 else 8
        selection = [sel0]
        for _ in range(nlevels - 1):
            prev = selection[-1]
            selection.append(
                (prev[:, None] * nc + np.arange(nc)[None, :]).reshape(-1)
            )
        selection = selection[::-1]  # finest first (level 0)
        return orig_h, embed_h, selection

    # --- agglomeration mode ---------------------------------------------------
    orig_levels = [build_simplicial_level(orig_gm)]
    embed_levels = [build_simplicial_level(embed_gm)]
    orig_P, embed_P = [], []
    orig_parents, embed_parents = [], []
    selection = [sel0]
    material = np.asarray(embed_gm.attributes) == 1
    for _ in range(nlevels - 1):
        el = embed_levels[-1]
        adj = _cell_adjacency(el).tocoo()
        keep = material[adj.row] == material[adj.col]
        adj_cut = sp.csr_matrix(
            (adj.data[keep], (adj.row[keep], adj.col[keep])), shape=adj.shape
        )
        e_labels = partition_cells(adj_cut, _level_cell_centers(el), coarsening_factor)
        # Sanity: agglomerates never straddle the material interface.
        assert (
            np.intersect1d(
                np.unique(e_labels[material]), np.unique(e_labels[~material])
            ).size
            == 0
        ), "agglomerate straddles the material interface"
        e_coarse, e_P = agglomerate_level(el, e_labels)
        # Induced original partition via the twin cells.
        sel = selection[-1]
        o_labels_raw = e_labels[sel]
        uniq, o_labels = np.unique(o_labels_raw, return_inverse=True)
        o_coarse, o_P = agglomerate_level(orig_levels[-1], o_labels)
        embed_levels.append(e_coarse)
        orig_levels.append(o_coarse)
        embed_P.append(e_P)
        orig_P.append(o_P)
        embed_parents.append(e_labels)
        orig_parents.append(o_labels)
        selection.append(uniq)  # original agg i -> embedded agg uniq[i]
        material = np.zeros(e_coarse.n_s, dtype=bool)
        material[uniq] = True
    orig_h = SimplicialHierarchy(levels=orig_levels, parent=orig_parents, P_rt=orig_P)
    embed_h = SimplicialHierarchy(
        levels=embed_levels, parent=embed_parents, P_rt=embed_P
    )
    return orig_h, embed_h, selection


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
        self.projection_order = int(getattr(config, "projection_order", 0))
        self.G = []
        self.winv_orig = []
        self._cell_verts = []  # order-1 path: (nc, d+1) vertex gather per level
        for l in range(self.orig_hierarchy.nlevels):
            om = self.orig_hierarchy.levels[l]
            em = self.hierarchy.levels[l]
            if self.projection_order == 1:
                # Higher-order master space (round-2 VERDICT item 9): the
                # embedded P0 field is L2-projected onto the original
                # mesh's P1 vertex space through the exact mixed mortar
                # coupling (lumped P1 mass, so constants transfer exactly),
                # then reduced to the P0 coefficient by exact cell
                # averaging (mean of the d+1 vertex values on a simplex).
                from parelagmc_tpu.transfer_integrators import mortar_p1_p0_couple

                G, lump = mortar_p1_p0_couple(om.mesh, em.mesh)
                covered = np.asarray(G.sum(axis=1)).ravel()
                if not np.allclose(covered, lump, rtol=1e-8):
                    raise ValueError(
                        "No intersection, no transfer! (level %d)" % l)
                self.G.append(pack_csr_to_ell(G, dtype))
                self.winv_orig.append(jnp.asarray(1.0 / lump, dtype=dtype))
                self._cell_verts.append(
                    jnp.asarray(np.stack(om.mesh.elements), dtype=jnp.int32))
            else:
                G = mortar_p0_couple(om.mesh, em.mesh)
                covered = np.asarray(G.sum(axis=1)).ravel()
                if not np.allclose(covered, om.W, rtol=1e-8):
                    raise ValueError(
                        "No intersection, no transfer! (level %d)" % l)
                self.G.append(pack_csr_to_ell(G, dtype))
                self.winv_orig.append(jnp.asarray(1.0 / om.W, dtype=dtype))
                self._cell_verts.append(None)

    def field_size(self, level: int) -> int:
        return self.orig_hierarchy.levels[level].n_s

    def transfer_velocity(
        self,
        level: int,
        u_embed: jnp.ndarray,
        rtol: float = 1e-8,
        max_iterations: int = 60,
    ):
        """Mortar L2 projection of an RT0 (H(div)) velocity/flux field from
        the embedded mesh to the original mesh:

            v = CG(M_orig)^{-1} . B_rt . u_embed

        - the reference's ParMortarAssembler::Transfer with is_vector_fe
        (ParMortarAssembler.cpp:1146-1255: dest = CG(D)^{-1} B src with D
        the slave-space VectorFEMass matrix), its element-pair integrals
        being VectorL2MortarIntegrator (MortarIntegrator.hpp:77-111).
        B_rt is assembled once on host by the exact closed-form RT0-RT0
        mortar integrator over the native mesh intersection
        (transfer_integrators.mortar_rt0_couple) and applied as a static
        ELL operator; the well-conditioned RT0 mass is inverted by
        Jacobi-PCG on device. Returns (v, SolveInfo).

        `u_embed` is (n_u_embed,) or (batch, n_u_embed) in the embedded
        level's face-dof numbering; the result is in the original level's.
        """
        ops = getattr(self, "_vel_ops", None)
        if ops is None:
            ops = self._vel_ops = {}
        if level not in ops:
            from parelagmc_tpu.transfer_integrators import mortar_rt0_couple

            ol = self.orig_hierarchy.levels[level]
            el = self.hierarchy.levels[level]
            B = mortar_rt0_couple(ol, el).tocsr()
            M = ol.mass_csr().tocsr()
            ops[level] = (
                pack_csr_to_ell(B, self.dtype),
                pack_csr_to_ell(M, self.dtype),
                jnp.asarray(1.0 / M.diagonal(), dtype=self.dtype),
            )
        B_ell, M_ell, dinv = ops[level]
        rhs = ell_apply(B_ell, u_embed)
        v, info = pcg(
            lambda x: ell_apply(M_ell, x),
            rhs,
            prec=lambda r: dinv * r,
            max_iters=max_iterations,
            rtol=rtol,
        )
        return v, info

    def project(self, level: int, s_embed: jnp.ndarray) -> jnp.ndarray:
        s_v = self.winv_orig[level] * ell_apply(self.G[level], s_embed)
        if self.projection_order == 1:
            return jnp.mean(s_v[..., self._cell_verts[level]], axis=-1)
        return s_v

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

    def eval_pair(self, level: int, xi: jnp.ndarray):
        s_f, s_c = self._eval_gaussian_pair(level, xi)
        s_f = self.project(level, s_f)
        s_c = self.project(level + 1, s_c)
        if self.lognormal:
            return jnp.exp(s_f), jnp.exp(s_c)
        return s_f, s_c


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
        sbar_csr: List[sp.csr_matrix] = []
        self._coef_mg = [None] * self.hierarchy.nlevels
        for l, lvl in enumerate(levels):
            ess = lvl.ess_faces(ess_attr)
            if config.darcy_solver.name in ("minres-coefmg", "hybrid-cg"):
                # Per-sample Galerkin Schur MG below this MLMC level: the
                # AMGe-style graph variant (agglomerated parents, exact
                # Galerkin face-form collapse) - works on any simplicial /
                # agglomerated / curved mesh. See ops/coef_multigrid.py.
                from parelagmc_tpu.fem.agglomeration import _level_cell_centers
                from parelagmc_tpu.ops.coef_multigrid import build_coef_mg_graph

                fs_m = lvl.face_signs.copy()
                fs_m[ess, :] = 0.0
                self._coef_mg[l] = build_coef_mg_graph(
                    lvl.face_cells,
                    fs_m,
                    _level_cell_centers(lvl),
                    dtype=dtype,
                    cutoff=config.darcy_solver.coarse_dense_cutoff,
                    coarse_sweeps=max(1, config.darcy_solver.mg_coarse_sweeps),
                )
            m_vals = lvl.m_vals.copy()
            m_vals[ess, :] = 0.0
            m_vals = np.where(ess[lvl.m_cols], 0.0, m_vals)
            fs = lvl.face_signs.copy()
            fs[ess, :] = 0.0
            r = rhs_np[l].copy()
            r[: lvl.n_u][ess] = 0.0
            # Static approximate pressure Schur S_bar = B diag(M)^{-1} B^T
            # (unit coefficient) for the MG pressure-block preconditioner.
            diag_rows = np.where(lvl.m_cols == np.arange(lvl.n_u)[:, None], m_vals, 0.0)
            dM1 = np.maximum(diag_rows.sum(axis=1), 0.0)
            dinv1 = np.where(ess | (dM1 <= 0), 0.0, 1.0 / np.maximum(dM1, 1e-300))
            Bm = sp.csr_matrix(
                (
                    np.where(ess[lvl.cell_faces], 0.0, lvl.cell_signs).ravel(),
                    (
                        np.repeat(np.arange(lvl.n_s), lvl.cell_faces.shape[1]),
                        lvl.cell_faces.ravel(),
                    ),
                ),
                shape=(lvl.n_s, lvl.n_u),
            )
            sbar_csr.append((Bm @ sp.diags(dinv1) @ Bm.T).tocsr())
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
        # Mean-field warm starts (config.meanfield_x0, cf. physics/darcy.py
        # _meanfield_start): per-level cached w == 1 reference solution -
        # the saddle vector for MINRES levels, the trace multiplier for
        # hybridized levels.
        self._mf_cache = {}
        self._mf_building: set = set()
        # Hybridized SPD fast path ("hybrid-cg"): element-local condensation
        # to the face-multiplier system, per-sample coefficient entering as
        # an exact 1/w_e rescaling of the unit element blocks (the
        # reference's fast configuration, src/DarcySolver.cpp:562-649; see
        # physics/hybrid.py). Levels without simplicial element geometry
        # (agglomerated coarse levels) keep the MINRES path.
        self._hybrid = [None] * self.hierarchy.nlevels
        if config.darcy_solver.name == "hybrid-cg":
            from parelagmc_tpu.physics.hybrid import (
                build_hybrid_level,
                build_hybrid_level_algebraic,
            )

            for l, lvl in enumerate(levels):
                h = build_hybrid_level(
                    lvl, lvl.ess_faces(ess_attr), rhs_np[l], obs_np[l], dtype
                )
                if h is None:
                    # Agglomerated levels: algebraic hybridization from the
                    # per-agglomerate Galerkin mass blocks (round 5; the
                    # MINRES fallback cost ~5x the hybrid iterations).
                    h = build_hybrid_level_algebraic(
                        lvl, lvl.ess_faces(ess_attr), rhs_np[l], obs_np[l],
                        dtype,
                    )
                self._hybrid[l] = h
        # Block prolongations for warm-started pair solves.
        self._prolong_rt = [
            pack_csr_to_ell(P.tocsr(), dtype) for P in self.hierarchy.P_rt
        ]
        self._parent_dev = [
            jnp.asarray(p, dtype=jnp.int32) for p in self.hierarchy.parent
        ]
        # Geometric MG on the static pressure Schur complement over the
        # hierarchy's P0 prolongators - replaces the diagonal Schur
        # approximation when darcy_solver.name == "minres-mg" (reference
        # analog: BoomerAMG on S in DarcySolver_Legacy.cpp:499-534).
        self._schur_mg = [None] * self.hierarchy.nlevels
        if self.solver_cfg.name == "minres-mg" and self.hierarchy.nlevels > 1:
            from parelagmc_tpu.ops.multigrid import build_mg_hierarchy

            p_l2 = [
                self.hierarchy.p_l2(l).tocsr()
                for l in range(self.hierarchy.nlevels - 1)
            ]
            for l in range(self.hierarchy.nlevels - 1):
                # Galerkin RAP coarse Schur operators (see the sampler MG
                # note above on variational consistency).
                mats = [sbar_csr[l]]
                for P in p_l2[l:]:
                    Sc = (P.T @ mats[-1] @ P).tocsr()
                    dz = np.asarray(Sc.diagonal()) == 0.0
                    if dz.any():
                        Sc = Sc + sp.diags(dz.astype(np.float64))
                    mats.append(Sc)
                self._schur_mg[l] = build_mg_hierarchy(
                    mats, p_l2[l:], dtype, omega="spectral",
                    coarse_sweeps=self.solver_cfg.mg_coarse_sweeps,
                )

    def num_dofs(self, level: int = 0) -> int:
        L = self._lv[level]
        return int(L["n_u"] + L["n_s"])

    def nnz(self, level: int = 0) -> int:
        L = self._lv[level]
        return int(np.sum(np.asarray(L["m_op"].mvals) != 0)) + 2 * int(
            np.sum(np.asarray(L["cell_signs"]) != 0)
        )

    def solve_fwd_pair(self, level: int, w_f: jnp.ndarray, w_c: jnp.ndarray):
        """Coupled (fine, coarse) solves with the fine MINRES warm-started
        from the block-prolongated coarse solution [P_rt u_c; P_l2 p~_c]
        (reference: MLMC_Manager.cpp:150-156 + DarcySolver SolveFwd with
        initial iterate). Returns (q, qc, info_f, info_c)."""
        if self._hybrid[level] is not None:
            # Hybridized solves recover (u, p~) element-locally; the coarse
            # saddle iterate is not materialized, so the pair runs as two
            # independent SPD solves (cold fine start - the hybrid fine
            # solve at ~30 iterations costs less than a warm MINRES one).
            qc, _, info_c = self.solve_fwd(level + 1, w_c)
            q, _, info_f = self.solve_fwd(level, w_f)
            return q, qc, info_f, info_c
        qc, _, info_c, x_c = self.solve_fwd(
            level + 1, w_c, return_pressure=False, return_solution=True
        )
        n_uc = int(self._lv[level + 1]["n_u"])
        u0 = ell_apply(self._prolong_rt[level], x_c[..., :n_uc])
        u0 = jnp.where(self._lv[level]["ess"], 0.0, u0)
        p0 = jnp.take(x_c[..., n_uc:], self._parent_dev[level], axis=-1)
        x0 = jnp.concatenate([u0, p0], axis=-1)
        q, _, info_f = self.solve_fwd(level, w_f, x0=x0)
        return q, qc, info_f, info_c

    def _coefmg_cycle(self, level: int, w: jnp.ndarray):
        """Per-sample Galerkin coefficient-MG V-cycle r -> z for this
        sample's masked mass diagonal, or None when the level has no coef
        MG. Shared by the hybrid aux-space preconditioner and the MINRES
        pressure-block preconditioner so the masking rule stays in one
        place (review r3)."""
        if self._coef_mg[level] is None:
            return None
        from parelagmc_tpu.ops.coef_multigrid import (
            coef_mg_dinvs,
            coef_mg_idiags,
            coef_v_cycle,
        )

        L = self._lv[level]
        mg = self._coef_mg[level]
        diag_w = L["m_diag"](w)
        dinv0 = jnp.where(
            (diag_w > 0) & ~L["ess"],
            1.0 / jnp.where(diag_w == 0, 1.0, diag_w),
            0.0,
        )
        dinvs = coef_mg_dinvs(mg, dinv0)
        idiags = coef_mg_idiags(mg, dinvs)
        return lambda r: coef_v_cycle(mg, dinvs, r, idiags=idiags)

    def solve_fwd(
        self,
        level: int,
        w: jnp.ndarray,
        return_pressure: bool = False,
        x0=None,
        return_solution: bool = False,
    ):
        mf = (
            getattr(self.solver_cfg, "meanfield_x0", False)
            and level not in self._mf_building
        )
        if (
            self._hybrid[level] is not None
            and x0 is None
            and not return_solution
        ):
            from parelagmc_tpu.physics.hybrid import hybrid_solve

            aux_cycle = self._coefmg_cycle(level, w)
            lam0 = None
            if mf:
                lam_ref = self._meanfield_start(level)
                lam0 = jnp.broadcast_to(
                    lam_ref, w.shape[:-1] + lam_ref.shape[-1:]
                )
            Q, info, pe = hybrid_solve(
                self._hybrid[level],
                w,
                max_iters=self.solver_cfg.max_iterations,
                rtol=self.solver_cfg.relative_tolerance,
                atol=self.solver_cfg.absolute_tolerance,
                restart_every=self.solver_cfg.restart_every,
                aux_cycle=aux_cycle,
                lam0=lam0,
            )
            cost = float(self.num_dofs(level))
            if return_pressure:
                return Q, cost, info, -pe
            return Q, cost, info
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
        coefmg_cycle = self._coefmg_cycle(level, w)
        if coefmg_cycle is not None:

            def prec(r):
                zp = coefmg_cycle(r[..., n_u:])
                return jnp.concatenate([r[..., :n_u] * inv_dM, zp], axis=-1)

        elif self._schur_mg[level] is not None:
            from parelagmc_tpu.ops.multigrid import v_cycle

            mg = self._schur_mg[level]
            # Per-sample geometric-mean coefficient scale on the static
            # unit-coefficient Schur V-cycle (cf. physics/darcy.py).
            w_bar = jnp.exp(jnp.mean(jnp.log(w), axis=-1, keepdims=True))

            def prec(r):
                zp = w_bar * v_cycle(mg, r[..., n_u:])
                return jnp.concatenate([r[..., :n_u] * inv_dM, zp], axis=-1)

        else:
            gathered = jnp.take(
                inv_dM, L["cell_faces"].reshape(-1), axis=-1
            ).reshape(inv_dM.shape[:-1] + L["cell_faces"].shape)
            dS = jnp.sum(gathered * (L["cell_signs"] ** 2), axis=-1)
            inv_dS = 1.0 / jnp.maximum(dS, 1e-30)

            def prec(r):
                return jnp.concatenate(
                    [r[..., :n_u] * inv_dM, r[..., n_u:] * inv_dS], axis=-1
                )

        if x0 is None and mf:
            x_ref = self._meanfield_start(level)
            x0 = jnp.broadcast_to(x_ref, w.shape[:-1] + x_ref.shape[-1:])
        b = jnp.broadcast_to(L["rhs"], w.shape[:-1] + L["rhs"].shape)
        x, info = minres(
            apply_A,
            b,
            prec=prec,
            x0=x0,
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
        )
        Q = jnp.sum(x * L["obs"], axis=-1)
        cost = float(self.num_dofs(level))
        if return_solution:
            return Q, cost, info, x
        if return_pressure:
            return Q, cost, info, -x[..., n_u:]
        return Q, cost, info

    def _meanfield_start(self, level: int):
        """Mean-field initial iterate (config.meanfield_x0): one reference
        solve with w == 1 per level, cached - every cold solve then starts
        from it (the structured production default; measured 1.79x on the
        SPE10 coarsest level, physics/darcy.py _meanfield_start).

        MEASURED NEGATIVE on this unstructured stack (round 5, cube_tet
        refine-4 f32): the saddle/trace warm start does NOT transfer -
        cold coarse MINRES 370 -> 404 iterations with the full mean
        vector, 410 with pressure-only, and the L1 pair conv fraction
        dropped to 0.88; at contrast ~1e2 the mean-field velocity is far
        from the per-sample one and ||b - A x0|| exceeds ||b||. The flag
        therefore stays OFF by default for unstructured runs (the wiring
        exists for config parity); the shipped coarse-level fix is the
        algebraic hybridization (physics/hybrid.py
        build_hybrid_level_algebraic: 370 -> 54 pair iterations). For
        MINRES levels the cache holds the saddle vector; for hybridized
        levels the trace multiplier (hybrid_solve lam0). Runs under
        jax.ensure_compile_time_eval() because the first solve_fwd call is
        typically itself being traced (jit_hoisted manager steps), with
        the cached entry indexed INSIDE the scope (tracer-leak class, see
        the structured docstring). The `_mf_building` guard stops the
        setup solve from recursing into itself."""
        if level in self._mf_cache:
            return self._mf_cache[level]
        import jax

        self._mf_building.add(level)
        try:
            with jax.ensure_compile_time_eval():
                ones = jnp.ones((1, self._lv[level]["n_s"]), dtype=self.dtype)
                if self._hybrid[level] is not None:
                    from parelagmc_tpu.physics.hybrid import hybrid_solve

                    aux = self._coefmg_cycle(level, ones)
                    lam = None
                    for _ in range(8):
                        _, info, _, lam = hybrid_solve(
                            self._hybrid[level],
                            ones,
                            max_iters=self.solver_cfg.max_iterations,
                            rtol=self.solver_cfg.relative_tolerance,
                            atol=self.solver_cfg.absolute_tolerance,
                            restart_every=self.solver_cfg.restart_every,
                            aux_cycle=aux,
                            lam0=lam,
                            return_lam=True,
                        )
                        if bool(np.asarray(info.converged).all()):
                            break
                    entry = lam[0]
                else:
                    x = None
                    for _ in range(8):
                        _, _, info, x = self.solve_fwd(
                            level, ones, x0=x, return_solution=True
                        )
                        if bool(np.asarray(info.converged).all()):
                            break
                    entry = x[0]
        finally:
            self._mf_building.discard(level)
        self._mf_cache[level] = entry
        return entry
