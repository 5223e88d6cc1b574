"""Mixed Darcy forward model with per-sample permeability.

TPU-native analog of the reference's DarcySolver
(/root/reference/src/DarcySolver.{hpp,cpp}): per realization of the
coefficient field w (the velocity mass weight - the reference passes the
sampler output directly to ComputeMassOperator(uform, k),
src/DarcySolver.cpp:479), solve

    [[M(w), B^T], [B, 0]] [u; p~] = [rhs_u; rhs_p],

with essential velocity BCs (u.n fixed) on selected boundary attributes and
weak pressure data on the rest. We use the p~ = -p convention so the system
is symmetric with +B^T (matching the reference's block signs,
src/DarcySolver.cpp:481-485); all built-in QoIs are linear functionals of
(u, p~) and reproduce the reference's values.

Per-sample solve: batched preconditioned MINRES with the block-diagonal SPD
preconditioner

    P = diag( diag(M(w))^{-1},  w_bar * S(1)^{-1} ),

where S(1) = B M(1)^{-1} B^T is the *exact* reference-coefficient pressure
Schur complement applied by the tensor-product spectral solver
(ops/tensorsolve.py) and w_bar is the per-sample geometric mean of w (the
first-order scaling of S(w)^{-1}). This replaces the reference's
rebuild-AMG-per-sample MINRES-BJ-GS configuration
(src/DarcySolver.cpp:562-649): the preconditioner here is sample-independent
up to a scalar, so nothing is rebuilt inside the hot loop.

QoI functionals (reference src/DarcySolver.cpp:246-358), assembled on the
finest level and restricted through P^T exactly like the reference:
* eff_perm    - boundary flux through the observation boundary,
* p_int       - volume integral of pressure,
* local_avg_p - integral of pressure over cells marked near a point.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem.hierarchy import GeometricHierarchy
from parelagmc_tpu.ops.ell import (
    CoefELL,
    DiagCoef,
    coef_diag_structure,
    coef_ell_apply,
    pack_coef_ell,
)
from parelagmc_tpu.ops.mass_solve import MassTridiagSolver, build_mass_tridiag_solver
from parelagmc_tpu.ops.solvers import minres, pcg
from parelagmc_tpu.ops.tensorsolve import TensorEig, build_tensor_solver, tensor_solve


class DarcyLevel(NamedTuple):
    n_u: int
    n_s: int
    m_op: Optional[CoefELL]  # masked velocity mass ELL (ess rows/cols
    # zeroed); None for the Schur-CG solver family, which inverts M(w) by
    # the tridiagonal line solver and never applies the assembled mass
    m_diag: DiagCoef  # masked diagonal structure
    ess: jnp.ndarray  # (n_u,) bool
    cell_faces: jnp.ndarray  # (n_s, 2d) int32
    cell_signs: jnp.ndarray  # (n_s, 2d) masked signs (ess cols zeroed)
    face_cells: jnp.ndarray  # (n_u, 2) int32
    face_signs: jnp.ndarray  # (n_u, 2) masked signs (ess rows zeroed)
    rhs: jnp.ndarray  # (n_u + n_s,)
    obs_func: jnp.ndarray  # (n_u + n_s,)
    schur: TensorEig  # exact S(1) factors (alpha = 0, Darcy BCs)
    kinv_logmean: float  # log geometric mean of the static kinv_ref (0 if none)
    mass_solver: MassTridiagSolver  # exact M(w)^{-1} (tensor-grid tridiagonals)
    schur_mg: object  # Optional[MGHierarchy]: kinv-aware Schur preconditioner
    sbar_dinv: object  # Optional[(n_s,)]: 1/diag(S_bar) (cg-schur-diag variant)
    kinv_cell: object = None  # Optional[(n_s,)]: per-cell geomean of kinv_ref
    coef_mg: object = None  # Optional[CoefMG]: per-sample Galerkin Schur MG
    # Structured-incidence tables (tensor meshes): (shape, face_offsets,
    # per-axis float masks in face-grid layout). B/B^T become zero-padded
    # difference stencils (slices) instead of gathers - measured ~50x
    # cheaper at SPE10 level 0, where 3.4M-index takes defeat the TPU
    # vectorizer (same finding as ops/coef_multigrid_structured.py).
    b_struct: object = None


def _assemble_sbar(mesh, kinv, ess_attr):
    """Static variable-coefficient pressure Schur complement
    S_bar = B diag(M(1; kinv))^{-1} B^T as scipy CSR (the sample field w is
    a bounded lognormal multiplier on top of kinv, so S_bar captures the
    dominant - e.g. SPE10's ~1e6 - coefficient contrast)."""
    import scipy.sparse as sp

    from parelagmc_tpu.fem.assembly import build_mixed_level

    lvl = build_mixed_level(mesh)
    d = mesh.dim
    ess = lvl.ess_faces(np.asarray(ess_attr[: 2 * d], dtype=np.int64))
    face_ax = mesh.face_axis()
    mv = lvl.m_vals * kinv[lvl.m_cells, face_ax[:, None]]
    diag = mv[:, 0] + mv[:, 1]  # diag slots are first two by construction
    dinv = np.where(ess | (diag <= 0), 0.0, 1.0 / np.maximum(diag, 1e-300))
    signs = np.where(ess[lvl.cell_faces], 0.0, lvl.cell_signs)
    rows = np.repeat(np.arange(lvl.n_s), lvl.cell_faces.shape[1])
    B = sp.csr_matrix(
        (signs.ravel(), (rows, lvl.cell_faces.ravel())), shape=(lvl.n_s, lvl.n_u)
    )
    return (B @ sp.diags(dinv) @ B.T).tocsr()


def _parse_line_axes(spec: str, mesh, kinv) -> tuple:
    """config.coefmg_line_axes -> mesh-axis tuple. Letters x/y/z name the
    SOLVER mesh's axes (build_problem relabels the config string together
    with axis_order, so user-facing letters stay physical). "auto" keeps
    every axis whose kinv_ref-weighted mean face conductance (A / (h *
    kinv_axis), the 2-point-flux transmissibility) is >= 3x the weakest
    axis's mean - the same dominance rule as the static MG's line
    detection (DarcySolverConfig.mg_line_smoother)."""
    spec = (spec or "").strip().lower()
    if not spec:
        return ()
    d = len(mesh.shape)
    if spec == "auto":
        if kinv is None:
            return ()
        means = []
        for a in range(d):
            h = np.diff(np.asarray(mesh.axes[a]))
            vol = np.asarray(mesh.cell_volumes()).reshape(
                tuple(int(n) for n in mesh.shape[::-1])
            )
            hg = h.reshape((1,) * (d - 1 - a) + (-1,) + (1,) * a)
            area = vol / hg
            cond = area / (
                hg * np.asarray(kinv)[:, a].reshape(vol.shape)
            )
            means.append(float(cond.mean()))
        lo = min(means)
        return tuple(a for a in range(d) if means[a] >= 3.0 * lo)
    letters = {"x": 0, "y": 1, "z": 2}
    axes = []
    for ch in spec:
        if ch not in letters or letters[ch] >= d:
            raise ValueError(
                f"coefmg_line_axes {spec!r}: unknown axis {ch!r} for a "
                f"{d}-D mesh (use letters from 'xyz'[:d] or 'auto')"
            )
        axes.append(letters[ch])
    return tuple(axes)


def _build_coef_mg_level(mesh, ess, dtype, solver_cfg, kinv=None):
    """Static structure for the per-sample Galerkin Schur MG; the sample's
    coefficient enters at solve time through the masked mass diagonal.

    Tensor-product meshes get the slicing-only specialization
    (ops/coef_multigrid_structured.py - measured ~50x cheaper V-cycles
    at SPE10 level 0 than the gather formulation, which defeats the TPU
    vectorizer at millions of faces); coefmg_impl="gather" forces the
    generic tables (oracle / benchmarking)."""
    impl = getattr(solver_cfg, "coefmg_impl", "auto")
    if impl != "gather" and hasattr(mesh, "axes"):
        from parelagmc_tpu.ops.coef_multigrid_structured import (
            build_struct_coef_mg,
        )

        return build_struct_coef_mg(
            mesh,
            cutoff=solver_cfg.coarse_dense_cutoff,
            coarse_sweeps=max(1, solver_cfg.mg_coarse_sweeps),
            omega=getattr(solver_cfg, "coefmg_omega", 0.8),
            cheby_order=getattr(solver_cfg, "coefmg_cheby_order", 0),
            cheby_lo=getattr(solver_cfg, "coefmg_cheby_lo", 0.25),
            line_axes=_parse_line_axes(
                getattr(solver_cfg, "coefmg_line_axes", ""), mesh, kinv
            ),
            line_omega=getattr(solver_cfg, "coefmg_line_omega", 1.0),
            coarsen=getattr(solver_cfg, "coefmg_coarsen", "galerkin"),
        )
    from parelagmc_tpu.ops.coef_multigrid import build_coef_mg

    return build_coef_mg(
        mesh,
        np.asarray(ess),
        dtype=dtype,
        cutoff=solver_cfg.coarse_dense_cutoff,
        coarse_sweeps=max(1, solver_cfg.mg_coarse_sweeps),
        omega=getattr(solver_cfg, "coefmg_omega", 0.8),
        cheby_order=getattr(solver_cfg, "coefmg_cheby_order", 0),
        cheby_lo=getattr(solver_cfg, "coefmg_cheby_lo", 0.25),
    )


def _build_schur_mg(
    mesh,
    kinv,
    ess_attr,
    dtype,
    cutoff: int,
    coarse_sweeps: int = 0,
    line_smoother: bool = False,
):
    """Geometric multigrid hierarchy on S_bar: derefine below the MLMC level
    as far as needed, rediscretizing the coefficient by volume-weighted
    averaging, until the coarsest grid is dense-invertible. The TPU-native
    replacement for the reference's per-sample BoomerAMG on heterogeneous
    media (src/DarcySolver.cpp:562-649)."""
    from parelagmc_tpu.fem.hierarchy import axis_parent_map, derefine_axis
    from parelagmc_tpu.mesh.structured import StructuredMesh
    from parelagmc_tpu.ops.multigrid import build_mg_hierarchy

    import scipy.sparse as sp

    meshes = [mesh]
    kinvs = [np.asarray(kinv, dtype=np.float64)]
    while meshes[-1].num_cells > cutoff and max(meshes[-1].shape) > 2:
        prev = meshes[-1]
        coarse = StructuredMesh([derefine_axis(a) for a in prev.axes])
        maps = [axis_parent_map(prev.axes[a], coarse.axes[a]) for a in range(prev.dim)]
        idx = prev.cell_multi_index()
        par = coarse.cell_index(*[m[i] for m, i in zip(maps, idx)])
        Wf = prev.cell_volumes()
        acc = np.zeros((coarse.num_cells, kinvs[-1].shape[1]))
        np.add.at(acc, par, Wf[:, None] * kinvs[-1])
        kinvs.append(acc / coarse.cell_volumes()[:, None])
        meshes.append(coarse)
    mats = [_assemble_sbar(m, k, ess_attr) for m, k in zip(meshes, kinvs)]
    ps = []
    for l in range(len(meshes) - 1):
        maps = [
            axis_parent_map(meshes[l].axes[a], meshes[l + 1].axes[a])
            for a in range(meshes[l].dim)
        ]
        idx = meshes[l].cell_multi_index()
        par = meshes[l + 1].cell_index(*[m[i] for m, i in zip(maps, idx)])
        ps.append(
            sp.csr_matrix(
                (np.ones(meshes[l].num_cells), (np.arange(meshes[l].num_cells), par)),
                shape=(meshes[l].num_cells, meshes[l + 1].num_cells),
            )
        )
    return build_mg_hierarchy(
        mats,
        ps,
        dtype,
        coarse_sweeps=coarse_sweeps,
        line_shapes=[m.shape for m in meshes] if line_smoother else None,
    )


class DarcySolver:
    def __init__(
        self,
        hierarchy: GeometricHierarchy,
        config: ProblemConfig,
        dtype=jnp.float32,
        kinv_ref: Optional[np.ndarray] = None,
    ):
        """kinv_ref: optional static reference inverse permeability on the
        *finest* mesh, shape (n_s, dim) (per-axis, e.g. SPE10's anisotropic
        tensor) or (n_s,). It is coarsened by volume-weighted averaging and
        baked into the mass-matrix values per level; the per-sample field w
        then multiplies on top (the reference's k_over_k_ref semantics:
        SPE10_MLMC.cpp feeds InversePermeability as the deterministic
        integrator and the sampler field per sample)."""
        self.hierarchy = hierarchy
        self.config = config
        self.dtype = dtype
        self._mf_cache = {}  # per-level mean-field iterates (meanfield_x0)
        d = hierarchy.levels[0].dim
        self.ndim = d
        nb = 2 * d
        ess_attr = np.asarray(config.ess_attr[:nb], dtype=np.int64)
        obs_attr = np.asarray(config.obs_attr[:nb], dtype=np.int64)
        inflow_attr = np.asarray(config.inflow_attr[:nb], dtype=np.int64)

        # --- finest-level functionals, then restrict through P^T -----------
        fine = hierarchy.levels[0]
        n_u0, n_s0 = fine.n_u, fine.n_s
        bdr = fine.bdr_attr  # (n_u,) 0 = interior
        outward = self._outward_sign(fine)

        rhs_u0 = np.zeros(n_u0)
        on_inflow = (bdr > 0) & (inflow_attr[np.maximum(bdr - 1, 0)] == 1)
        # rhs_u[f] = -p_bar * outward_sign with the reference's inflow
        # pressure coefficient -1 => p_bar = +1 on the inflow boundary
        # (reference: examples/MLMC.cpp:227-239 BuildForcingTerms with
        # pinflow_coeff = -1; VectorFEBoundaryFluxLFIntegrator semantics).
        rhs_u0[on_inflow] = -1.0 * outward[on_inflow]
        rhs0 = np.concatenate([rhs_u0, np.zeros(n_s0)])

        obs0 = np.zeros(n_u0 + n_s0)
        if config.qoi == "eff_perm":
            on_obs = (bdr > 0) & (obs_attr[np.maximum(bdr - 1, 0)] == 1)
            obs0[:n_u0][on_obs] = outward[on_obs]
        elif config.qoi == "p_int":
            # integral of the physical pressure p = -p~.
            obs0[n_u0:] = -fine.W
        elif config.qoi == "local_avg_p":
            mesh0 = fine.mesh
            mask = (
                np.abs(
                    mesh0.cell_centers() - np.asarray(config.qoi_point)[None, :d]
                ).max(axis=1)
                <= config.qoi_eps
            )
            obs0[n_u0:] = np.where(mask, -fine.W, 0.0)
        else:
            raise ValueError(f"unknown QoI '{config.qoi}'")

        # --- static reference inverse permeability per level ----------------
        # Two constructions (config.coarse_operators):
        # * "galerkin" (default): coarse mass = exact RAP of the fine
        #   kinv-weighted mass through the *energy-adapted* RT embedding
        #   (per-line conductance flux weights), carried as per-(cell,
        #   axis) 2x2 blocks (fem/galerkin_mass.py) - the tensor analog of
        #   the reference's AMGe minimum-energy coarsening of the
        #   kinv-weighted sequence (src/DarcySolver.cpp:87-90,161-169);
        #   kinv_levels holds the blocks' effective coefficient for the
        #   preconditioner scalings only.
        # * "rediscretize": volume-weighted arithmetic averaging of kinv
        #   (round-1/2 behavior; at SPE10 contrast this defines a
        #   materially different coarse problem and was the measured cause
        #   of the missing MLMC variance decay).
        kinv_levels: List[Optional[np.ndarray]] = [None] * hierarchy.nlevels
        blocks_chain = None
        p_weights: List[Optional[List[np.ndarray]]] = [None] * (
            hierarchy.nlevels - 1
        )
        if kinv_ref is not None:
            kinv_ref = np.asarray(kinv_ref, dtype=np.float64)
            if kinv_ref.ndim == 1:
                kinv_ref = np.repeat(kinv_ref[:, None], d, axis=1)
            if getattr(config, "coarse_operators", "galerkin") == "galerkin":
                from parelagmc_tpu.fem.galerkin_mass import (
                    effective_kinv,
                    galerkin_block_chain,
                )

                blocks_chain, p_weights = galerkin_block_chain(
                    [lvl.mesh for lvl in hierarchy.levels], kinv_ref
                )
                kinv_levels = [
                    effective_kinv(hierarchy.levels[l].mesh, blocks_chain[l])
                    for l in range(hierarchy.nlevels)
                ]
            else:
                kinv_levels[0] = kinv_ref
                for l in range(hierarchy.nlevels - 1):
                    Wf = hierarchy.levels[l].W
                    Wc = hierarchy.levels[l + 1].W
                    coarse = np.zeros((hierarchy.levels[l + 1].n_s, d))
                    np.add.at(
                        coarse, hierarchy.parent[l], Wf[:, None] * kinv_levels[l]
                    )
                    kinv_levels[l + 1] = coarse / Wc[:, None]

        # Restrict rhs/obs by the exact block prolongator transpose (the
        # energy-adapted embedding when active, so the coarse functionals
        # are the true Galerkin restrictions of the fine ones).
        rhs_np: List[np.ndarray] = [rhs0]
        obs_np: List[np.ndarray] = [obs0]
        for l in range(hierarchy.nlevels - 1):
            if p_weights[l] is not None:
                from parelagmc_tpu.fem.galerkin_mass import (
                    weighted_rt_prolongator,
                )

                P_rt = weighted_rt_prolongator(
                    hierarchy.levels[l].mesh,
                    hierarchy.levels[l + 1].mesh,
                    p_weights[l],
                )
            else:
                P_rt = hierarchy.P_rt[l]
            P_l2 = hierarchy.p_l2(l)
            for vecs in (rhs_np, obs_np):
                vu = P_rt.T @ vecs[l][: hierarchy.levels[l].n_u]
                vp = P_l2.T @ vecs[l][hierarchy.levels[l].n_u:]
                vecs.append(np.concatenate([vu, vp]))

        # --- per-level device operators -------------------------------------
        self.levels: List[DarcyLevel] = []
        self._nnz: List[int] = []
        # The full mass ELL is only applied by the saddle-system (MINRES)
        # path; the Schur-CG family inverts M(w) by the tridiagonal line
        # solver and reads only the diagonal structure. Skipping the ELL
        # saves ~160 MB HBM at SPE10 scale (cols+vals+cells at 3.4M faces
        # x width 4; VERDICT r2 item 2).
        need_m_op = not config.darcy_solver.name.startswith("cg-schur")
        for l, lvl in enumerate(hierarchy.levels):
            ess = lvl.ess_faces(ess_attr)
            if blocks_chain is not None:
                from parelagmc_tpu.fem.galerkin_mass import blocks_to_ell_vals

                m_vals = blocks_to_ell_vals(lvl, blocks_chain[l])
            else:
                m_vals = lvl.m_vals.copy()
                if kinv_levels[l] is not None:
                    face_ax = lvl.mesh.face_axis()
                    m_vals = m_vals * kinv_levels[l][lvl.m_cells, face_ax[:, None]]
            m_vals[ess, :] = 0.0
            col_is_ess = ess[lvl.m_cols]
            m_vals = np.where(col_is_ess, 0.0, m_vals)
            cell_signs = np.where(ess[lvl.cell_faces], 0.0, lvl.cell_signs)
            face_signs = lvl.face_signs.copy()
            face_signs[ess, :] = 0.0
            rhs_l = rhs_np[l].copy()
            rhs_l[: lvl.n_u][ess] = 0.0  # zero essential data (reference default)
            self._nnz.append(
                int(np.sum(m_vals != 0))
                + 2 * int(np.sum(np.asarray(cell_signs) != 0))
            )
            self.levels.append(
                DarcyLevel(
                    n_u=lvl.n_u,
                    n_s=lvl.n_s,
                    m_op=(
                        pack_coef_ell(lvl.m_cols, m_vals, lvl.m_cells, dtype)
                        if need_m_op
                        else None
                    ),
                    m_diag=coef_diag_structure(lvl.m_cols, m_vals, lvl.m_cells, dtype),
                    ess=jnp.asarray(ess),
                    cell_faces=jnp.asarray(lvl.cell_faces, dtype=jnp.int32),
                    cell_signs=jnp.asarray(cell_signs, dtype=dtype),
                    face_cells=jnp.asarray(lvl.face_cells, dtype=jnp.int32),
                    face_signs=jnp.asarray(face_signs, dtype=dtype),
                    rhs=jnp.asarray(rhs_l, dtype=dtype),
                    obs_func=jnp.asarray(obs_np[l], dtype=dtype),
                    schur=build_tensor_solver(
                        lvl.mesh, 0.0, ess_attr=ess_attr, dtype=dtype
                    ),
                    kinv_logmean=(
                        float(np.mean(np.log(np.maximum(kinv_levels[l], 1e-300))))
                        if kinv_levels[l] is not None
                        else 0.0
                    ),
                    mass_solver=build_mass_tridiag_solver(
                        lvl,
                        ess,
                        kinv_ref=kinv_levels[l],
                        dtype=dtype,
                        axis_blocks=(
                            blocks_chain[l] if blocks_chain is not None else None
                        ),
                    ),
                    schur_mg=(
                        _build_schur_mg(
                            lvl.mesh, kinv_levels[l], ess_attr, dtype,
                            config.sampler_solver.coarse_dense_cutoff,
                            coarse_sweeps=config.darcy_solver.mg_coarse_sweeps,
                            line_smoother=config.darcy_solver.mg_line_smoother,
                        )
                        if kinv_levels[l] is not None
                        and config.darcy_solver.name
                        not in ("cg-schur-diag", "cg-schur-exact", "cg-schur-coefmg")
                        else None
                    ),
                    sbar_dinv=(
                        jnp.asarray(
                            1.0
                            / np.maximum(
                                _assemble_sbar(
                                    lvl.mesh, kinv_levels[l], ess_attr
                                ).diagonal(),
                                1e-300,
                            ),
                            dtype=dtype,
                        )
                        if kinv_levels[l] is not None
                        and config.darcy_solver.name == "cg-schur-diag"
                        else None
                    ),
                    kinv_cell=(
                        jnp.asarray(
                            np.exp(
                                np.mean(
                                    np.log(np.maximum(kinv_levels[l], 1e-300)),
                                    axis=1,
                                )
                            ),
                            dtype=dtype,
                        )
                        if kinv_levels[l] is not None
                        else None
                    ),
                    coef_mg=(
                        _build_coef_mg_level(
                            lvl.mesh, ess, dtype, config.darcy_solver,
                            kinv=kinv_levels[l],
                        )
                        if config.darcy_solver.name == "cg-schur-coefmg"
                        else None
                    ),
                    b_struct=self._build_b_struct(lvl.mesh, ess, dtype),
                )
            )
        self.solver_cfg = config.darcy_solver
        # Retained for spatial sharding (parallel/spatial_darcy.py) and
        # introspection: the per-level mass blocks and effective kinv.
        self._blocks_chain = blocks_chain
        self._kinv_levels = kinv_levels
        self._ess_attr = ess_attr
        # Parent cell maps for warm-started pair solves (coarse -> fine
        # piecewise-constant pressure prolongation).
        self._parent_dev = [
            jnp.asarray(p, dtype=jnp.int32) for p in hierarchy.parent
        ]
        # Lazily-built spatially-sharded solvers (config spatial_shards).
        self._spatial_cache: Dict[tuple, object] = {}
        n_spatial = int(getattr(self.solver_cfg, "spatial_shards", 0) or 0)
        if n_spatial > 1 and self.solver_cfg.name == "minres-bj":
            # Silently falling back to the replicated solve would defeat
            # the reason spatial_shards exists (HBM at SPE10 scale).
            raise ValueError(
                "spatial_shards requires a cg-schur-family solver; "
                "minres-bj solves the full saddle system replicated"
            )
        if (
            int(getattr(self.solver_cfg, "spatial_sample_shards", 1) or 1) > 1
            and n_spatial <= 1
        ):
            import warnings

            warnings.warn(
                "spatial_sample_shards > 1 has no effect without "
                "spatial_shards > 1 (no (dp, sp) mesh is built)",
                stacklevel=2,
            )

    def level_blocks(self, level: int):
        """Per-(cell, axis) mass blocks (bll, blr, brr) of the level - the
        complete kinv-bearing coefficient structure of M(w) (fed to the
        spatially-sharded solver so it solves the identical problem)."""
        if self._blocks_chain is not None:
            return self._blocks_chain[level]
        from parelagmc_tpu.fem.galerkin_mass import fine_axis_blocks

        return fine_axis_blocks(
            self.hierarchy.levels[level].mesh, self._kinv_levels[level]
        )

    def sbar_diag_np(self, level: int) -> np.ndarray:
        """Host copy of diag(S_bar) at the level (Jacobi-preconditioner
        data for the spatial solver)."""
        lvl = self.hierarchy.levels[level]
        kinv = self._kinv_levels[level]
        if kinv is None:
            kinv = np.ones((lvl.n_s, self.ndim))
        return np.maximum(
            _assemble_sbar(lvl.mesh, kinv, self._ess_attr).diagonal(), 1e-300
        )

    @staticmethod
    def _build_b_struct(mesh, ess: np.ndarray, dtype):
        """Per-axis essential-mask face grids for the slicing-form B/B^T
        (tensor meshes only; see DarcyLevel.b_struct)."""
        if not hasattr(mesh, "axes"):
            return None
        d = mesh.dim
        masks = []
        for a in range(d):
            fshape = list(mesh.shape)
            fshape[a] += 1
            m = (~ess[mesh.face_offsets[a]: mesh.face_offsets[a + 1]]).astype(
                np.float64
            ).reshape(tuple(fshape[::-1]))
            masks.append(jnp.asarray(m, dtype=dtype))
        return (
            tuple(int(s) for s in mesh.shape),
            tuple(int(x) for x in mesh.face_offsets),
            tuple(masks),
        )

    @staticmethod
    def _outward_sign(lvl) -> np.ndarray:
        """Outward-normal sign of every boundary face's +axis dof."""
        mesh = lvl.mesh
        out = np.zeros(lvl.n_u)
        d = mesh.dim
        for a in range(d):
            shape = mesh.face_grid_shape(a)
            grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
            i_a = grids[a].ravel(order="F")
            fidx = mesh.face_offsets[a] + np.arange(int(np.prod(shape)))
            out[fidx[i_a == 0]] = -1.0
            out[fidx[i_a == shape[a] - 1]] = +1.0
        return out

    # -- operator / preconditioner closures -----------------------------------
    def _apply_A(self, L: DarcyLevel, w: jnp.ndarray):
        ess = L.ess

        def apply_A(x: jnp.ndarray) -> jnp.ndarray:
            u, p = x[..., : L.n_u], x[..., L.n_u:]
            Mu = coef_ell_apply(L.m_op, w, u)
            Btp = jnp.sum(
                jnp.take(p, L.face_cells.reshape(-1), axis=-1).reshape(
                    p.shape[:-1] + L.face_cells.shape
                )
                * L.face_signs,
                axis=-1,
            )
            yu = Mu + Btp
            yu = jnp.where(ess, u, yu)  # identity rows at essential dofs
            Bu = jnp.sum(
                jnp.take(u, L.cell_faces.reshape(-1), axis=-1).reshape(
                    u.shape[:-1] + L.cell_faces.shape
                )
                * L.cell_signs,
                axis=-1,
            )
            return jnp.concatenate([yu, Bu], axis=-1)

        return apply_A

    def _prec(self, L: DarcyLevel, w: jnp.ndarray):
        dM = L.m_diag(w)
        dM = jnp.where(L.ess, 1.0, dM)
        inv_dM = 1.0 / dM
        # Geometric-mean scaling of the reference-coefficient Schur inverse:
        # S(w)^{-1} ~ w_bar S(1)^{-1} to first order (includes the static
        # kinv_ref geometric mean when present).
        w_bar = jnp.exp(
            jnp.mean(jnp.log(w), axis=-1, keepdims=True) + L.kinv_logmean
        )

        def prec(r: jnp.ndarray) -> jnp.ndarray:
            ru, rp = r[..., : L.n_u], r[..., L.n_u:]
            zu = ru * inv_dM
            zp = w_bar * tensor_solve(L.schur, rp)
            return jnp.concatenate([zu, zp], axis=-1)

        return prec

    # -- public API ------------------------------------------------------------
    def num_dofs(self, level: int) -> int:
        L = self.levels[level]
        return L.n_u + L.n_s

    def nnz(self, level: int) -> int:
        return self._nnz[level]

    def _apply_B(self, L: DarcyLevel, u: jnp.ndarray) -> jnp.ndarray:
        """Divergence B u. Tensor meshes use the slicing stencil: the masked
        per-axis face grid t has (B u)_i = t_{i+1} - t_i along each axis
        (cell_signs = +1 hi face / -1 lo face, assembly.py:166)."""
        if L.b_struct is not None:
            shape, offs, masks = L.b_struct
            d = len(shape)
            batch = u.shape[:-1]
            y = None
            for a in range(d):
                fshape = list(shape)
                fshape[a] += 1
                t = u[..., offs[a]: offs[a + 1]].reshape(
                    batch + tuple(fshape[::-1])
                ) * masks[a]
                ax = t.ndim - 1 - a
                lo = [slice(None)] * t.ndim
                hi = [slice(None)] * t.ndim
                lo[ax] = slice(0, -1)
                hi[ax] = slice(1, None)
                contrib = t[tuple(hi)] - t[tuple(lo)]
                y = contrib if y is None else y + contrib
            return y.reshape(batch + (-1,))
        return jnp.sum(
            jnp.take(u, L.cell_faces.reshape(-1), axis=-1).reshape(
                u.shape[:-1] + L.cell_faces.shape
            )
            * L.cell_signs,
            axis=-1,
        )

    def _apply_Bt(self, L: DarcyLevel, p: jnp.ndarray) -> jnp.ndarray:
        """Gradient-form B^T p: (B^T p)_f = p_lo - p_hi (face_signs slot
        order, assembly.py:219-220), zero outside the domain, essential
        rows masked."""
        if L.b_struct is not None:
            shape, offs, masks = L.b_struct
            d = len(shape)
            batch = p.shape[:-1]
            pg = p.reshape(batch + tuple(shape[::-1]))
            outs = []
            for a in range(d):
                ax = pg.ndim - 1 - a
                pad = [(0, 0)] * pg.ndim
                pad[ax] = (1, 1)
                pp = jnp.pad(pg, pad)
                lo = [slice(None)] * pg.ndim
                hi = [slice(None)] * pg.ndim
                lo[ax] = slice(0, -1)
                hi[ax] = slice(1, None)
                t = masks[a] * (pp[tuple(lo)] - pp[tuple(hi)])
                outs.append(t.reshape(batch + (-1,)))
            return jnp.concatenate(outs, axis=-1)
        return jnp.sum(
            jnp.take(p, L.face_cells.reshape(-1), axis=-1).reshape(
                p.shape[:-1] + L.face_cells.shape
            )
            * L.face_signs,
            axis=-1,
        )

    def solve_fwd(
        self,
        level: int,
        w: jnp.ndarray,
        return_pressure: bool = False,
        return_adjoint: bool = False,
    ):
        """Solve the Darcy problem for a batch of coefficient fields w
        (shape (..., n_s)). Returns (Q, cost, info[, p]).

        Q is the QoI functional value per sample; cost is the global dof
        count (the reference's C, src/DarcySolver.cpp:429).

        Solver selection (config.darcy_solver.name):
        * "cg-schur" (default): exact pressure Schur-complement CG - the
          velocity block M(w) is inverted exactly per CG iteration by
          batched per-axis tridiagonal solves (ops/mass_solve.py) and the
          Schur system S(w) p = B M(w)^{-1} f - g is preconditioned by the
          exact reference-coefficient inverse S(1)^{-1} via the tensor
          spectral solver.
        * "minres-bj": block-diagonal preconditioned MINRES on the full
          saddle system (the reference's MINRES-BJ-GS analog).
        * "cg-schur-diag" / "cg-schur-exact": with a static kinv_ref,
          select the diag(S_bar) / exact-S(1)-tensor preconditioner
          instead of the kinv-aware MG ("cg-schur" default with kinv).
          Combine "cg-schur-exact" with local_schur_scaling=True for the
          per-cell sqrt(w*kinv) symmetric scaling.
        * "cg-schur-coefmg": per-sample Galerkin MG - the preconditioner
          hierarchy is rebuilt from THIS sample's coefficient at gather
          cost (ops/coef_multigrid.py), the analog of the reference's
          per-sample BoomerAMG setup.
        """
        L = self.levels[level]
        if self._use_spatial(level):
            return self._solve_spatial(
                level, w, return_pressure, return_adjoint=return_adjoint
            )
        if self.solver_cfg.name == "minres-bj":
            if getattr(self.solver_cfg, "adjoint_qoi", False):
                raise NotImplementedError(
                    "adjoint_qoi applies to the cg-schur solver family"
                )
            return self._solve_minres(L, w, return_pressure)
        x0 = lam0 = None
        if getattr(self.solver_cfg, "meanfield_x0", False):
            p_ref, lam_ref = self._meanfield_start(level)
            x0 = jnp.broadcast_to(p_ref, w.shape[:-1] + p_ref.shape[-1:])
            if lam_ref is not None:
                lam0 = jnp.broadcast_to(
                    lam_ref, w.shape[:-1] + lam_ref.shape[-1:]
                )
        return self._solve_cg_schur(
            L, w, return_pressure, x0=x0, lam0=lam0,
            return_adjoint=return_adjoint,
        )

    def _meanfield_start(self, level: int):
        """Mean-field initial iterate (config.meanfield_x0): the physical
        pressure (and, with adjoint_qoi, the adjoint) of ONE reference
        solve with w == 1, computed at first use per level and cached.
        Every cold solve_fwd then starts PCG from it instead of zero -
        the per-sample solution is the mean-field one plus a lognormal
        perturbation, so the initial energy error shrinks by the
        perturbation's share (measured: 24-37% fewer iterations on
        synthetic-SPE10 levels). The setup solve is continued across
        bounded executions like the managers' segmented paths, so it
        stays inside the TPU worker's execution-duration limit at SPE10
        scale (CLAUDE.md). Cached arrays surface as jaxpr consts and are
        hoisted to runtime arguments by ops.jit_utils.jit_hoisted, not
        embedded in compiled modules. The setup runs under
        jax.ensure_compile_time_eval(): the first solve_fwd call is often
        itself being traced (jit_hoisted managers), and this setup is
        constant w.r.t. the traced inputs - without the escape the host-side
        convergence check would hit a tracer."""
        if level in self._mf_cache:
            return self._mf_cache[level]
        L = self.levels[level]
        adjoint = getattr(self.solver_cfg, "adjoint_qoi", False)
        from parelagmc_tpu.ops.tridiag_pallas import force_scan

        # force_scan: Pallas kernels cannot trace under compile-time eval
        # (captured-constant rejection; see ops/tridiag_pallas.py). The
        # scan path costs more on this ONE-TIME setup solve only.
        with jax.ensure_compile_time_eval(), force_scan():
            ones = jnp.ones((1, L.n_s), dtype=self.dtype)
            out = self._solve_cg_schur(
                L, ones, True, return_adjoint=adjoint
            )
            info, p = out[2], out[3]
            lam = out[4] if adjoint else None
            for _ in range(15):
                if bool(np.asarray(info.converged).all()):
                    break
                out = self._solve_cg_schur(
                    L, ones, True, x0=p, lam0=lam, return_adjoint=adjoint
                )
                info, p = out[2], out[3]
                lam = out[4] if adjoint else None
            # Index INSIDE the compile-time-eval scope: outside it, p[0] on
            # the concrete result would create a tracer of the ambient jit
            # trace, and caching that tracer leaks it into every later
            # trace (UnexpectedTracerError on the next program; measured
            # 2026-08-20 on the level-2 coarsest-Q program after the
            # level-1 pair populated the cache).
            entry = (p[0], lam[0] if lam is not None else None)
        self._mf_cache[level] = entry
        return entry

    # -- spatial domain decomposition (config spatial_shards) ------------------
    def _use_spatial(self, level: int) -> bool:
        """Route this level through the spatially-sharded solver? Finest
        level only: that is where HBM binds (SPE10 level 0 caps near batch
        8 on a 16G chip, CLAUDE.md); coarser levels are cheap replicated."""
        return (
            int(getattr(self.solver_cfg, "spatial_shards", 0) or 0) > 1
            and level == 0
            and self.solver_cfg.name != "minres-bj"
        )

    def _spatial(self, level: int):
        """Lazily-built SpatialDarcy for this level: each realization's
        solve state sharded into y-slabs over the 'sp' device-mesh axis,
        optionally with the sample batch over a leading 'dp' axis
        (parallel/spatial_darcy.py; the reference's MPI/ParMesh axis,
        src/DarcySolver.cpp:651-675). Preconditioning follows the solver
        name: cg-schur-coefmg gets the two-level Schwarz slab coefMG
        (iterations near the replicated coefMG path - 50 vs 45 measured
        at synthetic-SPE10 contrast on (60,110,42)/8 shards, same
        deep-truth QoI error; SPATIAL_EVIDENCE.json); other
        cg-schur variants get local-sqrt(w)-scaled diag(S_bar) Jacobi,
        adequate only at modest contrast. Exists for the levels that do
        not FIT replicated."""
        cfg = self.solver_cfg
        # Key on every config field SpatialDarcy bakes in at construction,
        # so the repo-idiomatic `solver.solver_cfg = dataclasses.replace(
        # solver_cfg, relative_tolerance=...)` pattern rebuilds instead of
        # silently answering at the stale tolerance (review r3).
        key = (
            level,
            cfg.name,
            int(cfg.spatial_shards),
            int(getattr(cfg, "spatial_sample_shards", 1) or 1),
            float(cfg.relative_tolerance),
            int(cfg.max_iterations),
            int(getattr(cfg, "restart_every", 50) or 0),
            getattr(cfg, "coefmg_prec_dtype", ""),
            int(getattr(cfg, "coefmg_cycles", 1)),
            int(getattr(cfg, "coefmg_cheby_order", 0)),
            float(getattr(cfg, "coefmg_cheby_lo", 0.25)),
            int(getattr(cfg, "coefmg_sweeps", 2)),
            float(getattr(cfg, "coefmg_omega", 0.8)),
            getattr(cfg, "coefmg_line_axes", ""),
            float(getattr(cfg, "coefmg_line_omega", 1.0)),
            getattr(cfg, "coefmg_coarsen", "galerkin"),
        )
        if key not in self._spatial_cache:
            from parelagmc_tpu.parallel.spatial_darcy import SpatialDarcy

            self._spatial_cache[key] = SpatialDarcy.from_darcy(
                self,
                level,
                n_sp=int(cfg.spatial_shards),
                n_dp=int(getattr(cfg, "spatial_sample_shards", 1) or 1),
            )
        return self._spatial_cache[key]

    def _solve_spatial(
        self,
        level: int,
        w: jnp.ndarray,
        return_pressure: bool,
        p0=None,
        lam0=None,
        return_adjoint: bool = False,
    ):
        from parelagmc_tpu.ops.solvers import SolveInfo

        adjoint = bool(getattr(self.solver_cfg, "adjoint_qoi", False))
        if return_adjoint and not adjoint:
            raise ValueError("return_adjoint requires config.adjoint_qoi")
        sp = self._spatial(level)
        out = sp.solve_fwd(
            w,
            p0=p0,
            return_pressure=return_pressure or return_adjoint,
            lam0=lam0,
            adjoint=adjoint,
        )
        q, it, rel, conv = out[:4]
        # rel and conv come from the sharded CG's true-residual-verified
        # exit (parallel/spatial_darcy._run_cg, same honesty contract as
        # ops.solvers.pcg). With adjoint, rel is the max of the primal
        # and adjoint solves, conv their AND, and `it` their sum
        # (cf. _solve_cg_schur).
        info = SolveInfo(jnp.max(it), rel, conv)
        cost = float(self.num_dofs(level))
        if return_adjoint:
            return q, cost, info, out[4], out[5]
        if return_pressure:
            return q, cost, info, out[4]
        return q, cost, info

    def adjoint_pair_enabled(self, level: int) -> bool:
        """Can the MLMC pair at this level run the adjoint-corrected QoI
        (config.adjoint_qoi) with the coarse adjoint warm-starting the fine
        one? False for the minres-bj family (full-saddle MINRES has no
        Schur adjoint path); the cg-schur family supports it replicated AND
        spatially sharded (parallel/spatial_darcy.py runs the second CG
        inside the same shard_map). Public so the managers' split-step
        builder can thread lambda between bounded executions exactly like
        the pressure."""
        return (
            bool(getattr(self.solver_cfg, "adjoint_qoi", False))
            and self.solver_cfg.name != "minres-bj"
        )

    def solve_fwd_pair(self, level: int, w_f: jnp.ndarray, w_c: jnp.ndarray):
        """Coupled (fine, coarse) pair solve for one MLMC correction sample:
        solve level+1 first, then warm-start the level solve from the
        prolongated coarse pressure - the reference's coarse-then-fine
        Eval with initial guess (src/MLMC_Manager.cpp:150-156,
        src/PDESampler.cpp:451-516: SetInitialIterate of the prolongated
        solution). Returns (q_fine, q_coarse, info_fine, info_coarse)."""
        if self.adjoint_pair_enabled(level):
            # The coarse adjoint warm-starts the fine adjoint exactly like
            # the pressure (same P0 parent-take prolongation): both CG
            # solves of the corrected pair start near their solutions.
            qc, _, info_c, p_c, lam_c = self.solve_fwd(
                level + 1, w_c, return_pressure=True, return_adjoint=True
            )
            q, _, info_f = self.solve_fwd_warm(level, w_f, p_c, lam_c=lam_c)
            return q, qc, info_f, info_c
        qc, _, info_c, p_c = self.solve_fwd(level + 1, w_c, return_pressure=True)
        q, _, info_f = self.solve_fwd_warm(level, w_f, p_c)
        return q, qc, info_f, info_c

    def solve_fwd_warm(
        self,
        level: int,
        w: jnp.ndarray,
        p_coarse: jnp.ndarray,
        return_pressure: bool = False,
        lam_c: Optional[jnp.ndarray] = None,
        return_adjoint: bool = False,
    ):
        """Fine solve warm-started from the level+1 physical pressure (as
        returned by solve_fwd(..., return_pressure=True)). Exposed
        separately from solve_fwd_pair so SPE10-scale callers can run the
        coarse and fine solves as TWO device programs: a single composed
        execution at 4.5M dofs exceeds the TPU worker's execution-duration
        limit (see CLAUDE.md). Returns (Q, cost, info[, p])."""
        # P0 prolongation: fine cell takes its parent's physical pressure
        # (exact piecewise-constant embedding); _solve_cg_schur converts to
        # its internal p~ = -p convention.
        p0 = jnp.take(p_coarse, self._parent_dev[level], axis=-1)
        lam0 = (
            jnp.take(lam_c, self._parent_dev[level], axis=-1)
            if lam_c is not None
            else None
        )
        if self._use_spatial(level):
            return self._solve_spatial(
                level, w, return_pressure, p0=p0, lam0=lam0,
                return_adjoint=return_adjoint,
            )
        if self.solver_cfg.name == "minres-bj":
            return self.solve_fwd(level, w, return_pressure=return_pressure)
        return self._solve_cg_schur(
            self.levels[level], w, return_pressure=return_pressure, x0=p0,
            lam0=lam0, return_adjoint=return_adjoint,
        )

    def solve_fwd_x0(
        self,
        level: int,
        w: jnp.ndarray,
        p0: jnp.ndarray,
        return_pressure: bool = False,
        lam0: Optional[jnp.ndarray] = None,
        return_adjoint: bool = False,
    ):
        """Continue/restart the level solve from a SAME-level physical
        pressure iterate (as returned with return_pressure=True). Segment
        long Krylov solves across device executions: chain
        solve_fwd_x0(level, w, p_prev) until info.converged - each call is
        one bounded execution (max_iterations), sidestepping the TPU
        worker's execution-duration limit at SPE10 scale (CLAUDE.md).
        CG restarts at segment boundaries cost little: float32 runs
        restart the direction every restart_every iterations anyway."""
        if self._use_spatial(level):
            return self._solve_spatial(
                level, w, return_pressure, p0=p0, lam0=lam0,
                return_adjoint=return_adjoint,
            )
        if self.solver_cfg.name == "minres-bj":
            return self.solve_fwd(level, w, return_pressure=return_pressure)
        return self._solve_cg_schur(
            self.levels[level], w, return_pressure=return_pressure, x0=p0,
            lam0=lam0, return_adjoint=return_adjoint,
        )

    def _solve_cg_schur(
        self,
        L: DarcyLevel,
        w: jnp.ndarray,
        return_pressure: bool,
        x0: Optional[jnp.ndarray] = None,
        lam0: Optional[jnp.ndarray] = None,
        return_adjoint: bool = False,
    ):
        batch = w.shape[:-1]
        f = jnp.broadcast_to(L.rhs[: L.n_u], batch + (L.n_u,))
        g = jnp.broadcast_to(L.rhs[L.n_u:], batch + (L.n_s,))
        # Factor the tridiagonal mass tables ONCE per solve: XLA does not
        # hoist their (loop-invariant) construction out of the CG
        # while_loop body. Together with the precomputed MG Jacobi
        # diagonals below, measured 50.2 -> 45.8 ms per real Schur-CG
        # iteration at SPE10 level 0, batch 16 (examples/spe10_iter_cost.py).
        mass_fac = L.mass_solver.factor(w)
        Minv = lambda r: L.mass_solver.apply_factored(mass_fac, r)
        rhs_s = self._apply_B(L, Minv(f)) - g
        if L.coef_mg is not None:
            # Per-sample Galerkin MG: the hierarchy's entire coefficient
            # dependence is the per-level dinv face vectors, computed once
            # per solve from this sample's masked mass diagonal (the TPU
            # analog of the reference's per-sample BoomerAMG setup,
            # src/DarcySolver.cpp:562-649). See ops/coef_multigrid.py and
            # the structured slicing specialization in
            # ops/coef_multigrid_structured.py.
            from parelagmc_tpu.ops.coef_multigrid_structured import (
                StructCoefMG,
                struct_mg_setup,
                struct_s_apply,
                struct_v_cycle,
            )

            diag_w = L.m_diag(w)
            dinv0 = jnp.where(diag_w > 0, 1.0 / jnp.where(diag_w == 0, 1.0, diag_w), 0.0)
            # Optional reduced-precision preconditioner state: the V-cycle
            # is HBM-bandwidth-bound, so bf16 tables + bf16 residual math
            # halve its bytes; the CG iteration itself stays in the solve
            # dtype (config.coefmg_prec_dtype).
            pdt = getattr(self.solver_cfg, "coefmg_prec_dtype", "")
            pdt = jnp.dtype(pdt) if pdt else None

            def _cast_prec(fn):
                if pdt is None:
                    return fn
                return lambda r: fn(r.astype(pdt)).astype(r.dtype)

            nsw = max(1, int(getattr(self.solver_cfg, "coefmg_sweeps", 2)))
            if isinstance(L.coef_mg, StructCoefMG):
                # Precomputed (dinv_axes, idiag) per level: the Jacobi
                # diagonals are loop invariants too (see struct_mg_setup).
                dinvs = struct_mg_setup(L.coef_mg, dinv0)
                if pdt is not None:
                    dinvs = jax.tree.map(lambda a: a.astype(pdt), dinvs)
                cycle = _cast_prec(
                    lambda r: struct_v_cycle(L.coef_mg, dinvs, r, sweeps=nsw)
                )
                s_fine = lambda z: struct_s_apply(L.coef_mg, dinvs, z)
            else:
                from parelagmc_tpu.ops.coef_multigrid import (
                    _s_apply,
                    coef_mg_dinvs,
                    coef_mg_idiags,
                    coef_v_cycle,
                )

                dinvs = coef_mg_dinvs(L.coef_mg, dinv0)
                idiags = coef_mg_idiags(L.coef_mg, dinvs)
                if pdt is not None:
                    dinvs = [d.astype(pdt) for d in dinvs]
                    idiags = [d.astype(pdt) for d in idiags]
                cycle = _cast_prec(
                    lambda r: coef_v_cycle(
                        L.coef_mg, dinvs, r, nsw, idiags=idiags
                    )
                )
                s_fine = lambda z: _s_apply(
                    L.coef_mg.levels[0], dinvs[0], z
                )
            ncyc = max(1, getattr(self.solver_cfg, "coefmg_cycles", 1))
            if ncyc == 1:
                prec = cycle
            else:
                # Composed cycles stay a fixed symmetric polynomial in the
                # MG's own face-form operator (linear + SPD, CG-safe):
                # z_{k+1} = z_k + V(r - S z_k).
                def prec(r):
                    z = cycle(r)
                    for _ in range(ncyc - 1):
                        z = z + cycle(r - s_fine(z))
                    return z
        elif L.sbar_dinv is not None:
            # Diagonal of the static variable-coefficient Schur complement:
            # weaker than MG but a far smaller program ("cg-schur-diag").
            w_bar = jnp.exp(jnp.mean(jnp.log(w), axis=-1, keepdims=True))
            prec = lambda r: w_bar * (r * L.sbar_dinv)
        elif L.schur_mg is not None:
            # kinv-aware geometric MG on S_bar.
            from parelagmc_tpu.ops.multigrid import v_cycle

            if self.solver_cfg.local_schur_scaling:
                # Symmetric per-cell scaling of the static MG:
                # S(w*kinv)^{-1} ~ D(w)^{1/2} S(kinv)^{-1} D(w)^{1/2}
                # (exact for constant w). Captures the sample's LOCAL
                # amplitude - on SPE10-scale lognormal fields the global
                # geometric mean leaves CG nearly unpreconditioned.
                sw = jnp.sqrt(w)
                prec = lambda r: sw * v_cycle(L.schur_mg, sw * r)
            else:
                # Per-sample lognormal multiplier contributes only its
                # geometric-mean scale.
                w_bar = jnp.exp(jnp.mean(jnp.log(w), axis=-1, keepdims=True))
                prec = lambda r: w_bar * v_cycle(L.schur_mg, r)
        elif self.solver_cfg.local_schur_scaling:
            # Symmetric LOCAL scaling of the exact reference Schur inverse:
            # S(w)^{-1} ~ diag(w)^{1/2} S(1)^{-1} diag(w)^{1/2} (exact for
            # constant w, first-order in the local log-field otherwise) -
            # captures the per-cell amplitude the global geometric mean
            # misses, at the cost of two elementwise multiplies.
            k_loc = (
                L.kinv_cell
                if L.kinv_cell is not None
                else jnp.exp(jnp.asarray(L.kinv_logmean, dtype=w.dtype))
            )
            sw = jnp.sqrt(w * k_loc)
            prec = lambda r: sw * tensor_solve(L.schur, sw * r)
        else:
            w_bar = jnp.exp(
                jnp.mean(jnp.log(w), axis=-1, keepdims=True) + L.kinv_logmean
            )
            prec = lambda r: w_bar * tensor_solve(L.schur, r)
        apply_S = lambda p: self._apply_B(L, Minv(self._apply_Bt(L, p)))
        adjoint = getattr(self.solver_cfg, "adjoint_qoi", False)
        stacked = adjoint and getattr(self.solver_cfg, "adjoint_stacked", False)
        if stacked:
            # Stacked primal+adjoint Krylov loop (config.adjoint_stacked):
            # solve S [p~, lam] = [rhs_s, q_s] as ONE batched PCG over a new
            # rhs axis (-2), vmapping the existing operator/preconditioner
            # closures so the per-sample state (tridiagonal mass factors,
            # coefMG dinv/idiag hierarchies) is streamed from HBM ONCE per
            # iteration for both systems instead of once per solve. The
            # Schur solve is HBM-bandwidth-bound on TPU (CLAUDE.md: level 0
            # saturates at batch 8), so the second right-hand side rides the
            # same table traffic nearly free; the loop runs to
            # max(it_primal, it_adjoint) with per-row convergence masking
            # instead of it_primal + it_adjoint sequential trips.
            # Reference analog: none (the reference has no adjoint QoI path;
            # cf. hypre solves src/DarcySolver.cpp:562-649 are one-rhs).
            cu = jnp.broadcast_to(L.obs_func[: L.n_u], batch + (L.n_u,))
            q_s = L.obs_func[L.n_u:] - self._apply_B(L, Minv(cu))
            bb = jnp.stack([rhs_s, q_s], axis=-2)
            if x0 is None and lam0 is None:
                X0 = None
            else:
                X0 = jnp.stack(
                    [
                        -x0 if x0 is not None else jnp.zeros_like(rhs_s),
                        lam0 if lam0 is not None else jnp.zeros_like(q_s),
                    ],
                    axis=-2,
                )
            apply_S2 = jax.vmap(apply_S, in_axes=-2, out_axes=-2)
            prec2 = jax.vmap(prec, in_axes=-2, out_axes=-2)
            # want_r_true: the correction needs the primal true residual
            # anyway, so the exit verification and the correction share one
            # stacked S application (review r3).
            X, info2, R_true = pcg(
                apply_S2,
                bb,
                prec=prec2,
                x0=X0,
                max_iters=self.solver_cfg.max_iterations,
                rtol=self.solver_cfg.relative_tolerance,
                atol=self.solver_cfg.absolute_tolerance,
                restart_every=self.solver_cfg.restart_every,
                want_r_true=True,
            )
            p = X[..., 0, :]
            lam = X[..., 1, :]
            from parelagmc_tpu.ops.solvers import SolveInfo

            # iterations x2 = operator applications per sample, the
            # apples-to-apples diagnostic vs the sequential path's
            # it_primal + it_adjoint (each stacked trip applies S to both
            # right-hand sides).
            info = SolveInfo(
                2 * info2.iterations,
                jnp.max(info2.residual, axis=-1),
                jnp.all(info2.converged, axis=-1),
            )
        else:
            # want_r_true on the adjoint path only: the correction consumes
            # the primal true residual, so pcg's exit verification shares
            # the operator application with it (review r3).
            out = pcg(
                apply_S,
                rhs_s,
                prec=prec,
                x0=(-x0 if x0 is not None else None),  # p~ = -p convention
                max_iters=self.solver_cfg.max_iterations,
                rtol=self.solver_cfg.relative_tolerance,
                atol=self.solver_cfg.absolute_tolerance,
                restart_every=self.solver_cfg.restart_every,
                want_r_true=adjoint,
            )
            p, info = out[0], out[1]
            r_true = out[2] if adjoint else None
        u = Minv(f - self._apply_Bt(L, p))
        Q = jnp.sum(p * L.obs_func[L.n_u:], axis=-1) + jnp.sum(
            u * L.obs_func[: L.n_u], axis=-1
        )
        if stacked:
            r_true = R_true[..., 0, :]
            Q = Q + jnp.sum(lam * r_true, axis=-1)
        elif adjoint:
            # Goal-oriented correction (config.adjoint_qoi): with
            # p* = S^{-1} rhs_s the exact solve, the QoI error is
            #   Q(p*) - Q(p) = q_s^T S^{-1} r,   r = rhs_s - S p,
            # where q_s = dQ/dp = c_p - B M(w)^{-1} c_u is the QoI
            # functional reduced to pressure space (all three QoIs are
            # linear in (u, p); the u-part folds through the exact M(w)
            # inverse). Solving the ADJOINT system S lam = q_s (S is
            # symmetric, so same operator and preconditioner state) and
            # adding lam^T r leaves a remaining error
            #   (lam* - lam)^T r <= ||lam* - lam||_S ||p* - p||_S,
            # the product of the two solves' energy errors - loose rtols
            # on both sides multiply into a deep-converged-grade QoI
            # PROVIDED the preconditioner's energy error tracks the
            # residual (pair with the barrier-aware coefMG knobs; see
            # config.adjoint_qoi for the measured composition: half-scale
            # SPE10 rtol 1e-4 QoI error 2.5e-1 plain -> 7.0e-6 corrected).
            # Reference analog: none - the reference brute-forces solver
            # tolerance in f64; at SPE10 contrast the flux QoI error is
            # ~1e5 x the true rel residual (CLAUDE.md r3 revised).
            cu = jnp.broadcast_to(L.obs_func[: L.n_u], batch + (L.n_u,))
            q_s = L.obs_func[L.n_u:] - self._apply_B(L, Minv(cu))
            lam, info_a = pcg(
                apply_S,
                q_s,
                prec=prec,
                x0=lam0,  # MLMC pairs warm-start from the coarse adjoint
                max_iters=self.solver_cfg.max_iterations,
                rtol=self.solver_cfg.relative_tolerance,
                atol=self.solver_cfg.absolute_tolerance,
                restart_every=self.solver_cfg.restart_every,
            )
            # r_true came out of the primal pcg (want_r_true above).
            Q = Q + jnp.sum(lam * r_true, axis=-1)
            from parelagmc_tpu.ops.solvers import SolveInfo

            info = SolveInfo(
                info.iterations + info_a.iterations,
                jnp.maximum(info.residual, info_a.residual),
                info.converged & info_a.converged,
            )
        cost = float(L.n_u + L.n_s)
        if return_adjoint:
            if not getattr(self.solver_cfg, "adjoint_qoi", False):
                raise ValueError("return_adjoint requires config.adjoint_qoi")
            return Q, cost, info, -p, lam
        if return_pressure:
            return Q, cost, info, -p
        return Q, cost, info

    def _solve_minres(self, L: DarcyLevel, w: jnp.ndarray, return_pressure: bool):
        apply_A = self._apply_A(L, w)
        prec = self._prec(L, w)
        b = jnp.broadcast_to(L.rhs, w.shape[:-1] + L.rhs.shape)
        x, info = minres(
            apply_A,
            b,
            prec=prec,
            max_iters=self.solver_cfg.max_iterations,
            rtol=self.solver_cfg.relative_tolerance,
            atol=self.solver_cfg.absolute_tolerance,
        )
        Q = jnp.sum(x * L.obs_func, axis=-1)
        cost = float(L.n_u + L.n_s)
        if return_pressure:
            # Physical pressure p = -p~.
            return Q, cost, info, -x[..., L.n_u:]
        return Q, cost, info
