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


def test_hybrid_cg_agglomerated_falls_back():
    """Agglomerated coarse levels carry no simplicial element geometry, so
    hybrid-cg must construct with hybridization on geometric levels only
    and fall back to MINRES elsewhere instead of crashing (review r3)."""
    import jax

    from parelagmc_tpu.fem.agglomeration import build_agglomerated_hierarchy

    gm = read_mfem_mesh(MESH)
    label_box_boundaries_gm(gm)
    hier = build_agglomerated_hierarchy(gm, 2, coarsening_factor=8)
    cfg = ProblemConfig(refinements=1, dtype="float64")
    cfg.darcy_solver.name = "hybrid-cg"
    cfg.darcy_solver.relative_tolerance = 1e-8
    cfg.darcy_solver.max_iterations = 2000
    solver = UnstructuredDarcySolver(hier, cfg, jnp.float64)
    assert solver._hybrid[0] is not None  # fine level is geometric
    assert solver._hybrid[1] is None  # agglomerated level: MINRES fallback
    w = jnp.ones((2, hier.levels[1].n_s), jnp.float64)
    q, _, info = solver.solve_fwd(1, w)
    assert np.isfinite(np.asarray(q)).all()
