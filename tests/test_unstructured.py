"""Unstructured simplicial FEM: assembly invariants, SPDE sampler
statistics, and the Darcy forward model on the reference's tet/tri meshes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem.simplicial import build_simplicial_level
from parelagmc_tpu.mesh.mfem_io import read_mfem_mesh
from parelagmc_tpu.unstructured import (
    UnstructuredDarcySolver,
    UnstructuredSPDESampler,
    label_box_boundaries,
)

DT = jnp.float64
MESHES = "/root/reference/meshes"


def load(name):
    gm = read_mfem_mesh(f"{MESHES}/{name}")
    return build_simplicial_level(gm)


def face_geometry(level):
    """Oracle: area and unit owner-outward normal per face."""
    gm = level.mesh
    conn = np.stack(gm.elements)
    d = gm.dim
    nloc = d + 1
    local_faces = [[j for j in range(nloc) if j != i] for i in range(nloc)]
    areas = np.zeros(level.n_u)
    normals = np.zeros((level.n_u, d))
    for i, lf in enumerate(local_faces):
        q = gm.vertices[conn[:, lf]]
        opp = gm.vertices[conn[:, i]]
        if d == 2:
            t = q[:, 1] - q[:, 0]
            n = np.stack([t[:, 1], -t[:, 0]], axis=1)
        else:
            n = np.cross(q[:, 1] - q[:, 0], q[:, 2] - q[:, 0]) / 2.0
        a = np.linalg.norm(n, axis=1)
        n = n / a[:, None]
        if d == 2:
            a = np.linalg.norm(q[:, 1] - q[:, 0], axis=1)
        # Orient away from the opposite vertex (cell-outward).
        out = np.sign(np.einsum("ed,ed->e", q[:, 0] - opp, n))
        n = n * out[:, None]
        fids = level.cell_faces[:, i]
        owner = level.face_cells[fids, 0] == np.arange(conn.shape[0])
        areas[fids] = a
        normals[fids[owner]] = n[owner]
    return areas, normals


def test_cube_tet_level_invariants():
    lvl = load("cube_tet.mesh")
    assert lvl.n_s == 6
    np.testing.assert_allclose(lvl.W.sum(), 1.0)  # unit cube
    # Constant field c: dofs u_f = c . n_f |f| must be (a) divergence free
    # and (b) have u^T M u = |c|^2 * |domain|.
    areas, normals = face_geometry(lvl)
    rng = np.random.default_rng(0)
    c = rng.normal(size=3)
    u = areas * (normals @ c)
    B = lvl.b_csr()
    np.testing.assert_allclose(B @ u, 0.0, atol=1e-12)
    M = lvl.mass_csr()
    np.testing.assert_allclose(u @ (M @ u), c @ c * 1.0, rtol=1e-12)
    # B entries are exactly +-1.
    assert set(np.unique(B.tocoo().data)) <= {-1.0, 1.0}


def test_square_tri_level_invariants():
    lvl = load("square.mesh")
    np.testing.assert_allclose(lvl.W.sum(), 1.0, rtol=1e-10)
    areas, normals = face_geometry(lvl)
    c = np.array([0.3, -0.7])
    u = areas * (normals @ c)
    np.testing.assert_allclose(lvl.b_csr() @ u, 0.0, atol=1e-10)
    M = lvl.mass_csr()
    np.testing.assert_allclose(u @ (M @ u), c @ c, rtol=1e-8)
    # Mass SPD.
    evals = np.linalg.eigvalsh(M.toarray())
    assert evals.min() > 0


def test_unstructured_spde_moments_square():
    lvl = load("square.mesh")
    cfg = ProblemConfig(correlation_length=0.3, lognormal=False, refinements=0)
    cfg.sampler_solver.relative_tolerance = 1e-10
    sampler = UnstructuredSPDESampler(lvl, cfg, DT)
    # Dense oracle covariance: sigma^2 g^2 S^-1 W S^-1 with
    # S = B M^-1 B^T + alpha W (constrained M).
    ess = lvl.bdr_attr > 0
    keep = ~ess
    M = lvl.mass_csr().toarray()[np.ix_(keep, keep)]
    B = lvl.b_csr().toarray()[:, keep]
    S = B @ np.linalg.solve(M, B.T) + sampler.alpha * np.diag(lvl.W)
    Sinv = np.linalg.inv(S)
    C = sampler.g ** 2 * Sinv @ np.diag(lvl.W) @ Sinv
    n = 3000
    s = np.asarray(sampler.eval(0, sampler.sample(0, jax.random.PRNGKey(0), n)))
    var = (s ** 2).mean(axis=0)
    tol = 6.0 * np.sqrt(2.0 / n) * np.diag(C).max() + 1e-3
    np.testing.assert_allclose(var, np.diag(C), atol=tol)


def test_unstructured_spde_single_realization_exact():
    # One realization must equal the dense solve of the same system.
    lvl = load("cube_tet.mesh")
    cfg = ProblemConfig(correlation_length=0.5, lognormal=False, refinements=0)
    cfg.sampler_solver.relative_tolerance = 1e-12
    sampler = UnstructuredSPDESampler(lvl, cfg, DT)
    xi = jnp.asarray(np.random.default_rng(1).normal(size=(1, lvl.n_s)))
    s = np.asarray(sampler.eval(0, xi))[0]
    ess = lvl.bdr_attr > 0
    keep = ~ess
    M = lvl.mass_csr().toarray()[np.ix_(keep, keep)]
    B = lvl.b_csr().toarray()[:, keep]
    S = B @ np.linalg.solve(M, B.T) + sampler.alpha * np.diag(lvl.W)
    ref = np.linalg.solve(S, sampler.g * lvl.w_sqrt * np.asarray(xi)[0])
    np.testing.assert_allclose(s, ref, atol=1e-9)


def test_unstructured_darcy_cube_tet():
    # k = 1 on the unit cube (6 tets): effective permeability = area/L = 1.
    lvl = load("cube_tet.mesh")
    label_box_boundaries(lvl)
    assert set(np.unique(lvl.bdr_attr[lvl.bdr_attr > 0])) == {1, 2, 3, 4, 5, 6}
    cfg = ProblemConfig(refinements=0)
    cfg.darcy_solver.relative_tolerance = 1e-11
    solver = UnstructuredDarcySolver(lvl, cfg, DT)
    w = jnp.ones((1, lvl.n_s), dtype=DT)
    Q, cost, info = solver.solve_fwd(0, w)
    assert bool(info.converged.all())
    np.testing.assert_allclose(float(Q[0]), 1.0, rtol=1e-8)


def test_unstructured_darcy_square_tri():
    # 2D: k = 1 on the unit square (328 triangles): Q = 1 exactly.
    lvl = load("square.mesh")
    label_box_boundaries(lvl)
    cfg = ProblemConfig(
        refinements=0, ess_attr=(0, 1, 0, 1), obs_attr=(1, 0, 0, 0),
        inflow_attr=(0, 0, 1, 0),
    )
    cfg.darcy_solver.relative_tolerance = 1e-10
    solver = UnstructuredDarcySolver(lvl, cfg, DT)
    w = jnp.ones((1, lvl.n_s), dtype=DT)
    Q, cost, info = solver.solve_fwd(0, w)
    assert bool(info.converged.all())
    np.testing.assert_allclose(float(Q[0]), 1.0, rtol=1e-7)


def test_unstructured_mc_manager(tmp_path):
    # Full single-level MC pipeline on the reference's unstructured
    # square.mesh (lognormal SPDE field + Darcy QoI).
    from parelagmc_tpu.uq import MCManager
    from parelagmc_tpu.utils.timing import TimeManager

    TimeManager.reset()
    lvl = load("square.mesh")
    label_box_boundaries(lvl)
    cfg = ProblemConfig(
        refinements=0, mse=2e-2, batch_size=32, initial_samples=32,
        correlation_length=0.3, ess_attr=(0, 1, 0, 1), obs_attr=(1, 0, 0, 0),
        inflow_attr=(0, 0, 1, 0),
        output_filename=str(tmp_path / "usq.dat"),
    )
    sampler = UnstructuredSPDESampler(lvl, cfg, DT)
    solver = UnstructuredDarcySolver(lvl, cfg, DT)
    mgr = MCManager(solver, sampler, cfg)
    est = mgr.run()
    # Fixed-seed f64 anchor (single-level: adaptive N is cost-independent).
    np.testing.assert_allclose(est, 3.46972, rtol=0.05)
    mgr.close()
