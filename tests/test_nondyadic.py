"""Non-dyadic structured coarsening invariants (SPE10's odd z-count)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem import build_mixed_level
from parelagmc_tpu.fem.hierarchy import (
    build_geometric_hierarchy_from_fine,
    derefine_axis,
)
from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.samplers import SPDESampler

DT = jnp.float64


def test_derefine_axis_odd():
    axis = np.arange(6.0)  # 5 cells
    c = derefine_axis(axis)
    np.testing.assert_allclose(c, [0.0, 2.0, 5.0])  # groups (2, 3)
    axis = np.arange(86.0)  # 85 cells (SPE10 z)
    c = derefine_axis(axis)
    assert c.size - 1 == 42
    assert c[-1] == 85.0 and c[-2] == 82.0  # last group has 3 layers


def test_from_fine_hierarchy_invariants_odd_grid():
    fine = make_box_mesh((6, 5), lengths=(1.2, 1.0))
    hier = build_geometric_hierarchy_from_fine(fine, 2)
    assert hier.levels[1].mesh.shape == (3, 2)
    # Exact embedding: P^T M_f P == M_c (coefficient 1) even non-dyadically.
    P = hier.P_rt[0]
    Mf = hier.levels[0].mass_csr()
    Mc = hier.levels[1].mass_csr()
    np.testing.assert_allclose((P.T @ Mf @ P).toarray(), Mc.toarray(), atol=1e-12)
    # Commuting diagram: pointwise divergence of the embedded coarse field.
    rng = np.random.default_rng(0)
    uc = rng.normal(size=hier.levels[1].n_u)
    div_f = (hier.levels[0].b_csr() @ (P @ uc)) / hier.levels[0].W
    div_c = (hier.levels[1].b_csr() @ uc) / hier.levels[1].W
    np.testing.assert_allclose(div_f, div_c[hier.parent[0]], atol=1e-12)
    # P_l2^T W_f P_l2 == W_c.
    Pl2 = hier.p_l2(0)
    np.testing.assert_allclose(
        (Pl2.T @ sp.diags(hier.levels[0].W) @ Pl2).toarray(),
        np.diag(hier.levels[1].W),
        atol=1e-13,
    )


def test_spde_sampler_nondyadic_coupling_law():
    # Coupled coarse noise has the native coarse law on non-dyadic grids too.
    fine = make_box_mesh((6, 5), lengths=(1.0, 1.0))
    hier = build_geometric_hierarchy_from_fine(fine, 2)
    cfg = ProblemConfig(refinements=1, lognormal=False, correlation_length=0.3)
    sampler = SPDESampler(hier, cfg, DT)
    n = 4000
    s_c_coupled = np.asarray(
        sampler.eval(1, sampler.sample(0, jax.random.PRNGKey(0), n), xi_level=0)
    )
    s_c_native = np.asarray(sampler.eval(1, sampler.sample(1, jax.random.PRNGKey(1), n)))
    v1 = (s_c_coupled ** 2).mean(axis=0)
    v2 = (s_c_native ** 2).mean(axis=0)
    tol = 6.0 * np.sqrt(2.0 / n) * max(v1.max(), v2.max())
    np.testing.assert_allclose(v1, v2, atol=tol)


def test_spe10_full_grid_builds():
    from parelagmc_tpu.problems import build_problem

    cfg = ProblemConfig(mesh="spe10", refinements=1, dtype="float64")
    prob = build_problem(cfg)
    assert prob.hierarchy.levels[0].mesh.shape == (60, 220, 85)
    assert prob.hierarchy.levels[1].mesh.shape == (30, 110, 42)
    # One tiny fine solve to exercise the whole stack.
    w = jnp.ones((1, prob.hierarchy.levels[1].n_s), dtype=jnp.float64)
    Q, cost, info = prob.solver.solve_fwd(1, w)
    assert bool(info.converged.all())
    assert np.isfinite(float(Q[0]))


def test_egg_model_builds_and_samples():
    # Egg-model grid (60x60x7, odd z): non-dyadic coarsening + SPDE sampler.
    import jax
    from parelagmc_tpu.problems import build_problem

    cfg = ProblemConfig(
        mesh="egg", refinements=1, dtype="float64", correlation_length=30.0
    )
    prob = build_problem(cfg)
    assert prob.hierarchy.levels[0].mesh.shape == (60, 60, 7)
    assert prob.hierarchy.levels[1].mesh.shape == (30, 30, 3)
    s = prob.sampler.eval(0, prob.sampler.sample(0, jax.random.PRNGKey(0), 2))
    assert np.isfinite(np.asarray(s)).all()


def test_egg_projection_mlmc_anchor(tmp_path, monkeypatch):
    """End-to-end MLMC on the Egg model through the embedded factory pair
    (round-4 VERDICT next-round item 7; reference egg factories
    src/MeshUtilities.hpp:27-41): the non-dyadic (60,60,7) egg grid with
    the mortar PROJECTION embedding (exact overlap coupling per level -
    matching embedding cannot align non-dyadic trailing merges), fixed
    seed, f64, pinned estimate."""
    import jax.numpy as jnp  # noqa: F401  (jax configured by conftest)
    from examples.common import parse_config
    from parelagmc_tpu.problems import build_problem
    from parelagmc_tpu.uq import MLMCManager

    monkeypatch.chdir(tmp_path)
    cfg = parse_config(
        ["--mesh", "egg", "--embedding", "projection", "--refinements", "1",
         "--dtype", "float64", "--seed", "0", "--corlen", "30",
         "--mse", "1e10", "--samples", "16", "--batch", "16"]
    )
    prob = build_problem(cfg)
    assert prob.hierarchy.levels[0].mesh.shape == (60, 60, 7)
    # Embedded solve grid: +4 buffer layers per side at the fine level
    # (n_buffer in coarse cells x 2^refinements), z via trailing merge.
    assert prob.embed_hierarchy.levels[0].mesh.shape == (64, 64, 11)
    assert prob.embed_hierarchy.levels[1].mesh.shape == (32, 32, 5)
    mgr = MLMCManager(prob.solver, prob.sampler, cfg)
    mgr.init_run([16, 16])
    # Fixed-seed anchor (CPU f64, deterministic counter-based PRNG).
    np.testing.assert_allclose(mgr.estimate, 99835.47, rtol=1e-3)
    assert np.all(mgr.consistency[:1] < 1.0)
    assert np.isfinite(mgr.varY).all()
    mgr.close()
