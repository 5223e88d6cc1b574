"""Algebraic agglomeration of given unstructured meshes (fem/agglomeration.py).

Reference semantics: BuildTopologyAlgebraic (Utilities.cpp:125-155) + the
DarcySolver Coarsen() loop (DarcySolver.cpp:161-169). Oracle strategy per
SURVEY.md section 4: every coarse operator is checked against the Galerkin
triple product of the fine one; MLMC behavior is validated end-to-end on the
reference's own curved meshes (circle.mesh, cylinder.mesh), which round 1
could not run at all (they cannot be built by refinement)."""

import numpy as np
import pytest

import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem.agglomeration import (
    AgglomeratedLevel,
    _cell_adjacency,
    _level_cell_centers,
    agglomerate_level,
    build_agglomerated_hierarchy,
    partition_cells,
)
from parelagmc_tpu.fem.simplicial import build_simplicial_level
from parelagmc_tpu.mesh.mfem_io import read_mfem_mesh

DT = jnp.float64
MESHES = "/root/reference/meshes"


@pytest.fixture(scope="module")
def circle_hier():
    gm = read_mfem_mesh(f"{MESHES}/circle.mesh")
    return build_agglomerated_hierarchy(gm, 3, coarsening_factor=4)


def test_partition_contiguous_balanced_deterministic():
    gm = read_mfem_mesh(f"{MESHES}/cylinder.mesh")
    lvl = build_simplicial_level(gm)
    adj = _cell_adjacency(lvl)
    cen = _level_cell_centers(lvl)
    lab1 = partition_cells(adj, cen, 8)
    lab2 = partition_cells(adj, cen, 8)
    np.testing.assert_array_equal(lab1, lab2)  # deterministic
    sizes = np.bincount(lab1)
    assert sizes.min() >= 2 and sizes.max() <= 24  # balanced-ish around 8
    assert abs(sizes.mean() - 8) < 4
    # Contiguity: each agglomerate's induced subgraph is connected.
    from scipy.sparse import csgraph

    coo = adj.tocoo()
    for a in range(sizes.size):
        cells = np.nonzero(lab1 == a)[0]
        if cells.size == 1:
            continue
        sel = np.isin(coo.row, cells) & np.isin(coo.col, cells)
        import scipy.sparse as sp

        sub = sp.csr_matrix(
            (np.ones(sel.sum()), (coo.row[sel], coo.col[sel])),
            shape=adj.shape,
        )
        ncomp, comp = csgraph.connected_components(sub, directed=False)
        assert np.unique(comp[cells]).size == 1, f"agglomerate {a} disconnected"


def test_coarse_operators_are_galerkin_rap(circle_hier):
    hier = circle_hier
    assert [l.n_s for l in hier.levels][0] == 144
    for l in range(hier.nlevels - 1):
        f, c = hier.levels[l], hier.levels[l + 1]
        P = hier.P_rt[l]
        Pl2 = hier.p_l2(l)
        Mf, Bf = f.mass_csr(), f.b_csr()
        # M_c == P^T M_f P (also with a random coefficient: agglomerate-
        # constant k enters the coarse mass exactly as the fine Galerkin
        # product with k piecewise constant on agglomerates).
        np.testing.assert_allclose(
            c.mass_csr().toarray(), (P.T @ Mf @ P).toarray(), atol=1e-12
        )
        rng = np.random.default_rng(3 + l)
        k_c = np.exp(rng.normal(size=c.n_s))
        k_f = k_c[hier.parent[l]]
        np.testing.assert_allclose(
            c.mass_csr(k_c).toarray(),
            (P.T @ f.mass_csr(k_f) @ P).toarray(),
            atol=1e-12,
        )
        # B_c == P_l2^T B_f P with entries exactly +-1 (commuting diagram).
        Bc = c.b_csr().toarray()
        np.testing.assert_allclose(Bc, (Pl2.T @ Bf @ P).toarray(), atol=1e-9)
        nz = np.abs(Bc) > 1e-8
        np.testing.assert_allclose(np.abs(Bc[nz]), 1.0, atol=1e-9)
        # W_c == P_l2^T W_f P_l2.
        np.testing.assert_allclose(c.W, np.asarray(Pl2.T @ f.W).ravel(), atol=1e-13)


def test_coarse_basis_divergence_constant(circle_hier):
    hier = circle_hier
    f, c = hier.levels[0], hier.levels[1]
    lab = hier.parent[0]
    D = (f.b_csr() @ hier.P_rt[0]).toarray() / f.W[:, None]  # pointwise div
    for F in range(c.n_u):
        for a in np.unique(lab):
            assert np.ptp(D[lab == a, F]) < 1e-8


def test_total_volume_and_bdr_attrs(circle_hier):
    hier = circle_hier
    for l in range(1, hier.nlevels):
        c = hier.levels[l]
        np.testing.assert_allclose(c.W.sum(), hier.levels[0].W.sum(), rtol=1e-12)
        # circle.mesh has the single boundary attribute 2; coarse boundary
        # faces must carry it.
        assert set(np.unique(c.bdr_attr)) <= {0, 2}
        assert (c.bdr_attr == 2).sum() > 0


def test_agglomerated_sampler_moments_circle(circle_hier):
    """SPDE sampler statistics on agglomerated levels of circle.mesh
    (reference methodology: examples/SamplerTest.cpp:281-307 on its curved
    meshes): Gaussian field mean -> 0, pointwise variance -> sigma^2 within
    MC tolerance, and coupled coarse samples correlate with fine ones."""
    import jax

    from parelagmc_tpu.unstructured import UnstructuredSPDESampler

    cfg = ProblemConfig(
        refinements=2, correlation_length=0.1, variance=1.0, lognormal=False
    )
    smp = UnstructuredSPDESampler(circle_hier, cfg, DT)
    n = 256
    xi = smp.sample(0, jax.random.PRNGKey(5), n)
    s_f = np.asarray(smp.eval(0, xi))
    s_c = np.asarray(smp.eval(1, xi, xi_level=0))
    # Zero mean within MC tolerance of the (boundary-inflated) field std.
    std = float(np.sqrt(np.median(s_f.var(axis=0))))
    assert np.abs(s_f.mean()) < 3.0 * std / np.sqrt(n)
    # Marginal variance positive and finite. NOTE: circle.mesh has diameter
    # 0.4 ~ 4 correlation lengths, so the no-embedding variance is strongly
    # boundary-inflated - exactly the effect the reference measures (its
    # no-embedding golden variance error is 9.31, examples/CMakeLists.txt:
    # 83-87) and embedding exists to remove.
    v = s_f.var(axis=0)
    assert 0.2 < np.median(v) < 15.0
    # MLMC coupling: the coarse field (same noise, restricted through
    # P_l2^T) tracks the agglomerate average of the fine field per sample.
    lab = circle_hier.parent[0]
    W = circle_hier.levels[0].W
    n_agg = circle_hier.levels[1].n_s
    den = np.bincount(lab, weights=W, minlength=n_agg)
    fine_avg = np.stack(
        [np.bincount(lab, weights=W * s_f[i], minlength=n_agg) / den for i in range(n)]
    )
    corr = np.corrcoef(fine_avg.ravel(), s_c.ravel())[0, 1]
    assert corr > 0.95, corr


def test_mlmc_on_cylinder_agglomerated(tmp_path):
    """End-to-end adaptive MLMC on cylinder.mesh - a given unstructured
    curved-domain mesh, levels by agglomeration (round-1 VERDICT item 2's
    done criterion): consistency < 1, multilevel variance reduction."""
    from parelagmc_tpu.problems import build_problem
    from parelagmc_tpu.uq import MLMCManager
    from parelagmc_tpu.utils.timing import TimeManager

    TimeManager.reset()
    cfg = ProblemConfig(
        mesh=f"{MESHES}/cylinder.mesh",
        refinements=2,
        unstructured_coarsening=True,
        coarsening_factor=8,
        ess_attr=(1, 0, 0),
        inflow_attr=(0, 1, 0),
        obs_attr=(0, 0, 1),
        variance=0.25,
        correlation_length=0.3,
        mse=1e10,
        initial_samples=16,
        batch_size=16,
        dtype="float64",
        output_filename=str(tmp_path / "cyl.dat"),
    )
    prob = build_problem(cfg)
    assert [l.n_s for l in prob.hierarchy.levels][0] == 384
    assert prob.hierarchy.levels[1].n_s < 384 // 4
    mgr = MLMCManager(prob.solver, prob.sampler, cfg)
    mgr.init_run([16, 16, 16])
    assert np.all(mgr.consistency[:2] < 1.0)
    assert np.isfinite(mgr.estimate)
    # Multilevel variance reduction: the fine-pair corrections fluctuate
    # much less than the QoI itself.
    assert mgr.varY[0] < 0.5 * mgr.varQ[0]
    mgr.close()


def test_three_level_recursion_cylinder():
    gm = read_mfem_mesh(f"{MESHES}/cylinder.mesh")
    hier = build_agglomerated_hierarchy(gm, 3, coarsening_factor=8)
    assert isinstance(hier.levels[2], AgglomeratedLevel)
    f, c = hier.levels[1], hier.levels[2]
    P = hier.P_rt[1]
    np.testing.assert_allclose(
        c.mass_csr().toarray(), (P.T @ f.mass_csr() @ P).toarray(), atol=1e-11
    )
    Bc = c.b_csr().toarray()
    nz = np.abs(Bc) > 1e-8
    np.testing.assert_allclose(np.abs(Bc[nz]), 1.0, atol=1e-8)


def test_cylsphere_agglomerated_sampler():
    """cylsphere.mesh (cylinder with a spherical cavity, 4 boundary attrs) -
    the last untested bundled curved mesh: agglomerated hierarchy + SPDE
    sampler moments and MLMC coupling (reference runs its sampler tests on
    these meshes via mesh params, examples/CMakeLists.txt:69-109)."""
    import jax

    from parelagmc_tpu.unstructured import UnstructuredSPDESampler

    gm = read_mfem_mesh(f"{MESHES}/cylsphere.mesh")
    hier = build_agglomerated_hierarchy(gm, 2, coarsening_factor=8)
    assert hier.levels[0].n_s == 705
    assert hier.levels[1].n_s <= 705 // 4
    # Oracle invariants.
    P, Pl2 = hier.P_rt[0], hier.p_l2(0)
    f, c = hier.levels[0], hier.levels[1]
    np.testing.assert_allclose(
        c.mass_csr().toarray(), (P.T @ f.mass_csr() @ P).toarray(), atol=1e-11
    )
    Bc = c.b_csr().toarray()
    nz = np.abs(Bc) > 1e-8
    np.testing.assert_allclose(np.abs(Bc[nz]), 1.0, atol=1e-8)
    # All four native boundary attributes survive agglomeration.
    assert set(np.unique(f.bdr_attr)) >= {1, 2, 3, 4}
    assert set(np.unique(c.bdr_attr)) - {0} <= {1, 2, 3, 4}
    cfg = ProblemConfig(
        refinements=1, correlation_length=0.4, variance=1.0, lognormal=False
    )
    smp = UnstructuredSPDESampler(hier, cfg, DT)
    n = 64
    xi = smp.sample(0, jax.random.PRNGKey(9), n)
    s_f = np.asarray(smp.eval(0, xi))
    s_c = np.asarray(smp.eval(1, xi, xi_level=0))
    assert np.isfinite(s_f).all() and np.isfinite(s_c).all()
    lab = hier.parent[0]
    W = f.W
    den = np.bincount(lab, weights=W, minlength=c.n_s)
    avg = np.stack(
        [np.bincount(lab, weights=W * s_f[i], minlength=c.n_s) / den for i in range(n)]
    )
    corr = np.corrcoef(avg.ravel(), s_c.ravel())[0, 1]
    assert corr > 0.9, corr


def test_coefmg_on_agglomerated_cylinder():
    """Per-sample Galerkin MG (graph variant) composes with algebraic
    agglomeration on a curved mesh: minres-coefmg solves the Darcy problem
    on cylinder.mesh's agglomerated hierarchy, matching minres-bj."""
    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.fem.agglomeration import build_agglomerated_hierarchy
    from parelagmc_tpu.unstructured import (
        UnstructuredDarcySolver,
        UnstructuredSPDESampler,
    )

    gm = read_mfem_mesh(f"{MESHES}/cylinder.mesh")
    hier = build_agglomerated_hierarchy(gm, 2, coarsening_factor=8)
    results = {}
    for name in ("minres-bj", "minres-coefmg"):
        cfg = ProblemConfig(
            refinements=1, variance=0.25, correlation_length=0.3,
            ess_attr=(1, 0, 0), inflow_attr=(0, 1, 0), obs_attr=(0, 0, 1),
        )
        cfg.darcy_solver.name = name
        cfg.darcy_solver.relative_tolerance = 1e-9
        cfg.darcy_solver.max_iterations = 600
        cfg.darcy_solver.coarse_dense_cutoff = 60
        sampler = UnstructuredSPDESampler(hier, cfg, DT)
        solver = UnstructuredDarcySolver(hier, cfg, DT)
        xi = sampler.sample(0, jax.random.PRNGKey(4), 2)
        s = sampler.eval(0, xi)
        q, _, info = solver.solve_fwd(0, s)
        assert bool(np.asarray(info.converged).all()), name
        results[name] = np.asarray(q)
    np.testing.assert_allclose(
        results["minres-coefmg"], results["minres-bj"], rtol=1e-6
    )
