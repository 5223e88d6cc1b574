"""Oracles for the energy-consistent (Galerkin) coarse operators and the
exact marginal normalization of the SPDE sampler (round-3 headline fixes:
VERDICT r2 items 1 and the beta < 0 SPE10 failure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem.galerkin_mass import (
    blocks_mass_csr,
    blocks_to_ell_vals,
    effective_kinv,
    galerkin_block_chain,
)
from parelagmc_tpu.fem.hierarchy import build_geometric_hierarchy_from_fine
from parelagmc_tpu.mesh.factories import make_box_mesh
from parelagmc_tpu.ops.mass_solve import build_mass_tridiag_solver
from parelagmc_tpu.ops.tensorsolve import (
    build_tensor_solver,
    tensor_marginal_std,
)
from parelagmc_tpu.samplers.pde import SPDESampler


@pytest.fixture(scope="module")
def hier():
    # Non-dyadic z (5 -> 3 -> 2) exercises the SPE10-style trailing merge.
    fine = make_box_mesh((8, 6, 5), spacings=[0.3, 0.5, 0.7])
    return build_geometric_hierarchy_from_fine(fine, 3)


@pytest.fixture(scope="module")
def kinv(hier):
    rng = np.random.default_rng(0)
    # High contrast per-axis field (SPE10-like anisotropy).
    return np.exp(rng.normal(size=(hier.levels[0].n_s, 3)) * 3.0)


def _dense_rap_mass(hier, kinv, level, w_c):
    """Oracle: P_rt^T M_f(kinv * prolonged w_c) P_rt assembled densely."""
    lvl0 = hier.levels[0]
    w_f = np.asarray(w_c, dtype=np.float64)
    for ll in range(level - 1, -1, -1):
        w_f = w_f[hier.parent[ll]]
    ax = lvl0.mesh.face_axis()
    vals = lvl0.m_vals * kinv[lvl0.m_cells, ax[:, None]] * w_f[lvl0.m_cells]
    rows = np.repeat(np.arange(lvl0.n_u), lvl0.m_cols.shape[1])
    Mf = sp.csr_matrix(
        (vals.ravel(), (rows, lvl0.m_cols.ravel())), shape=(lvl0.n_u, lvl0.n_u)
    )
    P = None
    for ll in range(level):
        Pl = hier.P_rt[ll]
        P = Pl if P is None else P @ Pl
    return (P.T @ Mf @ P).toarray()


def test_blocks_match_dense_rap_geometric(hier, kinv):
    chain, _ = galerkin_block_chain(
        [l.mesh for l in hier.levels], kinv, adapt=False
    )
    rng = np.random.default_rng(1)
    for level in (1, 2):
        w_c = np.exp(rng.normal(size=hier.levels[level].n_s))
        Mc = blocks_mass_csr(hier.levels[level], chain[level], w_c).toarray()
        Mref = _dense_rap_mass(hier, kinv, level, w_c)
        assert np.abs(Mc - Mref).max() <= 1e-12 * np.abs(Mref).max()


def test_blocks_match_dense_rap_adapted(hier, kinv):
    # Same RAP identity with the energy-adapted embedding: blocks must be
    # the congruence of the fine mass through weighted_rt_prolongator.
    from parelagmc_tpu.fem.galerkin_mass import weighted_rt_prolongator

    meshes = [l.mesh for l in hier.levels]
    chain, weights = galerkin_block_chain(meshes, kinv, adapt=True)
    rng = np.random.default_rng(3)
    lvl0 = hier.levels[0]
    ax = lvl0.mesh.face_axis()
    for level in (1, 2):
        w_c = np.exp(rng.normal(size=hier.levels[level].n_s))
        Mc = blocks_mass_csr(hier.levels[level], chain[level], w_c).toarray()
        w_f = np.asarray(w_c, dtype=np.float64)
        for ll in range(level - 1, -1, -1):
            w_f = w_f[hier.parent[ll]]
        vals = lvl0.m_vals * kinv[lvl0.m_cells, ax[:, None]] * w_f[lvl0.m_cells]
        rows = np.repeat(np.arange(lvl0.n_u), lvl0.m_cols.shape[1])
        Mf = sp.csr_matrix(
            (vals.ravel(), (rows, lvl0.m_cols.ravel())),
            shape=(lvl0.n_u, lvl0.n_u),
        )
        P = None
        for ll in range(level):
            Pl = weighted_rt_prolongator(meshes[ll], meshes[ll + 1], weights[ll])
            P = Pl if P is None else P @ Pl
        Mref = (P.T @ Mf @ P).toarray()
        assert np.abs(Mc - Mref).max() <= 1e-12 * np.abs(Mref).max()


def test_adapted_weights_constant_kinv_are_geometric(hier):
    # For constant kinv the conductance weights must reduce to transverse
    # area fractions, i.e. the geometric embedding of rt_prolongator.
    from parelagmc_tpu.fem.galerkin_mass import (
        adapted_line_weights,
        fine_axis_blocks,
        weighted_rt_prolongator,
    )
    from parelagmc_tpu.fem.hierarchy import rt_prolongator

    meshes = [l.mesh for l in hier.levels]
    blocks = fine_axis_blocks(meshes[0], 2.5 * np.ones((meshes[0].num_cells, 3)))
    w = adapted_line_weights(meshes[0], meshes[1], blocks)
    P_w = weighted_rt_prolongator(meshes[0], meshes[1], w)
    P_g = rt_prolongator(meshes[0], meshes[1])
    assert abs(P_w - P_g).max() <= 1e-12


def test_unit_kinv_degenerates_to_rediscretized(hier):
    # The RT embedding is exact and the adapted weights reduce to the
    # geometric ones for constant coefficient, so constant-coefficient RAP
    # must reproduce the rediscretized coarse mass values (hence every
    # no-kinv golden anchor is unaffected by the galerkin default).
    chain, _ = galerkin_block_chain([l.mesh for l in hier.levels], None)
    for level in range(3):
        lvl = hier.levels[level]
        vals = blocks_to_ell_vals(lvl, chain[level])
        assert np.abs(vals - lvl.m_vals).max() <= 1e-12 * np.abs(lvl.m_vals).max()


def test_tridiag_solver_with_blocks(hier, kinv):
    chain, _ = galerkin_block_chain([l.mesh for l in hier.levels], kinv)
    rng = np.random.default_rng(2)
    for level in (1, 2):
        lvl = hier.levels[level]
        ess = lvl.ess_faces(np.array([0, 1, 1, 1, 1, 0]))
        solver = build_mass_tridiag_solver(
            lvl, ess, dtype=jnp.float64, axis_blocks=chain[level]
        )
        w = np.exp(rng.normal(size=lvl.n_s))
        rhs = rng.normal(size=lvl.n_u)
        z = np.asarray(solver(jnp.asarray(w), jnp.asarray(rhs)))
        M = blocks_mass_csr(lvl, chain[level], w).tolil()
        idx = np.nonzero(ess)[0]
        M[idx, :] = 0.0
        M[:, idx] = 0.0
        M[idx, idx] = 1.0
        z_ref = np.linalg.solve(M.toarray(), rhs)
        assert np.abs(z - z_ref).max() <= 1e-9 * np.abs(z_ref).max()


def test_effective_kinv_constant_field(hier):
    chain, _ = galerkin_block_chain(
        [l.mesh for l in hier.levels], 3.7 * np.ones((hier.levels[0].n_s, 3))
    )
    for level in range(3):
        k = effective_kinv(hier.levels[level].mesh, chain[level])
        assert np.allclose(k, 3.7, rtol=1e-12)


def test_marginal_std_oracle():
    # Dense oracle: Cov = g^2 S^{-1} W S^{-1} on a small mesh.
    mesh = make_box_mesh((5, 4, 3), spacings=[0.2, 0.3, 0.5])
    alpha = 2.3
    eig = build_tensor_solver(mesh, alpha, ess_attr=None, dtype=jnp.float64)
    from parelagmc_tpu.fem.assembly import build_mixed_level

    lvl = build_mixed_level(mesh)
    ess = lvl.ess_faces(np.ones(6, dtype=int))
    M = lvl.mass_csr().toarray()
    B = lvl.b_csr().toarray()
    keep = ~ess
    S = B[:, keep] @ np.linalg.solve(M[np.ix_(keep, keep)], B[:, keep].T)
    S = S + alpha * np.diag(lvl.W)
    g = 1.7
    Cov = g**2 * np.linalg.solve(S, np.diag(lvl.W) @ np.linalg.inv(S))
    std_ref = np.sqrt(np.diag(Cov))
    std = tensor_marginal_std(eig, g)
    assert np.abs(std - std_ref).max() <= 1e-10 * std_ref.max()


def test_normalized_sampler_unit_marginals(hier):
    cfg = ProblemConfig(
        mesh="box",
        ncells=(2, 2, 2),
        lengths=(2.4, 3.0, 3.5),
        refinements=2,
        correlation_length=1.0,
        variance=1.0,
        lognormal=False,
        dtype="float64",
    )
    cfg.normalize_marginals = True
    s = SPDESampler(hier, cfg, jnp.float64)
    key = jax.random.PRNGKey(0)
    for level in range(3):
        xi = s.sample(0, jax.random.fold_in(key, level), 256)
        field = np.asarray(s.eval(level, xi, xi_level=0))
        # Per-cell variance over the batch: unit to MC accuracy, everywhere
        # (including boundary cells, where the raw sampler inflates).
        v = field.var(axis=0)
        assert abs(field.var() - 1.0) < 0.15
        assert v.max() < 1.6 and v.min() > 0.55
