import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem import build_geometric_hierarchy, build_mixed_level
from parelagmc_tpu.mesh import make_box_mesh, make_embedded_box_mesh
from parelagmc_tpu.samplers.pde import (
    EmbeddedSPDESampler,
    L2ProjectionSPDESampler,
    SPDESampler,
    mortar_coupling,
    overlap_matrix_1d,
    prolong_cells,
    restrict_cells,
)

DT = jnp.float64


def exact_gaussian_cov(hier, level, corlen, variance):
    """Dense oracle for the sampler covariance: C = sigma^2 g^2 S^-1 W S^-1."""
    from parelagmc_tpu.utils.special import matern_spde_scaling

    lvl = hier.levels[level]
    d = lvl.dim
    alpha = 1.0 / corlen ** 2
    g = matern_spde_scaling(corlen, d)
    ess = lvl.ess_faces(np.ones(2 * d, dtype=int))
    keep = ~ess
    M = lvl.mass_csr().toarray()[np.ix_(keep, keep)]
    B = lvl.b_csr().toarray()[:, keep]
    S = B @ np.linalg.solve(M, B.T) + alpha * np.diag(lvl.W)
    Sinv = np.linalg.inv(S)
    return variance * g ** 2 * Sinv @ np.diag(lvl.W) @ Sinv


def make_sampler(ncells=(8, 8), lengths=(1.0, 1.0), corlen=0.3, nlevels=2,
                 lognormal=False, variance=1.0):
    base = make_box_mesh(
        tuple(n // 2 ** (nlevels - 1) for n in ncells), lengths=lengths
    )
    hier = build_geometric_hierarchy(base, nlevels)
    cfg = ProblemConfig(
        ncells=ncells, lengths=lengths, correlation_length=corlen,
        lognormal=lognormal, variance=variance, refinements=nlevels - 1,
    )
    return hier, SPDESampler(hier, cfg, DT), cfg


def test_restrict_prolong_cells_match_parent_map():
    base = make_box_mesh((2, 3, 2), lengths=(1.0, 1.0, 1.0))
    hier = build_geometric_hierarchy(base, 2)
    rng = np.random.default_rng(0)
    xf = rng.normal(size=(3, hier.levels[0].n_s))
    fine_shape = hier.levels[0].mesh.shape
    rc = np.asarray(restrict_cells(jnp.asarray(xf), fine_shape))
    # Oracle via the parent map.
    ref = np.zeros((3, hier.levels[1].n_s))
    np.add.at(ref.T, hier.parent[0], xf.T)
    np.testing.assert_allclose(rc, ref, atol=1e-13)
    xc = rng.normal(size=(hier.levels[1].n_s,))
    pf = np.asarray(prolong_cells(jnp.asarray(xc), hier.levels[1].mesh.shape))
    np.testing.assert_allclose(pf, xc[hier.parent[0]], atol=1e-14)


def test_sampler_exact_linear_map():
    # The Gaussian sampler is the linear map s = g S^{-1} sqrt(W) xi;
    # check one realization against the dense oracle.
    hier, sampler, _ = make_sampler()
    lvl = hier.levels[0]
    rng = np.random.default_rng(1)
    xi = rng.normal(size=(2, lvl.n_s))
    s = np.asarray(sampler.eval(0, jnp.asarray(xi)))
    C = None
    from parelagmc_tpu.utils.special import matern_spde_scaling

    d = lvl.dim
    alpha = 1.0 / 0.3 ** 2
    g = matern_spde_scaling(0.3, d)
    ess = lvl.ess_faces(np.ones(2 * d, dtype=int))
    keep = ~ess
    M = lvl.mass_csr().toarray()[np.ix_(keep, keep)]
    B = lvl.b_csr().toarray()[:, keep]
    S = B @ np.linalg.solve(M, B.T) + alpha * np.diag(lvl.W)
    ref = np.linalg.solve(S, (g * lvl.w_sqrt * xi).T).T
    np.testing.assert_allclose(s, ref, atol=1e-10)


def test_gaussian_moments_match_exact_covariance():
    hier, sampler, _ = make_sampler(ncells=(8, 8), corlen=0.3)
    C = exact_gaussian_cov(hier, 0, 0.3, 1.0)
    var_exact = np.diag(C)
    n = 4000
    key = jax.random.PRNGKey(0)
    xi = sampler.sample(0, key, n)
    s = np.asarray(sampler.eval(0, xi))
    mean = s.mean(axis=0)
    var = (s ** 2).mean(axis=0)
    # MC tolerance ~ 4 * sqrt(2/n) * var.
    tol = 5.0 * np.sqrt(2.0 / n) * var_exact.max()
    assert np.abs(mean).max() < 5.0 * np.sqrt(var_exact.max() / n) * 1.5
    np.testing.assert_allclose(var, var_exact, atol=tol)


def test_coupled_coarse_noise_has_native_law():
    # Cov of the restricted rhs equals the native coarse rhs covariance
    # (P^T W_f P == W_c) -> coupled coarse fields have the native coarse law.
    hier, sampler, _ = make_sampler(ncells=(8, 8), nlevels=2)
    n = 4000
    key = jax.random.PRNGKey(1)
    xi_f = sampler.sample(0, key, n)
    s_c_coupled = np.asarray(sampler.eval(1, xi_f, xi_level=0))
    key2 = jax.random.PRNGKey(2)
    xi_c = sampler.sample(1, key2, n)
    s_c_native = np.asarray(sampler.eval(1, xi_c))
    v1 = (s_c_coupled ** 2).mean(axis=0)
    v2 = (s_c_native ** 2).mean(axis=0)
    tol = 6.0 * np.sqrt(2.0 / n) * max(v1.max(), v2.max())
    np.testing.assert_allclose(v1, v2, atol=tol)


def test_lognormal_mean():
    hier, sampler, _ = make_sampler(ncells=(8, 8), corlen=0.3, lognormal=True)
    C = exact_gaussian_cov(hier, 0, 0.3, 1.0)
    n = 8000
    xi = sampler.sample(0, jax.random.PRNGKey(3), n)
    s = np.asarray(sampler.eval(0, xi))
    exact = np.exp(0.5 * np.diag(C))
    err = np.abs(s.mean(axis=0) - exact) / exact
    assert np.median(err) < 0.1


def test_overlap_matrix_1d():
    a = np.array([0.0, 1.0, 2.0])
    b = np.array([-0.5, 0.5, 1.5, 2.5])
    O = overlap_matrix_1d(a, b).toarray()
    np.testing.assert_allclose(O, [[0.5, 0.5, 0.0], [0.0, 0.5, 0.5]])
    # Partition of unity: row sums = cell lengths when b covers a.
    np.testing.assert_allclose(O.sum(axis=1), np.diff(a))


def test_mortar_coupling_rowsums():
    orig = make_box_mesh((4, 4), lengths=(2.0, 2.0))
    emb = make_box_mesh((7, 7), origin=(-0.3, -0.3), lengths=(2.8, 2.8))
    G = mortar_coupling(orig, emb)
    np.testing.assert_allclose(
        np.asarray(G.sum(axis=1)).ravel(), orig.cell_volumes(), atol=1e-12
    )


def test_embedded_variants_agree_on_matching_mesh():
    # With identical embedded meshes, the matching-selection and the mortar
    # projection samplers must produce the same field for the same noise
    # (the reference's cross-implementation consistency check:
    # examples/CMakeLists.txt:73 vs :109 share one golden regex).
    nlev = 2
    orig_base = make_box_mesh((4, 4), lengths=(2.0, 2.0))
    emb_base = make_embedded_box_mesh((4, 4), lengths=(2.0, 2.0), n_buffer=(1,))
    hier = build_geometric_hierarchy(orig_base, nlev)
    ehier = build_geometric_hierarchy(emb_base, nlev)
    cfg = ProblemConfig(ncells=(4, 4), lengths=(2.0, 2.0), lognormal=True,
                        refinements=nlev - 1)
    emb = EmbeddedSPDESampler(hier, ehier, cfg, DT)
    proj = L2ProjectionSPDESampler(hier, ehier, cfg, DT)
    for level in range(nlev):
        xi = emb.sample(level, jax.random.PRNGKey(4 + level), 3)
        s1 = np.asarray(emb.eval(level, xi))
        s2 = np.asarray(proj.eval(level, xi))
        np.testing.assert_allclose(s1, s2, atol=1e-10)


def test_embedded_reduces_boundary_variance_inflation():
    # The plain sampler inflates variance at the boundary (reflecting BCs);
    # the embedded sampler should be closer to the target in boundary cells.
    nlev = 1
    orig_base = make_box_mesh((12, 12), lengths=(1.2, 1.2))
    emb_base = make_embedded_box_mesh((12, 12), lengths=(1.2, 1.2), n_buffer=(4,))
    hier = build_geometric_hierarchy(orig_base, nlev)
    ehier = build_geometric_hierarchy(emb_base, nlev)
    cfg = ProblemConfig(ncells=(12, 12), lengths=(1.2, 1.2), lognormal=False,
                        correlation_length=0.2, refinements=0)
    plain = SPDESampler(hier, cfg, DT)
    emb = EmbeddedSPDESampler(hier, ehier, cfg, DT)
    n = 3000
    s_p = np.asarray(plain.eval(0, plain.sample(0, jax.random.PRNGKey(7), n)))
    s_e = np.asarray(emb.eval(0, emb.sample(0, jax.random.PRNGKey(8), n)))
    var_p = (s_p ** 2).mean(axis=0)
    var_e = (s_e ** 2).mean(axis=0)
    # Corner cell of the original mesh.
    corner = 0
    center = hier.levels[0].n_s // 2 + 6
    # Plain sampler: boundary variance noticeably above interior; embedded:
    # much flatter.
    assert var_p[corner] > 1.5 * var_e[corner]
