import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem import build_geometric_hierarchy
from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.physics import DarcySolver
from parelagmc_tpu.samplers import SPDESampler
from parelagmc_tpu.uq import BayesianInverseProblem, BayesRatioManager, SLBayesRatioManager
from parelagmc_tpu.utils.timing import TimeManager

DT = jnp.float64


def build_problem(tmp_path, nlevels=2, m=0, mse=5e-3, **kw):
    mesh = make_box_mesh((2, 2, 2), lengths=(2.0, 2.0, 2.0))
    hier = build_geometric_hierarchy(mesh, nlevels)
    cfg = ProblemConfig(
        refinements=nlevels - 1,
        batch_size=16,
        initial_samples=16,
        mse=mse,
        bayes_num_obs=m,
        bayes_obs_coords=(0.5, 0.5, 0.5, 1.5, 1.5, 1.5)[: 3 * max(m, 1)],
        bayes_eps=0.45,
        bayes_ref_data_file=str(tmp_path / "ref_obs.dat"),
        output_filename=str(tmp_path / "ratio.dat"),
        **kw,
    )
    sampler = SPDESampler(hier, cfg, DT)
    solver = DarcySolver(hier, cfg, DT)
    prob = BayesianInverseProblem(solver, sampler, cfg, DT)
    return hier, prob, cfg


def test_observable_p_int_deterministic(tmp_path):
    # m = 0: G = int p / |D|; for k=1 on the side-2 cube p(z) = z/2 ->
    # mean = 0.5.
    hier, prob, cfg = build_problem(tmp_path, nlevels=1)
    w = jnp.ones((1, hier.levels[0].n_s), dtype=DT)
    G, Q, cost = prob.compute_G(0, w)
    np.testing.assert_allclose(np.asarray(G), 0.5, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(Q), 2.0, rtol=1e-8)


def test_observable_pointwise(tmp_path):
    # m = 2 local-average pressure observables around two points.
    hier, prob, cfg = build_problem(tmp_path, nlevels=1, m=2)
    w = jnp.ones((1, hier.levels[0].n_s), dtype=DT)
    G, Q, cost = prob.compute_G(0, w)
    G = np.asarray(G)[0]
    assert G.shape == (2,)
    # Local averages of p(z) = z/2 near z=0.5 and z=1.5.
    np.testing.assert_allclose(G, [0.25, 0.75], rtol=1e-8)


def test_likelihood_and_R(tmp_path):
    hier, prob, cfg = build_problem(tmp_path, nlevels=2)
    prob.set_observational_data([0.5])
    w = jnp.ones((2, hier.levels[0].n_s), dtype=DT)
    like, cost = prob.likelihood(0, w)
    np.testing.assert_allclose(np.asarray(like), 1.0, rtol=1e-8)  # zero misfit
    R, cost = prob.compute_R(0, w)
    np.testing.assert_allclose(np.asarray(R), 2.0, rtol=1e-7)
    # Nonzero misfit decreases the likelihood as exp(-d^2 / (2*noise)).
    prob.set_observational_data([0.7])
    like2, _ = prob.likelihood(0, w)
    np.testing.assert_allclose(
        np.asarray(like2), np.exp(-0.04 / (2 * cfg.bayes_noise)), rtol=1e-6
    )


def test_generate_and_reload_obs_data(tmp_path):
    hier, prob, cfg = build_problem(tmp_path, nlevels=2)
    y = prob.generate_observational_data()
    assert y.shape == (1,)
    # Reload from file.
    hier2, prob2, cfg2 = build_problem(tmp_path, nlevels=2)
    prob2.config.bayes_generate_ref_data = False
    y2 = prob2.generate_observational_data()
    np.testing.assert_allclose(y2, y)


@pytest.mark.parametrize("splitting", [False, True])
def test_ml_ratio_manager_runs(tmp_path, splitting):
    TimeManager.reset()
    hier, prob, cfg = build_problem(tmp_path, nlevels=2, mse=2e-3)
    prob.set_observational_data([0.55])
    mgr = BayesRatioManager(prob, cfg, splitting=splitting)
    est = mgr.run()
    assert mgr.ml_estimator_variance <= cfg.mse_splitting_ratio * mgr.eps2
    # Posterior expectation of the effective permeability stays physical.
    assert 1.0 < est < 5.0
    dash = mgr.show_me()
    assert ("Splitting" if splitting else "Ratio") + " Estimate" in dash
    mgr.close()


def test_sl_ratio_manager(tmp_path):
    TimeManager.reset()
    hier, prob, cfg = build_problem(tmp_path, nlevels=1, mse=5e-3)
    prob.set_observational_data([0.55])
    mgr = SLBayesRatioManager(prob, cfg)
    est = mgr.run()
    # Fixed-seed f64 anchor: single-level adaptive N depends only on the
    # sampled variance (the cost model cancels for one level), so the run
    # is deterministic across hosts up to reduction-order drift.
    np.testing.assert_allclose(est, 1.98477, rtol=0.05)
    assert "SL_BayesRatio_Manager" in mgr.show_me()
    mgr.close()


def test_ratio_vs_splitting_agree(tmp_path):
    # Both estimators target E_post[Q]; with enough samples they agree.
    TimeManager.reset()
    hier, prob, cfg = build_problem(tmp_path, nlevels=1, mse=1e10)
    prob.set_observational_data([0.55])
    m1 = BayesRatioManager(prob, cfg, nlevels=1, splitting=False)
    m1.init_run([512])
    m2 = BayesRatioManager(prob, cfg, nlevels=1, splitting=True)
    m2.init_run([512])
    # On a single level the splitting estimator is E[R]/E[Z] vs E[R/Z]:
    # different estimators, same posterior in the small-noise limit; here
    # just require same ballpark.
    assert abs(m1.estimate - m2.estimate) < 0.5
    m1.close()
    m2.close()


def test_ratio_split_programs_identical(tmp_path):
    """split_pair_programs on the ratio manager (Z/R streams as separate
    device programs) matches the composed step to solver tolerance (same
    RNG stream; XLA fuses differently across the program boundary)."""

    results = []
    for split in (False, True):
        hier, prob, cfg = build_problem(
            tmp_path, nlevels=2, split_pair_programs=split, seed=13
        )
        mgr = BayesRatioManager(prob, cfg)
        mgr.init_run([8] * mgr.nlevels)
        results.append((mgr.E.copy(), mgr.varYR.copy(), mgr.varYZ.copy()))
        mgr.close()
    for a, b in zip(results[0], results[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-12)


def test_ratio_checkpoint_resume_matches_uninterrupted(tmp_path):
    # VERDICT r2 item 7: bit-exact resume for the ratio managers, mirroring
    # tests/test_checkpoint.py for MLMCManager.
    def fresh(tag):
        TimeManager.reset()
        _, prob, cfg = build_problem(
            tmp_path, mse=2e-2, cost_model="dofs",
            bayes_generate_ref_data=False,
        )
        return BayesRatioManager(prob, cfg)

    # Fix the observational data on disk so all managers share it.
    TimeManager.reset()
    _, prob0, _ = build_problem(tmp_path, mse=2e-2)
    obs = prob0.generate_observational_data()
    np.savetxt(str(tmp_path / "ref_obs.dat"), np.atleast_1d(obs))

    m1 = fresh("full")
    est1 = m1.run()
    n1 = m1.level_nsamples.copy()

    m2 = fresh("part1")
    m2.init_run([m2.init_nsamples] * m2.nlevels)
    ckpt = str(tmp_path / "ratio_state.npz")
    m2.save_state(ckpt)
    m2.close()

    m3 = fresh("part2")
    est3 = m3.resume(ckpt)
    np.testing.assert_allclose(est3, est1, rtol=1e-12)
    np.testing.assert_array_equal(m3.level_nsamples, n1)
    m1.close()
    m3.close()


def test_ratio_checkpoint_kind_mismatch(tmp_path):
    TimeManager.reset()
    _, prob, cfg = build_problem(tmp_path, mse=2e-2)
    m = BayesRatioManager(prob, cfg, splitting=True)
    m.init_run([4, 4])
    ckpt = str(tmp_path / "k.npz")
    m.save_state(ckpt)
    m2 = BayesRatioManager(prob, cfg, splitting=False)
    with pytest.raises(ValueError, match="splitting"):
        m2.load_state(ckpt)
    m.close()


def test_ratio_with_spatial_sharding(tmp_path):
    """Spatial DD through the ratio-estimator surface: (a) SampleMesh +
    spatial_shards nesting is rejected with the same friendly error as
    MLMCManager (review r3), (b) an SL ratio run with the finest-level
    solves routed through SpatialDarcy reproduces the unsharded estimate
    for the identical seed/noise stream."""
    from parelagmc_tpu.parallel import SampleMesh

    TimeManager.reset()
    _, prob_bad, cfg_bad = build_problem(tmp_path, nlevels=1, mse=1e10)
    cfg_bad.darcy_solver.spatial_shards = 4
    with pytest.raises(ValueError, match="spatial_shards"):
        BayesRatioManager(prob_bad, cfg_bad, nlevels=1,
                          sharding=SampleMesh(jax.devices()[:2]))

    def run(spatial):
        TimeManager.reset()
        _, prob, cfg = build_problem(tmp_path, nlevels=1, mse=1e10, seed=3)
        cfg.darcy_solver.relative_tolerance = 1e-9
        cfg.darcy_solver.max_iterations = 2000
        if spatial:
            cfg.darcy_solver.spatial_shards = 4
        prob.set_observational_data([0.55])
        mgr = BayesRatioManager(prob, cfg, nlevels=1)
        mgr.init_run([16])
        return float(mgr.estimate)

    est_ref = run(False)
    est_sp = run(True)
    np.testing.assert_allclose(est_sp, est_ref, rtol=1e-6)


def test_ratio_split_programs_sharded(tmp_path):
    """split_pair_programs + sample sharding on the ratio manager (r3):
    the sharded Z/R stream programs fold the same per-shard key as the
    composed sharded step, so the estimates agree to solver tolerance."""
    from parelagmc_tpu.parallel import SampleMesh

    results = []
    for split in (False, True):
        TimeManager.reset()
        hier, prob, cfg = build_problem(
            tmp_path, nlevels=2, split_pair_programs=split, seed=17
        )
        mgr = BayesRatioManager(prob, cfg, sharding=SampleMesh())
        mgr.init_run([16] * mgr.nlevels)
        results.append((mgr.E.copy(), mgr.varYR.copy(), mgr.varYZ.copy()))
        mgr.close()
    for a, b in zip(results[0], results[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-12)
