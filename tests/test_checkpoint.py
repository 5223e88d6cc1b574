import numpy as np
import pytest

import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem import build_geometric_hierarchy
from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.physics import DarcySolver
from parelagmc_tpu.samplers import SPDESampler
from parelagmc_tpu.uq import MLMCManager
from parelagmc_tpu.utils.timing import TimeManager

DT = jnp.float64


def make_manager(tmp_path, tag):
    mesh = make_box_mesh((2, 2, 2), lengths=(2.0, 2.0, 2.0))
    hier = build_geometric_hierarchy(mesh, 2)
    cfg = ProblemConfig(
        refinements=1, mse=4e-3, batch_size=16, initial_samples=16,
        output_filename=str(tmp_path / f"{tag}.dat"), seed=7,
        cost_model="dofs",
    )
    sampler = SPDESampler(hier, cfg, DT)
    solver = DarcySolver(hier, cfg, DT)
    return MLMCManager(solver, sampler, cfg)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    TimeManager.reset()
    # Uninterrupted run.
    m1 = make_manager(tmp_path, "full")
    est1 = m1.run()
    n1 = m1.level_nsamples.copy()
    # Interrupted run: first round only, checkpoint, fresh manager resumes.
    TimeManager.reset()
    m2 = make_manager(tmp_path, "part1")
    m2.init_run(m2.init_nsamples)
    ckpt = str(tmp_path / "state.npz")
    m2.save_state(ckpt)
    m2.close()
    TimeManager.reset()
    m3 = make_manager(tmp_path, "part2")
    est3 = m3.resume(ckpt)
    # Identical moment sums after the first round (same seed + counter) mean
    # the resumed estimate equals the uninterrupted one exactly.
    np.testing.assert_allclose(est3, est1, rtol=1e-12)
    np.testing.assert_array_equal(m3.level_nsamples, n1)
    m1.close()
    m3.close()


def test_checkpoint_seed_mismatch(tmp_path):
    TimeManager.reset()
    m = make_manager(tmp_path, "a")
    m.init_run([16, 16])
    ckpt = str(tmp_path / "s.npz")
    m.save_state(ckpt)
    m.config.seed = 8
    with pytest.raises(ValueError):
        m.load_state(ckpt)
    m.close()
