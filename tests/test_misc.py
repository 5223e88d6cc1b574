import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem import build_geometric_hierarchy, build_mixed_level
from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.ops.prng import sample_normals, sample_uniforms
from parelagmc_tpu.samplers import SPDESampler
from parelagmc_tpu.utils.io_vtk import cell_to_vertex_average, save_vtk_vertex_field

DT = jnp.float64


def test_sample_normals_cpu_fallback():
    x = np.asarray(sample_normals(jax.random.PRNGKey(0), (1000, 50), DT))
    assert abs(x.mean()) < 0.05 and abs(x.std() - 1.0) < 0.05


def test_sample_uniforms_cpu_fallback():
    x = np.asarray(sample_uniforms(jax.random.PRNGKey(1), (2000,), DT))
    assert 0.0 <= x.min() and x.max() < 1.0
    assert abs(x.mean() - 0.5) < 0.05


def test_eval_with_flux_satisfies_first_block_row():
    # u = -M^{-1} B^T s  =>  M u + B^T s = 0 on non-essential dofs.
    base = make_box_mesh((4, 4), lengths=(1.0, 1.0))
    hier = build_geometric_hierarchy(base, 1)
    cfg = ProblemConfig(refinements=0, lognormal=False, correlation_length=0.3)
    sampler = SPDESampler(hier, cfg, DT)
    xi = sampler.sample(0, jax.random.PRNGKey(2), 2)
    s, u = sampler.eval_with_flux(0, xi)
    lvl = hier.levels[0]
    ess = lvl.ess_faces(np.ones(4, dtype=int))
    M = lvl.mass_csr().toarray()
    B = lvl.b_csr().toarray()
    for b in range(2):
        resid = M @ np.asarray(u[b]) + B.T @ np.asarray(s[b])
        np.testing.assert_allclose(resid[~ess], 0.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(u[b])[ess], 0.0, atol=1e-12)


def test_cell_to_vertex_average_constant():
    mesh = make_box_mesh((3, 4, 2), lengths=(1.0, 2.0, 1.0))
    v = cell_to_vertex_average(mesh, np.full(mesh.num_cells, 3.5))
    np.testing.assert_allclose(v, 3.5)
    assert v.size == 4 * 5 * 3


def test_save_vtk_vertex_field(tmp_path):
    mesh = make_box_mesh((2, 2), lengths=(1.0, 1.0))
    v = cell_to_vertex_average(mesh, np.arange(4.0))
    path = str(tmp_path / "v.vtk")
    save_vtk_vertex_field(mesh, v, path)
    txt = open(path).read()
    assert "POINT_DATA 9" in txt


def test_reporting_helpers():
    from parelagmc_tpu.utils.reporting import (
        chi_center_of_mass,
        dofs_info_table,
        find_closest_cell,
        random_field_errors_table,
    )
    mesh = make_box_mesh((4, 4), lengths=(2.0, 2.0))
    e = find_closest_cell(mesh, (1.0, 1.0))
    c = mesh.cell_centers()[e]
    assert np.abs(c - 1.0).max() <= 0.25
    chi = chi_center_of_mass(mesh)
    assert chi.sum() == 1.0
    t = dofs_info_table([100, 25], nnz=[500, 120], iters=[3.5, 2.0])
    assert "level" in t and "500" in t
    t2 = random_field_errors_table([0.1, 0.2], [0.3, 0.4])
    assert "E[s]" in t2


def test_glvis_plot_no_server():
    from parelagmc_tpu.utils.reporting import glvis_plot

    mesh = make_box_mesh((2, 2), lengths=(1.0, 1.0))
    # No GLVis server in this environment: must return False, not raise.
    assert glvis_plot(mesh, np.zeros(4), port=59999) is False
