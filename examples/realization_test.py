"""Draw and save random-field realizations (reference analog:
examples/RealizationTest.cpp + the GLVis/VTK savers of the samplers,
src/PDESampler.cpp:637-755). Writes VTK rectilinear-grid files and
MFEM/GLVis mesh+field files per level."""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.utils.io_vtk import save_field_glvis, save_mesh_mfem, save_vtk_cell_field


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    for level in range(cfg.nlevels):
        xi = prob.sampler.sample(level, jax.random.fold_in(key, level), 1)
        s = np.asarray(prob.sampler.eval(level, xi))[0]
        mesh = prob.hierarchy.levels[level].mesh
        save_vtk_cell_field(mesh, s, f"realization_L{level:02d}.vtk")
        save_mesh_mfem(mesh, f"realization_mesh_L{level:02d}.mesh")
        save_field_glvis(mesh, s, f"realization_L{level:02d}.gf")
        print(
            f"level {level}: saved realization ({s.size} cells, "
            f"min={s.min():.4g} max={s.max():.4g})"
        )


if __name__ == "__main__":
    main()
