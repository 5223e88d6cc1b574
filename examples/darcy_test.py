"""Deterministic mixed Darcy forward solve per level.

Reference analog: examples/DarcyTest.cpp + the CTest golden table of
(level, iterations, dofs) (examples/CMakeLists.txt:62-66). With the
default golden parameters (4^3 hex cube of side 2, two refinements) the
dof column reproduces 17152 / 2240 / 304 exactly and the QoI (effective
permeability with k = 1) is the analytic value 2.0 on every level.

Run: python examples/darcy_test.py [--xml-file list.xml] [--refinements N] ...
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.utils.timing import TimeManager


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    print(f"-- DarcyTest: mesh={cfg.mesh} levels={cfg.nlevels} qoi={cfg.qoi}")
    print("%8s %8s %12s %16s" % ("level", "iters", "dofs", "Q"))
    for level in range(cfg.nlevels):
        w = jnp.ones((1, prob.hierarchy.levels[level].n_s), dtype=prob.dtype)
        with TimeManager.timed(f"Darcy: Mult -- Level {level}"):
            Q, cost, info = prob.solver.solve_fwd(level, w)
        print(
            "%8d %8d %12d %16.8g"
            % (level, int(info.iterations), prob.solver.num_dofs(level), float(Q[0]))
        )
    TimeManager.print_table()


if __name__ == "__main__":
    main()
