"""Mixed Darcy forward solves with one random permeability realization per
level (reference analog: examples/DarcyTest_RandomInput.cpp and the CTest
(level, QoI, dofs) table, examples/CMakeLists.txt:91-95)."""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    print(f"-- DarcyTest_RandomInput: sampler={cfg.sampler_name}")
    print("%8s %16s %12s" % ("level", "Q", "dofs"))
    for level in range(cfg.nlevels):
        xi = prob.sampler.sample(level, jax.random.fold_in(key, level), 1)
        s = prob.sampler.eval(level, xi)
        Q, cost, info = prob.solver.solve_fwd(level, s)
        print("%8d %16.8g %12d" % (level, float(Q[0]), prob.solver.num_dofs(level)))


if __name__ == "__main__":
    main()
