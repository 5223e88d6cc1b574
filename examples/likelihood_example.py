"""Evaluate the Bayesian likelihood per level for one prior draw
(reference analog: examples/LikelihoodExample.cpp and the CTest golden
values "L = 0 : 0.9279...", examples/CMakeLists.txt:98-102)."""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.uq import BayesianInverseProblem


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    cfg = prob.config  # axis-order permutation applied (problems.py)
    bip = BayesianInverseProblem(prob.solver, prob.sampler, cfg, prob.dtype)
    y = bip.generate_observational_data()
    print(f"-- observational data: {y}")
    key = jax.random.PRNGKey(cfg.seed + 1)
    xi = prob.sampler.sample(0, key, 1)
    for level in range(cfg.nlevels):
        w = prob.sampler.eval(level, xi, xi_level=0)
        like, cost = bip.likelihood(level, w)
        print(f"L = {level} : {float(like[0]):.8g}")


if __name__ == "__main__":
    main()
