"""Generate and store reference observational data for Bayesian runs
(reference analog: examples/ComputeReferenceObservationalData.cpp)."""

import sys

sys.path.insert(0, ".")

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.uq import BayesianInverseProblem


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    cfg = prob.config  # axis-order permutation applied (problems.py)
    bip = BayesianInverseProblem(prob.solver, prob.sampler, cfg, prob.dtype)
    y = bip.generate_observational_data()
    print(f"reference observational data -> {cfg.bayes_ref_data_file}: {y}")


if __name__ == "__main__":
    main()
