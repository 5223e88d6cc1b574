"""Adaptive MLMC estimation of a Darcy QoI with a random coefficient field.

Reference analog: examples/MLMC.cpp (and MLMC_EmbeddedPDESampler.cpp /
MLMC_ProjectionPDESampler.cpp via --embedding): choose a sampler
(--sampler pde|analytic|matern), build the multilevel hierarchy, run the
adaptive MLMC manager to the target MSE and print the ShowMe dashboard
(golden anchor: estimate ~2.56 on the default parameters,
examples/CMakeLists.txt:76-80).
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.uq import MLMCManager
from parelagmc_tpu.utils.timing import TimeManager


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    mgr = MLMCManager(prob.solver, prob.sampler, cfg)
    print(f"-- MLMC Run: sampler={cfg.sampler_name} embedding={cfg.embedding}")
    est = mgr.run()
    print("FINAL MLMC ERRORS")
    print(mgr.show_me())
    TimeManager.print_table()
    mgr.close()
    return est


if __name__ == "__main__":
    main()
