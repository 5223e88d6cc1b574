"""Single-level Monte Carlo on the finest level (reference analog:
examples/SLMC.cpp / SLMC_ProjectionPDESampler.cpp via --embedding)."""

import sys

sys.path.insert(0, ".")

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.uq import MCManager
from parelagmc_tpu.utils.timing import TimeManager


def main(argv=None):
    cfg = parse_config(argv, mse=5e-3)
    prob = build_problem(cfg)
    mgr = MCManager(prob.solver, prob.sampler, cfg)
    est = mgr.run()
    print("FINAL SLMC ERRORS")
    print(mgr.show_me())
    TimeManager.print_table()
    mgr.close()
    return est


if __name__ == "__main__":
    main()
