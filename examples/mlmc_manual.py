"""Hand-rolled MLMC level loop without the manager (reference analog:
examples/MLMC_Manual.cpp:328-369) - demonstrates the raw sampler/solver
API: draw noise, evaluate coupled fine/coarse realizations, accumulate
Y = Q_f - Q_c moments yourself."""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem


def main(argv=None):
    cfg = parse_config(argv)
    prob = build_problem(cfg)
    sampler, solver = prob.sampler, prob.solver
    key = jax.random.PRNGKey(cfg.seed)
    nsamples = cfg.initial_samples
    batch = cfg.batch_size
    L = cfg.nlevels
    eY, vY = np.zeros(L), np.zeros(L)
    for level in range(L - 1, -1, -1):
        if level == L - 1:
            def step(k, level=level):
                xi = sampler.sample(level, k, batch)
                q, _, _ = solver.solve_fwd(level, sampler.eval(level, xi))
                return q
        else:
            def step(k, level=level):
                xi = sampler.sample(level, k, batch)
                q, _, _ = solver.solve_fwd(level, sampler.eval(level, xi))
                qc, _, _ = solver.solve_fwd(
                    level + 1, sampler.eval(level + 1, xi, xi_level=level)
                )
                return q - qc
        step = jax.jit(step)
        ys = []
        for b in range(-(-nsamples // batch)):
            key, sub = jax.random.split(key)
            ys.append(np.asarray(step(sub), dtype=np.float64))
        y = np.concatenate(ys)
        eY[level], vY[level] = y.mean(), y.var(ddof=1)
        print(f"level {level}: E[Y]={eY[level]:.6g} Var[Y]={vY[level]:.6g} N={y.size}")
    print(f"MLMC estimate: {eY.sum():.8g}")
    return eY.sum()


if __name__ == "__main__":
    main()
