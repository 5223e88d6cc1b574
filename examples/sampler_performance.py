"""Sampler throughput harness: time batched Sample+Eval per level.

Reference analog: examples/SPE10/SPE10_{PDESampler,EmbeddedPDESampler,
ProjectionPDESampler}_Performance.cpp:165-185 - time nsamples of
(Sample + Eval) per level under named timers and print the per-level
timing table, plus dof counts. Select the variant with --embedding and the
mesh with --mesh (spe10 for the reference configuration).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.utils.timing import TimeManager


def main(argv=None):
    cfg = parse_config(argv, initial_samples=256, batch_size=256)
    prob = build_problem(cfg)
    sampler = prob.sampler
    nsamples = cfg.initial_samples
    batch = cfg.batch_size
    key = jax.random.PRNGKey(cfg.seed)
    print(
        f"-- Sampler performance: {cfg.sampler_name} embedding={cfg.embedding} "
        f"mesh={cfg.mesh} batch={batch}"
    )
    print("%8s %12s %14s %16s" % ("level", "stoch dofs", "sec/sample", "samples/sec"))
    for level in range(cfg.nlevels):
        step = jax.jit(
            lambda k, level=level: sampler.eval(level, sampler.sample(level, k, batch))
        )
        jax.block_until_ready(step(key))  # compile
        nb = max(1, nsamples // batch)
        t0 = time.perf_counter()
        out = None
        for i in range(nb):
            out = step(jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        n = nb * batch
        print(
            "%8d %12d %14.6g %16.1f"
            % (level, sampler.sample_size(level), dt / n, n / dt)
        )


if __name__ == "__main__":
    main()
