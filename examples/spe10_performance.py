"""SPE10-scale MLMC performance harness with captured JSON evidence.

Reference analog: examples/SPE10/SPE10_PDESampler_Performance.cpp:165-185 -
time nsamples of (Sample + Eval [+ Darcy forward]) per level and print the
per-level dofs / iterations / sec-per-sample table. This harness also runs
the MLMC coupled pair step per level (the estimator's real hot loop) and
writes everything to a JSON file (default SPE10_EVIDENCE.json) so at-scale
throughput is committed evidence rather than a claim.

Timing discipline: distinct PRNG keys per measured call and a host fetch of
every result (this environment's TPU tunnel dedups identical requests and
overlaps async RPCs; see CLAUDE.md).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from examples.common import parse_config
from parelagmc_tpu.ops.jit_utils import jit_hoisted
from parelagmc_tpu.physics.spe10 import load_spe10_kinv
from parelagmc_tpu.problems import build_problem


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    perm_file = None
    if "--perm-file" in argv:
        i = argv.index("--perm-file")
        perm_file = argv[i + 1]
        del argv[i : i + 2]
    out_file = "SPE10_EVIDENCE.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        del argv[i : i + 2]
    cfg = parse_config(
        argv,
        mesh="spe10",
        refinements=2,
        correlation_length=100.0,
        initial_samples=64,
        batch_size=64,
    )
    kinv = load_spe10_kinv(perm_file, ncells=(60, 220, 85))
    prob = build_problem(cfg, kinv_ref=kinv)
    sampler, solver = prob.sampler, prob.solver
    batch = cfg.batch_size
    key = jax.random.PRNGKey(cfg.seed)
    reps = max(1, cfg.initial_samples // batch)

    def timed(step, label):
        f = jit_hoisted(step, key)
        t0 = time.perf_counter()
        np.asarray(f(key)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [f(jax.random.fold_in(key, 10 + i)) for i in range(reps)]
        res = [np.asarray(o[0]) for o in outs]
        dt = time.perf_counter() - t0
        n = reps * batch
        iters = float(np.mean([np.asarray(o[-1]) for o in outs]))
        print(
            f"  {label:28s} {dt / n * 1e3:10.3f} ms/sample "
            f"{n / dt:10.1f} samples/s  iters {iters:.0f} "
            f"(compile {compile_s:.1f}s)"
        )
        return {
            "sec_per_sample": dt / n,
            "samples_per_sec": n / dt,
            "mean_iterations": iters,
            "compile_sec": compile_s,
        }

    evidence = {
        "config": {
            "mesh": "spe10 60x220x85 (20x10x2 ft)",
            "nlevels": cfg.nlevels,
            "batch": batch,
            "samples_per_measurement": reps * batch,
            "dtype": cfg.dtype,
            "correlation_length_ft": cfg.correlation_length,
            "darcy_solver": cfg.darcy_solver.name,
            "darcy_max_iterations": cfg.darcy_solver.max_iterations,
            "perm": "spe_perm.dat" if perm_file else "synthetic fallback",
        },
        "levels": [],
    }
    print(f"-- SPE10 performance: {cfg.nlevels} levels, batch {batch}")
    for level in range(cfg.nlevels):
        row = {
            "level": level,
            "stoch_dofs": int(sampler.sample_size(level)),
            "darcy_dofs": int(solver.num_dofs(level)),
            "darcy_nnz": int(solver.nnz(level)),
        }
        print(
            f"level {level}: sampler dofs {row['stoch_dofs']}, "
            f"darcy dofs {row['darcy_dofs']}, nnz {row['darcy_nnz']}"
        )

        def sample_eval(k, level=level):
            s = sampler.eval(level, sampler.sample(level, k, batch))
            # Per-sample reduction: fetch O(batch) scalars, not the O(n_s)
            # field - the tunnel transfer would otherwise dominate timing.
            return jnp.mean(s, axis=-1), jnp.zeros(())

        row["sample_eval"] = timed(sample_eval, "Sample+Eval")

        if level < cfg.nlevels - 1:

            def pair(k, level=level):
                xi = sampler.sample(level, k, batch)
                s_f = sampler.eval(level, xi)
                s_c = sampler.eval(level + 1, xi, xi_level=level)
                q, qc, i_f, i_c = solver.solve_fwd_pair(level, s_f, s_c)
                return q - qc, i_f.iterations + i_c.iterations

            row["mlmc_pair"] = timed(pair, "MLMC pair (coupled+Darcy)")
        else:

            def single(k, level=level):
                s = sampler.eval(level, sampler.sample(level, k, batch))
                q, _, info = solver.solve_fwd(level, s)
                return q, info.iterations

            row["mlmc_pair"] = timed(single, "coarsest Q (Darcy)")
        evidence["levels"].append(row)

    with open(out_file, "w") as f:
        json.dump(evidence, f, indent=1)
    print(f"wrote {out_file}")
    return evidence


if __name__ == "__main__":
    main()
