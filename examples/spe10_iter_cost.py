"""Measure the REAL SPE10 level-0 Schur-CG per-iteration cost by
iteration differencing: time solve_fwd at two forced iteration budgets
and report (t_hi - t_lo) / (hi - lo). This includes everything the
composed profile (spe10_struct_profile.py) can miss: pcg loop overhead,
the restart lax.cond, convergence bookkeeping, and the per-solve setup.

Usage (real TPU, from /root/repo):
    python examples/spe10_iter_cost.py [--batch 16] [--lo 10] [--hi 30]
                                       [--prec-dtype bfloat16]

--prec-dtype sets config.coefmg_prec_dtype (reduced-precision V-cycle
state; CPU-verified zero iteration penalty - this harness measures the
ms/iteration side on chip).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.ops.jit_utils import jit_hoisted
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv
    from parelagmc_tpu.problems import build_problem

    argv = sys.argv
    get = lambda k, d: int(argv[argv.index(k) + 1]) if k in argv else d
    batch, lo, hi = get("--batch", 16), get("--lo", 10), get("--hi", 30)

    cfg = ProblemConfig(
        mesh="spe10", refinements=2, batch_size=batch,
        correlation_length=100.0, normalize_marginals=True,
    )
    cfg.darcy_solver.name = "cg-schur-coefmg"
    cfg.darcy_solver.relative_tolerance = 0.0  # force the full budget
    if "--prec-dtype" in argv:
        cfg.darcy_solver.coefmg_prec_dtype = argv[argv.index("--prec-dtype") + 1]
    # Repeatable --solver-opt KEY=VALUE, same semantics as examples/common
    # (prices the barrier-aware knobs: coefmg_line_axes, coefmg_coarsen,
    # coefmg_cheby_order, ...).
    from examples.common import apply_solver_opt

    for i, tok in enumerate(argv):
        if tok == "--solver-opt":
            apply_solver_opt(cfg.darcy_solver, argv[i + 1])
    prob = build_problem(cfg, kinv_ref=load_spe10_kinv(None, ncells=(60, 220, 85)))
    solver = prob.solver
    L = solver.levels[0]

    rng = np.random.default_rng(0)
    w = jnp.asarray(np.exp(rng.normal(size=(batch, L.n_s)) * 0.5), jnp.float32)

    times = {}
    for iters in (lo, hi):
        solver.solver_cfg = dataclasses.replace(
            solver.solver_cfg, max_iterations=iters
        )

        def run(w_):
            q, _, info = solver.solve_fwd(0, w_)
            return q.sum() + info.residual.sum()

        f = jit_hoisted(run, w)
        float(f(w))  # compile + warm
        reps = 5
        t0 = time.perf_counter()
        outs = [f(w * (1.0 + 1e-6 * (i + 1))) for i in range(reps)]
        _ = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        times[iters] = dt
        print(f"solve_fwd iters={iters}: {dt * 1e3:.1f} ms/call")

    per_it = (times[hi] - times[lo]) / (hi - lo)
    print(f"real per-iteration: {per_it * 1e3:.2f} ms (batch {batch})")
    print(f"  = {per_it * 1e3 / batch:.3f} ms/sample/iteration")


if __name__ == "__main__":
    main()
