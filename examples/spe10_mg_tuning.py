"""Tune the per-sample coefMG preconditioner on the SPE10-contrast problem.

Scans smoother configurations of the cg-schur-coefmg preconditioner
(Jacobi V(s,s) sweeps / damping, Chebyshev order & lower cutoff, composed
cycles) on a scaled SPE10 grid (synthetic permeability at the real ~1e6
contrast, the same generator as physics/spe10.py's fallback) and reports
per config:

* Schur-CG iterations to the requested rtol (the honest 1e-5; see the
  CLAUDE.md rtol root-cause note),
* a TPU cost proxy est_ms = iters * (t_schur + cycles*(t_ovh + t_apply *
  fine_S_applies) + (cycles-1)*t_apply), using the chain-amortized level-0
  batch-16 numbers from examples/spe10_level0_breakdown.py /
  spe10_vcycle_profile.py (t_schur ~ 24 ms exact-Schur apply incl. the
  tridiagonal mass solves, t_ovh ~ 14 ms per-cycle transfers + coarse
  levels + elementwise, t_apply ~ 1.9 ms per fine S-apply). The proxy
  ranks candidates; adopt nothing without a real-TPU capture.

Iteration counts are hardware-independent (same operator, same Krylov
method), so this study runs on CPU f64 while the TPU measures throughput.

Reference analog: the preconditioner libraries the reference tunes via
ParameterLists (src/Utilities.cpp BoomerAMG/ADS solver blocks).

Usage (CPU ok):
    python examples/spe10_mg_tuning.py --grid 30,110,42 --batch 4 \
        --dtype float64 --rtol 1e-5
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

# --platform cpu must take effect before any backend initializes; this
# session pre-imports jax pinned to the axon tunnel, so env vars are too
# late (tests/conftest.py note) - jax.config.update still works here.
if "--platform" in sys.argv:
    _i = sys.argv.index("--platform")
    _plat = sys.argv[_i + 1]
    del sys.argv[_i: _i + 2]
    import jax

    jax.config.update("jax_platforms", _plat)
    if _plat == "cpu" and "float64" in sys.argv:
        jax.config.update("jax_enable_x64", True)

import numpy as np

from examples.common import parse_config
from parelagmc_tpu.physics.spe10 import load_spe10_kinv
from parelagmc_tpu.problems import build_problem

# Chain-amortized real-TPU component costs (ms, SPE10 level 0, batch 16).
T_SCHUR = 24.0
T_CYCLE_OVH = 14.0
T_APPLY = 1.9


def fine_s_applies(cheby_order: int, sweeps: int) -> int:
    """Fine-level S-applies per V-cycle: pre-smooth from x=0 costs
    (sweeps-1) applies (the first sweep is free), + 1 residual + sweeps
    post-smooth applies; Chebyshev order k is the same with k sweeps."""
    s = cheby_order if cheby_order > 0 else sweeps
    return 2 * s


def est_ms(iters: float, cheby_order: int, sweeps: int, cycles: int) -> float:
    per_cycle = T_CYCLE_OVH + T_APPLY * fine_s_applies(cheby_order, sweeps)
    return iters * (T_SCHUR + cycles * per_cycle + (cycles - 1) * T_APPLY)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    grid = (30, 110, 42)
    if "--grid" in argv:
        i = argv.index("--grid")
        grid = tuple(int(x) for x in argv[i + 1].split(","))
        del argv[i: i + 2]
    rtol = 1e-5
    if "--rtol" in argv:
        i = argv.index("--rtol")
        rtol = float(argv[i + 1])
        del argv[i: i + 2]
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        out_json = argv[i + 1]
        del argv[i: i + 2]
    quick = "--quick" in argv
    if quick:
        argv.remove("--quick")

    cfg0 = parse_config(
        argv,
        mesh="spe10",
        refinements=0,
        correlation_length=100.0,
        initial_samples=4,
        batch_size=4,
        normalize_marginals=True,
        axis_order="auto",
        dtype="float64",
    )
    from parelagmc_tpu.mesh.factories import SPE10_NCELLS, SPE10_SPACING

    lengths = tuple(n * h for n, h in zip(SPE10_NCELLS, SPE10_SPACING))
    cfg0 = dataclasses.replace(cfg0, mesh="box", ncells=grid, lengths=lengths)
    cfg0.darcy_solver.name = "cg-schur-coefmg"
    cfg0.darcy_solver.max_iterations = 600
    cfg0.darcy_solver.relative_tolerance = rtol
    kinv = load_spe10_kinv(None, ncells=grid)

    # (label, config overrides on DarcySolverConfig)
    variants = [
        ("jac s2 w0.8 (prod)", {}),
        ("jac s1 w0.8", {"coefmg_sweeps": 1}),
        ("jac s3 w0.8", {"coefmg_sweeps": 3}),
        ("jac s2 w0.7", {"coefmg_omega": 0.7}),
        ("jac s2 w0.9", {"coefmg_omega": 0.9}),
        ("jac s2 w1.0", {"coefmg_omega": 1.0}),
        ("cheb k2 lo.25", {"coefmg_cheby_order": 2}),
        ("cheb k3 lo.25", {"coefmg_cheby_order": 3}),
        ("cheb k4 lo.25", {"coefmg_cheby_order": 4}),
        ("cheb k3 lo.10", {"coefmg_cheby_order": 3, "coefmg_cheby_lo": 0.10}),
        ("cheb k3 lo.15", {"coefmg_cheby_order": 3, "coefmg_cheby_lo": 0.15}),
        ("cheb k3 lo.35", {"coefmg_cheby_order": 3, "coefmg_cheby_lo": 0.35}),
        ("jac s2 x2cyc", {"coefmg_cycles": 2}),
        ("cheb k3 lo.15 x2cyc",
         {"coefmg_cheby_order": 3, "coefmg_cheby_lo": 0.15,
          "coefmg_cycles": 2}),
    ]
    if quick:
        variants = variants[:3]

    s_ref = None
    rows = []
    print(f"# grid {grid}  rtol {rtol:g}  batch {cfg0.batch_size}  "
          f"dtype {cfg0.dtype}")
    print(f"{'config':22s} {'iters':>6s} {'conv':>5s} {'S/cyc':>6s} "
          f"{'est_ms/solve':>12s} {'Q[0]':>10s}")
    for label, over in variants:
        cfg = dataclasses.replace(cfg0)
        cfg.darcy_solver = dataclasses.replace(cfg0.darcy_solver, **over)
        prob = build_problem(cfg, kinv_ref=kinv)
        if s_ref is None:
            import jax

            xi = prob.sampler.sample(
                0, jax.random.PRNGKey(cfg.seed), cfg.batch_size
            )
            s_ref = np.asarray(prob.sampler.eval(0, xi))
        t0 = time.perf_counter()
        q, _, info = prob.solver.solve_fwd(0, s_ref)
        q = np.asarray(q)
        iters = int(np.max(np.asarray(info.iterations)))
        conv = bool(np.all(np.asarray(info.converged)))
        dt = time.perf_counter() - t0
        ch = int(over.get("coefmg_cheby_order", 0))
        sw = int(over.get("coefmg_sweeps", 2))
        cy = int(over.get("coefmg_cycles", 1))
        ems = est_ms(iters, ch, sw, cy)
        rows.append(
            dict(label=label, iters=iters, converged=conv,
                 s_applies=fine_s_applies(ch, sw) * cy, est_ms=ems,
                 q0=float(q[0]), cpu_s=dt, overrides=over)
        )
        print(f"{label:22s} {iters:6d} {str(conv):>5s} "
              f"{fine_s_applies(ch, sw) * cy:6d} {ems:12.1f} {q[0]:10.4f}")
    converged_rows = [r for r in rows if r["converged"]]
    if converged_rows:
        best = min(converged_rows, key=lambda r: r["est_ms"])
        print(f"# best by TPU proxy: {best['label']} "
              f"({best['iters']} iters, est {best['est_ms']:.0f} ms/solve)")
        qs = [r["q0"] for r in converged_rows]
        if max(qs) - min(qs) > 1e-3 * max(abs(q) for q in qs):
            print("# WARNING: converged QoIs disagree across "
                  "preconditioners - rtol too loose for this contrast "
                  "(CLAUDE.md rtol note)")
    else:
        print("# WARNING: no variant converged within the iteration cap - "
              "loosen --rtol or raise the cap; rows still recorded")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"grid": grid, "rtol": rtol, "rows": rows}, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
