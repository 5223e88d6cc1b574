"""Split SPE10 MLMC Var[Y_l] into solver noise vs field/discretization
physics by a PAIRED tolerance A/B at full scale (round-3 VERDICT item 4).

Runs the production estimator twice on the IDENTICAL sample stream (same
seed, counter-based PRNG - solver settings do not touch sampling):

  A (prod): adjoint-corrected QoI at the production rtol (1e-4)
  B (deep): adjoint-corrected QoI at --deep-rtol (1e-6)

and pairs the per-sample .dat logs row by row. For each level:

  Var[Y_A]          what the estimator sees in production
  Var[Y_B]          the (near) solver-noise-free variance
  Var[Y_A - Y_B]    the solver-noise POWER in the production capture -
                    a paired measurement, so it resolves noise far below
                    the ~13% sampling error of an unpaired variance
                    comparison at a few hundred samples

If Var[Y_A - Y_B] << Var[Y_B], the production Var[Y_0] (and hence the
measured beta ~ 0.54) is DISCRETIZATION/FIELD physics, not residual noise,
and tightening tolerances cannot raise beta. Reference rate economics this
informs: /root/reference/src/MLMC_Manager.cpp:333-398.

MEASURED 2026-08-20 (SPE10_BETA_NOISE.json): level-0 paired noise power is
1.2% of Var[Y_0] (corr 0.994) - beta is physics; and the deep leg's
LEVEL-1 row came back invalid in a diagnostic way: rtol 1e-6 sits below
the f32 Krylov floor for the 563k-dof level-1 system, the honest exit
never fires, solves exhaust the full segment budget (mean 440.5
iterations) and E[Y_1] corrupts 2.81 -> 10.98. Interpret any deep-leg row
whose mean iterations sit at the budget ceiling as unconverged noise, not
a variance measurement (the same reason production prefers the
adjoint-corrected QoI at loose rtol over deep residuals).

Usage (real TPU, from /root/repo):
    python examples/spe10_beta_noise.py [--samples 256] [--deep-rtol 1e-6]
Writes SPE10_BETA_NOISE.json.
"""

import sys

sys.path.insert(0, ".")

import json

import numpy as np

from examples import spe10_mlmc


def _load_dat(path):
    rows = np.loadtxt(path, skiprows=1)
    out = {}
    for lvl in np.unique(rows[:, 0]).astype(int):
        sel = rows[rows[:, 0] == lvl]
        out[int(lvl)] = {"Y": sel[:, 1], "Q": sel[:, 2], "Qc": sel[:, 3]}
    return out


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def _pop(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i: i + 2]
            return v
        return default

    n = _pop("--samples", 256, int)
    deep_rtol = _pop("--deep-rtol", 1e-6, float)

    common = ["--refinements", "2", "--mse", "1e10", "--samples", str(n)]
    legs = {
        "prod": [],
        "deep": ["--solver-opt", f"relative_tolerance={deep_rtol}"],
    }
    for tag, extra in legs.items():
        print(f"== running {tag} leg ({n} samples/level) ==", flush=True)
        spe10_mlmc.main(common + ["--output", f"beta_{tag}.dat"] + extra + argv)

    a = _load_dat("beta_prod.dat")
    b = _load_dat("beta_deep.dat")
    report = {"samples_per_level": n, "deep_rtol": deep_rtol, "levels": []}
    for lvl in sorted(a):
        ya, yb = a[lvl]["Y"], b[lvl]["Y"]
        m = min(ya.size, yb.size)
        ya, yb = ya[:m], yb[:m]
        d = ya - yb
        lv = {
            "level": lvl,
            "n": int(m),
            "var_Y_prod": float(ya.var(ddof=1)),
            "var_Y_deep": float(yb.var(ddof=1)),
            "var_noise": float(d.var(ddof=1)),
            "noise_fraction_of_var": float(d.var(ddof=1) / yb.var(ddof=1)),
            "mean_Y_prod": float(ya.mean()),
            "mean_Y_deep": float(yb.mean()),
            "max_abs_dY": float(np.abs(d).max()),
            "corr": float(np.corrcoef(ya, yb)[0, 1]),
        }
        report["levels"].append(lv)
        print(
            f"level {lvl}: Var[Y] prod {lv['var_Y_prod']:.4g} / deep "
            f"{lv['var_Y_deep']:.4g}, paired noise power "
            f"{lv['var_noise']:.4g} ({100 * lv['noise_fraction_of_var']:.2f}% "
            f"of deep Var), corr {lv['corr']:.6f}"
        )

    # Beta from the deep (noise-free) leg vs the production leg, over the
    # two Y-pair levels (level 2 is the plain-MC coarsest, not a Y).
    lv_pairs = report["levels"]
    if len(lv_pairs) >= 2:
        from parelagmc_tpu.utils.regression import exp_weighted_regression

        M = np.array([4525000.0, 563580.0])
        report["beta_prod"] = float(exp_weighted_regression(
            np.array([lv_pairs[0]["var_Y_prod"], lv_pairs[1]["var_Y_prod"]]), M, 0))
        report["beta_deep"] = float(exp_weighted_regression(
            np.array([lv_pairs[0]["var_Y_deep"], lv_pairs[1]["var_Y_deep"]]), M, 0))
        print(f"beta (pair levels 0-1): prod {report['beta_prod']:.3f}, "
              f"deep {report['beta_deep']:.3f}")
    with open("SPE10_BETA_NOISE.json", "w") as f:
        json.dump(report, f, indent=1)
    print("written: SPE10_BETA_NOISE.json")


if __name__ == "__main__":
    main()
