"""Microbenchmark: component breakdown of the SPE10 level-0 pair solve.

Times, on the real TPU, the individual device programs that make up one
fine-level Schur-CG iteration at full SPE10 scale (60x220x85, 4.5M Darcy
dofs, batch 8):

* Minv      - exact M(w)^{-1} via the batched Thomas line solves
              (ops/mass_solve.py) - one call per CG iteration (apply_S)
* apply_S   - B M(w)^{-1} B^T (Minv + the two incidence gathers)
* v_cycle   - one per-sample Galerkin coef-MG V(2,2) cycle
              (ops/coef_multigrid.py), the preconditioner application
* pcg_10    - ten full CG iterations (operator + prec + vector ops),
              amortizing dispatch overhead

This is the measurement that directs level-0 optimization: the pair cost
is iterations x (apply_S + v_cycle + vector ops), so whichever component
dominates here is the one to attack (VERDICT r2 next-2).

Usage (real TPU, from /root/repo): python examples/spe10_level0_breakdown.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.ops.jit_utils import jit_hoisted
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv
    from parelagmc_tpu.problems import build_problem

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 8
    cfg = ProblemConfig(
        mesh="spe10",
        refinements=2,
        batch_size=batch,
        correlation_length=100.0,
        normalize_marginals=True,
    )
    grid = (60, 220, 85)
    if "--grid" in sys.argv:  # scaled-down smoke test (e.g. CPU)
        import dataclasses

        from parelagmc_tpu.mesh.factories import SPE10_NCELLS, SPE10_SPACING

        grid = tuple(
            int(x) for x in sys.argv[sys.argv.index("--grid") + 1].split(",")
        )
        lengths = tuple(n * h for n, h in zip(SPE10_NCELLS, SPE10_SPACING))
        f = 2 ** cfg.refinements
        cfg = dataclasses.replace(
            cfg, mesh="box", ncells=tuple(g // f for g in grid), lengths=lengths
        )
    cfg.darcy_solver.name = "cg-schur-coefmg"
    cfg.darcy_solver.relative_tolerance = 1e-6
    cfg.darcy_solver.max_iterations = 150
    prob = build_problem(cfg, kinv_ref=load_spe10_kinv(None, ncells=grid))
    solver, sampler = prob.solver, prob.sampler
    L = solver.levels[0]
    key = jax.random.PRNGKey(0)
    xi = sampler.sample(0, key, batch)
    w = np.asarray(sampler.eval(0, xi))
    w = jnp.asarray(w)

    rng = np.random.default_rng(0)
    r_u = jnp.asarray(rng.normal(size=(batch, L.n_u)), dtype=jnp.float32)
    r_s = jnp.asarray(rng.normal(size=(batch, L.n_s)), dtype=jnp.float32)

    def timed(label, fn, *args, reps=10):
        # Reduce to a device-side scalar: fetching a full n_u-sized output
        # over the tunnel (~100 MB at batch 8) would dominate the timing.
        g = lambda eps, *a: jnp.sum(fn(a[0] * (1.0 + eps), *a[1:]))
        zero = jnp.float32(0.0)
        f = jit_hoisted(g, zero, *args)
        float(f(zero, *args))  # compile + warmup fetch
        outs = []
        t0 = time.perf_counter()
        for i in range(reps):
            # distinct input each call (tunnel dedups identical requests)
            outs.append(f(jnp.float32(1e-6 * (i + 1)), *args))
        vals = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:12s} {dt * 1e3:8.2f} ms/call   (checksum {vals[-1]:.3e})")
        return dt

    minv = lambda w_, r_: L.mass_solver(w_, r_)
    t_minv = timed("Minv", minv, w, r_u)

    apply_S = lambda w_, p_: solver._apply_B(
        L, L.mass_solver(w_, solver._apply_Bt(L, p_))
    )
    t_s = timed("apply_S", apply_S, w, r_s)

    from parelagmc_tpu.ops.coef_multigrid_structured import (
        StructCoefMG,
        struct_mg_dinvs,
        struct_v_cycle,
    )

    if isinstance(L.coef_mg, StructCoefMG):
        mk_dinvs = lambda d0: struct_mg_dinvs(L.coef_mg, d0)
        mk_cycle = lambda dinvs: (lambda r: struct_v_cycle(L.coef_mg, dinvs, r))
    else:
        from parelagmc_tpu.ops.coef_multigrid import coef_mg_dinvs, coef_v_cycle

        mk_dinvs = lambda d0: coef_mg_dinvs(L.coef_mg, d0)
        mk_cycle = lambda dinvs: (lambda r: coef_v_cycle(L.coef_mg, dinvs, r))

    def vcyc(w_, r_):
        diag_w = L.m_diag(w_)
        dinv0 = jnp.where(diag_w > 0, 1.0 / jnp.where(diag_w == 0, 1.0, diag_w), 0.0)
        return mk_cycle(mk_dinvs(dinv0))(r_)

    t_v = timed("v_cycle+setup", vcyc, w, r_s)

    def pcg10(w_, r_):
        from parelagmc_tpu.ops.solvers import pcg

        diag_w = L.m_diag(w_)
        dinv0 = jnp.where(diag_w > 0, 1.0 / jnp.where(diag_w == 0, 1.0, diag_w), 0.0)
        prec = mk_cycle(mk_dinvs(dinv0))
        S = lambda p: solver._apply_B(L, L.mass_solver(w_, solver._apply_Bt(L, p)))
        x, info = pcg(S, r_, prec=prec, max_iters=10, rtol=0.0)
        return x

    t_p = timed("pcg_10", pcg10, w, r_s, reps=5)
    print(
        f"per-iteration: pcg {t_p / 10 * 1e3:.2f} ms | apply_S {t_s * 1e3:.2f}"
        f" (Minv {t_minv * 1e3:.2f}) + v_cycle {t_v * 1e3:.2f}"
    )


if __name__ == "__main__":
    main()
