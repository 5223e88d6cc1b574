"""Amortized profile of the structured SPE10 level-0 Schur-CG components.

The tunnel to the TPU has a ~28 ms per-program dispatch floor (measured:
a single no-op-sized program and a full M(w)^{-1} land within 2 ms of
each other), so single-call timings of sub-50ms ops measure the floor,
not the op. This script times every component with CHAIN AMORTIZATION:
run the op K times inside one program with a data dependency between
iterations (an epsilon rescale prevents CSE dedup), and report
(t_K - t_1) / (K - 1) - the marginal per-application device time. That
is the number that actually enters the Schur-CG iteration cost, because
pcg runs its iterations inside one program too.

Usage (real TPU, from /root/repo):
    python examples/spe10_struct_profile.py [--batch 16] [--grid 12,44,17]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.ops.coef_multigrid_structured import (
        StructCoefMG,
        _s_apply_grid,
        struct_mg_dinvs,
        struct_mg_setup,
        struct_v_cycle,
    )
    from parelagmc_tpu.ops.jit_utils import jit_hoisted
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv
    from parelagmc_tpu.problems import build_problem

    argv = sys.argv
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 16
    grid = (60, 220, 85)
    if "--grid" in argv:
        grid = tuple(int(x) for x in argv[argv.index("--grid") + 1].split(","))
    cfg = ProblemConfig(
        mesh="spe10", refinements=2, batch_size=batch,
        correlation_length=100.0, normalize_marginals=True,
    )
    if grid != (60, 220, 85):
        import dataclasses
        from parelagmc_tpu.mesh.factories import SPE10_NCELLS, SPE10_SPACING

        lengths = tuple(n * h for n, h in zip(SPE10_NCELLS, SPE10_SPACING))
        f = 2 ** cfg.refinements
        cfg = dataclasses.replace(
            cfg, mesh="box", ncells=tuple(g // f for g in grid), lengths=lengths
        )
    cfg.darcy_solver.name = "cg-schur-coefmg"
    prob = build_problem(cfg, kinv_ref=load_spe10_kinv(None, ncells=grid))
    solver = prob.solver
    L = solver.levels[0]
    mg = L.coef_mg
    assert isinstance(mg, StructCoefMG), type(mg)
    print("mg level shapes:", [l.shape for l in mg.levels])

    rng = np.random.default_rng(0)
    w = jnp.asarray(np.exp(rng.normal(size=(batch, L.n_s)) * 0.5), jnp.float32)
    r_s = jnp.asarray(rng.normal(size=(batch, L.n_s)), jnp.float32)
    r_u = jnp.asarray(rng.normal(size=(batch, L.n_u)), jnp.float32)

    def marginal(label, fn, x0, *extra, K=8, reps=6):
        """(t_K - t_1)/(K-1) with an epsilon-rescale between iterations."""

        def chain(eps, k, x, *a):
            y = x * (1.0 + eps)
            for _ in range(k):
                y = fn(y, *a) * (1.0 + eps)
            return jnp.sum(y)

        ts = []
        for k in (1, K):
            f = jit_hoisted(lambda eps, x, *a, _k=k: chain(eps, _k, x, *a),
                            jnp.float32(0.0), x0, *extra)
            float(f(jnp.float32(0.0), x0, *extra))
            t0 = time.perf_counter()
            outs = [f(jnp.float32(1e-7 * (i + 1)), x0, *extra)
                    for i in range(reps)]
            _ = [float(o) for o in outs]
            ts.append((time.perf_counter() - t0) / reps)
        m = (ts[1] - ts[0]) / (K - 1)
        print(f"{label:22s} {m * 1e3:8.2f} ms marginal   "
              f"(t1 {ts[0] * 1e3:.1f} ms, t{K} {ts[1] * 1e3:.1f} ms)")
        return m

    diag_w = L.m_diag(w)
    dinv0 = jnp.where(diag_w > 0, 1.0 / diag_w, 0.0)
    state = struct_mg_setup(mg, dinv0)
    state = jax.tree_util.tree_map(jax.block_until_ready, state)
    fac = jax.tree_util.tree_map(
        jax.block_until_ready, L.mass_solver.factor(w)
    )

    # Component marginals (all flat-vector in/out so chains compose).
    marginal("Minv(in-loop fac)", lambda r: L.mass_solver(w, r), r_u)
    marginal("Minv(factored)",
             lambda r: L.mass_solver.apply_factored(fac, r), r_u)
    marginal("apply_Bt+B", lambda p: solver._apply_B(L, solver._apply_Bt(L, p)),
             r_s)
    marginal("apply_S", lambda p: solver._apply_B(
        L, L.mass_solver.apply_factored(fac, solver._apply_Bt(L, p))), r_s)
    d = len(mg.levels[0].shape)
    shape0 = mg.levels[0].shape

    def s0(x):
        xg = x.reshape(x.shape[:-1] + tuple(shape0[::-1]))
        return _s_apply_grid(state[0][0], xg).reshape(x.shape[:-1] + (-1,))

    marginal("mg_s_apply_0", s0, r_s)
    marginal("v_cycle", lambda r: struct_v_cycle(mg, state, r), r_s)
    marginal("setup(dinv+idiag+fac)", lambda d0: sum(
        x.sum() for ent in struct_mg_setup(mg, d0) for x in ent[0]
    ) + sum(t.sum() for axf in L.mass_solver.factor(
        jnp.exp(-d0[..., : L.n_s])) for t in axf) + d0, dinv0)

    # One full preconditioned CG iteration worth of work, composed.
    def cg_iter(p):
        Sp = solver._apply_B(
            L, L.mass_solver.apply_factored(fac, solver._apply_Bt(L, p))
        )
        z = struct_v_cycle(mg, state, Sp)
        return z + 1e-3 * p

    marginal("cg_iteration", cg_iter, r_s)


if __name__ == "__main__":
    main()
