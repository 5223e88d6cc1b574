"""Decompose the structured SPE10 V-cycle cost (chain-amortized, real TPU).

The composed V(2,2) cycle measures ~22 ms marginal at level 0 batch 16
while its visible parts (4 level-0 S-applies at ~1.9 ms + transfers +
elementwise) only account for ~12 ms. This script times each structural
piece of ops/coef_multigrid_structured._v_cycle_grid separately to find
where the rest goes.

Usage (real TPU, from /root/repo):
    python examples/spe10_vcycle_profile.py [--batch 16]
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
        _prolong_cells,
        _restrict_cells,
        _s_apply_grid,
        struct_mg_setup,
        struct_v_cycle,
        _v_cycle_grid,
    )
    from parelagmc_tpu.ops.jit_utils import jit_hoisted
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv
    from parelagmc_tpu.problems import build_problem

    argv = sys.argv
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 16
    grid = (60, 220, 85)
    cfg = ProblemConfig(
        mesh="spe10", refinements=2, batch_size=batch,
        correlation_length=100.0, normalize_marginals=True,
    )
    cfg.darcy_solver.name = "cg-schur-coefmg"
    prob = build_problem(cfg, kinv_ref=load_spe10_kinv(None, ncells=grid))
    solver = prob.solver
    L = solver.levels[0]
    mg = L.coef_mg
    assert isinstance(mg, StructCoefMG), type(mg)
    d = len(mg.levels[0].shape)
    print("mg level shapes:", [l.shape for l in mg.levels])

    rng = np.random.default_rng(0)
    w = jnp.asarray(np.exp(rng.normal(size=(batch, L.n_s)) * 0.5), jnp.float32)
    r_s = jnp.asarray(rng.normal(size=(batch, L.n_s)), jnp.float32)

    def marginal(label, fn, x0, *extra, K=8, reps=6):
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
        print(f"{label:26s} {m * 1e3:8.2f} ms marginal   "
              f"(t1 {ts[0] * 1e3:.1f} ms, t{K} {ts[1] * 1e3:.1f} ms)")
        return m

    diag_w = L.m_diag(w)
    dinv0 = jnp.where(diag_w > 0, 1.0 / diag_w, 0.0)
    state = struct_mg_setup(mg, dinv0)
    state = jax.tree_util.tree_map(jax.block_until_ready, state)
    shape0 = mg.levels[0].shape

    def to_grid(x):
        return x.reshape(x.shape[:-1] + tuple(shape0[::-1]))

    bg = jax.block_until_ready(to_grid(r_s))
    dinv_axes0, idiag0 = state[0][0], state[0][1]

    # 1. One Jacobi sweep at level 0 (residual form).
    def sweep0(x):
        return x + mg.omega * idiag0 * (bg - _s_apply_grid(dinv_axes0, x))

    marginal("jacobi_sweep_0", sweep0, bg)

    # 2. Restrict level0 -> level1 -> prolong back (transfer roundtrip).
    nxt = mg.levels[1]

    def roundtrip(x):
        rc = _restrict_cells(x, nxt, d)
        return _prolong_cells(rc, nxt, d)

    marginal("restrict+prolong_0to1", roundtrip, bg)

    # 3. The whole coarse solve (levels 1..end) on a level-1 grid.
    bg1 = jax.block_until_ready(_restrict_cells(bg, nxt, d))

    def coarse_cycle(r1):
        return _v_cycle_grid(mg, state, r1, 2, 1)

    marginal("v_cycle_from_level_1", coarse_cycle, bg1)

    # 4. Full cycle, sweeps=1 (V(1,1)) vs the default V(2,2).
    marginal("v_cycle_sweeps1",
             lambda r: struct_v_cycle(mg, state, r, sweeps=1), r_s)
    marginal("v_cycle_sweeps2",
             lambda r: struct_v_cycle(mg, state, r, sweeps=2), r_s)

    # 5. S-apply at level 0 alone (for reference within this run).
    marginal("s_apply_0", lambda x: _s_apply_grid(dinv_axes0, x), bg)


if __name__ == "__main__":
    main()
