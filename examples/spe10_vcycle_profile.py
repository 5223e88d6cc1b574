"""Profile the per-sample coef-MG V-cycle subcomponents at SPE10 level 0.

The level-0 breakdown (examples/spe10_level0_breakdown.py) showed the
V(2,2) cycle costing ~550 ms/call at batch 8 - an order of magnitude above
its HBM-bandwidth bound and ~4x the exact tridiagonal Schur apply it
preconditions. This script times each piece on the real TPU:

  dinvs     - per-level face-vector setup (coef_mg_dinvs)
  s_apply_0 - one fine-level stencil apply (_s_apply)
  jdiag_0   - fine-level Jacobi diagonal (_jacobi_diag)
  cycle     - full coef_v_cycle given precomputed dinvs

Usage (real TPU, from /root/repo): python examples/spe10_vcycle_profile.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.ops.coef_multigrid import (
        _jacobi_diag,
        _s_apply,
        coef_mg_dinvs,
        coef_v_cycle,
    )
    from parelagmc_tpu.ops.jit_utils import jit_hoisted
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv
    from parelagmc_tpu.problems import build_problem

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 8
    cfg = ProblemConfig(
        mesh="spe10", refinements=2, batch_size=batch,
        correlation_length=100.0, normalize_marginals=True,
    )
    cfg.darcy_solver.name = "cg-schur-coefmg"
    prob = build_problem(cfg, kinv_ref=load_spe10_kinv(None, ncells=(60, 220, 85)))
    L = prob.solver.levels[0]
    mg = L.coef_mg
    print("mg levels:", [int(l.face_cells.shape[0]) for l in mg.levels])

    rng = np.random.default_rng(0)
    w = jnp.asarray(
        np.exp(rng.normal(size=(batch, L.n_s)) * 0.5), dtype=jnp.float32
    )
    r_s = jnp.asarray(rng.normal(size=(batch, L.n_s)), dtype=jnp.float32)
    diag_w = L.m_diag(w)
    dinv0 = jnp.where(diag_w > 0, 1.0 / diag_w, 0.0)
    dinvs = list(coef_mg_dinvs(mg, dinv0))
    dinvs = [jax.block_until_ready(d) for d in dinvs]

    def timed(label, fn, *args, reps=10):
        g = lambda eps, *a: jnp.sum(fn(a[0] * (1.0 + eps), *a[1:]))
        zero = jnp.float32(0.0)
        f = jit_hoisted(g, zero, *args)
        float(f(zero, *args))
        t0 = time.perf_counter()
        outs = [f(jnp.float32(1e-6 * (i + 1)), *args) for i in range(reps)]
        vals = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:12s} {dt * 1e3:8.2f} ms/call   (checksum {vals[-1]:.3e})")
        return dt

    timed("dinvs", lambda d0: jnp.concatenate(
        [x.sum(-1, keepdims=True) for x in coef_mg_dinvs(mg, d0)], -1), dinv0)
    timed("s_apply_0", lambda x: _s_apply(mg.levels[0], dinvs[0], x), r_s)
    timed("jdiag_0", lambda d0: _jacobi_diag(mg.levels[0], d0), dinv0)
    for lvl in range(1, len(mg.levels)):
        n_c = int(mg.levels[lvl].cell_src.shape[0])
        x_l = jnp.asarray(rng.normal(size=(batch, n_c)), dtype=jnp.float32)
        timed(f"s_apply_{lvl}", lambda x, l=lvl: _s_apply(mg.levels[l], dinvs[l], x), x_l)
    timed("cycle", lambda x: coef_v_cycle(mg, dinvs, x), r_s)


if __name__ == "__main__":
    main()
