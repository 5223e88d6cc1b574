"""Probe: does the grid-axis ORDER change the SPE10 V-cycle cost on TPU?

Hypothesis: TPU tiles the two minormost array axes to (8, 128) for f32.
The SPE10 grid (x, y, z) = (60, 220, 85) reshapes to arrays (..., 85, 220,
60) with minor dim 60 -> padded to 128 lanes and second-minor 220 -> 224:
~2.17x HBM/VMEM waste on every grid-shaped tensor. Reordering the mesh
axes so the LARGEST dim is minor, e.g. (y, z, x) mesh order -> array
(..., 60, 85, 220): minor 220 -> 256, second-minor 85 -> 88, ~1.20x waste.
If the structured V-cycle is bandwidth-bound, the reorder is worth up to
~1.8x.

Measures chain-amortized marginals (the tunnel has a ~28 ms dispatch
floor, CLAUDE.md) of s_apply and struct_v_cycle on the same 1.12M-cell
problem under each axis order. Purely synthetic dinv (layout probe, not a
physics run).

Usage (real TPU, from /root/repo): python examples/spe10_layout_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.mesh.factories import make_box_mesh
    from parelagmc_tpu.ops.coef_multigrid_structured import (
        build_struct_coef_mg,
        struct_mg_setup,
        struct_v_cycle,
        struct_s_apply,
    )
    from parelagmc_tpu.ops.jit_utils import jit_hoisted

    argv = sys.argv
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 16
    orders = [(60, 220, 85), (220, 85, 60), (220, 60, 85)]
    kchain, reps = 8, 6
    if "--smoke" in argv:  # CPU correctness smoke (tiny grids)
        jax.config.update("jax_platforms", "cpu")
        orders = [(6, 22, 9), (22, 9, 6), (22, 6, 9)]
        # K=8 chains make XLA:CPU's LLVM compile pathologically slow; the
        # smoke only checks the script runs, not the timing quality.
        kchain, reps = 2, 1

    def marginal(label, fn, x0, K=kchain, reps=reps):
        def chain(eps, k, x):
            y = x * (1.0 + eps)
            for _ in range(k):
                y = fn(y) * (1.0 + eps)
            return jnp.sum(y)

        ts = []
        for k in (1, K):
            f = jit_hoisted(lambda eps, x, _k=k: chain(eps, _k, x),
                            jnp.float32(0.0), x0)
            float(f(jnp.float32(0.0), x0))
            t0 = time.perf_counter()
            outs = [f(jnp.float32(1e-7 * (i + 1)), x0) for i in range(reps)]
            _ = [float(o) for o in outs]
            ts.append((time.perf_counter() - t0) / reps)
        m = (ts[1] - ts[0]) / (K - 1)
        print(f"{label:34s} {m * 1e3:8.2f} ms marginal   "
              f"(t1 {ts[0] * 1e3:.1f} ms, t{K} {ts[1] * 1e3:.1f} ms)")
        return m

    rng = np.random.default_rng(0)
    results = {}
    # (x, y, z) mesh orders: current SPE10, then largest-dim-minor variants.
    for order in orders:
        mesh = make_box_mesh(order)
        mg = build_struct_coef_mg(mesh)
        print(f"order {order}: level shapes {[l.shape for l in mg.levels]}")
        dinv0 = jnp.asarray(
            np.exp(rng.normal(size=(batch, mesh.num_faces)) * 0.3),
            jnp.float32,
        )
        state = struct_mg_setup(mg, dinv0)
        state = jax.tree_util.tree_map(jax.block_until_ready, state)
        r = jnp.asarray(
            rng.normal(size=(batch, mesh.num_cells)), jnp.float32
        )
        sa = marginal(f"s_apply {order}",
                      lambda x, _mg=mg, _st=state: struct_s_apply(_mg, _st, x), r)
        vc = marginal(f"v_cycle(2,2) {order}",
                      lambda x, _mg=mg, _st=state: struct_v_cycle(_mg, _st, x), r)
        results[order] = (sa, vc)

    base = results[orders[0]]
    for order, (sa, vc) in results.items():
        print(f"order {order}: s_apply {base[0] / sa:.2f}x, "
              f"v_cycle {base[1] / vc:.2f}x vs current")


if __name__ == "__main__":
    main()
