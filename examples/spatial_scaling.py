"""Spatial domain-decomposition evidence: sharded vs replicated Darcy.

Produces the measured table behind the spatial-DD claims (README
"Parallelism axes", parallel/spatial_darcy.py): for an SPE10-shaped
heterogeneous level, compare the replicated solve against the spatially
sharded one — Krylov iterations, QoI agreement, and XLA compiled
per-device memory — for the slab-Jacobi and two-level-Schwarz-coefMG
preconditioners and the composed (dp, sp) mesh. Writes
SPATIAL_EVIDENCE.json.

Runs on the virtual 8-device CPU mesh (default; the same shard_map
program runs unchanged on a real multi-chip TPU mesh), so it is
CPU-verifiable evidence: correctness and iteration counts transfer to
hardware, absolute walltime does not. Reference analog: the MPI strong
scaling of src/DarcySolver.cpp:651-675 over ParMesh ranks.

Usage: python examples/spatial_scaling.py [--grid 60,110,42] [--shards 8]
"""

import sys

sys.path.insert(0, ".")

import argparse
import dataclasses
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--grid", default="60,110,42")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--dtype", default="float64",
                   help="float64 needs the CPU mesh (tests/conftest.py)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                   help="cpu (default): force the virtual host mesh via "
                        "jax.config (env vars are too late - this session "
                        "pre-imports jax, CLAUDE.md); 'default' keeps the "
                        "session platform for a real multi-chip mesh")
    p.add_argument("--out", default="SPATIAL_EVIDENCE.json")
    args = p.parse_args(argv)

    import os

    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.shards}"
        ).strip()
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    if len(jax.devices()) < args.shards:
        raise SystemExit(
            f"need {args.shards} devices; run under JAX_PLATFORMS=cpu with "
            "xla_force_host_platform_device_count or on a multi-chip mesh"
        )
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.fem.hierarchy import build_geometric_hierarchy_from_fine
    from parelagmc_tpu.mesh.factories import (
        SPE10_NCELLS,
        SPE10_SPACING,
        make_box_mesh,
    )
    from parelagmc_tpu.parallel.spatial_darcy import SpatialDarcy
    from parelagmc_tpu.physics import DarcySolver
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv

    grid = tuple(int(x) for x in args.grid.split(","))
    lengths = tuple(n * h for n, h in zip(SPE10_NCELLS, SPE10_SPACING))
    mesh = make_box_mesh(grid, spacings=[l / n for l, n in zip(lengths, grid)])
    kinv = load_spe10_kinv(None, ncells=grid)
    hier = build_geometric_hierarchy_from_fine(mesh, 1)
    dt = jnp.float64 if args.dtype == "float64" else jnp.float32

    def solver_for(name):
        cfg = ProblemConfig(
            mesh="box", ncells=grid, lengths=lengths, refinements=0,
            dtype=args.dtype,
        )
        cfg.darcy_solver.name = name
        cfg.darcy_solver.relative_tolerance = args.rtol
        cfg.darcy_solver.max_iterations = 20000
        cfg.darcy_solver.local_schur_scaling = True
        return DarcySolver(hier, cfg, dt, kinv_ref=kinv)

    rng = np.random.default_rng(0)
    w = jnp.asarray(
        np.exp(rng.normal(size=(args.batch, mesh.num_cells)) * 0.5), dtype=dt
    )

    results = {
        "grid": grid,
        "shards": args.shards,
        "batch": args.batch,
        "rtol": args.rtol,
        "dtype": args.dtype,
        "kinv_contrast": float(kinv.max() / kinv.min()),
        "runs": {},
    }

    # Deep-converged truth: ALL equal-rtol QoI errors are Krylov errors
    # riding low-eigenvalue modes (preconditioner-dependent at equal
    # residual; CLAUDE.md r3 rtol root-cause), so every config is scored
    # against the same deep reference, replicated included.
    deep = solver_for("cg-schur-coefmg")
    deep.solver_cfg = dataclasses.replace(
        deep.solver_cfg, relative_tolerance=min(args.rtol * 1e-3, 1e-9)
    )
    q_true = np.asarray(deep.solve_fwd(0, w)[0])

    solver = solver_for("cg-schur-coefmg")
    q_rep, _, info = solver.solve_fwd(0, w)
    f_ref = jax.jit(lambda w: solver.solve_fwd(0, w)[0])
    mem_ref = f_ref.lower(w).compile().memory_analysis()
    results["runs"]["replicated-coefmg"] = {
        "iterations": int(np.asarray(info.iterations)),
        "temp_mb_per_device": round(mem_ref.temp_size_in_bytes / 1e6, 1),
        "qoi_rel_err_vs_deep": float(
            np.max(np.abs((np.asarray(q_rep) - q_true) / q_true))
        ),
    }

    def capture(tag, sp, adjoint=False):
        if adjoint:
            q, it, rel, conv = sp.solve_fwd(w, adjoint=True)
        else:
            q, it, rel, conv = sp.solve_fwd(w)
        key = (1, False, False, adjoint, False)
        mem = (
            sp._jit_solve[key]
            .lower(sp.grids, sp._to_grid(w, 1.0))
            .compile()
            .memory_analysis()
        )
        results["runs"][tag] = {
            "iterations": int(np.max(np.asarray(it))),
            "relres": float(np.max(np.asarray(rel))),
            "converged_fraction": float(np.mean(np.asarray(conv))),
            "qoi_rel_err_vs_deep": float(
                np.max(np.abs((np.asarray(q) - q_true) / q_true))
            ),
            "temp_mb_per_device": round(mem.temp_size_in_bytes / 1e6, 1),
        }

    capture(
        "sharded-jacobi",
        SpatialDarcy.from_darcy(solver_for("cg-schur"), 0, n_sp=args.shards),
    )
    sp_mg = SpatialDarcy.from_darcy(solver, 0, n_sp=args.shards)
    capture("sharded-coefmg-2level", sp_mg)
    # PRODUCTION configuration (round-3 VERDICT item 5): the adjoint-
    # corrected QoI inside the sharded solve - what an SPE10-scale sp run
    # actually uses (config.adjoint_qoi; QoI error = product of the primal
    # and adjoint residuals, so the loose rtol stays QoI-valid where the
    # plain rows above carry the full contrast-amplified residual error).
    # Scored against the same deep truth; compare with the replicated
    # adjoint row for the sharding-is-free check.
    adj_rep = solver_for("cg-schur-coefmg")
    adj_rep.solver_cfg = dataclasses.replace(adj_rep.solver_cfg, adjoint_qoi=True)
    q_arep, _, info_arep = adj_rep.solve_fwd(0, w)
    results["runs"]["replicated-adjoint"] = {
        "iterations": int(np.asarray(info_arep.iterations)),
        "qoi_rel_err_vs_deep": float(
            np.max(np.abs((np.asarray(q_arep) - q_true) / q_true))
        ),
    }
    capture("sharded-adjoint", sp_mg, adjoint=True)
    results["runs"]["sharded-coefmg-2level"]["handoff_level"] = sp_mg.k_handoff
    # Tight-rtol sharded run: the flux QoI needs ~1e-7 residuals at this
    # contrast regardless of preconditioner; report the cost of honesty.
    tight = solver_for("cg-schur-coefmg")
    tight.solver_cfg = dataclasses.replace(
        tight.solver_cfg, relative_tolerance=args.rtol * 1e-2
    )
    capture(
        "sharded-coefmg-2level-tight",
        SpatialDarcy.from_darcy(tight, 0, n_sp=args.shards),
    )
    if args.shards % 2 == 0 and args.batch % 2 == 0:
        sp_dpxsp = SpatialDarcy.from_darcy(
            solver, 0, n_sp=args.shards // 2, n_dp=2
        )
        capture("sharded-dpxsp-coefmg", sp_dpxsp)
        # PRODUCTION composed row (round-4 VERDICT weak item 1): the
        # adjoint-corrected QoI through the composed (dp, sp) mesh - the
        # plain dpxsp row above carries the contrast-amplified residual
        # error (~0.1 at rtol 1e-5) that the adjoint correction removes.
        capture("sharded-dpxsp-adjoint", sp_dpxsp, adjoint=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{'config':30s} {'iters':>6s} {'temp MB/dev':>12s} "
          f"{'dQ/Q vs deep':>13s}")
    for tag, r in results["runs"].items():
        print(f"{tag:30s} {r['iterations']:6d} "
              f"{r.get('temp_mb_per_device', float('nan')):12.1f} "
              f"{r['qoi_rel_err_vs_deep']:13.1e}")
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
