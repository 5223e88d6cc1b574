"""Pallas TPU kernel for batched Thomas tridiagonal solves.

The XLA formulation of the batched Thomas sweep (ops/mass_solve._thomas_solve,
a lax.scan over the solved axis) costs one HLO loop step per matrix row:
at SPE10 scale that is ~370 sequential dispatches per M(w)^{-1} apply
(x/y/z lines of length 61/221/86), and each step round-trips its carry
through HBM. Measured on the real TPU it runs ~12x above the pure
bandwidth bound (35 ms vs ~3 ms at 4.6M faces, batch 16) and is the
largest single component of the SPE10 level-0 Schur-CG iteration.

Measured on the real TPU (SPE10 y-axis lines: batch 16, 5100 lines x 221,
18M unknowns) with chain amortization (the tunnel's ~28 ms per-program
dispatch floor swamps single-call timings): scan 1.28 ms -> pallas
<=0.6 ms marginal per solve. A statically-unrolled variant compiled 149 s
and ran no faster, so the fori_loop form is kept.

This kernel runs the whole forward-elimination + back-substitution
recurrence inside ONE Pallas program with the c/g intermediates resident
in VMEM:

* host-side layout: the solved axis becomes the leading (untiled) array
  dimension and the independent lines are flattened and tiled as
  (sublane, lane) = (8, 128) blocks, so every sequential step updates
  full native VPU tiles;
* the grid partitions the lines; each grid cell owns `block_lines` lines
  end-to-end (no cross-cell dependencies - lines are independent);
* the sequential loop is a fori_loop over rows with the carry in
  registers and c/g stored to VMEM scratch for the backward sweep.

The recurrences are identical to _thomas_solve (forward
c_i = du_i/(d_i - dl_i c_{i-1}), g_i = (b_i - dl_i g_{i-1})/denom;
backward x_i = g_i - c_i x_{i+1}); systems are SPD diagonally-dominant
RT0 mass lines, so no pivoting. Oracle-tested against the scan
implementation (tests/test_mass_solve.py, the "pallas" variant of
test_mass_tridiag_scan_variants_match_dense) and run in interpreter mode
on CPU.

Reference context: the reference never needs this - hypre AMG smooths
unstructured velocity blocks (/root/reference/src/DarcySolver.cpp:562-649);
the exact line-solve path exists because tensor-product RT0 mass matrices
decouple into tridiagonal lines (ops/mass_solve.py docstring).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128
_SUBLANE = 8

# Pallas kernels cannot be traced under jax.ensure_compile_time_eval():
# values created inside the kernel (loop bounds, zero carries) materialize
# as CONCRETE arrays and pallas_call rejects kernels that capture
# constants (measured 2026-08-20 on the meanfield_x0 setup solve, which
# runs its one-time reference solve inside that escape hatch). Callers
# that trace under compile-time eval wrap the region in force_scan(); the
# solve then routes to the lax.scan Thomas path - one-time setup cost,
# identical results (oracle-tested against the kernel).
_FORCE_SCAN = contextvars.ContextVar("tridiag_force_scan", default=False)


@contextlib.contextmanager
def force_scan():
    tok = _FORCE_SCAN.set(True)
    try:
        yield
    finally:
        _FORCE_SCAN.reset(tok)


def _thomas_kernel(dl_ref, d_ref, du_ref, b_ref, x_ref, c_ref, g_ref):
    n = dl_ref.shape[0]
    # Derive the zero carry from a ref so it is always a kernel-trace
    # value: a literal jnp.zeros here becomes a CONCRETE array when the
    # enclosing program runs under jax.ensure_compile_time_eval() (the
    # meanfield_x0 setup path), and Pallas TPU rejects kernels that
    # capture constants ("captures constants [f32[8,128]]", measured
    # 2026-08-20 on the meanfield_x0 at-scale A/B).
    zero = dl_ref[0] * 0.0

    def fwd(i, carry):
        c_prev, g_prev = carry
        dl_i = dl_ref[i]
        inv = 1.0 / (d_ref[i] - dl_i * c_prev)
        c_i = du_ref[i] * inv
        g_i = (b_ref[i] - dl_i * g_prev) * inv
        c_ref[i] = c_i
        g_ref[i] = g_i
        return (c_i, g_i)

    jax.lax.fori_loop(0, n, fwd, (zero, zero))

    def bwd(j, x_next):
        i = n - 1 - j
        x_i = g_ref[i] - c_ref[i] * x_next
        x_ref[i] = x_i
        return x_i

    jax.lax.fori_loop(0, n, bwd, zero)


def tridiag_thomas_pallas(dl, d, du, b, *, block_lines: int = 1024,
                          interpret: bool | None = None):
    """Solve tridiag(dl, d, du) x = b along the LAST axis, batched over all
    leading axes (dl/d/du broadcast against b). Drop-in replacement for
    ops.mass_solve._thomas_solve with the sequential sweep fused into a
    single TPU kernel. On CPU backends the kernel runs in interpreter
    mode (correctness only; the scan path is the CPU fast path).
    """
    if _FORCE_SCAN.get():
        from parelagmc_tpu.ops.mass_solve import _thomas_solve

        return _thomas_solve(dl, d, du, b)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_lines % (_SUBLANE * _LANE) != 0:
        raise ValueError(
            f"block_lines must be a multiple of {_SUBLANE * _LANE} "
            f"(sublane x lane tile), got {block_lines}"
        )
    return _tridiag_thomas_pallas(dl, d, du, b, block_lines=block_lines,
                                  interpret=bool(interpret))


@functools.partial(jax.jit, static_argnames=("block_lines", "interpret"))
def _tridiag_thomas_pallas(dl, d, du, b, *, block_lines: int,
                           interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = b.shape[-1]
    lead = b.shape[:-1]
    nlines = int(np.prod(lead)) if lead else 1
    lp = -(-nlines // block_lines) * block_lines

    def prep(x, pad_value):
        x = jnp.broadcast_to(x, b.shape)
        x = jnp.moveaxis(x.reshape(lead + (n,)), -1, 0).reshape(n, nlines)
        if lp != nlines:
            x = jnp.pad(x, ((0, 0), (0, lp - nlines)),
                        constant_values=pad_value)
        return x.reshape(n, lp // _LANE, _LANE)

    # Padding lines solve 1*x = 0: harmless, discarded below.
    dl2, d2, du2, b2 = (prep(dl, 0.0), prep(d, 1.0), prep(du, 0.0),
                        prep(b, 0.0))

    sub = block_lines // _LANE
    spec = pl.BlockSpec((n, sub, _LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((n, lp // _LANE, _LANE), b.dtype),
        grid=(lp // block_lines,),
        in_specs=[spec] * 4,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((n, sub, _LANE), b.dtype)] * 2,
        interpret=interpret,
    )(dl2, d2, du2, b2)

    x = x.reshape(n, lp)[:, :nlines]
    return jnp.moveaxis(x.reshape((n,) + lead), 0, -1)
