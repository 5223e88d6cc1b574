"""Per-sample Galerkin Schur multigrid, structured-grid specialization.

Mathematically identical to ops/coef_multigrid.py (same Galerkin face-sum
identity, same V-cycle / smoothers - see that module's docstring for the
derivation and the reference citation), but every device operation is a
static SLICE / RESHAPE / PAD instead of a gather:

* the face-form stencil apply S(w) x becomes per-axis zero-padded
  first differences (flux t_k = dinv_k (x_{k-1} - x_k)) followed by the
  adjoint difference (S x)_i = t_{i+1} - t_i,
* the Jacobi diagonal is d_i + d_{i+1} accumulated per axis,
* cell restriction / prolongation are per-axis group sums / repeats
  (groups of 2 with a trailing 2-or-3 group - exactly
  fem/hierarchy.derefine_axis's coarsening pattern),
* the per-sample hierarchy setup (coarse dinv) selects the coarse face
  planes (static indices) and group-sums the transverse directions.

Why this exists: measured on the real TPU at SPE10 level 0 (1.12M cells,
batch 8), the gather-based V(2,2) cycle costs ~550 ms/call - two orders of
magnitude above its bandwidth bound - because large take()s along the dof
axis defeat XLA's TPU vectorizer. The slicing formulation is pure VPU
work at HBM speed. The generic module remains the oracle (bit-compatible
up to float reassociation) and the fallback for unstructured/agglomerated
meshes (build_coef_mg_graph).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class StructMGLevel(NamedTuple):
    shape: Tuple[int, ...]  # cells per mesh axis (x first)
    # Per mesh axis: number of fine cells on the PREVIOUS (finer) level
    # mapped onto this level's cells as [2]*(m-1) + [tail] groups
    # (fem/hierarchy.derefine_axis); () on level 0.
    fine_shape: Tuple[int, ...] = ()


class StructCoefMG(NamedTuple):
    levels: Tuple[StructMGLevel, ...]
    face_offsets: Tuple[int, ...]  # level-0 flat face-vector offsets
    omega: float
    coarse_sweeps: int
    cheby_order: int = 0
    cheby_lo: float = 0.25
    # Per-sample LINE relaxation (batched Thomas solves along these mesh
    # axes) instead of the point Jacobi/Chebyshev smoother. Why it exists:
    # a thin high-contrast barrier INSIDE a 2-cell coarsening group is
    # invisible to every P0 Galerkin coarse level (the intra-group face
    # drops out of RAP entirely) and point smoothers reduce the jump mode
    # across it at rate ~ 1 - g_barrier/diag ~ 1 - 1e-6 per sweep - these
    # are exactly the near-null barrier modes that make the Schur CG's
    # QoI conditioning ~1e5 at SPE10 contrast (CLAUDE.md r3 revised).
    # A line solve along the axis NORMAL to the barrier inverts the weak
    # link exactly (it is IN the tridiagonal), killing the mode in one
    # sweep. Reference analog: hypre's BoomerAMG handles this via
    # strength-of-connection coarsening; per-sample coefficient-adaptive
    # AGGREGATION would break the static tensor structure on TPU, so the
    # smoother absorbs the coefficient adaptivity instead.
    line_axes: Tuple[int, ...] = ()
    line_omega: float = 1.0
    # "galerkin": P0 RAP coarse faces (_plane_select, the exact face-sum
    # identity). "harmonic": series-composed coarse faces (_face_series)
    # so thin barriers stay visible on every level - pair with line_axes
    # for barrier-dominated coefficients.
    coarsen: str = "galerkin"


def build_struct_coef_mg(
    mesh,
    cutoff: int = 5000,
    coarse_sweeps: int = 8,
    omega: float = 0.8,
    cheby_order: int = 0,
    cheby_lo: float = 0.25,
    line_axes: Tuple[int, ...] = (),
    line_omega: float = 1.0,
    coarsen: str = "galerkin",
) -> StructCoefMG:
    """MG level shapes below `mesh` (a StructuredMesh), derefining by 2 per
    axis until <= cutoff cells - the same ladder as build_coef_mg. The
    per-sample coefficient and all boundary/essential masking enter at
    solve time through dinv0 (the masked mass-diagonal inverse)."""
    from parelagmc_tpu.fem.hierarchy import derefine_axis
    from parelagmc_tpu.mesh.structured import StructuredMesh

    meshes = [mesh]
    while meshes[-1].num_cells > cutoff and max(meshes[-1].shape) > 2:
        meshes.append(StructuredMesh([derefine_axis(a) for a in meshes[-1].axes]))
    levels = [StructMGLevel(shape=tuple(int(s) for s in meshes[0].shape))]
    for l in range(1, len(meshes)):
        levels.append(
            StructMGLevel(
                shape=tuple(int(s) for s in meshes[l].shape),
                fine_shape=tuple(int(s) for s in meshes[l - 1].shape),
            )
        )
    return StructCoefMG(
        levels=tuple(levels),
        face_offsets=tuple(int(x) for x in mesh.face_offsets),
        omega=float(omega),
        coarse_sweeps=int(coarse_sweeps),
        cheby_order=int(cheby_order),
        cheby_lo=float(cheby_lo),
        line_axes=tuple(int(a) for a in line_axes),
        line_omega=float(line_omega),
        coarsen=str(coarsen),
    )


# -- static axis helpers ------------------------------------------------------
#
# Array layout convention (CLAUDE.md): flat cell/face vectors are x-fastest,
# grids reshape to (..., z, y, x); mesh axis a lives at array axis
# ndim - 1 - a.


def _arr_ax(x: jnp.ndarray, d: int, a: int) -> int:
    return x.ndim - 1 - a


def _tail(n_f: int, n_c: int) -> int:
    """Size of the trailing group when n_f fine cells coarsen to n_c."""
    return n_f - 2 * (n_c - 1)


# MISCOMPILE GUARD (measured, 2026-08-18): axis-native forms of the three
# transfer helpers below (middle-axis reshape-split + sum for _group_sum,
# expand_dims + broadcast + reshape-merge for _repeat_groups, middle-axis
# strided slice for _plane_select - no moveaxis anywhere) are MISCOMPILED
# by this XLA:TPU backend when all three are fused into a multi-level
# V-cycle program at batch >= 2: outputs for sample 0 change with the
# batch size (max rel diff O(1); CPU backend is exact on the identical
# jaxpr, batch 1 is exact, and every helper is exact in isolation - only
# the composed multi-output program breaks, e.g. at level shapes
# (110,30,42)/(55,15,21)/(27,7,10)). Reverting ANY one helper to the
# moveaxis(axis, -1) form below clears the observed reproducer, but the
# failure is fusion-context-dependent, so ALL THREE stay in the
# moveaxis form (round-2 production-proven at SPE10 scale). The axis-
# native variants saved one lane-crossing transpose per axis per
# transfer; do not reintroduce them without a batch-consistency check on
# real TPU (examples/spe10_performance.py --selfcheck).


def _group_sum(x: jnp.ndarray, axis: int, n_f: int, n_c: int) -> jnp.ndarray:
    """Sum groups of [2]*(n_c-1) + [tail] along `axis` (slices only)."""
    if n_c == n_f:  # passthrough axis (already 1-2 cells)
        return x
    x = jnp.moveaxis(x, axis, -1)
    main = x[..., : 2 * (n_c - 1)]
    main = main.reshape(main.shape[:-1] + (n_c - 1, 2)).sum(axis=-1)
    tail = x[..., 2 * (n_c - 1):].sum(axis=-1, keepdims=True)
    return jnp.moveaxis(jnp.concatenate([main, tail], axis=-1), -1, axis)


def _repeat_groups(x: jnp.ndarray, axis: int, n_f: int, n_c: int) -> jnp.ndarray:
    """Adjoint-structure of _group_sum: repeat each of the n_c entries of
    `x` along `axis` over its [2]*(n_c-1) + [tail] group, yielding n_f."""
    if n_c == n_f:
        return x
    t = _tail(n_f, n_c)
    x = jnp.moveaxis(x, axis, -1)
    main = x[..., : n_c - 1]
    main = jnp.broadcast_to(
        main[..., None], main.shape + (2,)
    ).reshape(main.shape[:-1] + (2 * (n_c - 1),))
    tail = jnp.broadcast_to(x[..., n_c - 1:], x.shape[:-1] + (t,))
    return jnp.moveaxis(jnp.concatenate([main, tail], axis=-1), -1, axis)


def _plane_select(x: jnp.ndarray, axis: int, n_f: int, n_c: int) -> jnp.ndarray:
    """Coarse face planes of one axis: fine planes 0, 2, ..., 2(n_c-1), n_f
    (static strided slice + the final plane)."""
    if n_c == n_f:
        return x
    x = jnp.moveaxis(x, axis, -1)
    main = x[..., : 2 * (n_c - 1) + 1: 2]
    last = x[..., n_f:]
    return jnp.moveaxis(jnp.concatenate([main, last], axis=-1), -1, axis)


def _series(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Conductances in series: ab/(a+b), 0-safe (a 0-conductance
    (essential/blocked) face stays blocked)."""
    s = a + b
    return jnp.where(s > 0, a * b / jnp.where(s > 0, s, 1.0), 0.0)


def _face_series(x: jnp.ndarray, axis: int, n_f: int, n_c: int) -> jnp.ndarray:
    """Harmonic (series) coarse faces of one axis: coarse face k combines
    fine faces [2k, 2k+1] in series (the last combines the 1-2 faces the
    tail cell leaves over). This is the 2-point-flux REdiscretization of
    the coarse grid rather than the P0 Galerkin RAP (_plane_select, which
    keeps only the selected plane): a thin blocking layer anywhere in the
    fine grid stays visible on EVERY coarse level instead of being
    short-circuited when it lands on a dropped (intra-group) plane. For a
    constant coefficient, series(d, d) = d/2 reproduces the 2-point-flux
    REdiscretization of the coarse grid - HALF the P0 RAP face sum: plain
    (unsmoothed) aggregation's rigid-aggregate energy overestimates
    inter-aggregate stiffness 2x per coarsened axis, which is exactly the
    overcorrection-factor-2 phenomenon of aggregation MG, and removing it
    is a second reason this option converges faster (measured on the
    half-scale synthetic SPE10 at rtol 1e-7: 51 -> 34 CG iterations with
    the cheb3 smoother, 49 -> 28 with cheb3 + z lines). Moveaxis form per
    the MISCOMPILE GUARD above."""
    if n_c == n_f:
        return x
    x = jnp.moveaxis(x, axis, -1)
    main = _series(x[..., : 2 * n_c: 2], x[..., 1: 2 * n_c: 2])
    rest = x[..., 2 * n_c:]  # tail-cell leftovers: 1 (tail 2) or 2 (tail 3)
    last = rest[..., :1] if rest.shape[-1] == 1 else _series(
        rest[..., :1], rest[..., 1:2]
    )
    return jnp.moveaxis(jnp.concatenate([main, last], axis=-1), -1, axis)


# -- per-sample hierarchy setup ----------------------------------------------


def struct_mg_dinvs(mg: StructCoefMG, dinv0_flat: jnp.ndarray):
    """Per-level tuples of per-axis face-grid dinv arrays from the flat
    masked mass-diagonal inverse (batch, n_u). Level-0 reshape is free;
    each coarser level = plane-select along the face axis + transverse
    group sums (the Galerkin face-sum identity, slices only)."""
    d = len(mg.levels[0].shape)
    batch = dinv0_flat.shape[:-1]
    shape0 = mg.levels[0].shape
    axes0 = []
    for a in range(d):
        fshape = list(shape0)
        fshape[a] += 1
        seg = dinv0_flat[..., mg.face_offsets[a]: mg.face_offsets[a + 1]]
        axes0.append(seg.reshape(batch + tuple(fshape[::-1])))
    out = [tuple(axes0)]
    coarsen_face = (
        _face_series if getattr(mg, "coarsen", "galerkin") == "harmonic"
        else _plane_select
    )
    for lvl in mg.levels[1:]:
        prev = out[-1]
        cur = []
        for a in range(d):
            x = prev[a]
            x = coarsen_face(
                x, _arr_ax(x, d, a), lvl.fine_shape[a], lvl.shape[a]
            )
            for b in range(d):
                if b != a:
                    x = _group_sum(
                        x, _arr_ax(x, d, b), lvl.fine_shape[b], lvl.shape[b]
                    )
            cur.append(x)
        out.append(tuple(cur))
    return out


def _line_tables(dinv_axes, d: int, a: int):
    """Tridiagonal tables for line relaxation along mesh axis a on the
    cell grid, solved axis LAST: full Jacobi diagonal (all axes' face
    pairs), off-diagonals -dinv_a at the interior faces. T_a is an
    M-matrix with the FULL diagonal, so it is SPD and 2 T_a - S is
    diagonally dominant: the undamped line-Jacobi sweep is S-convergent
    and the V-cycle stays a valid CG preconditioner."""
    diag = _jdiag_grid(dinv_axes, d)
    da = dinv_axes[a]
    dm = jnp.moveaxis(da, _arr_ax(da, d, a), -1)  # (..., n_a + 1) faces
    # Cell i couples to i-1 through face i and to i+1 through face i+1;
    # boundary faces 0 and n_a only contribute to the diagonal (the
    # Thomas recurrence never reads dl[0] / du[n_a - 1]).
    dl = -dm[..., :-1]
    du = -dm[..., 1:]
    dd = jnp.moveaxis(diag, _arr_ax(diag, d, a), -1)
    return dl, dd, du


def struct_mg_setup(mg: StructCoefMG, dinv0_flat: jnp.ndarray):
    """Full per-solve V-cycle state: per level (dinv_axes, idiag,
    line_tables) with the inverse Jacobi diagonal (and, when mg.line_axes
    is set, the per-axis tridiagonal line tables) precomputed. Like the
    Thomas tables (ops/mass_solve.factor), these depend only on the sample
    coefficient; computing them inside the V-cycle re-pays their
    slice/where/reciprocal chains every preconditioner application inside
    the CG while_loop (XLA does not hoist loop invariants out of while
    bodies)."""
    d = len(mg.levels[0].shape)
    dinvs = struct_mg_dinvs(mg, dinv0_flat)
    out = []
    for axes in dinvs:
        lines = tuple(_line_tables(axes, d, a) for a in mg.line_axes)
        out.append((axes, 1.0 / _jdiag_grid(axes, d), lines))
    return out


def _as_state(mg: StructCoefMG, dinvs):
    """Accept either struct_mg_setup state or bare struct_mg_dinvs output
    (oracle tests / older call sites) and normalize to state entries."""
    d = len(mg.levels[0].shape)
    if dinvs and isinstance(dinvs[0], tuple) and len(dinvs[0]) in (2, 3) and (
        isinstance(dinvs[0][0], tuple)
    ):
        if len(dinvs[0]) == 3:
            return dinvs
        return [
            (
                axes,
                idiag,
                tuple(_line_tables(axes, d, a) for a in mg.line_axes),
            )
            for axes, idiag in dinvs
        ]
    return [
        (
            axes,
            1.0 / _jdiag_grid(axes, d),
            tuple(_line_tables(axes, d, a) for a in mg.line_axes),
        )
        for axes in dinvs
    ]


# -- device apply -------------------------------------------------------------


def _s_apply_grid(dinv_axes, x: jnp.ndarray) -> jnp.ndarray:
    """S x on the cell grid: per axis, flux t_k = d_k (x_{k-1} - x_k) with
    zero-padded exterior, then (S x)_i += t_{i+1} - t_i. Matches the
    face-form operator of ops/coef_multigrid._s_apply exactly (per-face
    sign flips cancel; boundary faces see the zero pad; essential faces
    carry dinv = 0)."""
    d = len(dinv_axes)
    y = None
    for a in range(d):
        ax = _arr_ax(x, d, a)
        pad = [(0, 0)] * x.ndim
        pad[ax] = (1, 1)
        xp = jnp.pad(x, pad)
        lo = [slice(None)] * x.ndim
        hi = [slice(None)] * x.ndim
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        t = dinv_axes[a] * (xp[tuple(lo)] - xp[tuple(hi)])
        contrib = t[tuple(hi)] - t[tuple(lo)]
        y = contrib if y is None else y + contrib
    return y


def _jdiag_grid(dinv_axes, d: int) -> jnp.ndarray:
    diag = None
    for a in range(d):
        da = dinv_axes[a]
        ax = _arr_ax(da, d, a)
        lo = [slice(None)] * da.ndim
        hi = [slice(None)] * da.ndim
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        c = da[tuple(lo)] + da[tuple(hi)]
        diag = c if diag is None else diag + c
    return jnp.where(diag > 0, diag, 1.0)


def _restrict_cells(x: jnp.ndarray, lvl: StructMGLevel, d: int) -> jnp.ndarray:
    for a in range(d):
        x = _group_sum(x, _arr_ax(x, d, a), lvl.fine_shape[a], lvl.shape[a])
    return x


def _prolong_cells(x: jnp.ndarray, lvl: StructMGLevel, d: int) -> jnp.ndarray:
    for a in range(d):
        x = _repeat_groups(x, _arr_ax(x, d, a), lvl.fine_shape[a], lvl.shape[a])
    return x


def _cheb_smooth_grid(mg, dinv_axes, idiag, b, x):
    """Order-k Chebyshev(Jacobi) sweep on [cheby_lo*2, 2] of D^{-1}S
    (mirrors ops/coef_multigrid._cheb_smooth)."""
    lam_max = 2.0
    lam_min = mg.cheby_lo * lam_max
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma = theta / delta
    rho = 1.0 / sigma
    if x is None:
        r = b
        x = jnp.zeros_like(b)
    else:
        r = b - _s_apply_grid(dinv_axes, x)
    dvec = (1.0 / theta) * idiag * r
    for _ in range(mg.cheby_order - 1):
        x = x + dvec
        r = r - _s_apply_grid(dinv_axes, dvec)
        rho_new = 1.0 / (2.0 * sigma - rho)
        dvec = (rho_new * rho) * dvec + (2.0 * rho_new / delta) * (idiag * r)
        rho = rho_new
    return x + dvec


def _tridiag_solve_last(dl, dd, du, r):
    """Tridiagonal solve along the LAST axis, Pallas-fused on accelerator
    backends for large line counts (the same dispatch rule as
    ops/mass_solve.build_mass_tridiag_solver's measured crossover)."""
    import jax as _jax

    nlines = int(np.prod(r.shape[:-1])) if r.ndim > 1 else 1
    if nlines * r.shape[-1] > 32768 and _jax.default_backend() != "cpu":
        from parelagmc_tpu.ops.tridiag_pallas import tridiag_thomas_pallas

        return tridiag_thomas_pallas(dl, dd, du, r)
    from parelagmc_tpu.ops.mass_solve import _thomas_solve

    return _thomas_solve(dl, dd, du, r)


def _line_solve(tables, r, d: int, a: int):
    """T_a^{-1} r on the cell grid (tables from _line_tables)."""
    dl, dd, du = tables
    ax = _arr_ax(r, d, a)
    x = _tridiag_solve_last(dl, dd, du, jnp.moveaxis(r, ax, -1))
    return jnp.moveaxis(x, -1, ax)


def _line_smooth_grid(mg, dinv_axes, lines, b, x, reverse: bool):
    """One pass of line relaxation: for each configured axis,
    x += line_omega * T_a^{-1} (b - S x). The post-smoothing pass runs the
    axes REVERSED so the V-cycle stays self-adjoint (each T_a^{-1} update
    is S-self-adjoint alone; a multi-axis product needs its mirror)."""
    d = len(dinv_axes)
    order = range(len(mg.line_axes))
    if reverse:
        order = reversed(list(order))
    for i in order:
        a = mg.line_axes[i]
        if x is None:
            x = mg.line_omega * _line_solve(lines[i], b, d, a)
        else:
            r = b - _s_apply_grid(dinv_axes, x)
            x = x + mg.line_omega * _line_solve(lines[i], r, d, a)
    return x


def _v_cycle_grid(mg: StructCoefMG, state, b, sweeps: int, level: int):
    d = len(mg.levels[0].shape)
    dinv_axes, idiag, lines = state[level]
    cheby = mg.cheby_order > 0
    use_lines = bool(mg.line_axes) and len(lines) == len(mg.line_axes)
    if level == len(mg.levels) - 1:
        if use_lines:
            # Line sweeps at the coarsest level too: inter-aggregate
            # barriers stay visible as weak coarse faces all the way
            # down, and the Jacobi coarse solve stalls on them exactly
            # like the fine smoother. (fwd, rev) pass pairs keep the
            # coarse operator symmetric.
            x = _line_smooth_grid(mg, dinv_axes, lines, b, None, False)
            x = _line_smooth_grid(mg, dinv_axes, lines, b, x, True)
            for _ in range(max(1, mg.coarse_sweeps // 2) - 1):
                x = _line_smooth_grid(mg, dinv_axes, lines, b, x, False)
                x = _line_smooth_grid(mg, dinv_axes, lines, b, x, True)
            return x
        x = mg.omega * idiag * b
        for _ in range(mg.coarse_sweeps - 1):
            x = x + mg.omega * idiag * (b - _s_apply_grid(dinv_axes, x))
        return x
    # Pre-smoothing. Lines AUGMENT the point/Chebyshev smoother rather
    # than replace it: a line solve along axis a does not damp modes
    # oscillatory in the transverse axes (measured: a lone z-line pass
    # degrades the bulk V-cycle rate 0.867 -> 0.928 on a 16x16x32 barrier
    # problem), while the point smoother cannot relax across weak
    # (barrier) faces - each covers the other's blind spot. Adjoint
    # ordering (pre: point then lines-fwd; post: lines-rev then point)
    # keeps the cycle S-self-adjoint.
    if cheby:
        x = _cheb_smooth_grid(mg, dinv_axes, idiag, b, None)
    else:
        x = mg.omega * idiag * b
        for _ in range(sweeps - 1):
            x = x + mg.omega * idiag * (b - _s_apply_grid(dinv_axes, x))
    if use_lines:
        x = _line_smooth_grid(mg, dinv_axes, lines, b, x, reverse=False)
    r = b - _s_apply_grid(dinv_axes, x)
    nxt = mg.levels[level + 1]
    rc = _restrict_cells(r, nxt, d)
    xc = _v_cycle_grid(mg, state, rc, sweeps, level + 1)
    x = x + _prolong_cells(xc, nxt, d)
    if use_lines:
        x = _line_smooth_grid(mg, dinv_axes, lines, b, x, reverse=True)
    if cheby:
        return _cheb_smooth_grid(mg, dinv_axes, idiag, b, x)
    for _ in range(sweeps):
        x = x + mg.omega * idiag * (b - _s_apply_grid(dinv_axes, x))
    return x


# -- flat-vector API (mirrors the generic module) -----------------------------


def struct_s_apply(mg: StructCoefMG, dinvs, x_flat: jnp.ndarray) -> jnp.ndarray:
    """Fine-level S x for flat (batch, n_s) vectors (used by composed-cycle
    preconditioners). Accepts struct_mg_setup state or bare dinvs."""
    state = _as_state(mg, dinvs)
    shape0 = mg.levels[0].shape
    batch = x_flat.shape[:-1]
    xg = x_flat.reshape(batch + tuple(shape0[::-1]))
    return _s_apply_grid(state[0][0], xg).reshape(batch + (-1,))


def struct_v_cycle(
    mg: StructCoefMG, dinvs, b_flat: jnp.ndarray, sweeps: int = 2
) -> jnp.ndarray:
    """One V(sweeps, sweeps) cycle (or Chebyshev when cheby_order > 0) for
    flat (batch, n_s) residuals. Accepts struct_mg_setup state (fast path:
    precomputed idiag) or bare struct_mg_dinvs output."""
    state = _as_state(mg, dinvs)
    shape0 = mg.levels[0].shape
    batch = b_flat.shape[:-1]
    bg = b_flat.reshape(batch + tuple(shape0[::-1]))
    xg = _v_cycle_grid(mg, state, bg, sweeps, 0)
    return xg.reshape(batch + (-1,))
