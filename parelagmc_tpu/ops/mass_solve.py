"""Exact batched solves with the RT0 velocity mass matrix on tensor grids.

On axis-aligned tensor-product meshes the RT0 mass matrix is block-diagonal
per axis, and within each axis it decouples into independent *tridiagonal*
systems along grid lines (cross-axis RT0 products vanish; see
fem/assembly.py). For a piecewise-constant coefficient w the line systems
have per-cell coefficients

    d[face i]  = w[i-1]*m3[i-1] + w[i]*m3[i],   m3 = h^2/(3V)
    off[i,i+1] = w[i]*m6[i],                    m6 = h^2/(6V)

(one-sided at boundaries), so M(w)^{-1} is applied *exactly* per sample by
batched Thomas-scan tridiagonal solves (solved axis leading, so the big
line/batch dims stay in TPU-tiled positions). This unlocks the exact pressure Schur-complement CG for
the Darcy problem (physics/darcy.py "cg-schur"): the reference needs AMG
preconditioners because its meshes are unstructured; on tensor grids the
velocity block is directly invertible.

Essential velocity dofs are eliminated to identity rows and their couplings
zeroed, matching the masked operators used elsewhere.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import jax

from parelagmc_tpu.fem.assembly import MixedLevel


class _AxisData(NamedTuple):
    m3: jnp.ndarray  # cell grid, axis last: (lines..., n_a)
    m6: jnp.ndarray
    ess: jnp.ndarray  # face grid, axis last: (lines..., n_a + 1) bool
    n_a: int  # cells along the axis
    perm_cell: Tuple[int, ...]  # reversed-grid dims -> (lines..., axis)
    perm_face: Tuple[int, ...]


def _thomas_solve(dl, d, du, b):
    """Batched Thomas algorithm for tridiagonal systems along the LAST axis.

    dl/d/du broadcast against b over the leading (line/batch) dims. TPU
    layout note: jax.lax.linalg.tridiagonal_solve wants the solved axis at
    -2 and a num-rhs axis at -1; with one rhs per line that trailing
    singleton is padded to a full 128 lane tile (measured 130x memory
    expansion at SPE10 scale - OOM at batch 64). Scanning over the solved
    axis placed FIRST keeps the big line/batch dims in the tiled positions
    instead. The systems are SPD and diagonally dominant (RT0 mass lines),
    so no pivoting is needed.
    """
    move = lambda x: jnp.moveaxis(jnp.broadcast_to(x, b.shape), -1, 0)
    dl_s, d_s, du_s, b_s = move(dl), move(d), move(du), move(b)

    # Forward sweep: c'_i = du_i / (d_i - dl_i c'_{i-1});
    #                g_i = (b_i - dl_i g_{i-1}) / (d_i - dl_i c'_{i-1}).
    def fwd(carry, row):
        c_prev, g_prev = carry
        dl_i, d_i, du_i, b_i = row
        denom = d_i - dl_i * c_prev
        c_i = du_i / denom
        g_i = (b_i - dl_i * g_prev) / denom
        return (c_i, g_i), (c_i, g_i)

    zero = jnp.zeros_like(b_s[0])
    (_, _), (c, g) = jax.lax.scan(fwd, (zero, zero), (dl_s, d_s, du_s, b_s))

    # Back substitution: x_i = g_i - c'_i x_{i+1}.
    def bwd(x_next, row):
        c_i, g_i = row
        x_i = g_i - c_i * x_next
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, zero, (c, g), reverse=True)
    return jnp.moveaxis(xs, 0, -1)


class MassTridiagSolver(NamedTuple):
    axes: Tuple[_AxisData, ...]
    shape: Tuple[int, ...]  # cells per mesh axis (x first)
    face_offsets: Tuple[int, ...]
    n_u: int
    use_scan: bool = False  # Thomas scan (big grids) vs tridiagonal_solve

    def __call__(self, w: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        """z = M(w)^{-1} rhs, batched over leading dims of w/rhs."""
        d = len(self.shape)
        batch = w.shape[:-1]
        nb = len(batch)
        wg = w.reshape(batch + tuple(self.shape[::-1]))  # (..., z, y, x)
        outs = []
        for a in range(d):
            ax = self.axes[a]
            w_a = jnp.transpose(wg, tuple(range(nb)) + tuple(nb + p for p in ax.perm_cell))
            c3 = w_a * ax.m3
            c6 = w_a * ax.m6
            zero = jnp.zeros_like(c3[..., :1])
            # Face-grid arrays along the line (n_a + 1 faces).
            diag = jnp.concatenate([c3, zero], axis=-1) + jnp.concatenate(
                [zero, c3], axis=-1
            )
            du = jnp.concatenate([c6, zero], axis=-1)  # couples (i, i+1)
            dl = jnp.concatenate([zero, c6], axis=-1)  # couples (i, i-1)
            ess = ax.ess
            ess_next = jnp.concatenate([ess[..., 1:], ess[..., :1]], axis=-1)
            ess_prev = jnp.concatenate([ess[..., -1:], ess[..., :-1]], axis=-1)
            diag = jnp.where(ess, 1.0, diag)
            du = jnp.where(ess | ess_next, 0.0, du)
            dl = jnp.where(ess | ess_prev, 0.0, dl)

            fshape = list(self.shape)
            fshape[a] += 1
            r = rhs[..., self.face_offsets[a]: self.face_offsets[a + 1]]
            r = r.reshape(batch + tuple(fshape[::-1]))
            r = jnp.transpose(r, tuple(range(nb)) + tuple(nb + p for p in ax.perm_face))
            if self.use_scan:
                # Thomas scan: no trailing-singleton lane padding (130x
                # expansion measured at SPE10 scale, OOM at batch 64).
                z = _thomas_solve(dl, diag, du, r)
            else:
                # Small grids: the parallel primitive wins over the scan's
                # sequential latency despite the padded num-rhs lane.
                from jax.lax.linalg import tridiagonal_solve

                bshape = r.shape[:-1] + (r.shape[-1],)
                z = tridiagonal_solve(
                    jnp.broadcast_to(dl, bshape),
                    jnp.broadcast_to(diag, bshape),
                    jnp.broadcast_to(du, bshape),
                    r[..., None],
                )[..., 0]
            inv = np.argsort(ax.perm_face)
            z = jnp.transpose(z, tuple(range(nb)) + tuple(nb + p for p in inv))
            outs.append(z.reshape(batch + (-1,)))
        return jnp.concatenate(outs, axis=-1)


def build_mass_tridiag_solver(
    lvl: MixedLevel,
    ess_mask: np.ndarray,
    kinv_ref: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> MassTridiagSolver:
    """Static factors for M(w)^{-1} on `lvl`'s mesh with essential dofs
    `ess_mask`; optional static per-axis inverse permeability (n_s, d) is
    folded into the coefficients (matching DarcySolver's baked kinv_ref)."""
    mesh = lvl.mesh
    d = mesh.dim
    shape = mesh.shape
    vol = mesh.cell_volumes().reshape(shape[::-1])  # (z, y, x)
    axes: List[_AxisData] = []
    for a in range(d):
        h = mesh.cell_widths(a).reshape(shape[::-1])
        m3 = h * h / (3.0 * vol)
        m6 = h * h / (6.0 * vol)
        if kinv_ref is not None:
            k = np.asarray(kinv_ref)
            ka = (k[:, a] if k.ndim == 2 else k).reshape(shape[::-1])
            m3 = m3 * ka
            m6 = m6 * ka
        # Array layout is (z, y, x); mesh axis a is array dim d-1-a. Move it
        # last.
        dim_a = d - 1 - a
        perm_cell = tuple(i for i in range(d) if i != dim_a) + (dim_a,)
        m3 = np.transpose(m3, perm_cell)
        m6 = np.transpose(m6, perm_cell)
        fshape = list(shape)
        fshape[a] += 1
        ess_a = ess_mask[mesh.face_offsets[a]: mesh.face_offsets[a + 1]].reshape(
            tuple(fshape[::-1])
        )
        ess_a = np.transpose(ess_a, perm_cell)
        axes.append(
            _AxisData(
                m3=jnp.asarray(m3, dtype=dtype),
                m6=jnp.asarray(m6, dtype=dtype),
                ess=jnp.asarray(ess_a),
                n_a=shape[a],
                perm_cell=perm_cell,
                perm_face=perm_cell,
            )
        )
    return MassTridiagSolver(
        axes=tuple(axes),
        shape=shape,
        face_offsets=tuple(int(x) for x in mesh.face_offsets),
        n_u=lvl.n_u,
        # Above ~32k cells the tridiagonal_solve num-rhs lane padding costs
        # more memory/bandwidth than the scan's sequential latency.
        use_scan=int(np.prod(shape)) > 32768,
    )
