import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from parelagmc_tpu.fem import build_geometric_hierarchy, build_mixed_level
from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.ops.ell import (
    coef_diag_structure,
    coef_ell_apply,
    ell_apply,
    pack_coef_ell,
    pack_csr_to_ell,
)
from parelagmc_tpu.ops.multigrid import build_mg_hierarchy, make_preconditioner
from parelagmc_tpu.ops.solvers import chebyshev, minres, pcg

DT = jnp.float64


def random_spd(n, rng):
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def test_ell_apply_matches_scipy():
    rng = np.random.default_rng(0)
    A = sp.random(50, 50, density=0.1, random_state=0, format="csr")
    ell = pack_csr_to_ell(A, DT)
    x = rng.normal(size=(3, 50))
    y = ell_apply(ell, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x @ A.T.toarray(), atol=1e-12)


def test_coef_ell_matches_scipy_mass():
    m = make_box_mesh((3, 3, 2), lengths=(1.0, 2.0, 1.0))
    lvl = build_mixed_level(m)
    rng = np.random.default_rng(1)
    c = np.exp(rng.normal(size=(4, lvl.n_s)))
    x = rng.normal(size=(4, lvl.n_u))
    op = pack_coef_ell(lvl.m_cols, lvl.m_vals, lvl.m_cells, DT)
    y = coef_ell_apply(op, jnp.asarray(c), jnp.asarray(x))
    for b in range(4):
        ref = lvl.mass_csr(c[b]) @ x[b]
        np.testing.assert_allclose(np.asarray(y[b]), ref, atol=1e-12)
    # Diagonal structure.
    dg = coef_diag_structure(lvl.m_cols, lvl.m_vals, lvl.m_cells, DT)
    d = dg(jnp.asarray(c))
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(d[b]), lvl.mass_csr(c[b]).diagonal(), atol=1e-12
        )


def test_pcg_batched_vs_dense():
    rng = np.random.default_rng(2)
    n, batch = 40, 5
    A = random_spd(n, rng)
    b = rng.normal(size=(batch, n))
    Aj = jnp.asarray(A)
    apply_A = lambda x: x @ Aj.T
    x, info = pcg(apply_A, jnp.asarray(b), max_iters=200, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x), b @ np.linalg.inv(A).T, atol=1e-7)
    assert bool(info.converged.all())


def test_pcg_jacobi_prec():
    rng = np.random.default_rng(3)
    n = 30
    A = random_spd(n, rng) + np.diag(np.linspace(1, 1000, n))
    d = 1.0 / np.diag(A)
    b = rng.normal(size=(2, n))
    apply_A = lambda x: x @ jnp.asarray(A).T
    prec = lambda r: r * jnp.asarray(d)
    x, info = pcg(apply_A, jnp.asarray(b), prec=prec, max_iters=300, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x), b @ np.linalg.inv(A).T, atol=1e-7)


def test_pcg_want_r_true_returns_final_residual():
    rng = np.random.default_rng(21)
    n, batch = 35, 3
    A = random_spd(n, rng)
    b = rng.normal(size=(batch, n))
    Aj = jnp.asarray(A)
    apply_A = lambda x: x @ Aj.T
    x, info, r_true = pcg(
        apply_A, jnp.asarray(b), max_iters=200, rtol=1e-11, want_r_true=True
    )
    # r_true is exactly b - A x at exit, and rel is derived from it.
    np.testing.assert_allclose(
        np.asarray(r_true), b - np.asarray(x) @ A.T, atol=1e-12
    )
    rel_ref = np.linalg.norm(np.asarray(r_true), axis=-1) / np.linalg.norm(
        b, axis=-1
    )
    np.testing.assert_allclose(np.asarray(info.residual), rel_ref, rtol=1e-10)
    assert bool(np.asarray(info.converged).all())


def test_pcg_unconverged_row_gets_no_exit_slack():
    # Mixed batch under a tiny iteration budget: the converged flag must be
    # per-row honest, with the 4x exit slack granted only to rows whose
    # recurrence actually claimed convergence.
    rng = np.random.default_rng(22)
    n = 40
    A = random_spd(n, rng) + np.diag(np.linspace(1, 5e4, n))
    b = rng.normal(size=(2, n))
    b[0] = A @ np.ones(n)  # row 0: exact solution reachable quickly
    Aj = jnp.asarray(A)
    apply_A = lambda x: x @ Aj.T
    # Tight tolerance + tiny budget: row 1 cannot converge.
    x, info = pcg(apply_A, jnp.asarray(b), max_iters=4, rtol=1e-13)
    conv = np.asarray(info.converged)
    r_true = b - np.asarray(x) @ A.T
    rel = np.linalg.norm(r_true, axis=-1) / np.linalg.norm(b, axis=-1)
    assert not conv[rel > 1e-10].any()
    # With a generous budget both rows converge and verify.
    x2, info2, r2 = pcg(
        apply_A, jnp.asarray(b), max_iters=500, rtol=1e-12, want_r_true=True
    )
    assert bool(np.asarray(info2.converged).all())


def test_pcg_claim_at_budget_boundary_is_verified():
    # A row whose recurrence crosses the threshold exactly on the
    # max_iters-th iteration exits with it == max_iters; the converged flag
    # must still be verified against the true residual (claimed-convergence
    # trigger, review r3) rather than reported unverified/false.
    rng = np.random.default_rng(23)
    n = 30
    A = random_spd(n, rng)
    b = rng.normal(size=(1, n))
    Aj = jnp.asarray(A)
    apply_A = lambda x: x @ Aj.T
    _, info_free = pcg(apply_A, jnp.asarray(b), max_iters=300, rtol=1e-10)
    it_star = int(np.asarray(info_free.iterations))
    assert it_star > 1
    x, info = pcg(apply_A, jnp.asarray(b), max_iters=it_star, rtol=1e-10)
    assert int(np.asarray(info.iterations)) == it_star
    assert bool(np.asarray(info.converged).all())
    r_true = b - np.asarray(x) @ A.T
    rel = np.linalg.norm(r_true, axis=-1) / np.linalg.norm(b, axis=-1)
    np.testing.assert_allclose(np.asarray(info.residual), rel, rtol=1e-5)


def test_minres_saddle_vs_dense():
    rng = np.random.default_rng(4)
    nu, ns = 25, 10
    M = random_spd(nu, rng)
    B = rng.normal(size=(ns, nu))
    A = np.block([[M, B.T], [B, np.zeros((ns, ns))]])
    b = rng.normal(size=(3, nu + ns))
    apply_A = lambda x: x @ jnp.asarray(A).T
    x, info = minres(apply_A, jnp.asarray(b), max_iters=400, rtol=1e-12)
    ref = b @ np.linalg.inv(A).T
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-6)
    assert bool(info.converged.all())


def test_minres_with_spd_prec():
    rng = np.random.default_rng(5)
    nu, ns = 20, 8
    M = random_spd(nu, rng)
    B = rng.normal(size=(ns, nu))
    A = np.block([[M, B.T], [B, np.zeros((ns, ns))]])
    S = B @ np.linalg.inv(np.diag(np.diag(M))) @ B.T
    P = np.block(
        [
            [np.diag(1.0 / np.diag(M)), np.zeros((nu, ns))],
            [np.zeros((ns, nu)), np.linalg.inv(S)],
        ]
    )
    b = rng.normal(size=(2, nu + ns))
    apply_A = lambda x: x @ jnp.asarray(A).T
    prec = lambda r: r @ jnp.asarray(P).T
    x, info = minres(apply_A, jnp.asarray(b), prec=prec, max_iters=300, rtol=1e-11)
    ref = b @ np.linalg.inv(A).T
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-5)


def p0_laplacian(lvl, ess_attr):
    """Approximate pressure Schur complement S = B diag(M)^{-1} B^T with
    essential velocity dofs removed (the Darcy preconditioner operator)."""
    ess = lvl.ess_faces(ess_attr)
    M = lvl.mass_csr()
    dinv = sp.diags(np.where(ess, 0.0, 1.0 / M.diagonal()))
    B = lvl.b_csr()
    return (B @ dinv @ B.T).tocsr()


def test_mg_pcg_on_p0_laplacian():
    # Geometric MG with point-Jacobi smoothing on the cell-space Laplacian
    # (Darcy pressure preconditioner); must converge in few iterations.
    base = make_box_mesh((4, 4), lengths=(1.0, 1.0))
    hier = build_geometric_hierarchy(base, 3)
    ess_attr = np.array([0, 1, 0, 1])  # natural on bottom/top => nonsingular
    mats = [p0_laplacian(lvl, ess_attr) for lvl in hier.levels]
    ps = [hier.p_l2(l) for l in range(hier.nlevels - 1)]
    mg = build_mg_hierarchy(mats, ps, DT)
    prec = make_preconditioner(mg)
    rng = np.random.default_rng(6)
    n = hier.levels[0].n_s
    b = rng.normal(size=(2, n))
    apply_A = lambda x: ell_apply(mg.levels[0].A, x)
    x, info = pcg(apply_A, jnp.asarray(b), prec=prec, max_iters=60, rtol=1e-10)
    ref = np.linalg.solve(mats[0].toarray(), b.T).T
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-7)
    assert int(info.iterations) < 25  # MG should converge in few iterations


def test_chebyshev_reduces_residual():
    rng = np.random.default_rng(7)
    n = 30
    A = random_spd(n, rng)
    lam_max = jnp.asarray(np.full((2,), np.linalg.eigvalsh(A).max()))
    b = rng.normal(size=(2, n))
    apply_A = lambda x: x @ jnp.asarray(A).T
    x = chebyshev(apply_A, jnp.asarray(b), lam_max, order=10)
    r = b - np.asarray(x) @ A.T
    assert np.linalg.norm(r) < 0.5 * np.linalg.norm(b)


def test_mg_line_smoother_on_anisotropic_grid():
    """Line relaxation along the strong axis (SPE10-style anisotropy:
    z-spacing 10x smaller). Point Jacobi stalls; the tridiagonal
    block-Jacobi smoother restores textbook MG convergence, and the
    V-cycle stays a valid SPD preconditioner (exact solve oracle)."""
    from parelagmc_tpu.mesh.structured import StructuredMesh

    # 8x8x8 cells, z-spacing 10x finer -> z-coupling dominates ~100x.
    ax = np.linspace(0.0, 1.0, 9)
    az = np.linspace(0.0, 0.1, 9)
    base = StructuredMesh([ax, ax, az])
    hier = build_geometric_hierarchy(base, 2)
    ess_attr = np.array([0, 1, 0, 1, 0, 0])
    mats = [p0_laplacian(lvl, ess_attr) for lvl in hier.levels]
    ps = [hier.p_l2(l) for l in range(hier.nlevels - 1)]
    shapes = [lvl.mesh.shape for lvl in hier.levels]

    rng = np.random.default_rng(7)
    n = hier.levels[0].n_s
    b = rng.normal(size=(2, n))
    ref = np.linalg.solve(mats[0].toarray(), b.T).T

    iters = {}
    for use_line in (False, True):
        mg = build_mg_hierarchy(
            mats, ps, DT, line_shapes=shapes if use_line else None
        )
        if use_line:
            assert mg.levels[0].line is not None  # anisotropy detected
        prec = make_preconditioner(mg)
        apply_A = lambda x: ell_apply(mg.levels[0].A, x)
        x, info = pcg(
            apply_A, jnp.asarray(b), prec=prec, max_iters=200, rtol=1e-10
        )
        iters[use_line] = int(info.iterations)
        if use_line:
            np.testing.assert_allclose(np.asarray(x), ref, atol=1e-6)
    # Line smoothing must converge and beat point Jacobi by a wide margin.
    assert iters[True] < 30
    assert iters[True] * 2 <= iters[False]


def test_mg_line_smoother_skips_isotropic():
    """No dominant axis -> point Jacobi is kept (line=None)."""
    base = make_box_mesh((4, 4), lengths=(1.0, 1.0))
    hier = build_geometric_hierarchy(base, 2)
    ess_attr = np.array([0, 1, 0, 1])
    mats = [p0_laplacian(lvl, ess_attr) for lvl in hier.levels]
    ps = [hier.p_l2(l) for l in range(hier.nlevels - 1)]
    shapes = [lvl.mesh.shape for lvl in hier.levels]
    mg = build_mg_hierarchy(mats, ps, DT, line_shapes=shapes)
    assert all(l.line is None for l in mg.levels)


def _sbar_dense(lvl, w, ess):
    """Dense S_bar(w) = B diag(M(w))^{-1} B^T oracle (masked)."""
    M = lvl.mass_csr(w)
    dinv = np.where(ess, 0.0, 1.0 / M.diagonal())
    B = lvl.b_csr().toarray()
    B[:, ess] = 0.0
    return B @ np.diag(dinv) @ B.T


def test_coef_mg_galerkin_exactness():
    """The per-sample coefficient hierarchy (ops/coef_multigrid.py) is
    EXACT Galerkin: applying the level-1 face-form operator with the
    aggregated dinv equals P^T S_bar(w) P for a random lognormal w."""
    from parelagmc_tpu.fem.assembly import build_mixed_level
    from parelagmc_tpu.ops.coef_multigrid import (
        _s_apply,
        build_coef_mg,
        coef_mg_dinvs,
    )

    base = make_box_mesh((6, 5, 3), lengths=(1.0, 1.0, 0.1))
    lvl = build_mixed_level(base)
    ess_attr = np.array([0, 1, 0, 1, 1, 1])
    ess = lvl.ess_faces(ess_attr)
    mg = build_coef_mg(base, ess, DT, cutoff=4)
    assert len(mg.levels) >= 2

    rng = np.random.default_rng(3)
    w = np.exp(rng.normal(size=(2, lvl.n_s)))
    diag = np.stack([lvl.mass_csr(wi).diagonal() for wi in w])
    dinv0 = np.where(ess | (diag <= 0), 0.0, 1.0 / np.maximum(diag, 1e-300))
    dinvs = coef_mg_dinvs(mg, jnp.asarray(dinv0, dtype=DT))

    # Dense oracle: P^T S_bar(w) P with aggregation P.
    par = np.asarray(mg.levels[1].parent)
    nc = int(par.max()) + 1
    P = np.zeros((lvl.n_s, nc))
    P[np.arange(lvl.n_s), par] = 1.0
    for i in range(2):
        Sf = _sbar_dense(lvl, w[i], ess)
        Sc_ref = P.T @ Sf @ P
        X = np.eye(nc)
        Sc = np.asarray(
            _s_apply(mg.levels[1], dinvs[1][i], jnp.asarray(X, dtype=DT))
        )
        np.testing.assert_allclose(Sc, Sc_ref.T, rtol=1e-10, atol=1e-12)


def test_coef_mg_pcg_rough_coefficient():
    """CG preconditioned by the per-sample Galerkin V-cycle converges fast
    on a rough lognormal coefficient and matches the dense solve; the
    static unit-coefficient MG needs far more iterations on the same
    system (the reason the reference rebuilds AMG per sample)."""
    from parelagmc_tpu.fem.assembly import build_mixed_level
    from parelagmc_tpu.ops.coef_multigrid import (
        _s_apply,
        build_coef_mg,
        coef_mg_dinvs,
        coef_v_cycle,
    )

    base = make_box_mesh((8, 8, 8), lengths=(1.0, 1.0, 1.0))
    lvl = build_mixed_level(base)
    ess_attr = np.array([0, 1, 0, 1, 1, 1])
    ess = lvl.ess_faces(ess_attr)
    mg = build_coef_mg(base, ess, DT, cutoff=10)

    rng = np.random.default_rng(9)
    w = np.exp(2.0 * rng.normal(size=(2, lvl.n_s)))  # sigma=2: rough
    diag = np.stack([lvl.mass_csr(wi).diagonal() for wi in w])
    dinv0 = np.where(ess | (diag <= 0), 0.0, 1.0 / np.maximum(diag, 1e-300))
    dinvs = coef_mg_dinvs(mg, jnp.asarray(dinv0, dtype=DT))

    b = rng.normal(size=(2, lvl.n_s))
    apply_S = lambda x: _s_apply(mg.levels[0], dinvs[0], x)
    prec = lambda r: coef_v_cycle(mg, dinvs, r)
    x, info = pcg(apply_S, jnp.asarray(b, dtype=DT), prec=prec,
                  max_iters=100, rtol=1e-10)
    for i in range(2):
        ref = np.linalg.lstsq(
            _sbar_dense(lvl, w[i], ess), b[i], rcond=None
        )[0]
        # Compare through the operator (S is singular-free here since a
        # Dirichlet boundary is present, but lstsq is robust anyway).
        np.testing.assert_allclose(
            np.asarray(apply_S(jnp.asarray(x))[i]), b[i], atol=5e-7
        )
    assert int(info.iterations) < 40


def test_struct_coef_mg_matches_generic():
    """The structured slicing-only coefMG (ops/coef_multigrid_structured.py)
    is the SAME preconditioner as the generic gather implementation: the
    per-level dinv hierarchies, fine-level operator applies and full
    V-cycles agree to float reassociation on an anisotropic box with an
    odd (non-dyadic, SPE10-style) axis and essential BCs."""
    from parelagmc_tpu.fem.assembly import build_mixed_level
    from parelagmc_tpu.ops.coef_multigrid import (
        _s_apply,
        build_coef_mg,
        coef_mg_dinvs,
        coef_v_cycle,
    )
    from parelagmc_tpu.ops.coef_multigrid_structured import (
        build_struct_coef_mg,
        struct_mg_dinvs,
        struct_s_apply,
        struct_v_cycle,
    )

    base = make_box_mesh((6, 10, 7), lengths=(1.2, 2.0, 0.7))
    lvl = build_mixed_level(base)
    ess_attr = np.array([0, 1, 0, 1, 1, 1])
    ess = lvl.ess_faces(ess_attr)
    mg_g = build_coef_mg(base, ess, DT, cutoff=8, coarse_sweeps=6)
    mg_s = build_struct_coef_mg(base, cutoff=8, coarse_sweeps=6)
    assert len(mg_s.levels) == len(mg_g.levels) >= 3

    rng = np.random.default_rng(7)
    w = np.exp(1.5 * rng.normal(size=(2, lvl.n_s)))
    diag = np.stack([lvl.mass_csr(wi).diagonal() for wi in w])
    dinv0 = np.where(ess | (diag <= 0), 0.0, 1.0 / np.maximum(diag, 1e-300))
    dinv0 = jnp.asarray(dinv0, dtype=DT)
    dg = coef_mg_dinvs(mg_g, dinv0)
    ds = struct_mg_dinvs(mg_s, dinv0)

    # Coarse-level dinv hierarchies agree (same Galerkin face sums): the
    # generic level's face numbering comes from build_mixed_level of the
    # same coarse mesh, and the structured axes slices ARE that numbering
    # flattened per axis.
    for l in range(len(mg_s.levels)):
        flat_s = jnp.concatenate(
            [ds[l][a].reshape(2, -1) for a in range(3)], axis=-1
        )
        np.testing.assert_allclose(
            np.asarray(flat_s), np.asarray(dg[l]), rtol=1e-12, atol=1e-14
        )

    x = jnp.asarray(rng.normal(size=(2, lvl.n_s)), dtype=DT)
    np.testing.assert_allclose(
        np.asarray(struct_s_apply(mg_s, ds, x)),
        np.asarray(_s_apply(mg_g.levels[0], dg[0], x)),
        rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(struct_v_cycle(mg_s, ds, x)),
        np.asarray(coef_v_cycle(mg_g, dg, x)),
        rtol=1e-10,
        atol=1e-12,
    )


def test_struct_coef_mg_cheby_matches_generic():
    """Chebyshev-smoothed cycles agree across the two implementations."""
    from parelagmc_tpu.fem.assembly import build_mixed_level
    from parelagmc_tpu.ops.coef_multigrid import (
        build_coef_mg,
        coef_mg_dinvs,
        coef_v_cycle,
    )
    from parelagmc_tpu.ops.coef_multigrid_structured import (
        build_struct_coef_mg,
        struct_mg_dinvs,
        struct_v_cycle,
    )

    base = make_box_mesh((5, 8, 6), lengths=(1.0, 1.0, 1.0))
    lvl = build_mixed_level(base)
    ess = lvl.ess_faces(np.array([1, 1, 0, 0, 1, 0]))
    mg_g = build_coef_mg(base, ess, DT, cutoff=8, cheby_order=3, cheby_lo=0.2)
    mg_s = build_struct_coef_mg(base, cutoff=8, cheby_order=3, cheby_lo=0.2)

    rng = np.random.default_rng(11)
    w = np.exp(rng.normal(size=(1, lvl.n_s)))
    diag = lvl.mass_csr(w[0]).diagonal()[None]
    dinv0 = jnp.asarray(
        np.where(ess | (diag <= 0), 0.0, 1.0 / np.maximum(diag, 1e-300)),
        dtype=DT,
    )
    b = jnp.asarray(rng.normal(size=(1, lvl.n_s)), dtype=DT)
    zs = struct_v_cycle(mg_s, struct_mg_dinvs(mg_s, dinv0), b)
    zg = coef_v_cycle(mg_g, coef_mg_dinvs(mg_g, dinv0), b)
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zg), rtol=1e-10, atol=1e-12)


def test_struct_coef_mg_line_solve_dense_oracle():
    # T_a (full Jacobi diagonal + axis-a off-diagonals of the face-form
    # Schur stencil) solved by the line tables must match a dense solve.
    import numpy as np

    from parelagmc_tpu.mesh.factories import make_box_mesh
    from parelagmc_tpu.ops.coef_multigrid_structured import (
        _jdiag_grid,
        _line_solve,
        build_struct_coef_mg,
        struct_mg_setup,
        struct_s_apply,
    )

    grid = (3, 2, 4)
    mesh = make_box_mesh(grid, lengths=(1.0, 1.0, 1.0))
    n = mesh.num_cells
    rng = np.random.default_rng(1)
    dinv0 = jnp.asarray(np.exp(rng.normal(size=(1, mesh.face_offsets[-1]))))
    mg = build_struct_coef_mg(mesh, line_axes=(2,))
    st = struct_mg_setup(mg, dinv0)
    axes, _, lines = st[0]
    S = np.zeros((n, n))
    for i in range(n):
        e = np.zeros((1, n))
        e[0, i] = 1
        S[:, i] = np.asarray(struct_s_apply(mg, st, jnp.asarray(e)))[0]
    diag = np.asarray(_jdiag_grid(axes, 3))[0].reshape(-1)
    T = np.diag(diag)
    idx = np.arange(n).reshape(grid[::-1])
    for z in range(grid[2] - 1):
        i, j = idx[z].reshape(-1), idx[z + 1].reshape(-1)
        T[i, j], T[j, i] = S[i, j], S[j, i]
    r = rng.normal(size=(1, n))
    x = np.asarray(
        _line_solve(lines[0], jnp.asarray(r.reshape((1,) + grid[::-1])), 3, 2)
    ).reshape(-1)
    np.testing.assert_allclose(x, np.linalg.solve(T, r[0]), rtol=1e-12)


def test_struct_coef_mg_harmonic_constant_is_rediscretization():
    # For a CONSTANT coefficient the series coarse faces equal the
    # 2-point-flux rediscretization = HALF the P0 RAP face sum per
    # coarsened axis (plain aggregation's rigid-aggregate 2x
    # overstiffness removed - see _face_series).
    import numpy as np

    from parelagmc_tpu.mesh.factories import make_box_mesh
    from parelagmc_tpu.ops.coef_multigrid_structured import (
        build_struct_coef_mg,
        struct_mg_dinvs,
    )

    mesh = make_box_mesh((8, 8, 8), lengths=(1.0, 1.0, 1.0))
    dinv0 = jnp.ones((1, mesh.face_offsets[-1]))
    g = struct_mg_dinvs(build_struct_coef_mg(mesh, cutoff=64), dinv0)
    h = struct_mg_dinvs(
        build_struct_coef_mg(mesh, cutoff=64, coarsen="harmonic"), dinv0
    )
    assert len(g) >= 2
    for lg, lh in zip(g[1:], h[1:]):
        for a in range(3):
            # interior faces along the coarsened axis agree exactly
            ga = np.asarray(lg[a])
            ha = np.asarray(lh[a])
            sl = [slice(None)] * ga.ndim
            sl[ga.ndim - 1 - a] = slice(1, -1)
            np.testing.assert_allclose(
                ha[tuple(sl)], 0.5 * ga[tuple(sl)], rtol=1e-14
            )


def test_struct_coef_mg_lines_harmonic_cut_iterations_at_contrast():
    # Scaled synthetic-SPE10 contrast: the barrier-aware configuration
    # (Chebyshev + z/y line relaxation + harmonic coarse faces) must
    # converge the Schur CG in strictly fewer iterations than the point
    # V(2,2) production cycle AND reach the same QoI (measured at the
    # (30,110,42) half-scale: 76 -> 18 iterations at rtol 1e-7).
    import dataclasses

    import numpy as np

    from parelagmc_tpu.config import ProblemConfig
    from parelagmc_tpu.physics.spe10 import load_spe10_kinv
    from parelagmc_tpu.problems import build_problem

    grid = (8, 28, 11)
    kinv = load_spe10_kinv(None, ncells=grid)
    qs, its = [], []
    s = None
    for over in (
        {},
        dict(
            coefmg_cheby_order=3,
            coefmg_cheby_lo=0.10,
            coefmg_line_axes="zy",
            coefmg_coarsen="harmonic",
        ),
    ):
        cfg = ProblemConfig(
            mesh="box", ncells=grid, lengths=(1200.0, 2200.0, 170.0),
            refinements=0, batch_size=2, correlation_length=100.0,
            normalize_marginals=True, dtype="float64",
        )
        cfg.darcy_solver.name = "cg-schur-coefmg"
        cfg.darcy_solver.max_iterations = 2000
        cfg.darcy_solver.relative_tolerance = 1e-7
        for k, v in over.items():
            setattr(cfg.darcy_solver, k, v)
        prob = build_problem(cfg, kinv_ref=kinv)
        if s is None:
            xi = prob.sampler.sample(0, jax.random.PRNGKey(0), 2)
            s = np.asarray(prob.sampler.eval(0, xi))
        q, _, info = prob.solver.solve_fwd(0, jnp.asarray(s))
        assert bool(np.asarray(info.converged).all())
        qs.append(np.asarray(q))
        its.append(int(np.asarray(info.iterations)))
    assert its[1] < its[0], its
    np.testing.assert_allclose(qs[1], qs[0], rtol=1e-4)
