import numpy as np
import pytest
import scipy.sparse as sp

from parelagmc_tpu.fem import build_geometric_hierarchy, build_mixed_level
from parelagmc_tpu.mesh import make_box_mesh


def dense_rt0_mass_1cell(h):
    """Dense quadrature oracle for the RT0 mass matrix on one box cell with
    widths h (basis = +axis-flux dofs, face order lo/hi per axis)."""
    d = len(h)
    V = np.prod(h)
    n = 20
    pts = [(np.arange(n) + 0.5) / n * h[a] for a in range(d)]
    grids = np.meshgrid(*pts, indexing="ij")
    wq = V / n ** d

    def basis(a, which):
        # phi_lo = (h_a - x_a)/h_a * (1/A), phi_hi = x_a/h_a * (1/A); A = V/h_a
        x = grids[a]
        A = V / h[a]
        prof = (h[a] - x) / h[a] if which == 0 else x / h[a]
        return prof / A

    M = np.zeros((2 * d, 2 * d))
    for a in range(d):
        for i in range(2):
            for b in range(d):
                for j in range(2):
                    if a != b:
                        continue  # cross-axis terms vanish
                    M[2 * a + i, 2 * b + j] = (basis(a, i) * basis(b, j)).sum() * wq
    return M


@pytest.mark.parametrize("h", [(1.0, 1.0), (0.5, 2.0), (1.0, 2.0, 3.0)])
def test_rt0_mass_vs_quadrature(h):
    d = len(h)
    V = np.prod(h)
    oracle = dense_rt0_mass_1cell(h)
    for a in range(d):
        np.testing.assert_allclose(oracle[2 * a, 2 * a], h[a] ** 2 / (3 * V), rtol=5e-3)
        np.testing.assert_allclose(oracle[2 * a, 2 * a + 1], h[a] ** 2 / (6 * V), rtol=5e-3)


def test_mass_assembly_single_cell():
    m = make_box_mesh((1, 1, 1), lengths=(1.0, 2.0, 3.0))
    lvl = build_mixed_level(m)
    M = lvl.mass_csr().toarray()
    faces, _ = m.cell_faces()
    oracle = dense_rt0_mass_1cell((1.0, 2.0, 3.0))
    perm = faces[0]
    Mp = M[np.ix_(perm, perm)]
    np.testing.assert_allclose(Mp, oracle, rtol=5e-3, atol=1e-12)


def test_mass_coefficient_scaling():
    m = make_box_mesh((2, 2), lengths=(1.0, 1.0))
    lvl = build_mixed_level(m)
    c = np.array([1.0, 2.0, 3.0, 4.0])
    M1 = lvl.mass_csr().toarray()
    Mc = lvl.mass_csr(c).toarray()
    # Diagonal entries of faces interior to a single cell scale by that cell.
    # Global check: Mc = sum_e c_e M_e => Mc with c=1+eps*delta_e is linear.
    M0 = lvl.mass_csr(np.zeros(4)).toarray()
    np.testing.assert_allclose(M0, 0.0)
    Msum = sum(
        ce * lvl.mass_csr(np.eye(4)[e]).toarray() for e, ce in enumerate(c)
    )
    np.testing.assert_allclose(Mc, Msum, atol=1e-14)
    assert np.all(np.linalg.eigvalsh(M1) > 0)


def test_divergence_incidence():
    m = make_box_mesh((3, 3, 3), lengths=(1.0, 1.0, 1.0))
    lvl = build_mixed_level(m)
    B = lvl.b_csr()
    # Constant field u = x_hat: flux dof through every x-face = face area,
    # divergence integral over each cell = 0.
    u = np.zeros(lvl.n_u)
    ax = m.face_axis()
    off = m.face_offsets
    u[off[0]: off[1]] = m.face_areas(0)
    np.testing.assert_allclose(B @ u, 0.0, atol=1e-14)
    # u = x * x_hat: div = 1 -> integral over cell = volume.
    # flux through x-face at coordinate x equals x * area.
    shape = m.face_grid_shape(0)
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    xcoord = m.axes[0][grids[0].ravel(order="F")]
    u[:] = 0.0
    u[off[0]: off[1]] = xcoord * m.face_areas(0)
    np.testing.assert_allclose(B @ u, lvl.W, atol=1e-13)


def test_rt_prolongation_exact_embedding():
    # P_rt must reproduce any coarse RT0 field exactly on the fine mesh.
    base = make_box_mesh((2, 3), lengths=(1.0, 1.5))
    hier = build_geometric_hierarchy(base, 2)
    fine, coarse = hier.levels[0], hier.levels[1]
    P = hier.P_rt[0]
    rng = np.random.default_rng(0)
    uc = rng.normal(size=coarse.n_u)
    uf = P @ uc
    # Check flux conservation: total flux through any coarse face = sum of
    # children fluxes.
    cm, fm = coarse.mesh, fine.mesh
    # Also check the commuting diagram: Div_f P_rt = P_l2 Div_c, where
    # Div = W^{-1} B (pointwise divergence of the embedded field).
    div_f = (fine.b_csr() @ uf) / fine.W
    div_c = (coarse.b_csr() @ uc) / coarse.W
    np.testing.assert_allclose(div_f, div_c[hier.parent[0]], atol=1e-12)


def test_p_l2_mass_galerkin():
    # P_l2^T W_f P_l2 == W_c (children volumes sum to parent volume).
    base = make_box_mesh((2, 2, 2), lengths=(1.0, 2.0, 3.0))
    hier = build_geometric_hierarchy(base, 3)
    for l in range(2):
        Pl2 = hier.p_l2(l)
        Wf = sp.diags(hier.levels[l].W)
        Wc = (Pl2.T @ Wf @ Pl2).toarray()
        np.testing.assert_allclose(Wc, np.diag(hier.levels[l + 1].W), atol=1e-12)


def test_rt_galerkin_vs_rediscretized_mass():
    # For unit coefficient on uniformly refined boxes, P^T M_f P == M_c
    # exactly (the embedding is exact and the spaces are nested).
    base = make_box_mesh((2, 2), lengths=(1.0, 1.0))
    hier = build_geometric_hierarchy(base, 2)
    P = hier.P_rt[0]
    Mf = hier.levels[0].mass_csr()
    Mc = hier.levels[1].mass_csr()
    np.testing.assert_allclose((P.T @ Mf @ P).toarray(), Mc.toarray(), atol=1e-13)


def test_spde_operator_spd():
    m = make_box_mesh((4, 4), lengths=(1.0, 1.0))
    lvl = build_mixed_level(m)
    ess = lvl.ess_faces(np.array([1, 1, 1, 1]))
    A = lvl.spde_operator_csr(alpha=100.0, ess_mask=ess).toarray()
    np.testing.assert_allclose(A, A.T, atol=1e-14)
    assert np.all(np.linalg.eigvalsh(A) > 0)


def test_ess_faces_masks_sides():
    m = make_box_mesh((2, 2, 2), lengths=(1.0, 1.0, 1.0))
    lvl = build_mixed_level(m)
    # Golden-config essential attributes {0,1,1,1,1,0}: side walls only.
    ess = lvl.ess_faces(np.array([0, 1, 1, 1, 1, 0]))
    ax = m.face_axis()
    # All essential faces have x or y normals; z-boundary faces are free.
    assert np.all(ax[ess] != 2)
    assert ess.sum() == 16  # 4 sides x 4 faces
