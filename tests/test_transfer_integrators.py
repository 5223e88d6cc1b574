"""Higher-order (P1) and vector (RT0) mortar integrators
(transfer_integrators.py; reference: L2MortarIntegrator /
VectorL2MortarIntegrator, src/transfer/MortarIntegrator.hpp:19-111)."""

import math

import numpy as np
import pytest

from parelagmc_tpu.fem.simplicial import build_simplicial_level
from parelagmc_tpu.mesh.mfem_io import read_mfem_mesh
from parelagmc_tpu.native import mortar_moments
from parelagmc_tpu.transfer_integrators import mortar_p1_couple, mortar_rt0_couple

MESHES = "/root/reference/meshes"


def _p1_mass(gm):
    """Classical P1 mass matrix by exact simplex formulas:
    int lambda_a lambda_b = V (1 + delta_ab) / ((d+1)(d+2))."""
    import scipy.sparse as sp

    conn = np.stack(gm.elements)
    d = gm.dim
    p = gm.vertices[conn]
    vol = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / math.factorial(d)
    nloc = d + 1
    base = 1.0 / ((d + 1) * (d + 2))
    rows, cols, vals = [], [], []
    for a in range(nloc):
        for b in range(nloc):
            rows.append(conn[:, a])
            cols.append(conn[:, b])
            vals.append(vol * base * (1.0 + (a == b)))
    n = gm.vertices.shape[0]
    M = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    M.sum_duplicates()
    return M


@pytest.mark.parametrize("name", ["square", "cube_tet"])
def test_moments_oracle_single_mesh(name):
    # Self-coupling moments: sum over pairs equals the analytic moments of
    # the whole domain (box [0,1]^d for these meshes).
    gm = read_mfem_mesh(f"{MESHES}/{name}.mesh")
    i, j, vol, m1, m2 = mortar_moments(gm, gm)
    d = gm.dim
    np.testing.assert_allclose(vol.sum(), 1.0, rtol=1e-10)
    np.testing.assert_allclose(m1.sum(axis=0), 0.5 * np.ones(d), rtol=1e-9)
    # int x_a^2 over the unit box = 1/3.
    np.testing.assert_allclose(m2[:, :d].sum(axis=0), np.ones(d) / 3.0, rtol=1e-9)
    # int x y = 1/4.
    np.testing.assert_allclose(m2[:, d], 0.25 * vol * 0 + m2[:, d])  # shape guard
    np.testing.assert_allclose(m2[:, d].sum(), 0.25, rtol=1e-8)


@pytest.mark.parametrize("name", ["square", "cube_tet"])
def test_p1_mortar_equals_mass_on_same_mesh(name):
    gm = read_mfem_mesh(f"{MESHES}/{name}.mesh")
    B = mortar_p1_couple(gm, gm)
    M = _p1_mass(gm)
    np.testing.assert_allclose(B.toarray(), M.toarray(), atol=1e-12)


@pytest.mark.parametrize("name", ["square", "cube_tet"])
def test_rt0_mortar_equals_mass_on_same_mesh(name):
    gm = read_mfem_mesh(f"{MESHES}/{name}.mesh")
    lvl = build_simplicial_level(gm)
    B = mortar_rt0_couple(lvl, lvl)
    np.testing.assert_allclose(B.toarray(), lvl.mass_csr().toarray(), atol=1e-12)


def test_p1_mortar_projects_linear_exactly_nonmatching():
    """Non-matching meshes (square vs its independently generated enlarged
    mesh): the mortar L2 projection M1^{-1} B f2 reproduces any linear
    function exactly on the overlap - the defining property of the
    reference's non-matching transfer (Transfer,
    ParMortarAssembler.cpp:1146-1255)."""
    import scipy.sparse.linalg as spla

    g1 = read_mfem_mesh(f"{MESHES}/square.mesh")
    g2 = read_mfem_mesh(f"{MESHES}/square_enlarge.mesh")
    B = mortar_p1_couple(g1, g2)
    M1 = _p1_mass(g1)
    f = lambda x: 0.3 + 1.7 * x[:, 0] - 0.9 * x[:, 1]
    proj = spla.spsolve(M1.tocsc(), B @ f(g2.vertices))
    np.testing.assert_allclose(proj, f(g1.vertices), rtol=1e-8, atol=1e-10)


def test_rt0_mortar_transfers_constant_field_nonmatching():
    """RT0 vector mortar: transferring a constant vector field from the
    enlarged tet mesh reproduces it on the original (constants are in RT0
    on both meshes): M1^{-1} B u2 == u1 dof-wise."""
    import scipy.sparse.linalg as spla

    g1 = read_mfem_mesh(f"{MESHES}/cube_tet.mesh")
    g2 = read_mfem_mesh(f"{MESHES}/cube_tet_enlarge.mesh")
    l1 = build_simplicial_level(g1)
    l2 = build_simplicial_level(g2)

    def rt0_dofs(lvl, vec):
        """Exact RT0 dofs of the constant field `vec`: flux through each
        face along its global (owner-outward) normal."""
        gm = lvl.mesh
        d = gm.dim
        conn = np.stack(gm.elements)
        nloc = d + 1
        local_faces = [[j for j in range(nloc) if j != i] for i in range(nloc)]
        dofs = np.zeros(lvl.n_u)
        owner = lvl.face_cells[:, 0]
        for i, lf in enumerate(local_faces):
            fids = lvl.cell_faces[:, i]
            is_owner = owner[fids] == np.arange(conn.shape[0])
            q = gm.vertices[conn[:, lf]]
            nvec = 0.5 * np.cross(q[:, 1] - q[:, 0], q[:, 2] - q[:, 0])
            cen = q.mean(axis=1)
            opp = gm.vertices[conn[:, i]]
            out = np.sign(np.einsum("ed,ed->e", cen - opp, nvec))
            flux = np.einsum("ed,d->e", nvec, vec) * out
            dofs[fids[is_owner]] = flux[is_owner]
        return dofs

    vec = np.array([0.7, -0.3, 1.1])
    u1 = rt0_dofs(l1, vec)
    u2 = rt0_dofs(l2, vec)
    B = mortar_rt0_couple(l1, l2)
    M1 = l1.mass_csr()
    proj = spla.spsolve(M1.tocsc(), B @ u2)
    np.testing.assert_allclose(proj, u1, rtol=1e-8, atol=1e-10)


def test_p1_p0_mortar_oracle_same_mesh():
    """On identical meshes, B[vertex, cell] = int_cell phi_vertex =
    |K|/(d+1) for incident pairs and 0 otherwise, and the lumped diagonal
    is the row sum (full coverage)."""
    from parelagmc_tpu.transfer_integrators import mortar_p1_p0_couple

    for name in ("square", "cube_tet"):
        gm = read_mfem_mesh(f"{MESHES}/{name}.mesh")
        B, lump = mortar_p1_p0_couple(gm, gm)
        conn = np.stack(gm.elements)
        d = gm.dim
        p = gm.vertices[conn]
        vol = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / math.factorial(d)
        import scipy.sparse as sp

        rows = conn.T.ravel()
        cols = np.tile(np.arange(conn.shape[0]), d + 1)
        vals = np.repeat(vol[None, :] / (d + 1), d + 1, axis=0).ravel()
        Bref = sp.csr_matrix((vals, (rows, cols)), shape=B.shape)
        Bref.sum_duplicates()
        np.testing.assert_allclose(B.toarray(), Bref.toarray(), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(B.sum(axis=1)).ravel(), lump, rtol=1e-12)


def test_p1_p0_mortar_constant_exact_nonmatching():
    """Lumped-mass P1 projection of a constant P0 field from an
    independently generated non-matching mesh is exactly that constant
    (partition of unity + full coverage)."""
    from parelagmc_tpu.transfer_integrators import mortar_p1_p0_couple

    g1 = read_mfem_mesh(f"{MESHES}/square.mesh")
    g2 = read_mfem_mesh(f"{MESHES}/square_enlarge.mesh")
    B, lump = mortar_p1_p0_couple(g1, g2)
    c = 3.25
    s = B @ np.full(len(g2.elements), c) / lump
    np.testing.assert_allclose(s, c, rtol=1e-10)
