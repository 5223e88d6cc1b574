"""Native geometry kernel tests: the C++ mortar assembler against the
per-axis tensor-overlap oracle and analytic measures."""

import numpy as np
import pytest

from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.native import (
    detect_intersections_bruteforce,
    element_measure,
    mesh_arrays,
    mortar_p0_couple,
)
from parelagmc_tpu.samplers.pde import mortar_coupling


def test_element_measure_3d():
    m = make_box_mesh((2, 3, 4), lengths=(1.0, 2.0, 0.5))
    vol = m.cell_volumes()
    for e in (0, 5, 23):
        np.testing.assert_allclose(element_measure(m, e), vol[e], rtol=1e-12)


def test_element_measure_2d():
    m = make_box_mesh((3, 3), lengths=(2.0, 1.0))
    np.testing.assert_allclose(element_measure(m, 4), m.cell_volumes()[4], rtol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_mortar_matches_tensor_overlap(dim):
    if dim == 2:
        orig = make_box_mesh((4, 5), lengths=(2.0, 2.0))
        emb = make_box_mesh((7, 6), origin=(-0.3, -0.25), lengths=(2.9, 2.7))
    else:
        orig = make_box_mesh((3, 4, 2), lengths=(1.0, 1.5, 1.0))
        emb = make_box_mesh((4, 5, 3), origin=(-0.2, -0.2, -0.2), lengths=(1.5, 2.0, 1.5))
    G_native = mortar_p0_couple(orig, emb)
    G_tensor = mortar_coupling(orig, emb)
    np.testing.assert_allclose(
        G_native.toarray(), G_tensor.toarray(), atol=1e-12
    )
    # Partition of unity: each original cell fully covered.
    np.testing.assert_allclose(
        np.asarray(G_native.sum(axis=1)).ravel(), orig.cell_volumes(), atol=1e-12
    )


def test_broadphase_oracle():
    orig = make_box_mesh((4, 4), lengths=(1.0, 1.0))
    emb = make_box_mesh((5, 5), origin=(-0.1, -0.1), lengths=(1.2, 1.2))
    pi, pj = detect_intersections_bruteforce(orig, emb, tol=-1e-9)
    # Every true-overlap pair (from the exact coupling) must be a candidate.
    G = mortar_coupling(orig, emb).tocoo()
    cand = set(zip(pi.tolist(), pj.tolist()))
    for i, j in zip(G.row.tolist(), G.col.tolist()):
        assert (i, j) in cand


def test_mortar_nonmatching_spacings():
    # Truly non-matching grids (incommensurate spacings): the coupling sums
    # to the intersection measure.
    orig = make_box_mesh((3, 3), lengths=(1.0, 1.0))
    emb = make_box_mesh((7, 5), lengths=(1.0, 1.0))
    G = mortar_p0_couple(orig, emb)
    np.testing.assert_allclose(float(G.sum()), 1.0, rtol=1e-12)
    G_t = mortar_coupling(orig, emb)
    np.testing.assert_allclose(G.toarray(), G_t.toarray(), atol=1e-13)


def test_mortar_general_affine_cells():
    # Sheared (affine, planar-faced) quadrilateral mesh vs an axis-aligned
    # one: beyond the tensor-overlap oracle's reach, checked via total
    # intersection area. Shear maps y -> y + 0.3*x on a unit square mesh.
    base = make_box_mesh((3, 3), lengths=(1.0, 1.0))
    verts, conn = mesh_arrays(base)
    sheared = verts.copy()
    sheared[:, 1] += 0.3 * sheared[:, 0]

    big = make_box_mesh((4, 4), origin=(-0.5, -0.5), lengths=(2.5, 2.5))
    G = mortar_p0_couple(big, (sheared, conn))
    # The sheared mesh (area 1) lies fully inside the big mesh.
    np.testing.assert_allclose(float(G.sum()), 1.0, rtol=1e-10)


def test_mortar_mixed_tet_hex():
    # Tet mesh from the reference (unit cube as 6 tets) against an
    # axis-aligned hex mesh: mixed element types in one coupling.
    from parelagmc_tpu.mesh.mfem_io import read_mfem_mesh

    gm = read_mfem_mesh("/root/reference/meshes/cube_tet.mesh")
    box = make_box_mesh((3, 3, 3), origin=(-0.2, -0.2, -0.2), lengths=(1.4, 1.4, 1.4))
    G = mortar_p0_couple(gm, box)
    assert G.shape == (6, 27)
    # Each tet (1/6 volume) fully covered; total = 1.
    np.testing.assert_allclose(
        np.asarray(G.sum(axis=1)).ravel(), 1.0 / 6.0, rtol=1e-10
    )
    np.testing.assert_allclose(float(G.sum()), 1.0, rtol=1e-12)
