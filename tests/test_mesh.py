import numpy as np
import pytest

from parelagmc_tpu.mesh import make_box_mesh, make_embedded_box_mesh
from parelagmc_tpu.mesh.factories import embedded_selection, make_spe10_mesh


def test_golden_mesh_counts():
    # The golden-test hierarchy: 4^3 hex cube of side 2, refined twice.
    # Mixed dof counts must match the reference CTest table
    # 0 -> 17152, 1 -> 2240, 2 -> 304 (examples/CMakeLists.txt:62-66).
    m = make_box_mesh((4, 4, 4), lengths=(2.0, 2.0, 2.0))
    counts = []
    for _ in range(3):
        counts.append(m.num_faces + m.num_cells)
        m = m.refine()
    assert counts[::-1] == [17152, 2240, 304]


def test_volumes_and_areas():
    m = make_box_mesh((3, 4, 5), lengths=(1.0, 2.0, 3.0))
    vols = m.cell_volumes()
    assert vols.shape == (60,)
    np.testing.assert_allclose(vols.sum(), 6.0)
    np.testing.assert_allclose(vols, vols[0])
    # x-face areas = hy*hz
    areas = m.face_areas(0)
    np.testing.assert_allclose(areas, (2.0 / 4) * (3.0 / 5))


def test_cell_face_incidence():
    m = make_box_mesh((2, 2), lengths=(1.0, 1.0))
    faces, signs = m.cell_faces()
    assert faces.shape == (4, 4)
    # Each interior face appears exactly twice with opposite signs.
    flat = faces.ravel()
    sflat = signs.ravel()
    for f in range(m.num_faces):
        s = sflat[flat == f]
        if len(s) == 2:
            assert s.sum() == 0.0
        else:
            assert len(s) == 1


def test_boundary_attributes_3d():
    m = make_box_mesh((2, 2, 2), lengths=(1.0, 1.0, 1.0))
    attr = m.boundary_attr_of_faces()
    # 6 sides x 4 faces each on a 2x2x2 mesh.
    for a in range(1, 7):
        assert (attr == a).sum() == 4
    assert (attr == 0).sum() == m.num_faces - 24
    # Identify geometric sides.
    fc_axis = m.face_axis()
    # attr 1 is z=0: all faces with axis 2.
    assert np.all(fc_axis[attr == 1] == 2)
    assert np.all(fc_axis[attr == 6] == 2)
    assert np.all(fc_axis[attr == 3] == 0)
    assert np.all(fc_axis[attr == 5] == 0)


def test_refine_parent_map():
    m = make_box_mesh((2, 3), lengths=(1.0, 1.0))
    f = m.refine()
    par = f.parent_cells(m)
    assert par.shape == (24,)
    # Parents partition fine cells into groups of 4 with matching centers.
    cc = m.cell_centers()
    fc = f.cell_centers()
    for e in range(m.num_cells):
        kids = fc[par == e]
        assert kids.shape[0] == 4
        np.testing.assert_allclose(kids.mean(axis=0), cc[e], atol=1e-14)


def test_embedded_selection():
    orig = make_box_mesh((4, 4, 4), lengths=(2.0, 2.0, 2.0))
    emb = make_embedded_box_mesh((4, 4, 4), lengths=(2.0, 2.0, 2.0), n_buffer=(1,))
    assert emb.num_cells == 6 ** 3
    assert (emb.attributes == 1).sum() == 4 ** 3
    sel = embedded_selection(emb, orig)
    np.testing.assert_allclose(
        emb.cell_centers()[sel], orig.cell_centers(), atol=1e-14
    )


def test_spe10_mesh():
    m = make_spe10_mesh()
    assert m.shape == (60, 220, 85)
    np.testing.assert_allclose(m.cell_volumes()[0], 20.0 * 10.0 * 2.0)


def test_mark_cells_near_points():
    m = make_box_mesh((8, 8), lengths=(1.0, 1.0))
    mask = m.mark_cells_near_points(np.array([[0.5, 0.5]]), eps=0.1)
    assert mask.sum() == 4  # the four cells around the center point
    assert np.all(m.attributes[mask] == 2)
