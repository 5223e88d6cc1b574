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

    # Build a minimal shim object exposing the native-layout arrays.
    class _RawMesh:
        def __init__(self, v, c, shape):
            self._v, self._c = v, c
            self.dim = v.shape[1]
            self.shape = shape

    import parelagmc_tpu.native as native

    # monkey-friendly: call the lib directly via arrays
    import scipy.sparse as sp

    lib = native._lib()
    v2, c2 = sheared, conn
    big = make_box_mesh((4, 4), origin=(-0.5, -0.5), lengths=(2.5, 2.5))
    v1, c1 = mesh_arrays(big)
    cap = 4096
    out_i = np.empty(cap, dtype=np.int64)
    out_j = np.empty(cap, dtype=np.int64)
    out_v = np.empty(cap, dtype=np.float64)
    n = lib.mortar_p0_couple(
        v1, c1, c1.shape[0], np.ascontiguousarray(v2), c2, c2.shape[0],
        4, 2, 1e-12, out_i, out_j, out_v, cap,
    )
    assert n > 0
    # The sheared mesh (area 1) lies fully inside the big mesh.
    np.testing.assert_allclose(out_v[:n].sum(), 1.0, rtol=1e-10)
