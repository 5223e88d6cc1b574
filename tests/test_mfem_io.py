import os

import numpy as np
import pytest

from parelagmc_tpu.mesh.mfem_io import GeneralMesh, read_mfem_mesh, try_as_structured
from parelagmc_tpu.mesh.structured import StructuredMesh

MESHES = "/root/reference/meshes"

needs_meshes = pytest.mark.skipif(
    not os.path.isdir(MESHES), reason="reference meshes not mounted"
)


@needs_meshes
def test_inline_quad_and_hex():
    m = read_mfem_mesh(f"{MESHES}/inline_quad.mesh")
    assert isinstance(m, StructuredMesh)
    assert m.shape == (2, 2)
    np.testing.assert_allclose(m.cell_volumes().sum(), 1.0)
    m3 = read_mfem_mesh(f"{MESHES}/cube_hex.mesh")
    assert m3.shape == (4, 4, 4)
    np.testing.assert_allclose(m3.cell_volumes().sum(), 8.0)


@needs_meshes
def test_cube_hex_embed_detected_structured_with_attributes():
    m = read_mfem_mesh(f"{MESHES}/cube_hex_embed.mesh")
    assert isinstance(m, StructuredMesh)
    assert m.shape == (6, 6, 6)
    # The embedded region (attribute 1) is the central 4^3 = original mesh.
    assert (m.attributes == 1).sum() == 64
    from parelagmc_tpu.mesh.factories import embedded_selection
    from parelagmc_tpu.mesh import make_box_mesh

    orig = read_mfem_mesh(f"{MESHES}/cube_hex.mesh")
    sel = embedded_selection(m, orig)
    assert sel.shape == (64,)


@needs_meshes
def test_unstructured_meshes_parse_as_general():
    gm = read_mfem_mesh(f"{MESHES}/cube_tet.mesh")
    assert isinstance(gm, GeneralMesh)
    assert gm.dim == 3 and gm.num_cells > 0
    assert all(el.size == 4 for el in gm.elements)
    tri = read_mfem_mesh(f"{MESHES}/square.mesh")
    assert isinstance(tri, GeneralMesh)
    assert tri.dim == 2


@needs_meshes
def test_all_bundled_meshes_parse():
    for f in sorted(os.listdir(MESHES)):
        if f.endswith(".mesh"):
            m = read_mfem_mesh(os.path.join(MESHES, f))
            assert m is not None


def test_roundtrip_with_writer(tmp_path):
    from parelagmc_tpu.mesh import make_box_mesh
    from parelagmc_tpu.utils.io_vtk import save_mesh_mfem

    mesh = make_box_mesh((3, 2, 2), lengths=(1.0, 2.0, 0.5))
    mesh.attributes[:4] = 2
    path = str(tmp_path / "rt.mesh")
    save_mesh_mfem(mesh, path)
    back = read_mfem_mesh(path)
    assert isinstance(back, StructuredMesh)
    assert back.shape == mesh.shape
    np.testing.assert_allclose(back.cell_volumes(), mesh.cell_volumes())
    np.testing.assert_array_equal(back.attributes, mesh.attributes)
