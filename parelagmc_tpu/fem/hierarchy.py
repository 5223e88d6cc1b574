"""Geometric multilevel hierarchy of mixed RT0/P0 levels.

The reference obtains coarse de Rham spaces by AMGe agglomeration (ParELAG
DeRhamSequence::Coarsen, driven from src/PDESampler.cpp:160-168 and
src/DarcySolver.cpp:161-169); on uniformly-refined structured meshes with
the default constant targets, the coarse spaces have exactly the dof counts
of the geometrically coarsened mesh (golden test: 17152/2240/304 dofs,
examples/CMakeLists.txt:62-66). We build the hierarchy geometrically: level
L-1 is the base (coarsest) mesh and each finer level is a uniform
refinement; every level is *re-discretized* (its own exact RT0/P0
operators), and the interlevel transfer operators are the exact finite
element embeddings:

* P_l2 (P0): fine cell value = parent coarse cell value (injection). Stored
  as the parent map; P^T is a segment sum.
* P_rt (RT0): the natural embedding of a coarse RT0 field in the fine space.
  On boxes the RT0 normal component is constant on planes normal to its
  axis, so a fine face lying *on* a coarse face carries 1/2^(d-1) of the
  coarse flux, and a fine face on a coarse cell's mid-plane carries
  1/2^d of each of the two parallel coarse faces of that cell. These are
  exact (the embedding reproduces the coarse field), so the de Rham diagram
  commutes: Div_f P_rt = P_l2 Div_c - tested in tests/test_fem.py.

Level ordering follows the reference: level 0 = finest.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import scipy.sparse as sp

from parelagmc_tpu.fem.assembly import MixedLevel, build_mixed_level
from parelagmc_tpu.mesh.structured import StructuredMesh


@dataclass
class GeometricHierarchy:
    levels: List[MixedLevel]  # [0] = finest
    parent: List[np.ndarray]  # parent[l]: fine cell -> coarse cell (level l -> l+1)
    P_rt: List[sp.csr_matrix]  # P_rt[l]: (n_u[l], n_u[l+1]) coarse -> fine

    @property
    def nlevels(self) -> int:
        return len(self.levels)

    def p_l2(self, l: int) -> sp.csr_matrix:
        ne_f = self.levels[l].n_s
        return sp.csr_matrix(
            (np.ones(ne_f), (np.arange(ne_f), self.parent[l])),
            shape=(ne_f, self.levels[l + 1].n_s),
        )

    def prolongate_l2(self, l_from: int, l_to: int, x: np.ndarray) -> np.ndarray:
        """Host-side prolongation of a cell field from coarser level `l_from`
        to finer level `l_to` (l_to < l_from)."""
        for l in range(l_from - 1, l_to - 1, -1):
            x = x[..., self.parent[l]] if x.ndim > 1 else x[self.parent[l]]
        return x


def rt_prolongator(fine: StructuredMesh, coarse: StructuredMesh) -> sp.csr_matrix:
    """Exact RT0 embedding matrix P: coarse face dofs -> fine face dofs."""
    d = fine.dim
    rows, cols, vals = [], [], []
    child_w = 0.5 ** (d - 1)
    mid_w = 0.5 ** d
    for a in range(d):
        shape_f = fine.face_grid_shape(a)
        grids = np.meshgrid(
            *[np.arange(s, dtype=np.int64) for s in shape_f], indexing="ij"
        )
        idx_f = [g.ravel(order="F") for g in grids]
        fidx = fine.face_index(a, *idx_f)
        i_a = idx_f[a]
        on_plane = (i_a % 2) == 0
        # Children of coarse faces: same plane, halved transverse indices.
        cidx_child = [
            (x // 2) if ax != a else (x // 2) for ax, x in enumerate(idx_f)
        ]
        c_child = coarse.face_index(a, *cidx_child)
        rows.append(fidx[on_plane])
        cols.append(c_child[on_plane])
        vals.append(np.full(on_plane.sum(), child_w))
        # Mid-plane faces: average of the two parallel coarse faces of the
        # parent coarse cell (coarse face indices (i-1)/2 and (i-1)/2 + 1).
        mid = ~on_plane
        base = (i_a[mid] - 1) // 2
        for off in (0, 1):
            cidx_mid = [
                (base + off) if ax == a else (idx_f[ax][mid] // 2) for ax in range(d)
            ]
            rows.append(fidx[mid])
            cols.append(coarse.face_index(a, *cidx_mid))
            vals.append(np.full(mid.sum(), mid_w))
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(fine.num_faces, coarse.num_faces),
    )


def build_geometric_hierarchy(
    base_mesh: StructuredMesh, nlevels: int
) -> GeometricHierarchy:
    """Build `nlevels` levels with `base_mesh` as the coarsest (level
    nlevels-1), refining uniformly toward level 0."""
    meshes = [base_mesh]
    for _ in range(nlevels - 1):
        meshes.append(meshes[-1].refine())
    meshes = meshes[::-1]  # [0] = finest
    levels = [build_mixed_level(m) for m in meshes]
    parent = [
        meshes[l].parent_cells(meshes[l + 1]) for l in range(nlevels - 1)
    ]
    P_rt = [rt_prolongator(meshes[l], meshes[l + 1]) for l in range(nlevels - 1)]
    return GeometricHierarchy(levels=levels, parent=parent, P_rt=P_rt)
