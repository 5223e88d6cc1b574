"""ctypes bindings for the native geometry kernels (geometry.cc).

The shared library is compiled on first use with g++ -O3 and cached next
to the source (invalidated by a source hash). See geometry.cc for the
design; this module exposes:

* mortar_p0_couple(mesh1_arrays, mesh2_arrays) -> scipy COO coupling matrix
* detect_intersections_bruteforce(...)          -> candidate pairs (oracle)
* element_measure(...)                          -> |element| via the clipper
* mesh_arrays(StructuredMesh)                   -> (verts, conn) in the
  native layout (MFEM-convention local vertex ordering)
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "geometry.cc")
_LIB = None


def _build_library() -> str:
    src = open(_SRC, "rb").read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_geometry_{tag}.so")
    if not os.path.exists(so_path):
        # Clean stale builds.
        for f in os.listdir(_HERE):
            if f.startswith("_geometry_") and f.endswith(".so"):
                try:
                    os.remove(os.path.join(_HERE, f))
                except OSError:
                    pass
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", so_path]
        )
    return so_path


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_library())
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.mortar_p0_couple.restype = ctypes.c_int64
        lib.mortar_p0_couple.argtypes = [
            f64p, i64p, ctypes.c_int64, f64p, i64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            i64p, i64p, f64p, ctypes.c_int64,
        ]
        lib.mortar_moments_couple.restype = ctypes.c_int64
        lib.mortar_moments_couple.argtypes = [
            f64p, i64p, ctypes.c_int64, f64p, i64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            i64p, i64p, f64p, f64p, f64p, ctypes.c_int64,
        ]
        lib.detect_intersections_bruteforce.restype = ctypes.c_int64
        lib.detect_intersections_bruteforce.argtypes = [
            f64p, i64p, ctypes.c_int64, f64p, i64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            i64p, i64p, ctypes.c_int64,
        ]
        lib.element_measure.restype = ctypes.c_double
        lib.element_measure.argtypes = [
            f64p, i64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_double,
        ]
        _LIB = lib
    return _LIB


def mesh_arrays(mesh) -> Tuple[np.ndarray, np.ndarray]:
    """(vertices, connectivity) of a StructuredMesh in the native layout:
    vertices (nv, dim) float64, connectivity (ne, 2^dim) int64 with
    MFEM-convention local ordering (matches utils.io_vtk.save_mesh_mfem)."""
    d = mesh.dim
    grids = np.meshgrid(*mesh.axes, indexing="ij")
    verts = np.ascontiguousarray(
        np.stack([g.ravel(order="F") for g in grids], axis=1)
    )
    nvshape = tuple(s + 1 for s in mesh.shape)

    def vid(*ijk):
        out = 0
        stride = 1
        for a, s in enumerate(nvshape):
            out = out + np.asarray(ijk[a], dtype=np.int64) * stride
            stride *= s
        return out

    idx = mesh.cell_multi_index()
    if d == 3:
        i, j, k = idx
        conn = np.stack(
            [
                vid(i, j, k), vid(i + 1, j, k), vid(i + 1, j + 1, k), vid(i, j + 1, k),
                vid(i, j, k + 1), vid(i + 1, j, k + 1), vid(i + 1, j + 1, k + 1),
                vid(i, j + 1, k + 1),
            ],
            axis=1,
        )
    elif d == 2:
        i, j = idx
        conn = np.stack(
            [vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1
        )
    else:
        raise ValueError("1D not supported")
    return verts, np.ascontiguousarray(conn, dtype=np.int64)


def _as_arrays(mesh):
    """(verts, conn) for a StructuredMesh, GeneralMesh, or raw pair."""
    if isinstance(mesh, tuple):
        v, c = mesh
        return np.ascontiguousarray(v, dtype=np.float64), np.ascontiguousarray(
            c, dtype=np.int64
        )
    if hasattr(mesh, "elements"):  # GeneralMesh (single element type)
        conn = np.stack(mesh.elements)
        return (
            np.ascontiguousarray(mesh.vertices, dtype=np.float64),
            np.ascontiguousarray(conn, dtype=np.int64),
        )
    return mesh_arrays(mesh)


def mortar_p0_couple(mesh1, mesh2, tol: float = 1e-12):
    """Native-assembled P0 mortar coupling G[i, j] = |K_i^1 cap K_j^2| as a
    scipy CSR matrix. Works for any pair of convex planar-faced cell
    meshes - including mixed pairs (tets vs hexes); on axis-aligned tensor
    grids it equals the per-axis overlap Kronecker product
    (samplers.pde.mortar_coupling) exactly. Accepts StructuredMesh,
    mfem_io.GeneralMesh, or raw (vertices, connectivity) pairs."""
    import scipy.sparse as sp

    v1, c1 = _as_arrays(mesh1)
    v2, c2 = _as_arrays(mesh2)
    dim = v1.shape[1]
    cap = max(16 * max(c1.shape[0], c2.shape[0]), 1024)
    lib = _lib()
    while True:
        out_i = np.empty(cap, dtype=np.int64)
        out_j = np.empty(cap, dtype=np.int64)
        out_v = np.empty(cap, dtype=np.float64)
        n = lib.mortar_p0_couple(
            v1, c1, c1.shape[0], v2, c2, c2.shape[0],
            c1.shape[1], c2.shape[1], dim, tol,
            out_i, out_j, out_v, cap,
        )
        if n >= 0:
            break
        cap = -n + 16
    return sp.csr_matrix(
        (out_v[:n], (out_i[:n], out_j[:n])),
        shape=(c1.shape[0], c2.shape[0]),
    )


def mortar_moments(mesh1, mesh2, tol: float = 1e-12):
    """Per intersected pair: (i, j, volume, first moments (dim,), second
    moments (dim*(dim+1)/2,)). The moment table is sufficient to assemble
    any mortar integral of products of affine factors - see
    transfer_integrators.py for the P1 and RT0 (VectorL2) assemblers."""
    v1, c1 = _as_arrays(mesh1)
    v2, c2 = _as_arrays(mesh2)
    dim = v1.shape[1]
    nm2 = 6 if dim == 3 else 3
    cap = max(16 * max(c1.shape[0], c2.shape[0]), 1024)
    lib = _lib()
    while True:
        out_i = np.empty(cap, dtype=np.int64)
        out_j = np.empty(cap, dtype=np.int64)
        out_v = np.empty(cap, dtype=np.float64)
        out_m1 = np.empty(cap * dim, dtype=np.float64)
        out_m2 = np.empty(cap * nm2, dtype=np.float64)
        n = lib.mortar_moments_couple(
            v1, c1, c1.shape[0], v2, c2, c2.shape[0],
            c1.shape[1], c2.shape[1], dim, tol,
            out_i, out_j, out_v, out_m1, out_m2, cap,
        )
        if n >= 0:
            break
        cap = -n + 16
    return (
        out_i[:n].copy(),
        out_j[:n].copy(),
        out_v[:n].copy(),
        out_m1[: n * dim].reshape(n, dim).copy(),
        out_m2[: n * nm2].reshape(n, nm2).copy(),
    )


def detect_intersections_bruteforce(mesh1, mesh2, tol: float = 1e-12):
    v1, c1 = mesh_arrays(mesh1)
    v2, c2 = mesh_arrays(mesh2)
    dim = v1.shape[1]
    nv = c1.shape[1]
    cap = max(64 * max(c1.shape[0], c2.shape[0]), 1024)
    lib = _lib()
    while True:
        out_i = np.empty(cap, dtype=np.int64)
        out_j = np.empty(cap, dtype=np.int64)
        n = lib.detect_intersections_bruteforce(
            v1, c1, c1.shape[0], v2, c2, c2.shape[0], nv, dim, tol,
            out_i, out_j, cap,
        )
        if n >= 0:
            break
        cap = -n + 16
    return out_i[:n].copy(), out_j[:n].copy()


def element_measure(mesh, e: int, tol: float = 1e-12) -> float:
    v, c = mesh_arrays(mesh)
    return float(_lib().element_measure(v, c, c.shape[1], v.shape[1], e, tol))
