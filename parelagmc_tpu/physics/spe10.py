"""SPE10 dataset support.

The reference's SPE10 pipeline (examples/SPE10/SPE10_MLMC.cpp:74,165-171)
reads the SPE comparative-solution-project model-2 permeability file
(`spe_perm.dat`: 60x220x85 cells, three Kx/Ky/Kz blocks of 1,122,000 values
each, x fastest then y then z) via ParELAG's InversePermeabilityFunction
and feeds the *inverse* permeability to the velocity mass integrator; the
per-sample random field multiplies on top (k_over_k_ref). The mesh is the
60x220x85 grid with 20x10x2 ft cells (src/MeshUtilities.hpp:20-25).

This module owns the loader (SURVEY.md 7.2 step 10: the loader lives in
ParELAG upstream, so the rebuild provides its own). When the dataset file
is absent (this environment has no network egress), `load_spe10_kinv`
falls back to a deterministic synthetic layered log-normal permeability
field with SPE10-like contrast so the full pipeline stays runnable.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import numpy as np

from parelagmc_tpu.mesh.factories import SPE10_NCELLS


def read_spe_perm(path: str, ncells: Sequence[int] = SPE10_NCELLS) -> np.ndarray:
    """Read spe_perm.dat. Returns permeability (nx*ny*nz, 3) in cell order
    (x fastest), columns Kx, Ky, Kz."""
    n = int(np.prod(ncells))
    vals = np.loadtxt(path).ravel()
    if vals.size < 3 * n:
        raise ValueError(
            f"{path}: expected {3 * n} permeability values, got {vals.size}"
        )
    k = np.stack([vals[0:n], vals[n: 2 * n], vals[2 * n: 3 * n]], axis=1)
    return k


def synthetic_spe10_perm(
    ncells: Sequence[int] = SPE10_NCELLS, seed: int = 0
) -> np.ndarray:
    """Deterministic synthetic SPE10-like permeability: layered in z with
    smooth in-plane log-normal variation and high contrast (~1e6), vertical
    permeability 10x lower. Used only when the real dataset is absent."""
    nx, ny, nz = ncells
    rng = np.random.default_rng(seed)
    # Smooth log-perm per layer: low-order Fourier modes in (x, y).
    x = (np.arange(nx) + 0.5) / nx
    y = (np.arange(ny) + 0.5) / ny
    logk = np.zeros((nz, ny, nx))
    for z in range(nz):
        layer_mean = 3.0 * np.sin(2.5 * z / max(nz - 1, 1) * np.pi) - 1.0
        field = np.full((ny, nx), layer_mean)
        for _ in range(6):
            ax, ay = rng.integers(1, 6, size=2)
            ph1, ph2 = rng.uniform(0, 2 * np.pi, size=2)
            amp = rng.uniform(0.5, 2.0)
            field = field + amp * np.outer(
                np.sin(2 * np.pi * ay * y + ph1), np.sin(2 * np.pi * ax * x + ph2)
            )
        logk[z] = field
    kh = np.exp(logk).ravel()  # (nz, ny, nx) raveled C-order = x fastest
    k = np.stack([kh, kh, 0.1 * kh], axis=1)
    return k


def load_spe10_kinv(
    perm_file: Optional[str] = None,
    ncells: Sequence[int] = SPE10_NCELLS,
    slice_2d: Optional[int] = None,
) -> np.ndarray:
    """Inverse permeability (n_cells, d) for the SPE10 Darcy problem.

    slice_2d: take one XY layer (reference Set2DSlice,
    SPE10_MLMC.cpp:166-169) and return (nx*ny, 2).
    """
    if perm_file is not None and os.path.exists(perm_file):
        k = read_spe_perm(perm_file, ncells)
    else:
        if perm_file is not None:
            print(
                f"# spe10: '{perm_file}' not found; using synthetic permeability",
                file=sys.stderr,
            )
        k = synthetic_spe10_perm(ncells)
    if slice_2d is not None:
        nx, ny, nz = ncells
        sl = k.reshape(nz, ny, nx, 3)[slice_2d]
        return 1.0 / sl.reshape(nx * ny, 3)[:, :2]
    return 1.0 / k
