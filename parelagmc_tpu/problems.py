"""Problem assembly: config -> (hierarchy, sampler, solver, ...).

The analog of the reference's example-driver setup blocks
(examples/MLMC.cpp:85-268): select mesh, build the multilevel hierarchy,
wire sampler + forward solver (+ Bayesian problem). Used by the bundled
example drivers, the benchmark and the graft entry points.

Mesh notes:
* "box": cfg.ncells is the *coarsest* mesh; cfg.refinements uniform
  refinements define the finer levels (matching the reference's
  serial+parallel refinement semantics with geometric coarsening).
* "spe10": the fine mesh is the 60x220x85-cell SPE10 grid; for multilevel
  runs the z-extent is truncated to 84 layers so dyadic geometric
  coarsening applies (the reference coarsens SPE10 algebraically with
  METIS, src/Utilities.cpp:125-155 - unstructured agglomeration is a
  planned extension).
* "egg": the embedded Egg-model grid (60x60x7 + buffer within an embedded
  sampler; here the plain grid).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.fem import GeometricHierarchy, build_geometric_hierarchy
from parelagmc_tpu.mesh.factories import (
    EGG_NCELLS,
    EGG_SPACING,
    SPE10_NCELLS,
    SPE10_SPACING,
    make_box_mesh,
    make_embedded_box_mesh,
)
from parelagmc_tpu.physics.darcy import DarcySolver
from parelagmc_tpu.samplers.covariance import (
    AnalyticExponentialCovariance,
    MaternCovariance,
)
from parelagmc_tpu.samplers.kl import KLSampler
from parelagmc_tpu.samplers.pde import (
    EmbeddedSPDESampler,
    L2ProjectionSPDESampler,
    SPDESampler,
)


class Problem(NamedTuple):
    config: ProblemConfig
    hierarchy: GeometricHierarchy
    embed_hierarchy: Optional[GeometricHierarchy]
    sampler: object
    solver: DarcySolver
    dtype: object


def _dtype_of(cfg: ProblemConfig):
    return {"float32": jnp.float32, "float64": jnp.float64, "bfloat16": jnp.bfloat16}[
        cfg.dtype
    ]


def base_mesh_spec(cfg: ProblemConfig):
    """(base_ncells, base_spacings) of the coarsest mesh for the config."""
    nref = cfg.refinements
    f = 2 ** nref
    if cfg.mesh == "box":
        ncells = cfg.ncells
        return ncells, [L / n for L, n in zip(cfg.lengths, ncells)]
    if cfg.mesh == "spe10":
        fine = list(SPE10_NCELLS)
        if nref > 0:
            fine[2] = 84  # dyadic z-coarsening (see module docstring)
        if any(n % f for n in fine):
            raise ValueError(f"SPE10 grid {fine} not divisible by 2^{nref}")
        return tuple(n // f for n in fine), [s * f for s in SPE10_SPACING]
    if cfg.mesh == "egg":
        fine = list(EGG_NCELLS)
        if any(n % f for n in fine):
            raise ValueError(f"Egg grid {fine} not divisible by 2^{nref}")
        return tuple(n // f for n in fine), [s * f for s in EGG_SPACING]
    raise ValueError(f"unknown mesh '{cfg.mesh}'")


def build_problem(cfg: ProblemConfig, kinv_ref: Optional[np.ndarray] = None) -> Problem:
    dtype = _dtype_of(cfg)
    base_ncells, base_spacings = base_mesh_spec(cfg)
    base = make_box_mesh(base_ncells, spacings=base_spacings)
    hier = build_geometric_hierarchy(base, cfg.nlevels)

    embed_hier = None
    if cfg.embedding != "none":
        nb = list(cfg.n_buffer)
        if len(nb) == 1:
            nb = nb * len(base_ncells)
        embed_base = make_embedded_box_mesh(
            base_ncells, spacings=base_spacings, n_buffer=nb
        )
        embed_hier = build_geometric_hierarchy(embed_base, cfg.nlevels)

    fine_mesh = hier.levels[0].mesh
    if cfg.sampler_name == "pde":
        if cfg.embedding == "matching":
            sampler = EmbeddedSPDESampler(hier, embed_hier, cfg, dtype)
        elif cfg.embedding == "projection":
            sampler = L2ProjectionSPDESampler(hier, embed_hier, cfg, dtype)
        else:
            sampler = SPDESampler(hier, cfg, dtype)
    elif cfg.sampler_name == "analytic":
        d = fine_mesh.dim
        nmodes = max(2, round(cfg.number_of_modes ** (1.0 / d)))
        cov = AnalyticExponentialCovariance(
            fine_mesh, cfg.correlation_length, [nmodes] * d
        )
        sampler = KLSampler(hier, cov, cfg, dtype)
    elif cfg.sampler_name == "matern":
        cov = MaternCovariance(fine_mesh, cfg.correlation_length, cfg.number_of_modes)
        sampler = KLSampler(hier, cov, cfg, dtype)
    else:
        raise ValueError(f"unknown sampler '{cfg.sampler_name}'")

    solver = DarcySolver(hier, cfg, dtype, kinv_ref=kinv_ref)
    return Problem(cfg, hier, embed_hier, sampler, solver, dtype)
