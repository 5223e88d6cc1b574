"""Fast normal sampling on TPU via the native Pallas PRNG.

XLA's counter-based PRNGs (threefry and RngBitGenerator) lower poorly on
this TPU target (~85-300 ms for a 1M-value normal batch, measured), which
would dominate the whole MLMC pipeline (the tensor-solve realization costs
~6 ms). This kernel uses the TPU's hardware PRNG (pltpu.prng_seed /
prng_random_bits) and a Box-Muller transform: ~pure VPU work.

Determinism: the stream is fully determined by the 64-bit jax.random key
(both words enter prng_seed's multi-word mixer together with the grid block
id; samplers fold (level, batch counter) into the key exactly as before),
so runs remain reproducible chip-count-independently - the
replacement for the reference's TRNG leapfrog streams
(src/NormalDistributionSampler.cpp:21-24) at full speed.

On non-TPU backends `sample_normals` falls back to jax.random.normal
(bit-exactness across backends is NOT expected - statistical equivalence
is; tests validate moments on both paths).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_BLOCK_ROWS = 512
_COLS = 1024


@functools.partial(jax.jit, static_argnums=(1, 2))
def _pallas_normal(seed: jnp.ndarray, shape: Tuple[int, ...], dtype) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_total = int(np.prod(shape))
    cols = _COLS
    rows = _round_up(-(-n_total // cols), 8)
    block = min(_BLOCK_ROWS, rows)
    nblocks = -(-rows // block)
    rows = nblocks * block  # VMEM-bounded row blocks over a 1D grid

    def kernel(seed_ref, out_ref):
        # Independent hardware-PRNG stream per grid block: both 32-bit key
        # words enter the (two-word max on this libtpu) seed mixer, with the
        # block id hashed into each word by odd multiplicative constants
        # (Weyl/Murmur-style). Distinct jax.random keys therefore can never
        # alias block streams the way round 1's single int32 seed + additive
        # block offset could (ADVICE.md: adjacent derived seeds overlapping
        # block ranges); a collision now needs a full 64-bit match.
        pid = pl.program_id(0)
        pltpu.prng_seed(
            seed_ref[0] ^ (pid * jnp.int32(-1640531527)),  # 0x9E3779B9
            seed_ref[1] + pid * jnp.int32(-2048144789),  # 0x85EBCA6B
        )
        # prng_random_bits may come back as int32; force uint32 before the
        # logical shift so sign bits don't leak into the exponent.
        # Full Box-Muller: each uniform pair yields TWO normals (cos and
        # sin branches), so one bits pair covers two half-blocks - half
        # the hardware-PRNG draws and one log/sqrt per OUTPUT PAIR.
        half = cols // 2
        bits1 = pltpu.bitcast(pltpu.prng_random_bits((block, half)), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits((block, half)), jnp.uint32)
        # uint32 -> uniform [0, 1): top 23 bits into a [1, 2) float mantissa.
        u1 = pltpu.bitcast(
            (bits1 >> 9) | jnp.uint32(0x3F800000), jnp.float32
        ) - 1.0
        u2 = pltpu.bitcast(
            (bits2 >> 9) | jnp.uint32(0x3F800000), jnp.float32
        ) - 1.0
        u1 = 1.0 - u1  # (0, 1] so log is finite
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * np.pi) * u2
        out_ref[:, :half] = r * jnp.cos(theta)
        out_ref[:, half:] = r * jnp.sin(theta)

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(seed)
    out = out.reshape(-1)[:n_total].reshape(shape).astype(dtype)
    # MISCOMPILE GUARD (measured on real TPU, 2026-08-18): materialize the
    # noise before any consumer fuses with the kernel's pad-slice-reshape
    # epilogue. Without this barrier, XLA:TPU silently corrupts ~10% of the
    # values (O(1) garbage incl. +/-inf after exp) when the noise feeds the
    # SPDE spectral transform chain with a full-field program output at
    # some shape/batch combinations (SPE10 level-1 (110,30,42) grid, batch
    # 128, largest-dim-minor layout) - while the identical program with a
    # scalar-reduction output, batch 8, or a barrier here is exact. Seam
    # bisect on the real program: barrier on xi or on g*w_sqrt*xi fixes it;
    # barriers anywhere downstream (modal vector, pre-exp) do not - the
    # bad fusion is at the PRNG boundary. Same backend-bug class as the
    # guards in ops/coef_multigrid_structured.py and physics/darcy.py.
    return jax.lax.optimization_barrier(out)


def _seed_from_key(key) -> jnp.ndarray:
    """Both 32-bit words of the threefry key, for multi-word prng_seed."""
    data = jax.random.key_data(key).reshape(-1)
    if data.shape[0] == 1:  # rbg/other impls may differ; duplicate the word
        data = jnp.concatenate([data, data])
    return data[:2].astype(jnp.int32)


def sample_normals(key, shape: Tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    """N(0,1) samples of `shape`, deterministic in `key`. Uses the Pallas
    TPU PRNG on TPU backends, jax.random.normal elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return _pallas_normal(_seed_from_key(key), tuple(shape), dtype)
    return jax.random.normal(key, shape, dtype=dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _pallas_uniform(seed: jnp.ndarray, shape: Tuple[int, ...], dtype) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_total = int(np.prod(shape))
    cols = _COLS
    rows = _round_up(-(-n_total // cols), 8)
    block = min(_BLOCK_ROWS, rows)
    nblocks = -(-rows // block)
    rows = nblocks * block

    def kernel(seed_ref, out_ref):
        # Full-key two-word seeding with hashed block id (see _pallas_normal).
        pid = pl.program_id(0)
        pltpu.prng_seed(
            seed_ref[0] ^ (pid * jnp.int32(-1640531527)),
            seed_ref[1] + pid * jnp.int32(-2048144789),
        )
        bits = pltpu.bitcast(pltpu.prng_random_bits((block, cols)), jnp.uint32)
        out_ref[:] = (
            pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
        )

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(seed)
    out = out.reshape(-1)[:n_total].reshape(shape).astype(dtype)
    # Same PRNG-boundary miscompile guard as _pallas_normal.
    return jax.lax.optimization_barrier(out)


def sample_uniforms(key, shape: Tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    """U[0,1) samples of `shape` - the analog of the reference's
    UniformDistributionSampler (src/UniformDistributionSampler.hpp:27-64),
    with the same TPU Pallas fast path as sample_normals."""
    if jax.default_backend() in ("tpu", "axon"):
        return _pallas_uniform(_seed_from_key(key), tuple(shape), dtype)
    return jax.random.uniform(key, shape, dtype=dtype)
