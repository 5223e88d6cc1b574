"""Test configuration: run everything on CPU with 8 virtual devices.

This is the TPU analog of the reference's `mpirun -np N` on a single box
(reference: CMakeLists.txt:191-196 add_mpi_test): multi-chip sharding code
paths are exercised on a virtual device mesh. Verification configs run in
float64 (jax_enable_x64) so FEM oracles can use tight tolerances.

Note: this environment pre-imports jax at interpreter startup and pins
JAX_PLATFORMS=axon (the TPU tunnel), so plain env vars are too late here;
we use jax.config.update(), which works as long as no backend has been
initialized yet. XLA_FLAGS is still honored at (lazy) CPU client creation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
