"""Test configuration: run everything on CPU with 8 virtual devices.

This is the TPU analog of the reference's `mpirun -np N` on a single box
(reference: CMakeLists.txt:191-196 add_mpi_test): multi-chip sharding code
paths are exercised on a virtual device mesh. Verification configs run in
float64 (jax_enable_x64) so FEM oracles can use tight tolerances.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
