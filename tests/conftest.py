"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

This is the TPU-build analog of the reference's compile-time fake-MPI
backend (code/no_mpi.F90): all multi-device sharding tests execute on
host devices so the full SPMD path is exercised without TPU pods.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

# belt and suspenders: force the CPU backend even if jax was imported
# before this conftest (the env var alone is read lazily)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
