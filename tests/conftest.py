"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit tests must be deterministic
and runnable without TPU hardware, so we force the host platform with 8
virtual devices (enough to exercise the multi-chip sharding paths).  The
driver environment exports JAX_PLATFORMS=axon (the tunneled TPU), so this
must override, not setdefault.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's axon plugin rewrites jax_platforms to "axon,cpu" at
# import time, overriding the env var — force CPU via the config API
# (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
