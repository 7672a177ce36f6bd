"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, hence the
env mutation at import time (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
