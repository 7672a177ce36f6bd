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

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (real TPU tunnel); the env var above is therefore too
# late — switch the config directly before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _no_activation_mesh_leaks():
    """Defense in depth for the scoped activation mesh: no test may leave
    a global mesh behind (the round-3 full-suite failure was exactly such
    a leak poisoning a later differently-meshed shard_map trace)."""
    yield
    from mamba_asr_tpu.parallel import mesh as _mesh

    assert _mesh._ACTIVE_MESH is None, (
        "test leaked a global activation mesh: "
        f"{_mesh._ACTIVE_MESH}"
    )
