"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
sharding/multi-chip paths are exercised without TPU hardware."""

import os

# Force CPU even when the environment preconfigures a TPU platform
# (JAX_PLATFORMS=axon): tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    # Some environments register a TPU backend that overrides
    # JAX_PLATFORMS (the axon sitecustomize hook).  Pin the default
    # device to CPU so all test computation stays local and fast.
    try:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass
