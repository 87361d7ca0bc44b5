"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding / multi-chip tests run without TPU hardware (SURVEY.md §4).

NB the image's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU) and
the env var must be overwritten, not defaulted; `jax.config.update` makes it
stick even though the axon plugin already registered."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
