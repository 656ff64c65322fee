"""Test configuration: force CPU with 8 virtual devices so multi-chip mesh
code paths are exercised without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin (sitecustomize) force-selects its platform via
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter start, so the
env var alone is not enough — re-update the config before any backend
initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
