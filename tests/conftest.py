"""Test config: force CPU with 8 virtual devices so sharding/multi-chip
paths are exercised without TPU hardware.

The container's sitecustomize exports JAX_PLATFORMS=axon (a remote-compile
TPU tunnel with ~25s compiles) — tests must override it both via the env var
AND jax.config, since the axon plugin registers itself at interpreter start.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
