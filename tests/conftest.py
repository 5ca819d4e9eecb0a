import os

# Unit tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware; bench.py / __graft_entry__ run on the real chip.
#
# NOTE: this environment's sitecustomize pins JAX_PLATFORMS=axon at
# interpreter startup, so the env var alone cannot force CPU -- the config
# update below (before any backend initialization) is what makes it stick.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
