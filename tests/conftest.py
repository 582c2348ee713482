import os

# Tests run on a virtual 8-device CPU mesh: sharding semantics are identical
# to a TPU slice; the real-chip bench path lives in bench.py.
#
# Note: this image's sitecustomize registers the single real TPU ("axon"
# platform) in every interpreter and forces JAX_PLATFORMS=axon, so the env
# var alone is not enough — override via jax.config after import, before any
# backend is initialized. (Two processes touching the one TPU deadlock on the
# relay grant, so tests must never touch it.)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
