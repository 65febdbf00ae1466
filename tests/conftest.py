import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4 test strategy).
#
# NOTE: this environment's sitecustomize force-registers the 'axon' TPU
# platform and rewrites jax_platforms, so the JAX_PLATFORMS env var alone is
# not enough — we must override the config after importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
