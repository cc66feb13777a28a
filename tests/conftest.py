"""Test configuration: force the XLA CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``); real-TPU benchmarking happens
outside the test suite (``bench.py``).

Must set the env vars before the first ``import jax`` anywhere in the test
process, which is why this lives at the top of conftest.
"""

import os

# Force override: the driver environment presets JAX_PLATFORMS=axon (TPU)
# and a sitecustomize registers the axon PJRT plugin in every interpreter;
# the test suite must run on the virtual multi-device CPU backend.  Setting
# the env var alone is NOT enough (the plugin registration wins), so also
# update the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
