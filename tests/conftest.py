"""Test config: run the suite on a virtual 8-device CPU mesh.

The container's sitecustomize registers the 'axon' TPU-tunnel backend and
imports jax at interpreter startup, so JAX_PLATFORMS env tweaks are too
late — override via jax.config before any backend is initialized.
(SURVEY.md §4: multi-host logic is tested with
``xla_force_host_platform_device_count`` instead of mocks.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
