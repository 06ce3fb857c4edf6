"""Test harness config: force an 8-device CPU JAX platform.

This is the TPU-native substitute for "testing multi-node without a cluster"
(SURVEY.md §4): sharding/pjit tests run against a virtual 8-device mesh, exactly as the
driver's multi-chip dry-run does. The environment pre-registers a TPU PJRT plugin and
pins JAX_PLATFORMS, so plain env vars are not enough — we override through jax.config
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
