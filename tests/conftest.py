"""Test configuration: force the CPU backend with 8 virtual devices so the
entire stack — including multi-chip sharding — tests without TPU hardware.
(The reference has no fake-backend story at all; see SURVEY.md §4.)

Must run before jax initializes, hence env mutation at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
