"""Test configuration: force the CPU backend with 8 virtual devices so the
entire stack — including multi-chip sharding — tests without TPU hardware.
(The reference has no fake-backend story at all; see SURVEY.md §4.)

The environment may force-register a TPU plugin (sitecustomize setting
JAX_PLATFORMS / calling jax.config.update), so overriding the env var is not
enough — we update the config directly before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: integrator compiles are expensive; cache them
# across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
