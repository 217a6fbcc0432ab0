"""Test harness config: CPU backend, 8 fake devices, float64 enabled.

The multi-device mesh tests run on a virtual 8-device CPU mesh
(SURVEY.md §4: `xla_force_host_platform_device_count` trick); float64 is
the numerical oracle for the TPU f32 kernels (SURVEY.md §7 step 2).

NB: this environment preloads jax via sitecustomize before pytest starts,
so JAX_* env vars are ignored — jax.config.update is the only channel that
still works (safe: no backend has been initialised yet at conftest time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
