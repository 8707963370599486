"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware (SURVEY.md section 4d).

Note: this machine's sitecustomize pre-imports jax's config with
JAX_PLATFORMS=axon (the one real TPU chip), so setting the env var here is
too late — use jax.config.update instead. XLA_FLAGS is still read lazily at
first backend init, so the virtual-device flag works from here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
