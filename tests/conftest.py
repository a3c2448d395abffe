"""Test env: force the CPU backend with 8 virtual devices so unit + sharding
tests run fast and deterministically anywhere (SURVEY.md §7; the driver
separately dry-runs the multi-chip path, and bench.py runs on real TPU).

Note: the axon TPU plugin on this image ignores the JAX_PLATFORMS env var, so
we must also call jax.config.update after import — and this file must run
before any test module imports jax (pytest imports conftest first)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
