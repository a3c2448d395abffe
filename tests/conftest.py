"""Test env: force the CPU backend with 8 virtual devices so unit + sharding
tests run fast and deterministically anywhere (SURVEY.md §7; the driver
separately dry-runs the multi-chip path, and bench.py runs on real TPU).

Note: the axon TPU plugin on this image ignores the JAX_PLATFORMS env var, so
we must also call jax.config.update after import — and this file must run
before any test module imports jax (pytest imports conftest first)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 device threads on few host cores can take minutes to join a
    # collectives rendezvous; the 20s/40s defaults hard-kill the process
    # (see __graft_entry__.py)
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
