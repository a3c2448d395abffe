"""Emission cadence math — exact f32 port of `compute_emission_count`
(`/root/reference/src/core.rs:553-575`), the carry-based conversion from
elapsed cycle time to an integer emit count. Shared by global rate-based
emission (`core.rs:406-427`) and nested per-parent emission (`core.rs:490-498`).

Two implementations:
  * `compute_emission_count`: jax, vectorized (used inside the step kernel);
  * `np_compute_emission_count`: numpy f32 scalar oracle for parity tests.

Rust's `times_needed_to_emit as usize` saturates negative floats to 0; the
carry (`next_last_emission`) still uses the raw (possibly negative) float n,
which is how brand-new nested parents advance `last_emitted_age` from f32::MIN
to a finite value without emitting (SURVEY.md §A.1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils.f32 import div_euclid, np_div_euclid

F32 = np.float32


def compute_emission_count(time_passed_in_cycle, last_emission, cycle_duration, offset_start, offset_end, particles_per_cycle):
    """Vectorized. Returns (count:int32, next_last_emission:f32); broadcasts."""
    t = jnp.asarray(time_passed_in_cycle, jnp.float32)
    percent_passed = t / cycle_duration
    last_emission_percent = jnp.asarray(last_emission, jnp.float32) / cycle_duration
    clamped_last = jnp.maximum(last_emission_percent, offset_start)
    percent_passed_since = jnp.minimum(percent_passed, offset_end) - clamped_last
    percent_between = (offset_end - offset_start) / particles_per_cycle
    times = div_euclid(percent_passed_since, percent_between)
    # Rust `as usize`: truncate toward zero, saturate below at 0. `times` is
    # already integral; negatives map to 0.
    count = jnp.maximum(times, 0.0).astype(jnp.int32)
    next_last = (clamped_last + times * percent_between) * cycle_duration
    return count, next_last


def emission_next_last(last_emission, cycle_duration, offset_start, offset_end, particles_per_cycle, times):
    """`next_last_emission` for an explicit (possibly truncated) emission
    count `times` — same f32 op order as `compute_emission_count`'s tail.

    Used by the nested-deferral path (step._spawn_phase): when only part of a
    parent's children fit the per-frame child buffer, its cadence anchor
    advances by the number actually materialized, so the remainder re-emerges
    next frame instead of being silently lost (the reference's `Vec::push`
    never drops, `core.rs:502-545`)."""
    last_pct = jnp.asarray(last_emission, jnp.float32) / cycle_duration
    clamped_last = jnp.maximum(last_pct, offset_start)
    percent_between = (offset_end - offset_start) / particles_per_cycle
    return (clamped_last + jnp.asarray(times, jnp.float32) * percent_between) * cycle_duration


def np_compute_emission_count(time_passed_in_cycle, last_emission, cycle_duration, offset_start, offset_end, particles_per_cycle):
    """Scalar numpy-f32 oracle with identical op order."""
    t = F32(time_passed_in_cycle)
    duration = F32(cycle_duration)
    percent_passed = F32(t / duration)
    last_pct = F32(F32(last_emission) / duration)
    clamped_last = F32(max(last_pct, F32(offset_start)))
    passed_since = F32(F32(min(percent_passed, F32(offset_end))) - clamped_last)
    between = F32(F32(F32(offset_end) - F32(offset_start)) / F32(particles_per_cycle))
    times = np_div_euclid(passed_since, between)
    count = int(max(times, 0.0))
    next_last = F32(F32(clamped_last + F32(times * between)) * duration)
    return count, next_last
