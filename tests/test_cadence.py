"""Emission cadence parity tests (reference test: `core.rs:802-835`)."""

import numpy as np

from bevy_firework_tpu.cadence import compute_emission_count, np_compute_emission_count
from bevy_firework_tpu.utils.f32 import F32_MIN, np_div_euclid, np_rem_euclid


def test_conservation_reference_port():
    """Port of `test_compute_emission_count`: 3 s cycle at 16 ms steps with 23
    particles/cycle must emit exactly 23 or 22."""
    timestep = np.float32(0.016)
    age = np.float32(0.0)
    last_emission = F32_MIN
    duration = np.float32(3.0)
    per = np.float32(23.0)
    total = 0
    while age <= duration:
        n, last_emission = np_compute_emission_count(age, last_emission, duration, 0.0, 1.0, per)
        total += n
        age = np.float32(age + timestep)
    assert total in (22, 23)


def test_conservation_jax_matches_numpy():
    """Self-consistent carry streams must agree to within FMA-contraction
    noise: XLA may fuse a*b+c into one FMA while Rust/numpy round twice, so
    carries can differ by ~1 ulp; totals must still agree exactly (each
    stream is conservative by construction)."""
    import jax

    f = jax.jit(compute_emission_count)
    duration = np.float32(2.5)
    per = np.float32(37.0)
    dt = np.float32(0.007)
    t = np.float32(0.0)
    last_np = F32_MIN
    last_jx = F32_MIN
    total_np = total_jx = 0
    while t <= duration:
        n_np, last_np = np_compute_emission_count(t, last_np, duration, 0.1, 0.9, per)
        n_jx, last_jx_new = f(t, last_jx, duration, np.float32(0.1), np.float32(0.9), per)
        n_jx = int(n_jx)
        last_jx = np.float32(last_jx_new)
        assert abs(np.float32(last_np) - last_jx) < 1e-5, (t, last_np, last_jx)
        total_np += n_np
        total_jx += n_jx
        t = np.float32(t + dt)
    assert abs(total_np - total_jx) <= 1


def test_new_parent_emits_zero():
    """A just-spawned nested parent (age 0, last=f32::MIN) must emit nothing
    and advance its carry to a finite value (SURVEY.md A.1)."""
    n, new_last = np_compute_emission_count(0.0, F32_MIN, 2.0, 0.0, 0.1, 6.0)
    assert n == 0
    assert new_last == np.float32(0.0)


def test_rate_cadence_counts():
    """rate(r) => one particle every 1/r seconds; stepping a full second in
    uneven chunks emits ~r particles."""
    per = np.float32(1000.0)
    duration = np.float32(1.0)
    t_cycle = np.float32(0.0)
    last = np.float32(0.0)
    total = 0
    rng = np.random.RandomState(0)
    elapsed = 0.0
    while elapsed < 1.0:
        dt = np.float32(rng.uniform(0.001, 0.02))
        elapsed += float(dt)
        t_cycle = np_rem_euclid(np.float32(t_cycle + dt), duration)
        n, last = np_compute_emission_count(t_cycle, last, duration, 0.0, 1.0, per)
        total += n
    assert abs(total - 1000 * elapsed) < 25


def test_div_rem_euclid_rust_semantics():
    f = np.float32
    assert np_div_euclid(f(7.0), f(4.0)) == f(1.0)
    assert np_div_euclid(f(-7.0), f(4.0)) == f(-2.0)
    assert np_div_euclid(f(7.0), f(-4.0)) == f(-1.0)
    assert np_div_euclid(f(-7.0), f(-4.0)) == f(2.0)
    assert np_rem_euclid(f(-7.0), f(4.0)) == f(1.0)
    assert np_rem_euclid(f(7.0), f(4.0)) == f(3.0)
    # jax path agrees
    from bevy_firework_tpu.utils.f32 import div_euclid, rem_euclid
    import jax.numpy as jnp

    for a in (-7.0, 7.0, -0.3, 0.0, 11.75):
        for b in (4.0, -4.0, 0.25):
            assert float(div_euclid(jnp.float32(a), jnp.float32(b))) == float(np_div_euclid(f(a), f(b)))
            assert float(rem_euclid(jnp.float32(a), jnp.float32(b))) == float(np_rem_euclid(f(a), f(b)))
