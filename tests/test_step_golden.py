"""Golden trajectory parity: the jitted TPU step vs the NumPy oracle
transliteration of the Rust semantics, on deterministic (constant-range)
configs. This is the correctness anchor of SURVEY.md §7 build step 2/3."""

import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    FireworkCurve,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_spawner,
    gradient_uneven_samples,
    init_pool,
    init_pool_for,
    make_frame_input,
    step_jit,
)
from tests.oracle import oracle_init, oracle_step


def deterministic_spawner(**overrides):
    ps = dict(
        lifetime=RandF32.constant(0.5),
        initial_scale=RandF32.constant(0.1),
        scale_curve=FireworkCurve.uneven_samples([(0.0, 1.0), (1.0, 2.0)]),
        base_color=gradient_uneven_samples([(0.0, (1.0, 0.5, 0.2, 1.0)), (1.0, (0.0, 0.0, 0.0, 0.0))]),
        acceleration=(0.0, -9.81, 0.0),
        linear_drag=0.2,
    )
    es = dict(
        emission_pacing=EmissionPacing.rate(100.0),
        initial_velocity=RandVec3.constant((1.0, 3.0, 0.2)),
        initial_angular_velocity=RandVec3.constant((0.0, 2.0, 0.0)),
    )
    for k, v in overrides.items():
        if k in ps:
            ps[k] = v
        else:
            es[k] = v
    return ParticleSpawner(
        particle_settings=(ParticleSettings(**ps),),
        emission_settings=(EmissionSettings(**es),),
    )


def run_engine(spawner, n_frames, dt, capacity=256):
    from bevy_firework_tpu import pack_instances

    compiled = compile_spawner(spawner)
    state = init_pool_for(compiled, capacity, seed=0)
    frames = []
    for _ in range(n_frames):
        state, out = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
        alive = np.asarray(state.alive)
        # derived render fields (scale/colors) come from the pack path now
        buf, count = pack_instances(compiled.params, state, 0)
        rows = np.asarray(buf)[: int(count)]
        snap = {
            "count": int(alive.sum()),
            "pos": rows[:, 0:3],
            "vel": np.stack([np.asarray(state.vx)[alive], np.asarray(state.vy)[alive], np.asarray(state.vz)[alive]], -1),
            "age": np.asarray(state.age)[alive],
            "scale": rows[:, 3],
            "color": rows[:, 8:12],
            "rot": rows[:, 4:8],
            "finished": bool(out.finished_event),
        }
        frames.append(snap)
    return frames


def run_oracle(spawner, n_frames, dt):
    st = oracle_init(spawner)
    frames = []
    for _ in range(n_frames):
        _, finished = oracle_step(spawner, st, dt)
        parts = [p for plist in st.particles for p in plist]
        frames.append(
            {
                "count": len(parts),
                "pos": np.array([p.position for p in parts]).reshape(-1, 3),
                "vel": np.array([p.velocity for p in parts]).reshape(-1, 3),
                "age": np.array([p.age for p in parts]),
                "scale": np.array([p.scale for p in parts]),
                "color": np.array([p.base_color for p in parts]).reshape(-1, 4),
                "rot": np.array([p.rotation for p in parts]).reshape(-1, 4),
                "finished": finished,
            }
        )
    return frames


def _sorted_rows(a):
    a = np.asarray(a, dtype=np.float64)
    if a.size == 0:
        return a
    if a.ndim == 1:
        return np.sort(a)
    return a[np.lexsort(a.T[::-1])]


def assert_frames_match(engine_frames, oracle_frames, atol=2e-5):
    for fi, (ef, of) in enumerate(zip(engine_frames, oracle_frames)):
        assert ef["count"] == of["count"], f"frame {fi}: count {ef['count']} != {of['count']}"
        for key in ("pos", "vel", "age", "scale", "color", "rot"):
            a, b = _sorted_rows(ef[key]), _sorted_rows(of[key])
            np.testing.assert_allclose(a, b, atol=atol, err_msg=f"frame {fi} field {key}")
        assert ef["finished"] == of["finished"], f"frame {fi} finished"


def test_rate_emitter_trajectories():
    sp = deterministic_spawner()
    dt = 1.0 / 60.0
    n = 50  # > lifetime/dt so cull paths are exercised
    assert_frames_match(run_engine(sp, n, dt), run_oracle(sp, n, dt))


def test_one_shot_lifecycle_and_finished():
    sp = deterministic_spawner(emission_pacing=EmissionPacing.one_shot(20), lifetime=RandF32.constant(0.2))
    dt = 1.0 / 60.0
    n = 20
    ef, of = run_engine(sp, n, dt), run_oracle(sp, n, dt)
    assert_frames_match(ef, of)
    assert any(f["finished"] for f in ef)
    # burst emitted exactly once
    assert max(f["count"] for f in ef) == 20


def test_no_drag_ballistic_closed_form():
    """drag=0: after k frames velocity = v0 + k*a*dt exactly (semi-implicit,
    post-move update — A.4 steps 3/5)."""
    sp = deterministic_spawner(linear_drag=0.0, emission_pacing=EmissionPacing.one_shot(1), lifetime=RandF32.constant(10.0))
    dt = np.float32(0.01)
    frames = run_engine(sp, 5, float(dt), capacity=64)
    v0 = np.array([1.0, 3.0, 0.2], dtype=np.float32)
    a = np.array([0.0, -9.81, 0.0], dtype=np.float32)
    for k, f in enumerate(frames):
        want_v = v0 + np.float32(k + 1) * a * dt
        np.testing.assert_allclose(f["vel"][0], want_v, atol=1e-5)


def test_scale_curve_applied():
    sp = deterministic_spawner(emission_pacing=EmissionPacing.one_shot(1))
    dt = 0.05
    frames = run_engine(sp, 9, dt, capacity=64)
    for k, f in enumerate(frames):
        age = (k + 1) * dt
        if age >= 0.5:
            assert f["count"] == 0
            continue
        pct = np.float32(age) / np.float32(0.5)
        want = 0.1 * (1.0 + pct)  # curve 1 -> 2
        np.testing.assert_allclose(f["scale"][0], want, atol=1e-5)


def test_angular_velocity_rotates():
    sp = deterministic_spawner(emission_pacing=EmissionPacing.one_shot(3))
    dt = 1.0 / 30.0
    assert_frames_match(run_engine(sp, 16, dt), run_oracle(sp, 16, dt))


def test_modifier_scales_speed_and_size():
    from bevy_firework_tpu import EffectModifier
    from bevy_firework_tpu.pool import make_frame_input as mfi

    sp = deterministic_spawner(emission_pacing=EmissionPacing.one_shot(1), linear_drag=0.0)
    compiled = compile_spawner(sp)
    state = init_pool_for(compiled, 64, 0)
    frame = mfi(0.01, modifier_scale=2.0, modifier_speed=3.0)
    state, _ = step_jit(compiled.static, compiled.params, None, state, frame)
    alive = np.asarray(state.alive)
    # initial_scale = 0.1 * 2; velocity ~ 3 * v0 + 1 frame of gravity
    np.testing.assert_allclose(np.asarray(state.initial_scale)[alive][0], 0.2, atol=1e-6)
    v = np.array([np.asarray(state.vx)[alive][0], np.asarray(state.vy)[alive][0], np.asarray(state.vz)[alive][0]])
    want = 3.0 * np.array([1.0, 3.0, 0.2]) + np.array([0.0, -9.81, 0.0]) * 0.01
    np.testing.assert_allclose(v, want, atol=1e-5)
