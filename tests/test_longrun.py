"""Long-horizon numerical stability: thousands of frames through the
headless chains (the deployment shape) must stay finite and physically
bounded — resting contact must not gain energy, drag must not diverge,
ring reuse must not leak state, nested cadence must not drift.

The reference runs indefinitely inside a Bevy app; these are the headless
equivalents of "leave the demo running overnight"."""

import pytest

pytestmark = pytest.mark.slow  # excluded by default; CI test-slow job runs these

import numpy as np

from bevy_firework_tpu import (
    Collider,
    EmissionMode,
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
)
from bevy_firework_tpu.settings import ParticleCollisionSettings

DT = 1 / 60


def drive(scene, n_frames, chunk=200):
    for _ in range(n_frames // chunk):
        scene.step_n(DT, chunk)


def check_finite(scene, sid):
    st = scene._spawners[sid].state
    alive = np.asarray(st.alive)
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age", "qx", "qw", "wx"):
        v = np.asarray(getattr(st, f))[alive]
        assert np.isfinite(v).all(), f"non-finite {f}"
    return st, alive


def test_resting_contact_stays_bounded():
    """3000 frames of particles raining onto a floor (restitution 0.6):
    bounces must decay toward rest, never gain energy — speeds and heights
    stay bounded by the launch envelope the whole run."""
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(3.0), initial_scale=RandF32.constant(0.1),
            acceleration=(0.0, -9.8, 0.0), linear_drag=0.0,
            collision_settings=ParticleCollisionSettings(restitution=0.6, friction=0.2))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(500.0),
            initial_velocity=RandVec3(RandF32(1.0, 3.0), (0.0, 1.0, 0.0), 0.5))],
    )
    scene = Scene(colliders=[Collider.halfspace(position=(0.0, 0.0, 0.0))])
    sid = scene.add_spawner(sp, capacity=2048)
    # launch envelope: v0<=3 up from y~0 => apex <= v^2/2g + eps; total
    # speed bounded by free-fall from apex plus launch speed
    for _ in range(15):  # 15 x 200 = 3000 frames = 50 s sim time
        scene.step_n(DT, 200)
        st, alive = check_finite(scene, sid)
        assert alive.sum() > 0
        speed = np.sqrt(np.asarray(st.vx)[alive] ** 2 + np.asarray(st.vy)[alive] ** 2
                        + np.asarray(st.vz)[alive] ** 2)
        height = np.asarray(st.py)[alive]
        assert speed.max() <= 3.0 * 3.0 + 9.8 * DT, f"energy gained: speed {speed.max():.2f}"
        assert height.min() >= -0.5, f"tunneled through the floor: y {height.min():.2f}"
        assert height.max() <= 1.0, f"bounced above launch envelope: y {height.max():.2f}"


def test_drag_and_rotation_stay_bounded():
    """2000 frames with angular velocity + drag: quaternions stay unit-ish,
    angular velocity decays toward the drag equilibrium, no drift blowup."""
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(5.0), initial_scale=RandF32.constant(0.1),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.5, angular_drag=0.5)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(300.0),
            initial_velocity=RandVec3(RandF32(2.0, 4.0), (0.0, 1.0, 0.0), 1.0),
            initial_angular_velocity=RandVec3(RandF32(5.0, 10.0), (0.0, 0.0, 1.0), 1.0))],
    )
    scene = Scene()
    sid = scene.add_spawner(sp, capacity=4096)
    drive(scene, 2000)
    st, alive = check_finite(scene, sid)
    qn = np.sqrt(np.asarray(st.qx)[alive] ** 2 + np.asarray(st.qy)[alive] ** 2
                 + np.asarray(st.qz)[alive] ** 2 + np.asarray(st.qw)[alive] ** 2)
    # the reference never renormalizes quaternions either — but repeated
    # small-angle composition must stay near unit over a full lifetime
    np.testing.assert_allclose(qn, 1.0, atol=5e-3)
    w = np.abs(np.asarray(st.wz)[alive])
    assert w.max() <= 10.0 + 1e-3  # drag never amplifies spin


def test_nested_cadence_no_longrun_drift():
    """2400 frames of continuous nested emission: the children-per-parent
    ratio stays at the configured cadence (no cumulative f32 drift in the
    per-parent anchors), and counts remain conservation-consistent."""
    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(1.0)),
            ParticleSettings(lifetime=RandF32.constant(0.5)),
        ],
        emission_settings=[
            EmissionSettings(emission_pacing=EmissionPacing.rate(40.0)),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(10.0, 0.0, 0.0, 1.0),
            ),
        ],
    )
    scene = Scene()
    sid = scene.add_spawner(sp, capacity=2048, nested_buffer=512)
    counts = []
    for _ in range(12):  # 12 x 200 = 2400 frames
        scene.step_n(DT, 200)
        st, alive = check_finite(scene, sid)
        pt = np.asarray(st.ptype)[alive]
        parents, children = int((pt == 0).sum()), int((pt == 1).sum())
        assert parents > 0
        counts.append(children / parents)
    # steady state: parents ~40/s x 1s = 40; each emits 10 over 1s; child
    # life 0.5s => children ~ parents x 10 x 0.5 = 5x. Allow wide but
    # drift-catching bounds, and require the ratio NOT to trend.
    ratio = np.array(counts[2:])
    assert (np.abs(ratio - 5.0) < 1.5).all(), ratio
    assert abs(ratio[-3:].mean() - ratio[:3].mean()) < 0.8, ratio  # no trend
