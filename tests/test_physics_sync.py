"""Parent-velocity / modifier propagation helpers (SURVEY.md #12, #13)."""

import numpy as np

from bevy_firework_tpu import (
    EffectModifier,
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    Transform,
)
from bevy_firework_tpu.physics_sync import (
    RigidBodyState,
    linear_velocity_at_point,
    propagate_modifiers,
    sync_parent_velocity,
)


def test_linear_velocity_at_point():
    # pure rotation omega = (0,0,1) about origin: point (1,0,0) moves +y
    v = linear_velocity_at_point((0, 0, 0), (0, 0, 1), (1, 0, 0), (0, 0, 0))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)
    # with linear velocity added
    v = linear_velocity_at_point((2, 0, 0), (0, 0, 1), (1, 0, 0), (0, 0, 0))
    np.testing.assert_allclose(v, [2, 1, 0], atol=1e-6)


def test_sync_parent_velocity_feeds_spawned_particles():
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(5.0), acceleration=(0, 0, 0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.one_shot(1),
            initial_velocity=RandVec3.constant((0, 0, 0)),
            inherit_parent_velocity=True)],
    )
    scene = Scene()
    sid = scene.add_spawner(sp, capacity=8, transform=Transform(translation=(1.0, 0.0, 0.0)))
    body = RigidBodyState(linear_velocity=(0, 0, 0), angular_velocity=(0, 0, 2.0), center_of_mass=(0, 0, 0))
    sync_parent_velocity(scene, {sid: body})
    scene.step(0.0)
    st = scene._spawners[sid].state
    alive = np.asarray(st.alive)
    np.testing.assert_allclose(
        [float(np.asarray(st.vx)[alive][0]), float(np.asarray(st.vy)[alive][0])],
        [0.0, 2.0], atol=1e-6)  # omega x r


def test_propagate_modifiers():
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(5.0), initial_scale=RandF32.constant(1.0))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.one_shot(1))],
    )
    scene = Scene()
    a = scene.add_spawner(sp, capacity=8)
    b = scene.add_spawner(sp, capacity=8)
    propagate_modifiers(scene, EffectModifier(scale=3.0, speed=1.0), [a, b])
    scene.step(0.0)
    for sid in (a, b):
        st = scene._spawners[sid].state
        alive = np.asarray(st.alive)
        assert float(np.asarray(st.initial_scale)[alive][0]) == 3.0


def test_invalid_nested_pacing_warns():
    import warnings

    from bevy_firework_tpu import EmissionMode, compile_spawner

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(), ParticleSettings()],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(1)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.on_demand()),
        ],
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compile_spawner(sp)
    assert any("CountOverDuration" in str(x.message) for x in w)
