"""Force fields (force_fields.py — beyond the reference, which only has a
per-type constant acceleration, `core.rs:111,641-643`): analytic behavior,
fused-vs-XLA parity, zero-recompile dynamics, checkpoint round-trip."""

import jax
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    EmissionShape,
    ForceField,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    compile_force_fields,
    compile_spawner,
    init_pool_for,
    make_frame_input,
)
from bevy_firework_tpu.ops.fused_step import fused_step, step_auto_jit
from bevy_firework_tpu.step import step_jit

DT = 1 / 60


def drifting(n=64, lifetime=10.0, shape=None, vel=(0.0, 0.0, 0.0)):
    return ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(lifetime), initial_scale=RandF32.constant(0.1),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.one_shot(n),
            emission_shape=shape or EmissionShape.sphere(1.5),
            initial_velocity=RandVec3.constant(vel))],
    )


def run_scene(scene, sid, n_frames):
    for _ in range(n_frames):
        scene.step(DT)
    st = scene._spawners[sid].state
    alive = np.asarray(st.alive)
    p = np.stack([np.asarray(st.px), np.asarray(st.py), np.asarray(st.pz)], 1)[alive]
    v = np.stack([np.asarray(st.vx), np.asarray(st.vy), np.asarray(st.vz)], 1)[alive]
    return p, v


def test_point_attractor_binds_and_repulsor_expels():
    scene = Scene(force_fields=[ForceField.point((0.0, 0.0, 0.0), 6.0, 20.0)])
    sid = scene.add_spawner(drifting(), capacity=256)
    p, v = run_scene(scene, sid, 90)
    # attractor: bound orbit/oscillation — never escapes the spawn shell by
    # much, and the ensemble's radial velocity is inward-biased over time
    r = np.linalg.norm(p, axis=1)
    assert r.max() < 3.0
    assert p.shape[0] == 64

    scene2 = Scene(force_fields=[ForceField.point((0.0, 0.0, 0.0), -6.0, 20.0)])
    sid2 = scene2.add_spawner(drifting(), capacity=256)
    p2, v2 = run_scene(scene2, sid2, 90)
    rad_v = (p2 * v2).sum(1) / np.linalg.norm(p2, axis=1)
    assert (rad_v > 0).all()  # repulsor: everything moving outward
    assert np.linalg.norm(p2, axis=1).min() > np.linalg.norm(p, axis=1).min()


def test_vortex_swirls_with_consistent_handedness():
    scene = Scene(force_fields=[ForceField.vortex((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 5.0, 30.0)])
    sid = scene.add_spawner(drifting(), capacity=256)
    p, v = run_scene(scene, sid, 60)
    # angular momentum about +Y: L_y = z*vx - x*vz; axis x r convention
    # makes positive strength positive L_y
    Ly = p[:, 2] * v[:, 0] - p[:, 0] * v[:, 2]
    r_ax = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
    swirling = r_ax > 0.2  # lanes near the axis get ~no tangent
    assert swirling.sum() > 40
    assert (Ly[swirling] > 0).all()
    # falloff: outside the radius the field is zero — a particle at 100
    scene3 = Scene(force_fields=[ForceField.vortex((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 5.0, 2.0)])
    sid3 = scene3.add_spawner(
        drifting(shape=EmissionShape.point(), vel=(0.0, 0.0, 0.0)), capacity=256,
    )
    scene3.set_transform(sid3, __import__("bevy_firework_tpu").Transform(translation=(100.0, 0.0, 0.0)))
    p3, v3 = run_scene(scene3, sid3, 30)
    np.testing.assert_allclose(v3, 0.0, atol=1e-6)  # out of range: untouched


def test_fused_matches_xla_with_fields():
    """Interpret-mode fused kernel vs XLA path with a point + vortex mix —
    the same field_accel helper runs in both, against VMEM refs vs arrays."""
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.3), initial_scale=RandF32.constant(0.1))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(2000.0),
            initial_velocity=RandVec3.constant((1.0, 3.0, 0.2)))],
    )
    c = compile_spawner(sp)
    table = compile_force_fields([
        ForceField.point((0.5, 1.0, 0.0), 8.0, 6.0),
        ForceField.vortex((0.0, 0.0, 0.0), (0.3, 0.9, 0.1), 4.0, 8.0),
    ])
    frame = make_frame_input(1 / 50, force_fields=table)
    fj = jax.jit(fused_step, static_argnums=(0,))
    sA = init_pool_for(c, 8192, 0)
    sB = init_pool_for(c, 8192, 0)
    for _ in range(12):
        sA, oA = step_jit(c.static, c.params, None, sA, frame)
        with pltpu.force_tpu_interpret_mode():
            sB, oB = fj(c.static, c.params, None, sB, frame)
    a, b = np.asarray(sA.alive), np.asarray(sB.alive)
    assert a.sum() == b.sum() > 0
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age"):
        xa = np.sort(np.asarray(getattr(sA, f))[a])
        xb = np.sort(np.asarray(getattr(sB, f))[b])
        np.testing.assert_allclose(xa, xb, atol=2e-5, err_msg=f)


def test_unrolled_kernel_with_fields_matches_sequential():
    """Fields under the multi-frame unroll: each sub-frame must evaluate the
    fields at ITS OWN post-move positions (bit-equal to sequential)."""
    from bevy_firework_tpu.ops.fused_step import can_unroll

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.25), initial_scale=RandF32.constant(0.1))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(1500.0),
            initial_velocity=RandVec3.constant((1.0, 3.0, 0.2)))],
    )
    c = compile_spawner(sp)
    assert can_unroll(c.static)
    table = compile_force_fields([ForceField.point((0.0, 1.0, 0.0), 5.0, 4.0)])
    frame = make_frame_input(1 / 50, force_fields=table)
    fj = jax.jit(fused_step, static_argnums=(0, 5, 6))
    sA = init_pool_for(c, 8192, 0)
    sB = init_pool_for(c, 8192, 0)
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            sA, _ = fj(c.static, c.params, None, sA, frame)
        for _ in range(2):
            sB, _ = fj(c.static, c.params, None, sB, frame, False, 2)
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sA, f)), np.asarray(getattr(sB, f)), err_msg=f)


def test_field_dynamics_no_retrace():
    """Move / re-tune / toggle / remove+re-add of the same kind: zero
    recompiles (the dynamic-collider discipline)."""
    scene = Scene(force_fields=[
        ForceField.point((0.0, 2.0, 0.0), 3.0, 5.0),
        ForceField.vortex((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 2.0, 6.0),
    ])
    scene.add_spawner(drifting(), capacity=256)
    scene.step(DT)
    fid = scene.add_force_field(ForceField.point((1.0, 0.0, 0.0), 1.0, 3.0))
    scene.step(DT)  # layout with 3 slots now traced
    cache_before = step_auto_jit._cache_size()
    scene.set_force_field(fid, position=(2.0, 0.0, 0.0), strength=-4.0, radius=2.0)
    scene.step(DT)
    scene.remove_force_field(fid)
    scene.step(DT)
    fid2 = scene.add_force_field(ForceField.point((0.0, 0.0, 3.0), 2.0, 4.0))
    scene.step(DT)
    assert step_auto_jit._cache_size() == cache_before
    # removed fields contribute nothing: a particle at the removed field's
    # old position feels only the remaining fields
    scene.remove_force_field(fid2)
    scene.step(DT)
    assert step_auto_jit._cache_size() == cache_before


def test_fields_checkpoint_round_trip(tmp_path):
    import os

    from bevy_firework_tpu.checkpoint import load_scene, save_scene

    scene = Scene(force_fields=[ForceField.vortex((0.0, 1.0, 0.0), (0.0, 1.0, 0.0), 5.0, 8.0)])
    fid = scene.add_force_field(ForceField.point((2.0, 0.0, 0.0), -3.0, 4.0))
    sid = scene.add_spawner(drifting(n=32), capacity=256)
    for _ in range(20):
        scene.step(DT)
    scene.remove_force_field(fid)  # a disabled slot must survive the trip
    path = os.path.join(tmp_path, "ff.ckpt")
    save_scene(path, scene)
    b = load_scene(path)
    for _ in range(20):
        scene.step(DT)
        b.step(DT)
    sa, sb = scene._spawners[sid].state, b._spawners[sid].state
    np.testing.assert_array_equal(np.asarray(sa.px), np.asarray(sb.px))
    np.testing.assert_array_equal(np.asarray(sa.vx), np.asarray(sb.vx))
    # handles stay live: re-adding reuses the freed slot, no retrace keying
    assert b._field_slots[1].active is False
    b.add_force_field(ForceField.point((0.0, 0.0, 0.0), 1.0, 2.0))
    assert len(b._field_slots) == 2  # slot reuse


def test_fields_with_collision_and_batched_groups():
    """Fields + colliders together (XLA and fused agree via the scene path),
    across an archetype-batched pair of spawners."""
    from bevy_firework_tpu import Collider, Transform

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(1.0), initial_scale=RandF32.constant(0.1),
            collision_settings=__import__("bevy_firework_tpu").settings.ParticleCollisionSettings(
                restitution=0.5, friction=0.1))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(500.0),
            initial_velocity=RandVec3(RandF32(1.0, 2.0), (0.0, 1.0, 0.0), 0.4))],
    )
    scene = Scene(
        colliders=[Collider.halfspace(position=(0.0, -0.5, 0.0))],
        force_fields=[ForceField.vortex((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 3.0, 10.0)],
    )
    a = scene.add_spawner(sp, capacity=1024)
    b = scene.add_spawner(sp, capacity=1024, transform=Transform(translation=(5.0, 0.0, 0.0)))
    for _ in range(60):
        scene.step(DT)
    assert scene._last_step_dispatches == 1  # batched despite fields
    for sid in (a, b):
        st = scene._spawners[sid].state
        alive = np.asarray(st.alive)
        assert alive.sum() > 0
        assert np.asarray(st.py)[alive].min() >= -0.6  # floor still holds
        Ly = (np.asarray(st.pz) * np.asarray(st.vx) - np.asarray(st.px) * np.asarray(st.vz))[alive]
        assert Ly.mean() != 0.0  # swirl present


def test_turbulence_divergence_free_and_animates():
    """Curl-noise turbulence: numerically divergence-free (div curl = 0 —
    swirls never create sinks/sources), falls off to zero past radius, and
    the phase knob decorrelates/animates the pattern."""
    import jax.numpy as jnp

    from bevy_firework_tpu.force_fields import field_accel

    t = compile_force_fields([ForceField.turbulence(
        (0.0, 0.0, 0.0), strength=2.0, radius=1000.0, frequency=0.7)])

    def acc(p):
        a = field_accel(t.kinds, jnp.asarray(t.position), jnp.asarray(t.axis),
                        jnp.asarray(t.params), jnp.asarray(t.active).reshape(-1, 1),
                        p[..., 0], p[..., 1], p[..., 2])
        return np.asarray(jnp.stack(a, -1))

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(64, 3)) * 3).astype(np.float32)
    eps = 1e-3
    div = np.zeros(64)
    for axi in range(3):
        e = np.zeros(3, np.float32)
        e[axi] = eps
        div += (acc(pts + e)[:, axi] - acc(pts - e)[:, axi]) / (2 * eps)
    mag = np.linalg.norm(acc(pts), axis=1)
    assert mag.mean() > 0.5  # actually swirling
    assert np.abs(div).max() < 0.02 * mag.mean()

    t2 = compile_force_fields([ForceField.turbulence(
        (0.0, 0.0, 0.0), strength=2.0, radius=1.0, frequency=0.7)])
    far = np.float32([[50.0, 0.0, 0.0]])
    a2 = field_accel(t2.kinds, jnp.asarray(t2.position), jnp.asarray(t2.axis),
                     jnp.asarray(t2.params), jnp.asarray(t2.active).reshape(-1, 1),
                     far[:, 0], far[:, 1], far[:, 2])
    np.testing.assert_allclose(np.stack(a2, -1), 0.0, atol=1e-6)  # falloff cutoff

    t3 = compile_force_fields([ForceField.turbulence(
        (0.0, 0.0, 0.0), strength=2.0, radius=1000.0, frequency=0.7, phase=2.0)])

    def acc3(p):
        a = field_accel(t3.kinds, jnp.asarray(t3.position), jnp.asarray(t3.axis),
                        jnp.asarray(t3.params), jnp.asarray(t3.active).reshape(-1, 1),
                        p[..., 0], p[..., 1], p[..., 2])
        return np.asarray(jnp.stack(a, -1))

    assert np.abs(acc3(pts) - acc(pts)).max() > 0.1  # phase changes the pattern


def test_fused_matches_xla_with_turbulence():
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.3), initial_scale=RandF32.constant(0.1))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(2000.0),
            initial_velocity=RandVec3.constant((1.0, 3.0, 0.2)))],
    )
    c = compile_spawner(sp)
    table = compile_force_fields([
        ForceField.turbulence((0.0, 1.0, 0.0), strength=5.0, radius=50.0, frequency=1.3),
        ForceField.axial((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 3.0, 8.0),
    ])
    frame = make_frame_input(1 / 50, force_fields=table)
    fj = jax.jit(fused_step, static_argnums=(0,))
    sA = init_pool_for(c, 8192, 0)
    sB = init_pool_for(c, 8192, 0)
    for _ in range(10):
        sA, _ = step_jit(c.static, c.params, None, sA, frame)
        with pltpu.force_tpu_interpret_mode():
            sB, _ = fj(c.static, c.params, None, sB, frame)
    a, b = np.asarray(sA.alive), np.asarray(sB.alive)
    assert a.sum() == b.sum() > 0
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        xa = np.sort(np.asarray(getattr(sA, f))[a])
        xb = np.sort(np.asarray(getattr(sB, f))[b])
        np.testing.assert_allclose(xa, xb, atol=3e-5, err_msg=f)


def test_per_type_field_opt_out():
    """affected_by_fields=False exempts a type: in a two-type spawner under
    a strong repulsor, only the opted-in type accelerates (both paths:
    XLA via Scene, fused via interpret parity below)."""
    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(5.0),
                             acceleration=(0.0, 0.0, 0.0), linear_drag=0.0),
            ParticleSettings(lifetime=RandF32.constant(5.0),
                             acceleration=(0.0, 0.0, 0.0), linear_drag=0.0,
                             affected_by_fields=False),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(16),
                             emission_shape=EmissionShape.sphere(1.0)),
            EmissionSettings(particle_index=1, emission_pacing=EmissionPacing.one_shot(16),
                             emission_shape=EmissionShape.sphere(1.0)),
        ],
    )
    scene = Scene(force_fields=[ForceField.point((0.0, 0.0, 0.0), -10.0, 50.0)])
    sid = scene.add_spawner(sp, capacity=256)
    for _ in range(30):
        scene.step(DT)
    st = scene._spawners[sid].state
    alive = np.asarray(st.alive)
    pt = np.asarray(st.ptype)[alive]
    speed = np.sqrt(np.asarray(st.vx) ** 2 + np.asarray(st.vy) ** 2 + np.asarray(st.vz) ** 2)[alive]
    assert (speed[pt == 0] > 0.5).all()  # repelled
    np.testing.assert_allclose(speed[pt == 1], 0.0, atol=1e-6)  # exempt

    # serde round-trips the new flag (legacy JSON loads with default True)
    from bevy_firework_tpu import spawner_from_json, spawner_to_json

    sp2 = spawner_from_json(spawner_to_json(sp))
    assert sp2.particle_settings[0].affected_by_fields is True
    assert sp2.particle_settings[1].affected_by_fields is False

    # fused interpret parity for the multi-type masked config: DETERMINISTIC
    # draws (point shape + constant velocities; fused PRNG is distribution-
    # parity only), launched off-origin so the repulsor acts from frame 1
    spd = ParticleSpawner(
        particle_settings=sp.particle_settings,
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(16),
                             initial_velocity=RandVec3.constant((0.5, 0.2, 0.0))),
            EmissionSettings(particle_index=1, emission_pacing=EmissionPacing.one_shot(16),
                             initial_velocity=RandVec3.constant((-0.5, 0.1, 0.0))),
        ],
    )
    c = compile_spawner(spd)
    table = compile_force_fields([ForceField.point((0.0, -1.0, 0.0), -10.0, 50.0)])
    frame = make_frame_input(DT, force_fields=table)
    fj = jax.jit(fused_step, static_argnums=(0,))
    sA = init_pool_for(c, 8192, 0)
    sB = init_pool_for(c, 8192, 0)
    for _ in range(6):
        sA, _ = step_jit(c.static, c.params, None, sA, frame)
        with pltpu.force_tpu_interpret_mode():
            sB, _ = fj(c.static, c.params, None, sB, frame)
    a, b = np.asarray(sA.alive), np.asarray(sB.alive)
    assert a.sum() == b.sum() > 0
    for f in ("px", "vx", "vy"):
        xa = np.sort(np.asarray(getattr(sA, f))[a])
        xb = np.sort(np.asarray(getattr(sB, f))[b])
        np.testing.assert_allclose(xa, xb, atol=2e-5, err_msg=f)
    # the exempt type's speed is exactly its launch speed in BOTH paths
    pt_b = np.asarray(sB.ptype)[b]
    sp_b = np.sqrt(np.asarray(sB.vx) ** 2 + np.asarray(sB.vy) ** 2 + np.asarray(sB.vz) ** 2)[b]
    np.testing.assert_allclose(sp_b[pt_b == 1], np.sqrt(0.5**2 + 0.1**2), atol=1e-5)
