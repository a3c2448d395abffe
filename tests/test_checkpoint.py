"""Checkpoint/resume: bit-exact trajectory continuation after save+load."""

import os

import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    Transform,
)
from bevy_firework_tpu.checkpoint import load_pool, load_scene, save_pool, save_scene


def spawner():
    return ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32(0.2, 0.6))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(400.0),
            initial_velocity=RandVec3(RandF32(1.0, 3.0), (0, 1, 0), 0.3))],
    )


def test_pool_round_trip(tmp_path):
    scene = Scene()
    sid = scene.add_spawner(spawner(), capacity=512)
    for _ in range(20):
        scene.step(1 / 60)
    st = scene._spawners[sid].state
    p = os.path.join(tmp_path, "pool.npz")
    save_pool(p, st)
    st2 = load_pool(p)
    for name in ("px", "age", "alive", "rng_key", "time_in_cycle", "last_emission"):
        np.testing.assert_array_equal(np.asarray(getattr(st, name)), np.asarray(getattr(st2, name)))


def test_scene_resume_continues_exact_trajectory(tmp_path):
    path = os.path.join(tmp_path, "scene.ckpt")
    a = Scene()
    a.add_spawner(spawner(), capacity=512, transform=Transform(translation=(1, 2, 3)))
    for _ in range(15):
        a.step(1 / 60)
    save_scene(path, a)
    b = load_scene(path)
    assert b.time == a.time
    for _ in range(15):
        a.step(1 / 60)
        b.step(1 / 60)
    sa = next(iter(a._spawners.values())).state
    sb = next(iter(b._spawners.values())).state
    np.testing.assert_array_equal(np.asarray(sa.alive), np.asarray(sb.alive))
    np.testing.assert_array_equal(np.asarray(sa.px), np.asarray(sb.px))
    np.testing.assert_array_equal(np.asarray(sa.vy), np.asarray(sb.vy))
    np.testing.assert_array_equal(np.asarray(sa.rng_key), np.asarray(sb.rng_key))


def test_scene_restore_non_contiguous_ids(tmp_path):
    """Removals leave id gaps; restore must preserve the surviving ids
    exactly and new spawners must not collide with them (VERDICT r1 #10)."""
    path = os.path.join(tmp_path, "gappy.ckpt")
    a = Scene()
    s0 = a.add_spawner(spawner(), capacity=512)
    s1 = a.add_spawner(spawner(), capacity=512)
    s2 = a.add_spawner(spawner(), capacity=512)
    a.remove_spawner(s1)
    for _ in range(10):
        a.step(1 / 60)
    save_scene(path, a)

    b = load_scene(path)
    assert sorted(b.spawner_ids()) == [s0, s2]
    for sid in (s0, s2):
        np.testing.assert_array_equal(
            np.asarray(a._spawners[sid].state.alive), np.asarray(b._spawners[sid].state.alive))
    # fresh ids continue past the restored maximum
    s3 = b.add_spawner(spawner(), capacity=512)
    assert s3 == 3
    # explicit-id collision is rejected
    try:
        b.add_spawner(spawner(), capacity=512, sid=s0)
        assert False, "duplicate sid accepted"
    except ValueError:
        pass


def test_legacy_checkpoint_ring_cursor_reconstructed(tmp_path):
    """A checkpoint without ring_cursor (pre-ring format) must resume with
    the EXACT cursor reconstructed from the age field — no transient
    under-emission window (VERDICT r1 weak #7)."""
    from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
    from bevy_firework_tpu.checkpoint import pool_from_arrays, pool_to_arrays
    from bevy_firework_tpu.step import step_jit

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.5))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(300.0))],
    )
    c = compile_spawner(sp)
    assert c.static.ring_claim
    state = init_pool_for(c, 256, 0)
    frame = make_frame_input(1 / 60)
    for _ in range(40):  # past one lifetime: the ring has wrapped activity
        state, _ = step_jit(c.static, c.params, None, state, frame)

    arrays = pool_to_arrays(state)
    true_cursor = int(arrays.pop("ring_cursor"))  # simulate legacy format
    restored = pool_from_arrays(arrays)
    assert int(restored.ring_cursor) == true_cursor

    # continuing from the restore matches the uninterrupted run exactly
    a, b = state, restored
    for _ in range(40):
        a, oa = step_jit(c.static, c.params, None, a, frame)
        b, ob = step_jit(c.static, c.params, None, b, frame)
        assert int(oa.alive_count) == int(ob.alive_count)
    np.testing.assert_array_equal(np.asarray(a.alive), np.asarray(b.alive))


def test_scene_checkpoint_round_trips_trails_and_nested_buffer(tmp_path):
    """Trail history and the nested_buffer compile knob survive save+load:
    restored trail segments match exactly and keep continuing the ribbon."""
    from bevy_firework_tpu import TrailSettings

    path = os.path.join(tmp_path, "trail.ckpt")
    a = Scene()
    sid = a.add_spawner(spawner(), capacity=512, nested_buffer=2048,
                        trail=TrailSettings(length=5, width=0.4, taper=False),
                        layers=0b110)
    for _ in range(20):
        a.step(1 / 60)
    save_scene(path, a)
    b = load_scene(path)
    assert b._spawners[sid].compiled.static.nested_m == 2048
    assert b._spawners[sid].layers == 0b110  # RenderLayers survive restore
    assert b._spawners[sid].trail_settings == TrailSettings(length=5, width=0.4, taper=False)
    ia, ib = a.trail_items(), b.trail_items()
    assert len(ia) == len(ib) == 1
    np.testing.assert_array_equal(ia[0].segments, ib[0].segments)
    for _ in range(10):  # history keeps extending identically post-restore
        a.step(1 / 60)
        b.step(1 / 60)
    np.testing.assert_array_equal(a.trail_items()[0].segments,
                                  b.trail_items()[0].segments)


def test_scene_checkpoint_round_trips_colliders_and_fields(tmp_path):
    """The collider scene (incl. dynamic edits, disabled slots, and live
    handles) survives save+load — previously colliders were silently
    dropped and restored scenes let particles fall through their floors."""
    from bevy_firework_tpu import Collider
    from bevy_firework_tpu.settings import ParticleCollisionSettings

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(1.0),
            collision_settings=ParticleCollisionSettings(restitution=0.5, friction=0.1))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(400.0),
            initial_velocity=RandVec3(RandF32(1.0, 2.0), (0, 1, 0), 0.4))],
    )
    a = Scene(colliders=[Collider.halfspace(position=(0.0, -0.5, 0.0))])
    cid = a.add_collider(Collider.sphere(0.4, position=(0.5, 1.0, 0.0)))
    a.add_spawner(sp, capacity=1024)
    for _ in range(10):
        a.step(1 / 60)
    a.set_collider(cid, position=(0.7, 1.0, 0.0))  # dynamic edit pre-save
    path = os.path.join(tmp_path, "col.ckpt")
    save_scene(path, a)
    b = load_scene(path)
    # identical continuation: the floor + edited sphere are both there
    for _ in range(40):
        a.step(1 / 60)
        b.step(1 / 60)
    sa = next(iter(a._spawners.values())).state
    sb = next(iter(b._spawners.values())).state
    np.testing.assert_array_equal(np.asarray(sa.py), np.asarray(sb.py))
    assert np.asarray(sa.py)[np.asarray(sa.alive)].min() >= -0.6  # floor holds
    # handles survive: the restored scene can keep editing the same id
    b.set_collider(cid, position=(0.0, 5.0, 0.0))
    b.remove_collider(cid)
    b.step(1 / 60)
    # explicit override still wins when given
    c = load_scene(path, colliders=[Collider.halfspace(position=(0.0, -2.0, 0.0))])
    assert len(c._collider_slots) == 1
