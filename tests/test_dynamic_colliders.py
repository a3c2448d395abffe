"""Dynamic collider pool: add/remove/move colliders at runtime without
recompiling the step (traced `active` mask + slot reuse; reference analog is
avian's free insertion/removal of collider entities, which bevy_firework picks
up automatically through its spatial query, `/root/reference/src/core.rs:756`).
"""

import numpy as np

from bevy_firework_tpu import (
    Collider,
    EmissionPacing,
    EmissionSettings,
    ParticleCollisionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    Transform,
)
from bevy_firework_tpu.ops.fused_step import step_auto_jit


def dripper(rate=600.0, lifetime=0.4):
    """Continuous downward stream that either bounces on a floor or falls."""
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(
                lifetime=RandF32.constant(lifetime),
                acceleration=(0.0, 0.0, 0.0),
                linear_drag=0.0,
                collision_settings=ParticleCollisionSettings(restitution=0.8, friction=0.0),
            )
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.rate(rate),
                initial_velocity=RandVec3.constant((0.0, -5.0, 0.0)),
            )
        ],
    )


def min_live_y(scene):
    st = next(iter(scene._spawners.values())).state
    alive = np.asarray(st.alive)
    assert alive.any()
    return float(np.asarray(st.py)[alive].min())


def test_remove_and_readd_without_retrace():
    scene = Scene(colliders=[Collider.halfspace(position=(0, 0, 0))])
    scene.add_spawner(dripper(), capacity=512, transform=Transform(translation=(0, 1, 0)))

    for _ in range(60):
        scene.step(1 / 60)
    assert min_live_y(scene) >= -1e-3  # floor holds

    kinds_before = scene._colliders.kinds
    cache_before = step_auto_jit._cache_size()

    # find the floor's cid (the only collider)
    (cid,) = list(scene._collider_ids.keys())
    scene.remove_collider(cid)
    for _ in range(30):
        scene.step(1 / 60)
    assert min_live_y(scene) < -0.5  # falls through where the floor was

    cid2 = scene.add_collider(Collider.halfspace(position=(0, 0, 0)))
    for _ in range(60):
        scene.step(1 / 60)
    assert min_live_y(scene) >= -1e-3  # floor holds again

    # slot reuse: static layout unchanged, so the step never recompiled
    assert scene._colliders.kinds == kinds_before
    assert step_auto_jit._cache_size() == cache_before
    assert cid2 != cid  # fresh handle


def test_move_collider_no_retrace():
    scene = Scene(colliders=[Collider.halfspace(position=(0, 0, 0))])
    scene.add_spawner(dripper(), capacity=512, transform=Transform(translation=(0, 1, 0)))
    scene.step(1 / 60)
    cache_before = step_auto_jit._cache_size()

    (cid,) = list(scene._collider_ids.keys())
    scene.set_collider(cid, position=(0, -2.0, 0))
    for _ in range(60):
        scene.step(1 / 60)
    y = min_live_y(scene)
    assert -2.0 - 1e-3 <= y < -0.5  # rests on the lowered floor
    assert step_auto_jit._cache_size() == cache_before


def test_new_kind_appends_slot():
    scene = Scene(colliders=[Collider.halfspace(position=(0, 0, 0))])
    scene.add_collider(Collider.sphere(1.0, position=(5, 0, 0)))
    assert len(scene._colliders.kinds) == 2
    # removing the sphere and adding another sphere reuses its slot
    cids = list(scene._collider_ids.keys())
    scene.remove_collider(cids[1])
    scene.add_collider(Collider.sphere(2.0, position=(-5, 0, 0)))
    assert len(scene._colliders.kinds) == 2


def test_rotated_readd_does_not_reuse_identity_slot():
    scene = Scene()
    cid = scene.add_collider(Collider.cuboid((1, 1, 1)))
    scene.remove_collider(cid)
    # a rotated cuboid can't run through the identity-rot specialized slot
    rot = (0.0, 0.0, 0.3826834, 0.9238795)  # 45 deg about Z
    scene.add_collider(Collider.cuboid((1, 1, 1), rotation=rot))
    assert len(scene._colliders.kinds) == 2
    assert scene._colliders.identity_rot == (True, False)


def test_identity_readd_can_reuse_rotated_slot():
    rot = (0.0, 0.0, 0.3826834, 0.9238795)
    scene = Scene()
    cid = scene.add_collider(Collider.cuboid((1, 1, 1), rotation=rot))
    scene.remove_collider(cid)
    scene.add_collider(Collider.cuboid((2, 2, 2)))  # identity rot fits rotated slot
    assert len(scene._colliders.kinds) == 1
    assert scene._colliders.identity_rot == (False,)


def test_set_collider_rotation_flips_identity_slot():
    scene = Scene()
    cid = scene.add_collider(Collider.cuboid((1, 1, 1)))
    assert scene._colliders.identity_rot == (True,)
    scene.set_collider(cid, rotation=(0.0, 0.0, 0.3826834, 0.9238795))
    assert scene._colliders.identity_rot == (False,)


def test_inactive_collider_ignores_layers():
    # a disabled collider must not collide even with all-ones layer masks
    scene = Scene(colliders=[Collider.halfspace(position=(0, 0, 0), layers=0xFFFFFFFF)])
    scene.add_spawner(dripper(), capacity=512, transform=Transform(translation=(0, 1, 0)))
    (cid,) = list(scene._collider_ids.keys())
    scene.remove_collider(cid)
    for _ in range(30):
        scene.step(1 / 60)
    assert min_live_y(scene) < -0.5
