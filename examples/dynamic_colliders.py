"""Dynamic collider pool demo: add, remove, and move colliders at runtime
with ZERO recompiles (traced active mask + slot reuse; the avian analog is
freely spawning/despawning collider entities, which the reference picks up
automatically through its spatial query, `/root/reference/src/core.rs:756`).

A steady stream rains onto a floor; mid-run the floor is removed (particles
fall through), re-added (bounce resumes — the freed slot is reused so the
compiled step is untouched), then lowered in place."""

from _common import parse_args

args = parse_args(__doc__, frames=240)

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

spawner = ParticleSpawner(
    particle_settings=[
        ParticleSettings(
            lifetime=RandF32.constant(0.6),
            collision_settings=ParticleCollisionSettings(restitution=0.7),
        )
    ],
    emission_settings=[
        EmissionSettings(
            emission_pacing=EmissionPacing.rate(2000.0),
            initial_velocity=RandVec3.constant((0.0, -5.0, 0.0)),
        )
    ],
)

scene = Scene(colliders=[Collider.halfspace(position=(0, 0, 0))])
sid = scene.add_spawner(spawner, transform=Transform(translation=(0, 1.5, 0)))
(floor_id,) = list(scene._collider_ids.keys())


def min_y():
    st = scene._spawners[sid].state
    alive = np.asarray(st.alive)
    return float(np.asarray(st.py)[alive].min())


for _ in range(90):
    scene.step(args.dt)
print(f"floor on:      min y = {min_y():+.3f}  (held at 0)")
cache0 = step_auto_jit._cache_size()  # initial compile done; edits start here

scene.remove_collider(floor_id)
for _ in range(40):
    scene.step(args.dt)
print(f"floor removed: min y = {min_y():+.3f}  (falling through)")

floor_id = scene.add_collider(Collider.halfspace(position=(0, 0, 0)))
for _ in range(90):
    scene.step(args.dt)
print(f"floor back:    min y = {min_y():+.3f}  (held again, slot reused)")

scene.set_collider(floor_id, position=(0, -1.0, 0))
for _ in range(90):
    scene.step(args.dt)
print(f"floor lowered: min y = {min_y():+.3f}  (held at -1)")

recompiles = step_auto_jit._cache_size() - cache0
print(f"step recompiles across all collider edits: {recompiles} (expected 0)")
assert recompiles == 0
