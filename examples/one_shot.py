"""Impact bursts (reference: `examples/one_shot.rs`): a bouncing ball spawns
a 20-particle burst per impact, sized by impulse; each spawner despawns when
finished (ParticleSpawnerFinished observer)."""

from _common import parse_args

args = parse_args(__doc__, frames=600)

import numpy as np

from bevy_firework_tpu import Scene, Transform
from bevy_firework_tpu.models import effects

scene = Scene(colliders=effects.one_shot_walls())

# Simple host-side bouncing ball standing in for the avian rigid body.
pos = np.array([0.0, 3.0, 0.0])
vel = np.array([8.0, 0.0, 6.0])
bounds = np.array([3.0, 2.0, 3.0])

for f in range(args.frames):
    vel[1] -= 9.81 * args.dt
    pos += vel * args.dt
    for axis in range(3):
        lim = bounds[axis] if axis != 1 else 0.0
        if axis == 1 and pos[1] < -2.0:
            impulse = abs(vel[1])
            spawner, _ = effects.one_shot(impulse=impulse)
            sid = scene.add_spawner(spawner, capacity=32, transform=Transform(translation=tuple(pos)))
            scene.on_finished(sid, lambda s: scene.remove_spawner(s))
            pos[1] = -2.0
            vel[1] = -vel[1]
            print(f"frame {f}: impact (impulse {impulse:.1f}) -> burst spawner {sid}")
        elif axis != 1 and abs(pos[axis]) > lim:
            pos[axis] = np.sign(pos[axis]) * lim
            vel[axis] = -vel[axis]
    scene.step(args.dt)

print(f"end: live={scene.alive_count()}, active spawners={len(scene.spawner_ids())}")
