"""On-TPU randomized parity sweep: fused Pallas path vs XLA path.

The CPU test suite checks the fused kernel in interpret mode on three hand
configs; this sweep runs COMPILED kernels on real TPU across randomized
global-only archetypes (pacing kinds, curve shapes, colliders, physics
constants, multi-type) with deterministic draws, asserting frame-exact
agreement. Run: python tools/fused_parity_tpu.py [n_configs]
"""

import sys

sys.path.insert(0, ".")

import dataclasses

import jax
import numpy as np

from bevy_firework_tpu import (
    Collider,
    EmissionPacing,
    EmissionSettings,
    FireworkCurve,
    ParticleCollisionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_colliders,
    compile_spawner,
    gradient_uneven_samples,
    init_pool_for,
    make_frame_input,
)
from bevy_firework_tpu.ops.fused_step import can_fuse, fused_step
from bevy_firework_tpu.step import step_jit

fused_jit = jax.jit(fused_step, static_argnums=(0,))


def random_global_spawner(rng):
    T = rng.randint(1, 3)
    types = []
    for _ in range(T):
        nk = rng.randint(1, 5)
        if nk == 1:
            curve = FireworkCurve.constant(float(rng.uniform(0.5, 2.0)))
        else:
            ts = np.sort(rng.uniform(0, 1, nk))
            ts[0], ts[-1] = 0.0, 1.0
            curve = (
                FireworkCurve.constant(1.0)
                if len(set(ts)) < nk
                else FireworkCurve.uneven_samples([(float(t), float(rng.uniform(0.2, 3.0))) for t in ts])
            )
        collision = None
        if rng.rand() < 0.5:
            collision = ParticleCollisionSettings(
                restitution=float(rng.uniform(0, 1)), friction=float(rng.uniform(0, 0.5)),
                destroy_on_collision=bool(rng.rand() < 0.2),
            )
        types.append(ParticleSettings(
            lifetime=RandF32.constant(float(rng.uniform(0.1, 0.6))),
            initial_scale=RandF32.constant(float(rng.uniform(0.05, 0.3))),
            scale_curve=curve,
            acceleration=tuple(rng.uniform(-10, 10, 3).astype(float)),
            linear_drag=float(rng.uniform(0, 1)),
            angular_drag=float(rng.uniform(0, 1)),
            collision_settings=collision,
        ))
    E = rng.randint(1, 4)
    emitters = []
    for _ in range(E):
        kind = rng.choice(["one_shot", "rate", "windowed", "on_demand"])
        if kind == "one_shot":
            pacing = EmissionPacing.one_shot(int(rng.randint(1, 30)))
        elif kind == "on_demand":
            pacing = EmissionPacing.on_demand()
        elif kind == "rate":
            pacing = EmissionPacing.rate(float(rng.uniform(100, 2000)))
        else:
            pacing = EmissionPacing.count_over_duration(
                float(rng.uniform(5, 100)), float(rng.uniform(0.3, 1.5)),
                float(rng.uniform(0, 0.4)), float(rng.uniform(0.6, 1.0)))
        emitters.append(EmissionSettings(
            particle_index=int(rng.randint(0, T)),
            emission_pacing=pacing,
            initial_velocity=RandVec3.constant(tuple(rng.uniform(-4, 4, 3).astype(float))),
            initial_angular_velocity=RandVec3.constant(tuple(rng.uniform(-2, 2, 3).astype(float))),
            inherit_parent_velocity=bool(rng.randint(0, 2)),
            initial_rotation=tuple((lambda q: q / np.linalg.norm(q))(rng.normal(size=4)).astype(float)),
        ))
    return ParticleSpawner(particle_settings=tuple(types), emission_settings=tuple(emitters))


def main(n_configs=8):
    failures = 0
    for seed in range(n_configs):
        rng = np.random.RandomState(500 + seed)
        sp = random_global_spawner(rng)
        c = compile_spawner(sp)
        assert can_fuse(c.static)
        table = None
        if c.static.any_collision:
            table = compile_colliders([
                Collider.halfspace(position=(0, float(rng.uniform(-2, 0)), 0)),
                Collider.cuboid((1, 1, 1), position=tuple(rng.uniform(-2, 2, 3).astype(float)),
                                rotation=tuple((lambda q: q / np.linalg.norm(q))(rng.normal(size=4)).astype(float))),
            ])
        sA = init_pool_for(c, 8192, 0)
        sB = init_pool_for(c, 8192, 0)
        frame = make_frame_input(1 / 50)
        ok = True
        for fi in range(30):
            sA, oA = step_jit(c.static, c.params, table, sA, frame)
            sB, oB = fused_jit(c.static, c.params, table, sB, frame)
        a_alive = np.asarray(sA.alive)
        b_alive = np.asarray(sB.alive)
        if a_alive.sum() != b_alive.sum():
            print(f"seed {seed}: COUNT MISMATCH {a_alive.sum()} vs {b_alive.sum()}")
            failures += 1
            continue
        for f in ("px", "py", "pz", "vx", "vy", "vz", "age", "lifetime", "initial_scale", "qw", "wx"):
            xa = np.sort(np.asarray(getattr(sA, f))[a_alive])
            xb = np.sort(np.asarray(getattr(sB, f))[b_alive])
            if not np.allclose(xa, xb, atol=5e-4):
                print(f"seed {seed}: FIELD {f} max err {np.abs(xa - xb).max():.2e}")
                failures += 1
                ok = False
                break
        if ok:
            print(f"seed {seed}: OK ({int(a_alive.sum())} live, T={c.num_types} E={c.num_emitters}, "
                  f"collision={'y' if table is not None else 'n'})")
    print(f"\n{n_configs - failures}/{n_configs} configs exact-match")
    return failures


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 8))
