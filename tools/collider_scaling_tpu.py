"""Collision cost vs collider count on the fused kernel (1M-lane pool).

Quantifies the O(C) narrow-phase cost so capacity planning is honest. At
C < LOOP_MIN_COLLIDERS every collider's ray test is unrolled per substep
(collision.py semantics); at C >= LOOP_MIN_COLLIDERS the kernel switches to
the kind-grouped `lax.fori_loop` over SMEM collider rows with a scalar
broad-phase gate per iteration (ops/fused_step._collide_tile). Measured:
the loop is linear (~0.36 + 0.018xC ms @1M lanes) and beats unrolled at
every C where it engages; unrolled blows up superlinearly past C~24 on
CODE size, not ray math — see docs/PERF_NOTES.md "Collider-count scaling".

Run: python tools/collider_scaling_tpu.py
"""

import sys
import time

sys.path.insert(0, ".")

import dataclasses

import numpy as np

from bevy_firework_tpu import Collider, compile_colliders, compile_spawner, init_pool_for, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.ops.fused_step import multi_step_auto
from bevy_firework_tpu.settings import EmissionPacing

CAPACITY = 160 * 8192


def colliders_n(n, hulls=False):
    cols = [Collider.halfspace(position=(0.0, -2.0, 0.0))]
    rng = np.random.RandomState(7)
    while len(cols) < n:
        p = rng.uniform(-20, 20, 3)
        k = len(cols) % (4 if hulls else 3)
        if k == 0:
            cols.append(Collider.sphere(radius=1.0, position=tuple(p)))
        elif k == 1:
            cols.append(Collider.cuboid(half_extents=(1.0, 1.0, 1.0), position=tuple(p)))
        elif k == 2:
            cols.append(Collider.capsule(radius=0.5, half_segment=1.0, position=tuple(p)))
        else:
            cols.append(Collider.hull_from_points(
                [(0, 0, 0), (2.0, 0, 0), (0, 2.5, 0), (0, 0, 2.0)],
                position=tuple(p)))
    return cols[:n]


def _fence(arr) -> float:
    """4-byte device fence (see bench.py: full-pool readback rides the tunnel
    and its transfer variance swamps the differential being measured)."""
    return float(np.asarray(arr.sum()))


def measure(n_cols, warmup=140, n=60, reps=7, hulls=False):
    sp, _t, _c = effects.stress_test_collision()
    es = dataclasses.replace(sp.emission_settings[0], emission_pacing=EmissionPacing.rate(500_000.0))
    sp = dataclasses.replace(sp, emission_settings=(es,))
    c = compile_spawner(sp)
    table = compile_colliders(colliders_n(n_cols, hulls=hulls))
    state = init_pool_for(c, CAPACITY, 0)
    frame = make_frame_input(1 / 60)
    state, out = multi_step_auto(c.static, c.params, table, state, frame, warmup)
    _fence(state.px)

    def run(k):
        s, _ = multi_step_auto(c.static, c.params, table, state, frame, k)
        _fence(s.px)

    run(n); run(2 * n)
    d = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(n); t1 = time.perf_counter(); run(2 * n); t2 = time.perf_counter()
        d.append(((t2 - t1) - (t1 - t0)) / n * 1e3)
    d.sort()
    return int(out.alive_count), d[len(d) // 2]


def main():
    for n_cols in (1, 2, 4, 8, 16, 32):
        live, ms = measure(n_cols)
        print(f"C={n_cols:3d}: {ms:.3f} ms/frame ({live} live)")
    # hulls in the loop (VERDICT r4 next #4): every 4th collider a
    # tetrahedron hull — 24+ colliders with hulls must show loop-linear
    # cost, no unroll code-size blowup
    for n_cols in (8, 16, 24, 32):
        live, ms = measure(n_cols, hulls=True)
        print(f"C={n_cols:3d} (1/4 hulls): {ms:.3f} ms/frame ({live} live)")


if __name__ == "__main__":
    main()
