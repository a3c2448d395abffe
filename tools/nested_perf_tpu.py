"""On-TPU nested-emission perf breakdown.

Measures ms/frame at ~88k live for:
  A. nested stress (2 types, children nested on parents)  — XLA path
  B. same live count, global emitters only                — XLA path
  C. same live count, global emitters only                — fused Pallas path

A-B isolates the nested spawn machinery (cadence per parent, rank cumsum,
bounded-M child build, pool scatter); B-C is what a fused integrate would
recover. Run: python tools/nested_perf_tpu.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

from bevy_firework_tpu import (
    EmissionMode,
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_spawner,
    init_pool,
    make_frame_input,
)
from bevy_firework_tpu.step import multi_step
from bevy_firework_tpu.ops.fused_step import multi_step_auto

CAPACITY = 16 * 8192  # 131072


def nested_stress():
    """~8k parents (4000/s x 2s) + ~80k children (10/parent over parent life,
    child life 2s) = ~88k live."""
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(2.0), linear_drag=0.1),
            ParticleSettings(lifetime=RandF32.constant(2.0), linear_drag=0.3),
        ],
        emission_settings=[
            EmissionSettings(
                particle_index=0,
                emission_pacing=EmissionPacing.rate(4000.0),
                initial_velocity=RandVec3(magnitude=RandF32(2.0, 6.0), direction=(0, 1, 0), spread=0.5),
            ),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(10.0, 1.0, 0.0, 1.0),
                initial_velocity=RandVec3(magnitude=RandF32(0.2, 1.0), direction=(0, 1, 0), spread=3.14),
                inherit_parent_velocity=True,
            ),
        ],
    )


def global_match():
    """Same ~88k live with global emitters only (44000/s x 2s)."""
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(2.0), linear_drag=0.1),
            ParticleSettings(lifetime=RandF32.constant(2.0), linear_drag=0.3),
        ],
        emission_settings=[
            EmissionSettings(
                particle_index=0,
                emission_pacing=EmissionPacing.rate(4000.0),
                initial_velocity=RandVec3(magnitude=RandF32(2.0, 6.0), direction=(0, 1, 0), spread=0.5),
            ),
            EmissionSettings(
                particle_index=1,
                emission_pacing=EmissionPacing.rate(40000.0),
                initial_velocity=RandVec3(magnitude=RandF32(0.2, 1.0), direction=(0, 1, 0), spread=3.14),
            ),
        ],
    )


def measure(sp, stepper, warmup=150, n=100, label=""):
    """Differential readback-forced timing: (t_2n - t_n)/n — per-call
    constants cancel; np.asarray is the only reliable device fence on the
    axon attach (block_until_ready can return early)."""
    import numpy as np

    c = compile_spawner(sp)
    state = init_pool(CAPACITY, c.num_emitters, True, 0)
    frame = make_frame_input(1 / 60)
    state, out = stepper(c.static, c.params, None, state, frame, warmup)
    np.asarray(state.px)
    alive = int(out.alive_count)

    def run(k):
        s, _ = stepper(c.static, c.params, None, state, frame, k)
        np.asarray(s.px)

    run(n)
    run(2 * n)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        run(n)
        t1 = time.perf_counter()
        run(2 * n)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / n * 1e3)
    print(f"{label}: {alive} live, {best:.3f} ms/frame")
    return alive, best


def main():
    a_live, a = measure(nested_stress(), multi_step, label="A nested (XLA)")
    d_live, d = measure(nested_stress(), multi_step_auto, label="D nested (hybrid)")
    b_live, b = measure(global_match(), multi_step, label="B global-only (XLA)")
    c_live, c = measure(global_match(), multi_step_auto, label="C global-only (fused)")
    print(f"\nnested spawn machinery (A-B): {a - b:.3f} ms")
    print(f"XLA integrate overhead vs fused (B-C): {b - c:.3f} ms")
    print(f"hybrid speedup on nested (A/D): {a / d:.2f}x")


if __name__ == "__main__":
    main()
