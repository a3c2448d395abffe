"""Benchmark: particles stepped/sec + ms/frame at 100 k live (stress_test).

Driver metric from BASELINE.json: "Particles stepped/sec + ms/frame at 100k
particles (stress_test scene)". The reference ships no numbers; BASELINE.md
derives frame-rate parity at its design load as ~9.6 M particle-steps/s
(160 k live x 60 FPS), which we use as vs_baseline = 1.0.

Prints ONE JSON line. Runs on whatever backend jax picks (real TPU under the
driver). The timing loop chains jitted steps with no host sync until the end.
"""

import json
import time

import jax
import numpy as np

from bevy_firework_tpu import compile_spawner, init_pool, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.step import step_jit

BASELINE_STEPS_PER_SEC = 9.6e6  # BASELINE.md frame-rate-parity estimate
TARGET_LIVE = 100_000


def main():
    import dataclasses

    from bevy_firework_tpu.rand import RandF32

    spawner, _tf = effects.stress_test()
    # stress_test is 160k/s x 1 s => scale the rate so steady state is 100k
    es = dataclasses.replace(
        spawner.emission_settings[0],
        emission_pacing=type(spawner.emission_settings[0].emission_pacing).rate(float(TARGET_LIVE)),
    )
    spawner = dataclasses.replace(spawner, emission_settings=(es,))
    compiled = compile_spawner(spawner)

    capacity = 1 << 17  # 131072 slots for 100k steady-state
    state = init_pool(capacity, compiled.num_emitters, True, seed=0)
    frame = make_frame_input(1.0 / 60.0)

    # warm-up: compile + fill to steady state (1 s lifetime => 90 frames is
    # past steady state)
    for _ in range(90):
        state, out = step_jit(compiled.static, compiled.params, None, state, frame)
    jax.block_until_ready(state.px)
    alive = int(out.alive_count)

    # timed run: no host syncs inside the loop
    n_frames = 200
    t0 = time.perf_counter()
    for _ in range(n_frames):
        state, out = step_jit(compiled.static, compiled.params, None, state, frame)
    jax.block_until_ready(state.px)
    wall = time.perf_counter() - t0

    ms_per_frame = wall / n_frames * 1e3
    steps_per_sec = alive * n_frames / wall
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec at 100k live (stress_test)",
                "value": round(steps_per_sec),
                "unit": "particle-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
                "ms_per_frame": round(ms_per_frame, 4),
                "live_particles": alive,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
