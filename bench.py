"""Benchmark: particles stepped/sec + ms/frame at 100 k live (stress_test).

Driver metric from BASELINE.json: "Particles stepped/sec + ms/frame at 100k
particles (stress_test scene)". The reference ships no numbers; BASELINE.md
derives frame-rate parity at its design load as ~9.6 M particle-steps/s
(160 k live x 60 FPS), which we use as vs_baseline = 1.0.

Prints ONE JSON line. Runs on whatever backend jax picks (real TPU under the
driver). The timing loop chains jitted steps with no host sync until the end.
"""

import dataclasses
import json
import time
from functools import partial

import jax
import numpy as np

from bevy_firework_tpu import compile_spawner, init_pool, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.ops.fused_step import step_auto, step_auto_jit
from bevy_firework_tpu.settings import EmissionPacing

BASELINE_STEPS_PER_SEC = 9.6e6  # BASELINE.md frame-rate-parity estimate
TARGET_LIVE = 100_000


@partial(jax.jit, static_argnums=(0, 2))
def _multi(static, params, n, state, frame):
    def body(s, _):
        s2, _o = step_auto(static, params, None, s, frame)
        return s2, None

    out, _ = jax.lax.scan(body, state, None, length=n)
    return out


def main():
    spawner, _tf = effects.stress_test()
    # stress_test is 160k/s x 1 s => scale the rate so steady state is 100k
    es = dataclasses.replace(
        spawner.emission_settings[0], emission_pacing=EmissionPacing.rate(float(TARGET_LIVE))
    )
    spawner = dataclasses.replace(spawner, emission_settings=(es,))
    compiled = compile_spawner(spawner)

    capacity = 1 << 17  # 131072 slots for 100k steady-state
    state = init_pool(capacity, compiled.num_emitters, True, seed=0)
    frame = make_frame_input(1.0 / 60.0)

    # warm-up: compile + fill to steady state (1 s lifetime => 90 frames)
    for _ in range(90):
        state, out = step_auto_jit(compiled.static, compiled.params, None, state, frame)
    jax.block_until_ready(state.px)
    alive = int(out.alive_count)

    # (a) device throughput: frames chained on-device (the deployment shape —
    # simulation runs ahead of readback, like the reference's pipelined
    # main/render worlds)
    n_frames = 200
    s = _multi(compiled.static, compiled.params, n_frames, state, frame)
    jax.block_until_ready(s.px)
    t0 = time.perf_counter()
    s = _multi(compiled.static, compiled.params, n_frames, state, frame)
    jax.block_until_ready(s.px)
    wall_device = time.perf_counter() - t0

    # (b) per-dispatch latency (one host round-trip per frame)
    t0 = time.perf_counter()
    for _ in range(50):
        state, out = step_auto_jit(compiled.static, compiled.params, None, state, frame)
    jax.block_until_ready(state.px)
    wall_call = (time.perf_counter() - t0) / 50

    ms_per_frame = wall_device / n_frames * 1e3
    steps_per_sec = alive * n_frames / wall_device
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec at 100k live (stress_test)",
                "value": round(steps_per_sec),
                "unit": "particle-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
                "ms_per_frame": round(ms_per_frame, 4),
                "ms_per_frame_with_dispatch": round(wall_call * 1e3, 4),
                "live_particles": alive,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
