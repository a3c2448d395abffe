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

import jax

from bevy_firework_tpu import compile_spawner, init_pool, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.ops.fused_step import step_auto_jit
from bevy_firework_tpu.settings import EmissionPacing

BASELINE_STEPS_PER_SEC = 9.6e6  # BASELINE.md frame-rate-parity estimate
TARGET_LIVE = 100_000


def _measure(spawner, rate, capacity, colliders=None, warmup=140, n_frames=200):
    """Steady-state device throughput (frames chained on-device — the
    deployment shape, simulation running ahead of readback like the
    reference's pipelined main/render worlds). Returns (alive, ms/frame)."""
    from bevy_firework_tpu import compile_colliders
    from bevy_firework_tpu.ops.fused_step import multi_step_auto

    es = dataclasses.replace(spawner.emission_settings[0], emission_pacing=EmissionPacing.rate(float(rate)))
    spawner = dataclasses.replace(spawner, emission_settings=(es,))
    compiled = compile_spawner(spawner)
    table = compile_colliders(colliders) if colliders else None
    state = init_pool(capacity, compiled.num_emitters, True, seed=0)
    frame = make_frame_input(1.0 / 60.0)
    state, out = multi_step_auto(compiled.static, compiled.params, table, state, frame, warmup)
    jax.block_until_ready(state.px)
    alive = int(out.alive_count)
    state2, _o = multi_step_auto(compiled.static, compiled.params, table, state, frame, n_frames)
    jax.block_until_ready(state2.px)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        state2, _o = multi_step_auto(compiled.static, compiled.params, table, state, frame, n_frames)
        jax.block_until_ready(state2.px)
        best = min(best, (time.perf_counter() - t0) / n_frames * 1e3)
    return compiled, state, frame, alive, best


def main():
    # headline: driver metric — 100k live, stress_test
    spawner, _tf = effects.stress_test()
    compiled, state, frame, alive, ms = _measure(spawner, TARGET_LIVE, 1 << 17)

    # per-dispatch latency (one host round-trip per frame)
    state, out = step_auto_jit(compiled.static, compiled.params, None, state, frame)  # compile
    jax.block_until_ready(state.px)
    t0 = time.perf_counter()
    for _ in range(50):
        state, out = step_auto_jit(compiled.static, compiled.params, None, state, frame)
    jax.block_until_ready(state.px)
    wall_call = (time.perf_counter() - t0) / 50

    extras = {}
    try:
        _c, _s, _f, alive_1m, ms_1m = _measure(spawner, 1_000_000, 160 * 8192, n_frames=100)
        extras["1M"] = {"live": alive_1m, "ms_per_frame": round(ms_1m, 4)}
        spc, _t2, cols = effects.stress_test_collision()
        _c, _s, _f, alive_c, ms_c = _measure(spc, 500_000, 160 * 8192, colliders=cols, n_frames=100)
        extras["1M_collision"] = {"live": alive_c, "ms_per_frame": round(ms_c, 4)}
    except Exception as e:  # extras must never sink the headline metric
        extras["error"] = str(e)[:200]

    steps_per_sec = alive / (ms * 1e-3)
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec at 100k live (stress_test)",
                "value": round(steps_per_sec),
                "unit": "particle-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
                "ms_per_frame": round(ms, 4),
                "ms_per_frame_with_dispatch": round(wall_call * 1e3, 4),
                "live_particles": alive,
                "extras": extras,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
