"""Re-sweep fused-kernel BLOCK_ROWS with the trustworthy differential
harness (the round-1 sweep used block_until_ready fences, now known broken).

Monkeypatches ops.fused_step.BLOCK_ROWS and re-jits with a fresh function
identity per setting. Run: python tools/block_rows_sweep_tpu.py
"""

import importlib
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.settings import EmissionPacing

fs = importlib.import_module("bevy_firework_tpu.ops.fused_step")

import dataclasses


def measure(block_rows, capacity, rate, n=200):
    fs.BLOCK_ROWS = block_rows
    sp, _tf = effects.stress_test()
    es = dataclasses.replace(sp.emission_settings[0], emission_pacing=EmissionPacing.rate(float(rate)))
    sp = dataclasses.replace(sp, emission_settings=(es,))
    c = compile_spawner(sp)
    state = init_pool_for(c, capacity, 0)
    frame = make_frame_input(1 / 60)

    def fresh(static, params, colliders, st, fr, nf):
        def body(s, _):
            s2, _o = fs.fused_step(static, params, colliders, s, fr)
            return s2, None

        final, _ = jax.lax.scan(body, st, None, length=nf - 1)
        return fs.fused_step(static, params, colliders, final, fr)

    ms = jax.jit(fresh, static_argnums=(0, 5))
    state, out = ms(c.static, c.params, None, state, frame, 140)
    np.asarray(state.px)

    def run(k):
        s, _ = ms(c.static, c.params, None, state, frame, k)
        np.asarray(s.px)

    run(n)
    run(2 * n)
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        run(n)
        t1 = time.perf_counter()
        run(2 * n)
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / n * 1e3)
    diffs.sort()
    med = diffs[len(diffs) // 2]
    print(f"BLOCK_ROWS={block_rows:4d}: {med:.4f} ms/frame ({int(out.alive_count)} live)")
    return med


def main():
    orig = fs.BLOCK_ROWS
    try:
        print("--- 131072 pool, 100k live ---")
        for br in (8, 16, 32, 64, 128, 256):
            measure(br, 1 << 17, 100_000)
        print("--- 1.31M pool, 1M live ---")
        for br in (32, 64, 128, 256):
            measure(br, 160 * 8192, 1_000_000, n=100)
    finally:
        fs.BLOCK_ROWS = orig


if __name__ == "__main__":
    main()
