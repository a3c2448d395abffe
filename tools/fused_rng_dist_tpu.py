"""On-TPU distributional validation of the IN-KERNEL spawn pipeline.

The fused kernel draws randomness from the on-core hardware PRNG
(`pltpu.prng_random_bits` -> top-24-bit uniforms) and runs the samplers
(RandF32 ranges, RandVec3 cone, emission shapes) as kernel code. The XLA
path's threefry draws are fuzz-tested on CPU (tests/test_fuzz_parity.py);
this tool closes the loop for the hardware path: burst-spawn ~65k particles
through `fused_step` ON TPU, undo the deterministic parts, and KS-test each
draw dimension against its expected distribution.

Run: python tools/fused_rng_dist_tpu.py
"""

import sys

sys.path.insert(0, ".")

import dataclasses
import math

import jax
import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    EmissionShape,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_spawner,
    init_pool_for,
    make_frame_input,
)
from bevy_firework_tpu.ops.fused_step import fused_step

N = 16 * 8192
BURST = 60_000


def ks_uniform(x, lo, hi):
    """One-sample KS statistic against U[lo, hi]; returns (D, threshold)."""
    x = np.sort((np.asarray(x, np.float64) - lo) / (hi - lo))
    n = len(x)
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    d = max(np.max(np.abs(ecdf_hi - x)), np.max(np.abs(x - ecdf_lo)))
    # alpha=1e-6 threshold: sqrt(ln(2/a)/(2n))
    return d, math.sqrt(math.log(2 / 1e-6) / (2 * n))


def main():
    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(
                lifetime=RandF32(1.0, 3.0),
                initial_scale=RandF32(0.2, 0.6),
                acceleration=(0.0, 0.0, 0.0),
                linear_drag=0.0,
            )
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.one_shot(BURST),
                emission_shape=EmissionShape.sphere(2.0),
                initial_velocity=RandVec3(magnitude=RandF32(3.0, 7.0), direction=(0, 0, 1), spread=0.8),
            )
        ],
    )
    c = compile_spawner(sp)
    state = init_pool_for(c, N, 0)
    frame = make_frame_input(1e-6)  # tiny dt: state ~= spawn values
    f = jax.jit(fused_step, static_argnums=(0,))
    state, out = f(c.static, c.params, None, state, frame)
    alive = np.asarray(state.alive)
    n = int(alive.sum())
    assert n == BURST, (n, BURST)

    fails = []

    def check(name, x, lo, hi):
        d, thr = ks_uniform(x, lo, hi)
        ok = d < thr
        print(f"{name:28s} KS D={d:.5f} thr={thr:.5f} {'OK' if ok else 'FAIL'}")
        if not ok:
            fails.append(name)

    check("lifetime ~ U[1,3]", np.asarray(state.lifetime)[alive], 1.0, 3.0)
    check("initial_scale ~ U[0.2,0.6]", np.asarray(state.initial_scale)[alive], 0.2, 0.6)

    # velocity: magnitude ~ U[3,7]; deviation from +Z axis ~ U[0, 0.8] rad
    vx = np.asarray(state.vx)[alive]; vy = np.asarray(state.vy)[alive]; vz = np.asarray(state.vz)[alive]
    speed = np.sqrt(vx * vx + vy * vy + vz * vz)
    check("cone |v| ~ U[3,7]", speed, 3.0, 7.0)
    dev = np.arccos(np.clip(vz / speed, -1, 1))
    check("cone deviation ~ U[0,0.8]", dev, 0.0, 0.8)

    # sphere shape (center-biased, emission_shape.rs:22-33): radius = u*R
    px = np.asarray(state.px)[alive]; py = np.asarray(state.py)[alive]; pz = np.asarray(state.pz)[alive]
    r = np.sqrt(px * px + py * py + pz * pz)
    check("sphere r ~ U[0,2]", r, 0.0, 2.0)

    if fails:
        print(f"\nFAILED: {fails}")
        return 1
    print(f"\nall 5 draw dimensions OK over {n} hardware-PRNG spawns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
