"""Stage-level timing ablation of the HYBRID nested path (in-kernel merge).

Sets step._ABLATE to stub out one stage of the nested pipeline at a time and
times the full multi-frame chain at the bench nested_60k config on the real
chip. The stubs keep shapes and dataflow (nothing dead-code-eliminates) but
break semantics — timing only. full - variant isolates each stage's cost:

  cadence   the per-emitter Pallas cadence pass (pool-sized)
  inverse   _monotone_inverse rank->parent map (block cummax + MXU row fetch)
  gather    the MXU one-hot parent-state einsums ([M,N] one-hots, HIGHEST)
  rng       the threefry uniform draws for child init
  preshift  the (cursor mod 128) dynamic placement of the child buffers
  kmerge    the kernel-side per-tile merge block (XLA payload still built)
  floor     all of the above stubbed — global kernel + epilogue remnant

Run: python tools/nested_hybrid_ablation_tpu.py [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

import bevy_firework_tpu.step as stepmod
from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
from bevy_firework_tpu.ops.fused_step import _multi_step_impl
from bevy_firework_tpu.settings import (
    EmissionMode,
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
)

VARIANTS = [
    ("full", frozenset()),
    ("no_cadence", frozenset({"cadence"})),
    ("no_inverse", frozenset({"inverse"})),
    ("no_gather", frozenset({"gather"})),
    ("no_rng", frozenset({"rng"})),
    ("no_preshift", frozenset({"preshift"})),
    ("no_kmerge", frozenset({"kmerge"})),
    ("floor", frozenset({"cadence", "inverse", "gather", "rng",
                         "preshift", "kmerge"})),
]


def bench_spawner():
    """The bench.py nested_60k config (~8k parents + ~51k children live)."""
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


def measure(ablate, warmup=150, n_frames=100, reps=5):
    stepmod._ABLATE = ablate
    try:
        compiled = compile_spawner(bench_spawner(), nested_buffer=1024)
        state = init_pool_for(compiled, 16 * 8192, seed=0)
        frame = make_frame_input(1.0 / 60.0)

        # fresh function identity per variant: _ABLATE is read at trace time,
        # so a shared jit cache would reuse the first variant's executable
        def fresh(static, params, colliders, st, fr, nf):
            return _multi_step_impl(static, params, colliders, st, fr, nf)

        ms = jax.jit(fresh, static_argnums=(0, 5))
        state, _o = ms(compiled.static, compiled.params, None, state, frame, warmup)
        np.asarray(state.px)
        alive = int(np.asarray(state.alive.sum()))

        def run(k):
            s, _ = ms(compiled.static, compiled.params, None, state, frame, k)
            np.asarray(s.px)

        run(n_frames)
        run(2 * n_frames)
        diffs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n_frames)
            t1 = time.perf_counter()
            run(2 * n_frames)
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / n_frames * 1e3)
        diffs.sort()
        return alive, diffs[len(diffs) // 2]
    finally:
        stepmod._ABLATE = frozenset()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {}
    base = None
    for name, abl in VARIANTS:
        alive, ms = measure(abl, reps=reps)
        results[name] = ms
        if name == "full":
            base = ms
        delta = "" if base is None or name == "full" else f"  (stage ~{base - ms:+.4f})"
        print(f"{name:12s} {ms:.4f} ms/frame  @{alive} live{delta}", flush=True)
    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
