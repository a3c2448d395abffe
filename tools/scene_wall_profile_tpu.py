"""Where does the interactive Scene frame wall go? (VERDICT r4 next #1)

scene_hetero_100 reads ~6.3 ms/frame wall on the tunneled attach vs the r3
target of <=2.5/3 ms. This tool splits the steady-state frame into:

  * host python (phase A assembly + phase B re-pointing, everything outside
    the jitted call)
  * the combined-dispatch call itself (`_scene_step_combined.__call__` wall
    — enqueue + any synchronous tunnel chatter)
  * the end-of-window fence (device completion of the whole window)

and prints per-frame medians, plus a cProfile top list of the host side.
Run on the TPU attach: python tools/scene_wall_profile_tpu.py [--scene hetero]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import pathlib
import pstats
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_scene(which: str):
    import bench

    if which == "hetero":
        # same construction as bench._measure_scene_hetero
        import dataclasses

        from bevy_firework_tpu import Collider, Scene, Transform
        from bevy_firework_tpu.models import effects
        from bevy_firework_tpu.settings import EmissionPacing, RandF32

        sparks, _ = effects.sparks(rate=2000.0)
        pbr, _ = effects.pbr()
        smoke = dataclasses.replace(
            pbr,
            emission_settings=tuple(
                dataclasses.replace(e, emission_pacing=EmissionPacing.rate(800.0))
                for e in pbr.emission_settings
            ),
        )
        bouncy = bench.ParticleSpawner_bounce()
        oneshotish = dataclasses.replace(
            sparks,
            particle_settings=tuple(
                dataclasses.replace(p, lifetime=RandF32(0.5, 1.5))
                for p in sparks.particle_settings
            ),
        )
        archetypes = [sparks, smoke, bouncy, oneshotish]
        scene = Scene(colliders=[Collider.halfspace(position=(0.0, -1.0, 0.0))])
        for i in range(100):
            scene.add_spawner(archetypes[i % 4], capacity=8192,
                              transform=Transform(translation=(float(i % 10), 0.0, float(i // 10))))
        return scene
    else:  # batch12
        from bevy_firework_tpu import Scene, Transform
        from bevy_firework_tpu.models import effects

        spawner, _ = effects.sparks(rate=6000.0)
        scene = Scene()
        for i in range(12):
            scene.add_spawner(spawner, capacity=8192,
                              transform=Transform(translation=(float(i), 0.0, 0.0)))
        return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="hetero", choices=["hetero", "batch12"])
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    import jax

    from bevy_firework_tpu import scene as scene_mod

    scene = build_scene(args.scene)
    for _ in range(30):
        scene.step(1.0 / 60.0)
    for b in scene._batches.values():
        np.asarray(b.states.px)

    # wrap the combined step to time the call wall per frame
    orig = scene_mod._scene_step_combined
    call_ms = []

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        call_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    scene_mod._scene_step_combined = timed
    try:
        # warm the wrapper path
        scene.step(1.0 / 60.0)
        call_ms.clear()

        frame_ms = []
        t_win0 = time.perf_counter()
        for _ in range(args.frames):
            t0 = time.perf_counter()
            scene.step(1.0 / 60.0)
            frame_ms.append((time.perf_counter() - t0) * 1e3)
        t_loop = time.perf_counter()
        for b in scene._batches.values():
            float(np.asarray(b.states.px.sum()))
        t_fence = time.perf_counter()

        med = lambda xs: sorted(xs)[len(xs) // 2]
        print(f"scene={args.scene} frames={args.frames}")
        print(f"frame wall median: {med(frame_ms):.3f} ms  (mean {np.mean(frame_ms):.3f}, "
              f"p90 {np.percentile(frame_ms, 90):.3f})")
        print(f"combined-call wall median: {med(call_ms):.3f} ms")
        print(f"host python median (frame - call): {med([f - c for f, c in zip(frame_ms, call_ms)]):.3f} ms")
        print(f"end fence: {(t_fence - t_loop) * 1e3:.2f} ms; loop total {(t_loop - t_win0) * 1e3:.1f} ms")

        # cProfile pass over another window (includes the jit call; look at
        # what's above/below it)
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(args.frames):
            scene.step(1.0 / 60.0)
        pr.disable()
        for b in scene._batches.values():
            float(np.asarray(b.states.px.sum()))
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(24)
        print(s.getvalue())
    finally:
        scene_mod._scene_step_combined = orig


if __name__ == "__main__":
    main()
