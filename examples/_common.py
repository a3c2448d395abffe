"""Shared headless example runner.

The reference's examples are interactive Bevy apps with an FPS overlay
(`examples/stress_test.rs:169-202`); here each example builds the same scene
config, steps it headless, and prints the live-count / timing overlay to
stdout. `--cpu` forces the CPU backend (the axon TPU plugin ignores
JAX_PLATFORMS, so this must go through jax.config). `--slowmo` runs the
second half at 0.05x time scale — like the examples' Space toggle, dt is just
an input (`examples/sparks.rs:112-126`)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(description, frames=240):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--frames", type=int, default=frames)
    p.add_argument("--dt", type=float, default=1.0 / 60.0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--slowmo", action="store_true", help="0.05x time scale for the second half")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args


def run(scene, args, report_every=60, on_frame=None):
    t0 = time.perf_counter()
    for f in range(args.frames):
        dt = args.dt * (0.05 if (args.slowmo and f >= args.frames // 2) else 1.0)
        scene.step(dt)
        if on_frame:
            on_frame(f)
        if (f + 1) % report_every == 0:
            alive = scene.alive_count()
            wall = time.perf_counter() - t0
            print(f"frame {f + 1:5d} | t={scene.time:7.3f}s | live particles: {alive:7d} | wall {wall:6.2f}s")
    return time.perf_counter() - t0
