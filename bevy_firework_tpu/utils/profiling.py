"""Tracing / profiling / observability (SURVEY.md §5).

The reference's only observability is Bevy's FrameTimeDiagnosticsPlugin FPS
overlay plus live-particle counts queried from spawner data
(`/root/reference/examples/stress_test.rs:169-202`).  TPU equivalents:

  * `FrameStats` — smoothed frame timing + particle throughput, the FPS
    overlay analog (exponential smoothing like Bevy's diagnostics).
  * `trace(path)` — context manager around `jax.profiler` so any scene run
    can produce an xplane trace for tensorboard/xprof.
  * `device_memory_stats()` — HBM usage of the live pools.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@dataclass
class FrameStats:
    """Smoothed per-frame diagnostics (EMA, like FrameTimeDiagnosticsPlugin)."""

    smoothing: float = 0.9
    frame_ms: float = 0.0
    fps: float = 0.0
    particles: int = 0
    particle_steps_per_sec: float = 0.0
    frames: int = 0
    _last: Optional[float] = field(default=None, repr=False)

    def tick(self, particles: int = 0):
        now = time.perf_counter()
        if self._last is not None:
            dt_ms = (now - self._last) * 1e3
            a = self.smoothing if self.frames > 1 else 0.0
            self.frame_ms = a * self.frame_ms + (1 - a) * dt_ms
            self.fps = 1e3 / self.frame_ms if self.frame_ms > 0 else 0.0
            sps = particles / (dt_ms * 1e-3) if dt_ms > 0 else 0.0
            self.particle_steps_per_sec = a * self.particle_steps_per_sec + (1 - a) * sps
        self._last = now
        self.particles = particles
        self.frames += 1

    def overlay(self) -> str:
        """The stress_test-style on-screen text (`stress_test.rs:47-67`)."""
        return (
            f"FPS: {self.fps:7.1f} | frame: {self.frame_ms:7.3f} ms | "
            f"particles: {self.particles:9d} | steps/s: {self.particle_steps_per_sec:14,.0f}"
        )


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace of the enclosed block (view with
    tensorboard --logdir or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a trace (TraceAnnotation context manager)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
