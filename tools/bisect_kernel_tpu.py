"""In-session multi-sha kernel bisect (follow-up to ab_kernel_tpu.py).

ab_kernel_tpu.py established that HEAD's fused kernel is ~2x slower than the
round-2 kernel at 1M live, interleaved in one process (so NOT attach drift).
This tool finds the commit: it materializes each candidate sha's package from
git under a unique name, compiles the same stress config through every one,
and interleaves differential (t_2n - t_n)/n reps across ALL of them so drift
hits every sha equally.

Usage: python tools/bisect_kernel_tpu.py --shas fbb9d10 0e70d84 43a858a HEAD
Prints one JSON line: {sha: ms} ordered as given.
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib
import json
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _materialize(sha: str, idx: int, tmp: pathlib.Path) -> str:
    """Extract `sha`'s package from git as bevy_firework_bisect{idx}."""
    name = f"bevy_firework_bisect{idx}"
    sub = tmp / f"s{idx}"
    sub.mkdir()
    tar = subprocess.run(
        ["git", "archive", sha, "bevy_firework_tpu"],
        cwd=ROOT, check=True, capture_output=True).stdout
    subprocess.run(["tar", "-x"], input=tar, cwd=sub, check=True)
    (sub / "bevy_firework_tpu").rename(sub / name)
    sys.path.insert(0, str(sub))
    return name


def _make_case(pkg: str, rate: float, capacity: int):
    api = importlib.import_module(pkg)
    effects = importlib.import_module(pkg + ".models.effects")
    fused = importlib.import_module(pkg + ".ops.fused_step")
    settings = importlib.import_module(pkg + ".settings")

    spawner, _tf = effects.stress_test()
    es = dataclasses.replace(
        spawner.emission_settings[0],
        emission_pacing=settings.EmissionPacing.rate(float(rate)))
    spawner = dataclasses.replace(spawner, emission_settings=(es,))
    compiled = api.compile_spawner(spawner)
    state = api.init_pool_for(compiled, capacity, seed=0)
    frame = api.make_frame_input(1.0 / 60.0)
    state, out = fused.multi_step_auto(
        compiled.static, compiled.params, None, state, frame, 140)

    import numpy as np

    def fence(s):
        return float(np.asarray(s.px.sum()))

    fence(state)

    def run(n):
        s, _ = fused.multi_step_auto(
            compiled.static, compiled.params, None, state, frame, n)
        fence(s)

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shas", nargs="+", required=True)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--rate", type=float, default=1_000_000)
    ap.add_argument("--capacity", type=int, default=160 * 8192)
    args = ap.parse_args()

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bisect_"))
    sys.path.insert(0, str(ROOT))
    try:
        runners = {}
        for i, sha in enumerate(args.shas):
            if sha.upper() == "HEAD":
                pkg = "bevy_firework_tpu"
            else:
                pkg = _materialize(sha, i, tmp)
            runners[sha] = _make_case(pkg, args.rate, args.capacity)
            print(f"compiled {sha}", file=sys.stderr, flush=True)
        frames = args.frames
        for run in runners.values():  # compile both chain lengths everywhere
            run(frames)
            run(2 * frames)
        diffs = {sha: [] for sha in runners}
        for _ in range(args.reps):  # interleave: drift hits all shas equally
            for sha, run in runners.items():
                t0 = time.perf_counter(); run(frames)
                t1 = time.perf_counter(); run(2 * frames)
                t2 = time.perf_counter()
                diffs[sha].append(((t2 - t1) - (t1 - t0)) / frames * 1e3)
        out = {}
        for sha, d in diffs.items():
            d.sort()
            out[sha] = round(d[len(d) // 2], 4)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
