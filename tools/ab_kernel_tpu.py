"""In-session A/B: HEAD fused kernel vs the round-2 kernel (VERDICT r3 next #1).

The tunneled TPU attach drifts +-2x across runs, so BENCH_rNN.json numbers
from different days are not comparable: round 3's headline dropped 2.7x vs
round 2 with no way to tell attach drift from a real kernel regression. This
tool settles it by timing BOTH kernels in ONE process, alternating reps, so
any attach drift applies to both sides equally.

Method: `git archive <r02-sha> bevy_firework_tpu` into a temp dir, rename the
package `bevy_firework_r02` (internal imports are all relative, so a rename
imports cleanly), then compile the same stress configs (100k and 1M live,
const-lifetime ring-claim archetype) through each package's
`multi_step_auto` and interleave differential (t_4n - t_n)/3n measurements.

Statistics (VERDICT r4 next #6): each rep produces a PAIRED ratio
head_i / r02_i (the two sides run back-to-back inside the rep, so drift
hits both equally); the report carries {n_pairs, median, iqr} over >=9
pairs and a `regression` flag that fires only when the IQR excludes 1.0
by >10% — a future 1.3x regression at 1M becomes a CI-read instead of a
round-long hunt. The differential chain is (t_4n - t_n)/3n (r4 used
(t_2n - t_n)/n): tripling the differential window cut the 1M
per-invocation spread from ~+-50% to well under 15%.

Usage: python tools/ab_kernel_tpu.py [--sha fbb9d10] [--reps 9]
Prints one JSON line: per-config {head_ms, r02_ms, head_over_r02,
ratio_median, ratio_iqr, n_pairs, regression}.
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
R02_SHA = "fbb9d10"  # round 2 end-of-round snapshot


def _materialize_r02(sha: str) -> pathlib.Path:
    """Extract the round-2 package from git under the name bevy_firework_r02."""
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="ab_r02_"))
    tar = subprocess.run(
        ["git", "archive", sha, "bevy_firework_tpu"],
        cwd=ROOT, check=True, capture_output=True).stdout
    subprocess.run(["tar", "-x"], input=tar, cwd=tmp, check=True)
    (tmp / "bevy_firework_tpu").rename(tmp / "bevy_firework_r02")
    return tmp


def _make_case(pkg: str, rate: float, capacity: int):
    """Build a compiled stress config + multi-step runner from package `pkg`."""
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
    alive = int(out.alive_count)

    def run(n):
        s, _ = fused.multi_step_auto(
            compiled.static, compiled.params, None, state, frame, n)
        fence(s)

    return alive, run


def run(sha: str = R02_SHA, reps: int = 9, base_frames: int = 200) -> dict:
    """Interleaved A/B on the 100k and 1M stress configs; returns
    {config: {live, head_ms, r02_ms, head_over_r02, ratio_median,
    ratio_iqr, n_pairs, regression}}. Callable in-process from bench.py (a
    second process cannot share the axon tunnel)."""
    tmp = _materialize_r02(sha)
    sys.path.insert(0, str(tmp))
    sys.path.insert(0, str(ROOT))
    try:
        result = {}
        for name, rate, cap, frames in (
            ("100k", 100_000, 1 << 17, base_frames * 2),
            ("1M", 1_000_000, 160 * 8192, base_frames),
        ):
            alive_h, run_h = _make_case("bevy_firework_tpu", rate, cap)
            alive_r, run_r = _make_case("bevy_firework_r02", rate, cap)
            assert alive_h == alive_r, (alive_h, alive_r)
            # compile both chain lengths for both sides before timing.
            # (t_4n - t_n)/3n: the 3x-longer differential window keeps the
            # per-rep spread at 1M under ~15% where (t_2n - t_n)/n fluttered
            # +-50% (BASELINE.md r4 notes).
            for run in (run_h, run_r):
                run(frames)
                run(4 * frames)

            def one_diff(fn):
                t0 = time.perf_counter(); fn(frames)
                t1 = time.perf_counter(); fn(4 * frames)
                t2 = time.perf_counter()
                return ((t2 - t1) - (t1 - t0)) / (3 * frames) * 1e3

            diffs_h, diffs_r, ratios = [], [], []
            for _ in range(reps):  # pair the sides back-to-back inside a rep
                h_i = one_diff(run_h)
                r_i = one_diff(run_r)
                diffs_h.append(h_i)
                diffs_r.append(r_i)
                if r_i > 0:
                    ratios.append(h_i / r_i)
            diffs_h.sort(); diffs_r.sort(); ratios.sort()
            h = diffs_h[len(diffs_h) // 2]
            r = diffs_r[len(diffs_r) // 2]
            n = len(ratios)
            q1 = ratios[max(0, (n - 1) // 4)]
            q3 = ratios[min(n - 1, (3 * (n - 1) + 3) // 4)]
            result[name] = {
                "live": alive_h,
                "head_ms": round(h, 4),
                "r02_ms": round(r, 4),
                "head_over_r02": round(h / r, 3) if r > 0 else None,
                "n_pairs": n,
                "ratio_median": round(ratios[n // 2], 3) if n else None,
                "ratio_iqr": [round(q1, 3), round(q3, 3)] if n else None,
                # regression only when the whole IQR sits >10% above 1.0
                # (and symmetric improvement flag for the record)
                "regression": bool(n and q1 > 1.10),
                "improvement": bool(n and q3 < 0.90),
            }
        return {"ab_vs": sha, **result}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sha", default=R02_SHA)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--frames", type=int, default=200)
    args = ap.parse_args()
    print(json.dumps(run(args.sha, args.reps, args.frames)))


if __name__ == "__main__":
    main()
