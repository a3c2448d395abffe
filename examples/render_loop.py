"""The production render loop: pipelined sim + async extract + ring hand-off.

The deployment shape for 1M-scale rendering (SURVEY.md §7 hard part 6;
the analog of Bevy's pipelined main/render worlds, `render.rs:52-54`):

  sim loop:     step_auto_packed (the render pack rides the step kernel)
                -> reader.submit_packed (non-blocking; planes still on device)
  reader thread: device->host transfer + native-ring compaction/interleave
  render loop:  ring.acquire() -> newest [count, 16] instance rows -> draw

Run: python examples/render_loop.py [--cpu] [--frames N] [--f16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_p = argparse.ArgumentParser(description=__doc__)
_p.add_argument("--frames", type=int, default=240)
_p.add_argument("--cpu", action="store_true")
_p.add_argument("--f16", action="store_true", help="full-f16 in-kernel pack (32 B/particle)")
_a = _p.parse_args()
if _a.cpu:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
args = {"--frames": _a.frames, "--f16": _a.f16}

import numpy as np

from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.ops.fused_step import (
    can_pack_render,
    fused_step,
    step_auto_packed_jit,
)
from bevy_firework_tpu.render_pipeline import AsyncRenderReader

import jax

spawner, _tf = effects.stress_test()
import dataclasses

from bevy_firework_tpu.settings import EmissionPacing

es = dataclasses.replace(spawner.emission_settings[0], emission_pacing=EmissionPacing.rate(30_000.0))
spawner = dataclasses.replace(spawner, emission_settings=(es,))

compiled = compile_spawner(spawner)
capacity = 8 * 8192
state = init_pool_for(compiled, capacity, seed=0)
frame = make_frame_input(1.0 / 60.0)

use_kernel_pack = can_pack_render(compiled.static, capacity)
f16 = bool(args.get("--f16"))
reader = AsyncRenderReader(capacity=capacity, num_types=compiled.num_types)

fused_pack = jax.jit(fused_step, static_argnums=(0, 5))

drawn = 0
last_fid = -1
t0 = time.perf_counter()
for fid in range(int(args.get("--frames", 240))):
    if use_kernel_pack:
        if f16:  # full f16 record from the kernel (32 B/particle hand-off)
            state, outputs, planes = fused_pack(
                compiled.static, compiled.params, None, state, frame, "f16"
            )
        else:
            state, outputs, planes = step_auto_packed_jit(
                compiled.static, compiled.params, None, state, frame
            )
        reader.submit_packed(compiled.static, state, planes, fid)
    else:  # CPU/odd-capacity fallback: reader packs via the dense XLA path
        state, outputs, planes = step_auto_packed_jit(
            compiled.static, compiled.params, None, state, frame
        )
        reader.submit(compiled.params, state, fid)

    # "draw": acquire the newest ready frame, consume, release
    got = reader.rings[0].acquire_f16() if f16 else reader.acquire(0)
    if got is not None:
        rows, got_fid = got
        if got_fid != last_fid:
            drawn += 1
            last_fid = got_fid
        reader.release(0)

elapsed = time.perf_counter() - t0
# drain the last frame
time.sleep(0.3)
got = reader.rings[0].acquire_f16() if f16 else reader.acquire(0)
if got is not None:
    rows, fid = got
    print(f"final frame {fid}: {rows.shape[0]} instances, dtype {rows.dtype}")
    reader.release(0)
reader.close()
print(
    f"{int(args.get('--frames', 240))} sim frames in {elapsed:.2f}s "
    f"({elapsed / int(args.get('--frames', 240)) * 1e3:.2f} ms/frame wall, "
    f"kernel_pack={use_kernel_pack}, f16={f16}); rendered {drawn} distinct frames"
)
