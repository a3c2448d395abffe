"""Multi-chip scaling demo (SURVEY.md §2a): runs on a virtual 8-device CPU
mesh anywhere, or a real pod if one is attached.

  sp: one pool's particle axis sharded across the mesh (GSPMD inserts the
      spawn-prefix-sum / reduction collectives over ICI)
  dp: a fleet of independent spawners, zero cross-chip communication
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--real" not in sys.argv:
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.parallel.sharding import (
    make_fleet_step,
    make_mesh,
    make_sharded_step,
    shard_pool,
    stack_frames,
    stack_params,
    stack_pools,
)

n = len(jax.devices())
print(f"devices: {n} x {jax.devices()[0].platform}")
mesh = make_mesh(n)

# --- sp: one big pool sharded over the mesh
spawner, _ = effects.sparks(rate=3000.0)
c = compile_spawner(spawner)
state = shard_pool(init_pool_for(c, n * 8192, 0), mesh)
sharded = make_sharded_step(c.static, mesh)
frame = make_frame_input(1 / 60)
for _ in range(90):
    state, out = sharded(c.params, None, state, frame)
print(f"sp: {int(out.alive_count)} live particles sharded over {n} devices "
      f"(shard spec: {state.px.sharding.spec})")

# --- dp: fleet of independent spawners, one per device
S = n * 2
states = stack_pools([init_pool_for(c, 4096, i) for i in range(S)])
params = stack_params([c.params] * S)
frames = stack_frames([make_frame_input(1 / 60, translation=(float(i), 0, 0)) for i in range(S)])
fleet = make_fleet_step(c.static, mesh)
for _ in range(90):
    states, outs = fleet(params, states, frames)
import numpy as np

print(f"dp: {S} spawners x {int(np.asarray(outs.alive_count)[0])} live each, "
      f"sharded {n}-way with zero cross-chip communication")

# --- 2D hosts x chips: fleet axis over DCN, particle axis over ICI
from bevy_firework_tpu.parallel.sharding import (
    fleet_pool_shardings,
    make_fleet_step_2d,
    make_mesh_2d,
)

n_hosts, chips = (2, n // 2) if n % 2 == 0 and n >= 4 else (1, n)
mesh2 = make_mesh_2d(n_hosts, chips)
S2 = n_hosts * 2
pool_n = chips * 1024
sh = fleet_pool_shardings(mesh2)
states2 = jax.tree_util.tree_map(
    jax.device_put,
    stack_pools([init_pool_for(c, pool_n, 100 + i) for i in range(S2)]),
    sh,
)
params2 = stack_params([c.params] * S2)
frames2 = stack_frames([make_frame_input(1 / 60) for _ in range(S2)])
fleet2d = make_fleet_step_2d(c.static, mesh2)
for _ in range(60):
    states2, outs2 = fleet2d(params2, states2, frames2)
print(
    f"2d: {S2} spawners over {n_hosts} host(s) (DCN axis, zero traffic) x "
    f"{chips} chips (ICI axis), spec {states2.px.sharding.spec}, "
    f"{int(np.asarray(outs2.alive_count).sum())} live total"
)
