"""Multi-chip scaling via jax.sharding + GSPMD (SURVEY.md §2a).

Two orthogonal axes of scale, mirroring the reference's parallelism mapped to
TPU (SURVEY.md §2a table):

  * **sp (particle axis)** — one huge pool sharded across chips: every step
    op is lane-local except the spawn prefix-sum (claim ranks), the nested
    parent lookup, and the AABB/count reductions; GSPMD inserts the small
    collectives automatically, riding ICI. The sparse analog of sequence
    parallelism — legal because particles never interact with each other,
    only with replicated static colliders.
  * **dp (spawner/fleet axis)** — thousands of spawners of one archetype
    vmapped into a leading axis and sharded across chips with ZERO
    cross-emitter communication (the TPU analog of the reference's
    `par_iter_mut` over spawners, `/root/reference/src/core.rs:583-585`).

Both return jit-compiled functions with explicit in/out shardings; everything
else (collective insertion, fusion) is XLA's job.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..colliders import ColliderTable
from ..pool import FrameInput, PoolState
from ..compiled import SpawnerStatic
from ..step import step


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "d") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def pool_shardings(mesh: Mesh, axis_name: str = "d") -> PoolState:
    """A PoolState-shaped pytree of NamedShardings (particle axis sharded)."""
    import dataclasses

    kw = {}
    for f in dataclasses.fields(PoolState):
        if f.name == "last_emitted":
            kw[f.name] = NamedSharding(mesh, P(None, axis_name))
        elif f.name in ("time_in_cycle", "last_emission", "enabled", "manual_queued", "finished_notified", "ring_cursor", "rng_key"):
            kw[f.name] = NamedSharding(mesh, P())
        else:
            kw[f.name] = NamedSharding(mesh, P(axis_name))
    return PoolState(**kw)


def shard_pool(state: PoolState, mesh: Mesh, axis_name: str = "d") -> PoolState:
    """Place an existing pool on the mesh with the particle axis sharded.
    Capacity must be divisible by mesh size."""
    sh = pool_shardings(mesh, axis_name)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_sharded_step(static: SpawnerStatic, mesh: Mesh, axis_name: str = "d"):
    """jit-compiled step with the pool's particle axis sharded over `mesh`
    (sp-style). Params/colliders/frame are replicated."""
    sh = pool_shardings(mesh, axis_name)
    repl = NamedSharding(mesh, P())

    def fn(params, colliders, state, frame):
        return step(static, params, colliders, state, frame)

    return jax.jit(fn, in_shardings=(None, None, sh, None), out_shardings=(sh, None))


def make_fleet_step(static: SpawnerStatic, mesh: Mesh, axis_name: str = "d"):
    """vmapped step over a leading spawner axis, sharded across the mesh
    (dp-style): params and frame inputs carry a leading [S] axis; each
    spawner's pool is independent, so there is no cross-chip communication.
    """
    dp = NamedSharding(mesh, P(axis_name))

    def one(params, state, frame):
        return step(static, params, None, state, frame)

    batched = jax.vmap(one, in_axes=(0, 0, 0))

    def shard_leading(tree):
        return jax.tree_util.tree_map(lambda _: dp, tree) if tree is not None else None

    return jax.jit(batched, in_shardings=(dp, dp, dp), out_shardings=(dp, dp))


# --------------------------------------------------------------------------
# Multi-host (DCN) scale-out
#
# The reference is single-process (SURVEY.md §2a: no NCCL/MPI anywhere); the
# TPU-native scale-out story beyond one host is fleets-of-scenes: the fleet
# axis is embarrassingly parallel (zero cross-spawner communication), so it
# is the axis to place on DCN, while any single pool's particle axis stays
# on ICI where the spawn prefix-sum / AABB collectives are cheap.
# --------------------------------------------------------------------------


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host entry point: call once per host process BEFORE building
    meshes (wraps `jax.distributed.initialize`; with no arguments it
    auto-detects the TPU pod runtime). After this, `jax.devices()` is the
    global device list, ordered by process, and `make_mesh_2d` lays hosts
    along the DCN axis."""
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh_2d(n_hosts: Optional[int] = None, chips_per_host: Optional[int] = None,
                 axis_names=("host", "d")) -> Mesh:
    """A (hosts x chips) mesh. On a real multi-host run, `jax.devices()` is
    ordered by process, so rows of the reshape are per-host groups: axis 0
    ("host") crosses DCN, axis 1 ("d") stays on each host's ICI domain.
    Single-process (tests): pass explicit shape to carve virtual devices."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    grid = np.array(devs[: n_hosts * chips_per_host]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, axis_names)


def fleet_pool_shardings(mesh: Mesh, fleet_axis: str = "host", particle_axis: str = "d") -> PoolState:
    """Shardings for a fleet-of-pools pytree (leading [S] axis on every leaf):
    fleet axis over hosts (DCN, zero traffic), particle axis over intra-host
    chips (ICI)."""
    import dataclasses

    kw = {}
    for f in dataclasses.fields(PoolState):
        if f.name == "last_emitted":  # [S, E, N]
            kw[f.name] = NamedSharding(mesh, P(fleet_axis, None, particle_axis))
        elif f.name in ("time_in_cycle", "last_emission", "enabled"):  # [S, E]
            kw[f.name] = NamedSharding(mesh, P(fleet_axis))
        elif f.name in ("manual_queued", "finished_notified", "ring_cursor"):  # [S]
            kw[f.name] = NamedSharding(mesh, P(fleet_axis))
        elif f.name == "rng_key":  # [S, 2]
            kw[f.name] = NamedSharding(mesh, P(fleet_axis))
        else:  # [S, N]
            kw[f.name] = NamedSharding(mesh, P(fleet_axis, particle_axis))
    return PoolState(**kw)


def make_fleet_step_2d(static: SpawnerStatic, mesh: Mesh,
                       fleet_axis: str = "host", particle_axis: str = "d"):
    """Fleet step on a 2D (hosts x chips) mesh: spawners data-parallel across
    hosts, each pool's particle axis sharded across that host's chips. GSPMD
    inserts collectives only along the particle axis (spawn prefix-sum, AABB
    reduce) — they ride ICI; nothing crosses DCN after placement."""
    sh = fleet_pool_shardings(mesh, fleet_axis, particle_axis)
    dp = NamedSharding(mesh, P(fleet_axis))

    def one(params, state, frame):
        return step(static, params, None, state, frame)

    batched = jax.vmap(one, in_axes=(0, 0, 0))
    out_sh = NamedSharding(mesh, P(fleet_axis))
    return jax.jit(batched, in_shardings=(dp, sh, dp), out_shardings=(sh, out_sh))


def stack_pools(states):
    """Stack S single-spawner pools into one fleet pytree with leading [S]."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def stack_params(params_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def stack_frames(frames):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
