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
from ..step import StepOutputs, step


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "d") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def _mesh_is_tpu(mesh: Mesh) -> bool:
    return next(iter(mesh.devices.flat)).platform == "tpu"


def pool_pspecs(axis_name: str = "d", lead: Optional[str] = None) -> PoolState:
    """A PoolState-shaped pytree of PartitionSpecs for shard_map bodies:
    particle-axis leaves sharded, per-emitter/scalar leaves replicated.
    lead: optional extra leading fleet axis name prepended to every leaf
    (fleet-of-pools trees with [S, ...] leaves)."""
    import dataclasses

    def spec(*names):
        return P(lead, *names) if lead is not None else P(*names)

    kw = {}
    for f in dataclasses.fields(PoolState):
        if f.name == "last_emitted":
            kw[f.name] = spec(None, axis_name)
        elif f.name in ("time_in_cycle", "last_emission", "enabled",
                        "manual_queued", "finished_notified", "ring_cursor", "rng_key"):
            kw[f.name] = spec()
        else:
            kw[f.name] = spec(axis_name)
    return PoolState(**kw)


def outputs_pspecs(axis_name: str = "d", lead: Optional[str] = None) -> StepOutputs:
    """StepOutputs-shaped PartitionSpecs: destroyed_mask rides the particle
    axis; all stats/flags are replicated (the epilogue psums them)."""
    import dataclasses

    def spec(*names):
        return P(lead, *names) if lead is not None else P(*names)

    kw = {}
    for f in dataclasses.fields(StepOutputs):
        kw[f.name] = spec(axis_name) if f.name == "destroyed_mask" else spec()
    return StepOutputs(**kw)


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


def make_sharded_step(static: SpawnerStatic, mesh: Mesh, axis_name: str = "d",
                      prefer_fused: Optional[bool] = None):
    """jit-compiled step with the pool's particle axis sharded over `mesh`
    (sp-style). Params/colliders/frame are replicated.

    On TPU meshes with global-only archetypes, the body is the fused Pallas
    kernel under `jax.shard_map`: each chip runs the kernel on its pool
    shard with GLOBAL lane indexing (fused_step shard_axis — claims, ring
    cursor, and prefix ranks match the unsharded kernel), and the only
    cross-chip traffic is the epilogue's AABB/count all-reduce plus (for
    non-ring archetypes) one tiny all_gather of per-shard dead counts.
    Per-chip throughput is therefore the fused kernel's, not the XLA
    step's (~8x gap at 131k lanes, docs/PERF_NOTES.md). Elsewhere (CPU
    virtual meshes, nested archetypes, non-tile-aligned shard capacities)
    it falls back to the GSPMD-jit XLA step, which preserves exact global
    semantics by construction. prefer_fused forces the choice (tests).

    Fused-path shard contract: capacity % n_devices == 0 and the per-shard
    capacity a multiple of 8192 (BLOCK_ROWS * LANES)."""
    from ..ops.fused_step import BLOCK_ROWS, LANES, can_fuse, fused_step

    sh = pool_shardings(mesh, axis_name)
    n_dev = mesh.shape[axis_name]

    def xla_fn(params, colliders, state, frame):
        return step(static, params, colliders, state, frame)

    xla_jit = jax.jit(xla_fn, in_shardings=(None, None, sh, None), out_shardings=(sh, None))

    use_fused = prefer_fused if prefer_fused is not None else (
        _mesh_is_tpu(mesh) and can_fuse(static)
    )
    if not use_fused:
        return xla_jit

    state_specs = pool_pspecs(axis_name)
    body = jax.shard_map(
        lambda params, colliders, state, frame: fused_step(
            static, params, colliders, state, frame, shard_axis=axis_name
        ),
        mesh=mesh,
        in_specs=(P(), P(), state_specs, P()),
        out_specs=(state_specs, outputs_pspecs(axis_name)),
        check_vma=False,
    )
    fused_jit = jax.jit(body)

    def dispatch(params, colliders, state, frame):
        n = state.capacity
        if n % n_dev == 0 and (n // n_dev) % (BLOCK_ROWS * LANES) == 0:
            return fused_jit(params, colliders, state, frame)
        return xla_jit(params, colliders, state, frame)

    return dispatch


def make_fleet_step(static: SpawnerStatic, mesh: Mesh, axis_name: str = "d",
                    prefer_fused: Optional[bool] = None):
    """vmapped step over a leading spawner axis, sharded across the mesh
    (dp-style): params and frame inputs carry a leading [S] axis; each
    spawner's pool is independent, so there is no cross-chip communication.

    On TPU meshes the body is `step_auto_fleet` under `jax.shard_map` over
    the fleet axis: each chip runs its LOCAL slots through the fleet-native
    kernel (ONE pallas_call per chip per frame — grid (S_local, tiles),
    per-slot smalls whole-array resident) with zero collectives — the
    per-chip kernel throughput carries to the whole fleet. On CPU meshes
    (virtual-device tests) the body is the XLA step under the same
    shard_map, bit-identical semantics per slot. prefer_fused=True forces
    the solo fused kernel unconditionally (interpret-mode tests); None
    auto-selects step_auto_fleet on TPU meshes (which self-checks capacity
    alignment per slot)."""
    from ..ops.fused_step import fused_step, step_auto_fleet

    if prefer_fused:
        def body(params, states, frames):
            return jax.vmap(
                lambda p, s, f: fused_step(static, p, None, s, f)
            )(params, states, frames)
    elif prefer_fused is None and _mesh_is_tpu(mesh):
        def body(params, states, frames):
            return step_auto_fleet(static, params, None, states, frames)
    else:
        def body(params, states, frames):
            return jax.vmap(
                lambda p, s, f: step(static, p, None, s, f)
            )(params, states, frames)

    dp = P(axis_name)
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(dp, dp, dp), out_specs=(dp, dp),
        check_vma=False,
    ))


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
                       fleet_axis: str = "host", particle_axis: str = "d",
                       prefer_fused: Optional[bool] = None):
    """Fleet step on a 2D (hosts x chips) mesh: spawners data-parallel across
    hosts, each pool's particle axis sharded across that host's chips.
    Collectives exist only along the particle axis (AABB/count reduce, and
    the dead-count gather for non-ring claims) — they ride ICI; nothing
    crosses DCN after placement.

    On TPU meshes with global-only archetypes the body is the fused Pallas
    kernel under a 2-axis `jax.shard_map`: vmapped over each device's local
    fleet slots, sharded over the particle axis with global lane indexing
    (fused_step shard_axis). Fallback (CPU virtual meshes, nested
    archetypes, unaligned shard capacities): GSPMD-jit XLA step."""
    from ..ops.fused_step import BLOCK_ROWS, LANES, can_fuse, fused_step

    sh = fleet_pool_shardings(mesh, fleet_axis, particle_axis)
    dp = NamedSharding(mesh, P(fleet_axis))

    def one(params, state, frame):
        return step(static, params, None, state, frame)

    batched = jax.vmap(one, in_axes=(0, 0, 0))
    out_sh = NamedSharding(mesh, P(fleet_axis))
    xla_jit = jax.jit(batched, in_shardings=(dp, sh, dp), out_shardings=(sh, out_sh))

    use_fused = prefer_fused if prefer_fused is not None else (
        _mesh_is_tpu(mesh) and can_fuse(static)
    )
    if not use_fused:
        return xla_jit

    state_specs = pool_pspecs(particle_axis, lead=fleet_axis)
    fp = P(fleet_axis)
    body = jax.shard_map(
        lambda params, states, frames: jax.vmap(
            lambda p, s, f: fused_step(static, p, None, s, f, shard_axis=particle_axis)
        )(params, states, frames),
        mesh=mesh,
        in_specs=(fp, state_specs, fp),
        out_specs=(state_specs, outputs_pspecs(particle_axis, lead=fleet_axis)),
        check_vma=False,
    )
    fused_jit = jax.jit(body)
    n_p = mesh.shape[particle_axis]
    n_f = mesh.shape[fleet_axis]

    def dispatch(params, states, frames):
        s, n = states.alive.shape[0], states.capacity
        if (s % n_f == 0 and n % n_p == 0
                and (n // n_p) % (BLOCK_ROWS * LANES) == 0):
            return fused_jit(params, states, frames)
        return xla_jit(params, states, frames)

    return dispatch


def stack_pools(states):
    """Stack S single-spawner pools into one fleet pytree with leading [S]."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def stack_params(params_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def stack_frames(frames):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
