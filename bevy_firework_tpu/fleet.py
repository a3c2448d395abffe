"""Fleet: many same-archetype spawners stepped in ONE dispatch.

The reference parallelizes `update_particles` across spawners with
`par_iter_mut` CPU threads (`/root/reference/src/core.rs:583-585`).  The TPU
analog is vmap: a Fleet owns a fixed slab of S spawner slots of one
archetype, stacked into leading-axis pytrees, and advances all of them with a
single vmapped step — one device dispatch regardless of S (SURVEY.md §2a
"DP over spawners").  Sharding the slot axis over a mesh
(`parallel.sharding.make_fleet_step`) extends the same shape across chips.

Typical use — the one_shot scene's impact bursts (`examples/one_shot.rs`):

    fleet = Fleet(burst_spawner, capacity=64, max_spawners=256)
    slot = fleet.activate(Transform(translation=impact_point))
    fleet.step(dt)              # steps every active slot at once
    for slot in fleet.drain_finished():
        ...                     # slot auto-deactivated (despawn analog)

Slots are reused; `activate` resets a slot's pool exactly like the
reference's fresh-entity spawn + `sync_spawner_data`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .colliders import ColliderTable
from .compiled import CompiledSpawner, compile_spawner
from .pool import FrameInput, PoolState, init_pool, make_frame_input
from .render import RenderItem, make_uniform
from .scene import Transform
from .settings import EffectModifier, ParticleSpawner


@partial(jax.jit, static_argnums=(0,))
def _fleet_step_jit(static, params, colliders, states, frames):
    """Vmapped step over the slot axis. On TPU with tile-aligned capacities
    this routes through step_auto, so the whole fleet runs the fused Pallas
    kernel (vmap adds a grid dimension — still one launch for all slots)."""
    from .ops.fused_step import step_auto

    one = lambda s, f: step_auto(static, params, colliders, s, f)
    return jax.vmap(one, in_axes=(0, 0))(states, frames)


@partial(jax.jit, static_argnums=(3,))
def _reset_slot(states, template, slot, enabled: bool):
    """Overwrite slot `slot` of the stacked pools with a fresh pool — except
    its PRNG key, which keeps the slot's current (per-slot, advancing) stream
    so re-activated and sibling spawners draw distinct randomness."""
    fresh = dataclasses.replace(
        template,
        enabled=jnp.full_like(template.enabled, enabled),
    )
    kw = {}
    for f in dataclasses.fields(PoolState):
        stacked = getattr(states, f.name)
        if f.name == "rng_key":
            kw[f.name] = stacked  # preserve the slot's own stream
        else:
            kw[f.name] = stacked.at[slot].set(getattr(fresh, f.name))
    return PoolState(**kw)


@partial(jax.jit, static_argnums=(2,))
def _pack_fleet_dense(params, states, type_index: int):
    """Dense planes per slot ([S, 16, N], dead lanes at scale 0): pure
    elementwise on device (the scatter compaction costs ~ms at scale); live
    lanes are compacted host-side by the native bridge."""
    from .render import pack_instances_dense

    planes, counts = jax.vmap(lambda s: pack_instances_dense(params, s, type_index))(states)
    return planes, counts


class Fleet:
    def __init__(
        self,
        spawner: ParticleSpawner,
        capacity: int = 1024,
        max_spawners: int = 64,
        colliders: Optional[ColliderTable] = None,
        seed: int = 0,
    ):
        self.spawner = spawner
        self.compiled: CompiledSpawner = compile_spawner(spawner)
        self.capacity = int(capacity)
        self.max_spawners = int(max_spawners)
        self.colliders = colliders if (colliders is not None and self.compiled.static.any_collision) else None
        cl = self.compiled.static.const_lifetime
        self._lifetime_fill = 1.0 if cl is None else cl  # elision contract (pool.init_pool_for)
        # all slots allocated up-front, disabled (inactive)
        pools = [
            init_pool(capacity, self.compiled.num_emitters, False, seed + i,
                      lifetime_fill=self._lifetime_fill)
            for i in range(max_spawners)
        ]
        self.states: PoolState = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pools)
        self._template = init_pool(capacity, self.compiled.num_emitters, True, seed,
                                   lifetime_fill=self._lifetime_fill)
        self._active = [False] * max_spawners
        self._transforms: List[Transform] = [Transform() for _ in range(max_spawners)]
        self._modifiers: List[EffectModifier] = [EffectModifier() for _ in range(max_spawners)]
        self._parent_vel = [(0.0, 0.0, 0.0)] * max_spawners
        self._outputs = None
        self._finished_flags = np.zeros(max_spawners, bool)

    # ------------------------------------------------------------- lifecycle
    def activate(self, transform: Optional[Transform] = None, modifier: Optional[EffectModifier] = None, parent_velocity=(0.0, 0.0, 0.0)) -> int:
        """Claim a free slot and start its spawner (fresh pool, enabled)."""
        try:
            slot = self._active.index(False)
        except ValueError:
            raise RuntimeError("Fleet full: raise max_spawners") from None
        self.states = _reset_slot(self.states, self._template, slot, True)
        self._active[slot] = True
        self._transforms[slot] = transform or Transform()
        self._modifiers[slot] = modifier or EffectModifier()
        self._parent_vel[slot] = tuple(float(v) for v in parent_velocity)
        self._finished_flags[slot] = False
        return slot

    def deactivate(self, slot: int):
        self.states = _reset_slot(self.states, self._template, slot, False)
        self._active[slot] = False

    def active_slots(self) -> List[int]:
        return [i for i, a in enumerate(self._active) if a]

    # ------------------------------------------------------------------ step
    def step(self, dt: float):
        frames = [
            make_frame_input(
                dt,
                translation=self._transforms[i].translation,
                rotation=self._transforms[i].rotation,
                parent_velocity=self._parent_vel[i],
                modifier_scale=self._modifiers[i].scale,
                modifier_speed=self._modifiers[i].speed,
            )
            for i in range(self.max_spawners)
        ]
        frames = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
        self.states, self._outputs = _fleet_step_jit(
            self.compiled.static, self.compiled.params, self.colliders, self.states, frames
        )

    def drain_finished(self) -> List[int]:
        """Slots whose ParticleSpawnerFinished fired this frame; each is
        deactivated (the reference one_shot pattern: observer despawns)."""
        if self._outputs is None:
            return []
        fired = np.asarray(self._outputs.finished_event)
        out = []
        for i in range(self.max_spawners):
            if self._active[i] and fired[i] and not self._finished_flags[i]:
                self._finished_flags[i] = True
                self.deactivate(i)
                out.append(i)
        return out

    # ----------------------------------------------------------------- query
    def alive_count(self) -> int:
        if self._outputs is None:
            return 0
        return int(np.asarray(self._outputs.alive_count).sum())

    def render_items(self) -> List[RenderItem]:
        from .native import compact_dense

        items = []
        for t in range(self.compiled.num_types):
            planes, counts = _pack_fleet_dense(self.compiled.params, self.states, t)
            counts = np.asarray(counts)
            for i in range(self.max_spawners):
                if not self._active[i] or int(counts[i]) == 0:
                    continue
                rows = compact_dense(np.asarray(planes[i]))
                if rows.shape[0] == 0:
                    continue
                items.append(
                    RenderItem(
                        spawner_id=i,
                        type_index=t,
                        instances=rows,
                        count=rows.shape[0],
                        uniform=make_uniform(self.compiled, t),
                        textures=self.compiled.textures[t],
                    )
                )
        return items
