"""Lowering: `ParticleSpawner` authoring config -> TPU-friendly parameters.

The reference walks heap-allocated settings structs per particle
(`/root/reference/src/core.rs:367-551,577-670`); the TPU design instead splits
a spawner into

  * `SpawnerStatic`  — hashable structural metadata (type/emitter counts,
    pacing/mode kinds, which features are on). This is a jit static argument:
    spawners with identical structure share one compiled executable
    (SURVEY.md §7 "emitter batching").
  * `SpawnerParams`  — a pytree of f32/int32 arrays: per-type physics
    constants, padded curve/gradient tables, per-emitter distribution
    parameters. Passed as traced arguments so tweaking numbers does NOT
    recompile.

Because the spawn engine loops over emitters at trace time (E is static and
small), per-emitter parameters are indexed with static ints and become scalar
broadcasts inside the kernel — no gathers on the spawn path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .curve import K_MAX, compile_curve
from .settings import (
    EmissionModeKind,
    EmissionPacingKind,
    ParticleSpawner,
    SpawnTransformMode,
)

PACING_ONE_SHOT = 0
PACING_ON_DEMAND = 1
PACING_RATE = 2

MODE_GLOBAL = 0
MODE_NESTED = 1


@dataclasses.dataclass(frozen=True)
class SpawnerStatic:
    """Hashable structure key; two spawners with equal SpawnerStatic can share
    one jitted step executable."""

    num_types: int
    num_emitters: int
    pacing_kinds: Tuple[int, ...]  # per emitter
    mode_kinds: Tuple[int, ...]  # per emitter
    target_types: Tuple[int, ...]  # per emitter (nested target, else 0)
    particle_indices: Tuple[int, ...]  # per emitter
    collision_types: Tuple[bool, ...]  # per type: collision on?
    destroyed_dump_types: Tuple[bool, ...]  # per type: capture destroyed records?
    spawn_transform_local: bool
    nested_valid: Tuple[bool, ...]  # per emitter: mode/pacing combination legal
    # per type (kind, knot count) of the scale curve — compile-time shape so
    # kernels specialize the interpolation (constant curves cost zero ops)
    scale_curve_meta: Tuple[Tuple[int, int], ...]
    # per-emitter-per-frame nested child buffer size. The dominant nested
    # cost is an [M]-sized XLA gather (~36 ns/index on v5e, so cost scales
    # with M, not with children actually spawned); overflowing a small
    # buffer is LOSS-FREE (deferred to later frames, see
    # step.MAX_NESTED_SPAWN_PER_FRAME), so size this near the steady-state
    # children-per-frame, not the worst burst. compile_spawner(...,
    # nested_buffer=...) sets it.
    nested_m: int = 4096
    # per type (base_kind, base_n, emis_kind, emis_n) of the color gradients,
    # for the in-kernel render pack's curve specialization
    color_curve_meta: Tuple[Tuple[int, int, int, int], ...] = ()
    # --- field-elision flags (fused-kernel HBM traffic reduction) -----------
    # elide_rotation: every particle this spawner can ever create has
    # q = identity and w = 0 forever (all emitters spawn with identity
    # initial_rotation and zero initial_angular_velocity, and no type has
    # angular acceleration), so the 7 rotation arrays are invariant and the
    # fused kernel skips reading/writing them entirely.
    elide_rotation: bool = False
    # const_lifetime: every type draws the same compile-time-constant
    # lifetime, so the lifetime array is invariant once filled with that
    # constant. CONTRACT: pools for such spawners must be created with
    # `init_pool_for(compiled, ...)` (or init_pool(lifetime_fill=const)) so
    # reads outside the fused kernel (render pack, event payloads) see the
    # right value.
    const_lifetime: object = None  # Optional[float]
    # per type: destroy_on_collision set (authoring-level, so static)
    destroy_types: Tuple[bool, ...] = ()

    @property
    def any_collision(self) -> bool:
        return any(self.collision_types)

    @property
    def any_destroy(self) -> bool:
        return any(self.destroy_types)

    @property
    def any_destroyed_dump(self) -> bool:
        return any(self.destroyed_dump_types)

    @property
    def single_type(self) -> bool:
        """T == 1: the ptype array is identically zero, elided from kernels."""
        return self.num_types == 1

    @property
    def ring_claim(self) -> bool:
        """Deaths happen only by aging => spawn claims the contiguous ring
        window [cursor, cursor+n) mod N instead of ranking dead slots with a
        prefix sum (pure iota math, no cross-tile carry — which is also what
        makes the multi-frame kernel unroll legal, see fused can_unroll).
        Claims are still masked by the dead flag, so an under-provisioned
        pool drops overflow rather than trampling live lanes; BOTH paths
        (XLA _claim_and_init and the fused kernel) use the identical window
        + mask, so they stay slot-exact even when drops occur.

        Constant lifetime makes the window provably dead (FIFO deaths).
        RANDOM lifetime (VERDICT r3 next #4) keeps the ring too: a window
        slot was claimed ~capacity spawns ago, so any pool sized for its
        design load (estimate_capacity: rate x MAX lifetime x headroom)
        has it long dead; a too-small pool degrades to dropped spawns —
        the documented overflow semantics, with capacity the knob — never
        to corruption.

        Excluded when any type destroys on collision: early destruction
        punches dead holes BEHIND the cursor that the ring cannot reclaim
        until it wraps, while the reference (and the prefix claim) reuse
        freed slots immediately — a destroy-heavy scene would silently
        under-emit. Those archetypes keep the exact dead-rank claim."""
        return not self.any_destroy

    @property
    def derived_alive(self) -> bool:
        """Ring archetypes without destroyed-particle dump handlers don't
        need the alive array in the fused kernel: alive == (age < lifetime)
        once collision-destroys write age = lifetime (the age fudge is
        observable only through dump payloads, hence the gate). Saves the
        array's read+write and its bool<->int32 conversions around the
        kernel. Requires pools initialized with age = lifetime_fill
        (init_pool does this)."""
        return self.ring_claim and not self.any_destroyed_dump


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpawnerParams:
    """All-array spawner parameters (leaves of shape [T, ...] or [E, ...])."""

    # --- per particle type [T] ---------------------------------------------
    lifetime_lo: jax.Array
    lifetime_hi: jax.Array
    initial_scale_lo: jax.Array
    initial_scale_hi: jax.Array
    acceleration: jax.Array  # [T, 3]
    angular_acceleration: jax.Array  # [T, 3]
    linear_drag: jax.Array
    angular_drag: jax.Array
    scale_ts: jax.Array  # [T, K]
    scale_vs: jax.Array  # [T, K]
    scale_n: jax.Array  # [T] int32
    scale_kind: jax.Array  # [T] int32
    base_ts: jax.Array  # [T, K]
    base_vs: jax.Array  # [T, K, 4]
    base_n: jax.Array
    base_kind: jax.Array
    emis_ts: jax.Array
    emis_vs: jax.Array  # [T, K, 4]
    emis_n: jax.Array
    emis_kind: jax.Array
    base_color0: jax.Array  # [T, 4] gradient.sample_clamped(0), spawn-time color
    emis_color0: jax.Array  # [T, 4]
    pbr: jax.Array  # [T] f32 0/1
    restitution: jax.Array  # [T]
    friction: jax.Array  # [T]
    destroy_on_collision: jax.Array  # [T] f32 0/1
    collision_mask: jax.Array  # [T] uint32
    field_mask: jax.Array  # [T] f32 0/1: affected_by_fields
    # --- per emitter [E] ----------------------------------------------------
    count: jax.Array  # [E] f32 (particles per cycle, or one-shot count)
    duration: jax.Array  # [E]
    off_start: jax.Array  # [E]
    off_end: jax.Array  # [E]
    shape_params: jax.Array  # [E, 8]
    ivel_params: jax.Array  # [E, 7]
    radial_lo: jax.Array  # [E]
    radial_hi: jax.Array  # [E]
    inherit: jax.Array  # [E] f32 0/1
    init_rot: jax.Array  # [E, 4]
    iangvel_params: jax.Array  # [E, 7]


@dataclasses.dataclass(frozen=True)
class CompiledSpawner:
    static: SpawnerStatic
    params: SpawnerParams
    starts_enabled: bool
    # host-side render/metadata (not on the hot path): per type
    blend_modes: Tuple[int, ...]
    pbr_flags: Tuple[bool, ...]
    fade_edges: Tuple[float, ...]
    fade_scenes: Tuple[float, ...]
    textures: Tuple[Tuple[object, object, object], ...]
    destroyed_handlers: Tuple[object, ...]

    @property
    def num_types(self) -> int:
        return self.static.num_types

    @property
    def num_emitters(self) -> int:
        return self.static.num_emitters


def compile_spawner(spawner: ParticleSpawner, nested_buffer: int = 4096) -> CompiledSpawner:
    types = spawner.particle_settings
    emitters = spawner.emission_settings
    T, E = len(types), len(emitters)

    pacing_map = {
        EmissionPacingKind.ONE_SHOT: PACING_ONE_SHOT,
        EmissionPacingKind.ON_DEMAND: PACING_ON_DEMAND,
        EmissionPacingKind.COUNT_OVER_DURATION: PACING_RATE,
    }
    pacing_kinds = tuple(pacing_map[e.emission_pacing.kind] for e in emitters)
    mode_kinds = tuple(MODE_NESTED if e.emission_mode.kind == EmissionModeKind.NESTED else MODE_GLOBAL for e in emitters)
    # Nested emission requires CountOverDuration pacing; others are skipped
    # with a warning (`/root/reference/src/core.rs:474-485` warn_once!).
    nested_valid = tuple(
        not (m == MODE_NESTED and p != PACING_RATE) for m, p in zip(mode_kinds, pacing_kinds)
    )
    if not all(nested_valid):
        import warnings

        warnings.warn(
            "Only CountOverDuration emission pacing is allowed with Nested "
            "emission mode; the offending emitter(s) will never emit",
            stacklevel=2,
        )

    # Field-elision detection (see SpawnerStatic docstrings). All inputs are
    # authoring-level constants, so this is decidable at compile time.
    elide_rotation = (
        all(tuple(e.initial_rotation) == (0.0, 0.0, 0.0, 1.0) for e in emitters)
        and all(
            e.initial_angular_velocity.magnitude.min == 0.0
            and e.initial_angular_velocity.magnitude.max == 0.0
            for e in emitters
        )
        and all(tuple(t.angular_acceleration) == (0.0, 0.0, 0.0) for t in types)
    )
    lifetime_ranges = {(t.lifetime.min, t.lifetime.max) for t in types}
    const_lifetime = None
    if len(lifetime_ranges) == 1:
        lo, hi = next(iter(lifetime_ranges))
        if lo == hi:
            const_lifetime = float(lo)

    static = SpawnerStatic(
        num_types=T,
        num_emitters=E,
        pacing_kinds=pacing_kinds,
        mode_kinds=mode_kinds,
        target_types=tuple(e.emission_mode.target_particle_type for e in emitters),
        particle_indices=tuple(e.particle_index for e in emitters),
        collision_types=tuple(t.collision_settings is not None for t in types),
        destroyed_dump_types=tuple(t.event_handlers.particles_destroyed is not None for t in types),
        spawn_transform_local=spawner.spawn_transform_mode == SpawnTransformMode.LOCAL,
        nested_valid=nested_valid,
        scale_curve_meta=tuple((t.scale_curve.kind, t.scale_curve.n) for t in types),
        color_curve_meta=tuple(
            (t.base_color.kind, t.base_color.n, t.emissive_color.kind, t.emissive_color.n)
            for t in types
        ),
        nested_m=int(nested_buffer),
        elide_rotation=elide_rotation,
        const_lifetime=const_lifetime,
        destroy_types=tuple(
            bool(t.collision_settings and t.collision_settings.destroy_on_collision) for t in types
        ),
    )

    # Host-side (numpy) params on purpose: each jnp.asarray here is an EAGER
    # device op (~0.5-2 ms on a tunneled attach, x~30 leaves per compile) —
    # as numpy the leaves ride the first step's argument transfer, and group
    # formation pins them once with device_put (scene.py).
    def farr(vals):
        return np.asarray(vals, dtype=np.float32)

    def iarr(vals):
        return np.asarray(vals, dtype=np.int32)

    # per-archetype table width: the largest knot count across ALL of this
    # spawner's curves (>= K_MAX so common archetypes share shapes); still a
    # compile-time constant under jit, so arbitrary authoring-side keyframe
    # counts are supported (reference: unbounded sample vecs, curve.rs:8-75)
    k_pad = max([K_MAX] + [t.scale_curve.n for t in types]
                + [t.base_color.n for t in types] + [t.emissive_color.n for t in types])
    scale_tabs = [compile_curve(t.scale_curve, channels=0, k_pad=k_pad) for t in types]
    base_tabs = [compile_curve(t.base_color, channels=4, k_pad=k_pad) for t in types]
    emis_tabs = [compile_curve(t.emissive_color, channels=4, k_pad=k_pad) for t in types]

    params = SpawnerParams(
        lifetime_lo=farr([t.lifetime.min for t in types]),
        lifetime_hi=farr([t.lifetime.max for t in types]),
        initial_scale_lo=farr([t.initial_scale.min for t in types]),
        initial_scale_hi=farr([t.initial_scale.max for t in types]),
        acceleration=farr([t.acceleration for t in types]),
        angular_acceleration=farr([t.angular_acceleration for t in types]),
        linear_drag=farr([t.linear_drag for t in types]),
        angular_drag=farr([t.angular_drag for t in types]),
        scale_ts=farr([tab[0] for tab in scale_tabs]),
        scale_vs=farr([tab[1] for tab in scale_tabs]),
        scale_n=iarr([tab[2] for tab in scale_tabs]),
        scale_kind=iarr([tab[3] for tab in scale_tabs]),
        base_ts=farr([tab[0] for tab in base_tabs]),
        base_vs=farr([tab[1] for tab in base_tabs]),
        base_n=iarr([tab[2] for tab in base_tabs]),
        base_kind=iarr([tab[3] for tab in base_tabs]),
        emis_ts=farr([tab[0] for tab in emis_tabs]),
        emis_vs=farr([tab[1] for tab in emis_tabs]),
        emis_n=iarr([tab[2] for tab in emis_tabs]),
        emis_kind=iarr([tab[3] for tab in emis_tabs]),
        base_color0=farr([t.base_color.sample_clamped(0.0) for t in types]),
        emis_color0=farr([t.emissive_color.sample_clamped(0.0) for t in types]),
        pbr=farr([1.0 if t.pbr else 0.0 for t in types]),
        restitution=farr([(t.collision_settings.restitution if t.collision_settings else 0.0) for t in types]),
        field_mask=farr([1.0 if t.affected_by_fields else 0.0 for t in types]),
        friction=farr([(t.collision_settings.friction if t.collision_settings else 0.0) for t in types]),
        destroy_on_collision=farr([(1.0 if (t.collision_settings and t.collision_settings.destroy_on_collision) else 0.0) for t in types]),
        collision_mask=np.asarray(
            [(t.collision_settings.filter_mask if t.collision_settings else 0) for t in types],
            dtype=np.uint32,
        ),
        count=farr([e.emission_pacing.count for e in emitters]),
        duration=farr([e.emission_pacing.duration for e in emitters]),
        off_start=farr([e.emission_pacing.offset_start for e in emitters]),
        off_end=farr([e.emission_pacing.offset_end for e in emitters]),
        shape_params=farr([e.emission_shape.compile() for e in emitters]),
        ivel_params=farr([e.initial_velocity.compile() for e in emitters]),
        radial_lo=farr([e.initial_velocity_radial.min for e in emitters]),
        radial_hi=farr([e.initial_velocity_radial.max for e in emitters]),
        inherit=farr([1.0 if e.inherit_parent_velocity else 0.0 for e in emitters]),
        init_rot=farr([e.initial_rotation for e in emitters]),
        iangvel_params=farr([e.initial_angular_velocity.compile() for e in emitters]),
    )

    return CompiledSpawner(
        static=static,
        params=params,
        starts_enabled=spawner.starts_enabled,
        blend_modes=tuple(t.blend_mode.as_u32() for t in types),
        pbr_flags=tuple(bool(t.pbr) for t in types),
        fade_edges=tuple(t.fade_edge for t in types),
        fade_scenes=tuple(t.fade_scene for t in types),
        textures=tuple((t.base_color_texture, t.normal_map_texture, t.orm_texture) for t in types),
        destroyed_handlers=tuple(t.event_handlers.particles_destroyed for t in types),
    )
