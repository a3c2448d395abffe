"""Fixed-capacity SoA particle pool state (SURVEY.md §7 architecture).

The reference keeps `Vec<Vec<ParticleData>>` per spawner — AoS, dynamically
sized (`/root/reference/src/core.rs:269-321`).  Under XLA everything is static
shape, so a spawner owns one fixed-capacity pool of N slots; dead particles
are masked lanes, and spawning claims dead slots by prefix-sum rank instead of
`Vec::push` (same observable behaviour, different mechanism).

Layout notes (TPU): every field is a separate 1-D f32 array of length N.
Component-split (px/py/pz rather than [N,3]) keeps the minor dimension large
so XLA tiles lanes efficiently — an [N,3] array would pad its minor dim to the
128-lane tile and waste ~42x HBM bandwidth.  N should be a multiple of 1024
(8 sublanes x 128 lanes).

Particle types share the pool: `ptype` selects per-type settings via a small
unrolled select (T is tiny).  `last_emitted` is [E, N]: per-emitter "age when
this particle last spawned a nested child" (`/root/reference/src/core.rs:320`),
initialized to f32::MIN on spawn (`core.rs:467`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .utils.f32 import F32_MIN


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoolState:
    """Physics state only. The reference also stores derived render fields
    (scale, base/emissive color — `core.rs:311-317`); here they are pure
    functions of (initial_scale, age, lifetime, ptype) through the curve
    tables, so they are recomputed at instance-pack / event time instead of
    burning 9 extra HBM arrays of read+write bandwidth every step (~35% of
    the state)."""

    # per-slot fields, all shape [N] f32 unless noted
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    qx: jax.Array
    qy: jax.Array
    qz: jax.Array
    qw: jax.Array
    wx: jax.Array
    wy: jax.Array
    wz: jax.Array
    initial_scale: jax.Array
    age: jax.Array
    lifetime: jax.Array
    ptype: jax.Array  # [N] int32
    alive: jax.Array  # [N] bool
    last_emitted: jax.Array  # [E, N] f32
    # per-emitter scalars, shape [E]
    time_in_cycle: jax.Array  # f32
    last_emission: jax.Array  # f32
    enabled: jax.Array  # bool
    # spawner-level scalars
    manual_queued: jax.Array  # int32 scalar
    finished_notified: jax.Array  # bool scalar
    # Ring-allocation cursor (int32 scalar): const-lifetime archetypes die in
    # FIFO spawn order, so the n oldest slots are always the dead ones and
    # spawn claims are the contiguous window [cursor, cursor+n) mod N — no
    # prefix-sum/rank machinery (see SpawnerStatic.ring_claim). Unused (stays
    # 0) for variable-lifetime archetypes.
    ring_cursor: jax.Array
    rng_key: jax.Array  # jax PRNG key data (uint32[2])

    @property
    def capacity(self) -> int:
        return self.px.shape[-1]

    @property
    def num_emitters(self) -> int:
        return self.last_emitted.shape[-2]

    def alive_count(self):
        return jnp.sum(self.alive.astype(jnp.int32), axis=-1)


def init_pool(
    capacity: int,
    num_emitters: int,
    starts_enabled: bool = True,
    seed: int = 0,
    lifetime_fill: float = 1.0,
) -> PoolState:
    """Fresh pool, everything dead — the state produced by `sync_spawner_data`
    (`/root/reference/src/core.rs:343-365`).

    lifetime_fill: initial value of the dead-lane lifetime AND age arrays.
    CONTRACT: for spawners whose types share one constant lifetime
    (`SpawnerStatic.const_lifetime`), the engine elides the lifetime array
    (and, on the fused ring path, derives alive from age), relying on both
    arrays holding that constant. Pools for a compiled spawner should
    therefore be created with `init_pool_for(compiled, ...)` — a raw
    init_pool with the default fill silently simulates the wrong lifetime
    for such archetypes. This raw constructor is the low-level escape hatch
    (tests, custom fills); Scene/Fleet use init_pool_for everywhere.
    """
    # Host-side (numpy) leaves on purpose, like make_frame_input: each jnp
    # leaf here would be an EAGER device op (~0.5-2 ms per op on a tunneled
    # attach, x17 leaves) — as numpy they ride the first step's own argument
    # transfer. The rng_key too: threefry_seed(int) is exactly the
    # (hi, lo) uint32 pair, so the numpy form is bit-identical to
    # jax.random.PRNGKey(seed) without the eager op.
    import numpy as np

    n = int(capacity)
    z = np.zeros((n,), np.float32)
    return PoolState(
        px=z, py=z, pz=z,
        vx=z, vy=z, vz=z,
        qx=z, qy=z, qz=z, qw=np.ones((n,), np.float32),
        wx=z, wy=z, wz=z,
        initial_scale=z,
        # dead lanes read as dead under BOTH conventions: the alive array
        # (False) and the derived form age >= lifetime (see
        # SpawnerStatic.derived_alive), hence age starts AT the fill.
        age=np.full((n,), float(lifetime_fill), np.float32),
        lifetime=np.full((n,), float(lifetime_fill), np.float32),
        ptype=np.zeros((n,), np.int32),
        alive=np.zeros((n,), bool),
        last_emitted=np.full((num_emitters, n), F32_MIN, np.float32),
        time_in_cycle=np.zeros((num_emitters,), np.float32),
        last_emission=np.zeros((num_emitters,), np.float32),
        enabled=np.full((num_emitters,), bool(starts_enabled)),
        manual_queued=np.zeros((), np.int32),
        finished_notified=np.zeros((), bool),
        ring_cursor=np.zeros((), np.int32),
        # jax.random.PRNGKey(seed)'s numpy twin, verified empirically across
        # negative / int32-overflowing seeds: jax truncates the seed to
        # int32 and zero-extends, so the key is [0, seed mod 2^32] with the
        # high word always 0 (a previous >>32 formula crashed on negative
        # seeds and disagreed for seeds >= 2^32).
        rng_key=np.asarray([0, int(seed) & 0xFFFFFFFF], np.uint32),
    )


def init_pool_traced(capacity: int, num_emitters: int, rng_key,
                     starts_enabled: bool = True, lifetime_fill: float = 1.0) -> PoolState:
    """init_pool built from jnp constants INSIDE a jit (traced twin;
    bit-identical fields by construction). Used by the Scene's churn path:
    a fresh member's whole state is constants except the 8-byte rng_key, so
    materializing it in-program replaces a ~0.5 MB host->device transfer per
    churn frame with one tiny argument (measured ~30 ms/frame of tunnel
    transfer at 8192 lanes — the dominant churn cost after everything else
    was one dispatch)."""
    n = int(capacity)
    z = jnp.zeros((n,), jnp.float32)
    return PoolState(
        px=z, py=z, pz=z,
        vx=z, vy=z, vz=z,
        qx=z, qy=z, qz=z, qw=jnp.ones((n,), jnp.float32),
        wx=z, wy=z, wz=z,
        initial_scale=z,
        age=jnp.full((n,), float(lifetime_fill), jnp.float32),
        lifetime=jnp.full((n,), float(lifetime_fill), jnp.float32),
        ptype=jnp.zeros((n,), jnp.int32),
        alive=jnp.zeros((n,), bool),
        last_emitted=jnp.full((num_emitters, n), F32_MIN, jnp.float32),
        time_in_cycle=jnp.zeros((num_emitters,), jnp.float32),
        last_emission=jnp.zeros((num_emitters,), jnp.float32),
        enabled=jnp.full((num_emitters,), bool(starts_enabled)),
        manual_queued=jnp.zeros((), jnp.int32),
        finished_notified=jnp.zeros((), bool),
        ring_cursor=jnp.zeros((), jnp.int32),
        rng_key=jnp.asarray(rng_key, jnp.uint32),
    )


def init_pool_for(compiled, capacity: int, seed: int = 0) -> PoolState:
    """`init_pool` wired to a `CompiledSpawner`: honours starts_enabled and
    satisfies the const-lifetime elision contract (lifetime array pre-filled
    with the archetype's constant, see SpawnerStatic.const_lifetime)."""
    cl = compiled.static.const_lifetime
    return init_pool(
        capacity,
        compiled.num_emitters,
        compiled.starts_enabled,
        seed,
        lifetime_fill=1.0 if cl is None else cl,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameInput:
    """Per-frame host-provided inputs for one spawner.

    transform_translation/rotation: the spawn origin (Global or Local
    transform per SpawnTransformMode, `/root/reference/src/core.rs:432-435`).
    parent_velocity: world-space velocity of the rigid-body ancestor
    (`core.rs:705-742`); modifier_*: EffectModifier (`core.rs:323-336`).
    """

    dt: jax.Array  # f32 scalar
    transform_translation: jax.Array  # [3]
    transform_rotation: jax.Array  # [4] xyzw
    parent_velocity: jax.Array  # [3]
    modifier_scale: jax.Array  # f32 scalar
    modifier_speed: jax.Array  # f32 scalar
    # scene-level force fields (force_fields.FieldTable) or None — beyond
    # the reference; rides the frame so no step signature changes. The
    # table's kinds are pytree metadata: add/remove retraces once per
    # scene shape, move/retune/toggle never does.
    force_fields: object = None


def make_frame_input(dt, translation=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0, 1.0), parent_velocity=(0.0, 0.0, 0.0), modifier_scale=1.0, modifier_speed=1.0, force_fields=None) -> FrameInput:
    """Host-side (numpy) on purpose: each jnp leaf here would be an EAGER
    device_put — ~0.5-2 ms per op on a tunneled attach, times 6 leaves per
    spawner per frame (measured: a 12-spawner Scene.step spent ~150 ms/frame
    on frame-input creation alone). As numpy, the leaves ride the jit call's
    own argument transfer."""
    import numpy as np

    f = np.float32
    return FrameInput(
        dt=f(dt),
        transform_translation=np.asarray(translation, np.float32),
        transform_rotation=np.asarray(rotation, np.float32),
        parent_velocity=np.asarray(parent_velocity, np.float32),
        modifier_scale=f(modifier_scale),
        modifier_speed=f(modifier_speed),
        force_fields=force_fields,
    )
