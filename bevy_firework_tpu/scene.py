"""Host facade: the engine's public runtime API (SURVEY.md §7 host facade).

`Scene` plays the role of the reference's ECS plumbing (plugin schedule +
component queries, `/root/reference/src/plugin.rs:46-60`):

  scene = Scene(colliders=[...])
  sid = scene.add_spawner(ParticleSpawner(...), capacity=65536,
                          transform=Transform(...))
  scene.step(dt)                      # the whole per-frame system chain
  scene.queue_particles(sid, 5)       # ParticleSpawnerData::queue_particles
  scene.render_items()                # per (spawner x non-empty type) draws
  scene.on_finished(sid, callback)    # ParticleSpawnerFinished observer

Differences from the reference, by design:
  * Time is an input: `step(dt)` — slow-motion is the caller scaling dt
    (the examples' time-scale toggle, `examples/sparks.rs:112-126`).
  * `parent_velocity` / `EffectModifier` are explicit per-spawner setters
    instead of ECS hierarchy propagation (`core.rs:690-736`); a caller with a
    scene graph computes them and passes them down.
  * Mutating spawner settings via `set_spawner` resets the pool — matching
    `sync_spawner_data` on `Changed<ParticleSpawner>` (`core.rs:343-365`,
    "mutating settings clears all live particles").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from .capsule import CapsuleSpec
from .capsule import pack as _cap_pack
from .capsule import pack_host as _cap_pack_host
from .capsule import spec_of as _cap_spec_of
from .capsule import unpack as _cap_unpack
from .colliders import Collider, ColliderTable, empty_collider_table
from .force_fields import ForceField
from .compiled import CompiledSpawner, compile_spawner
from .ops.fused_step import (
    multi_step_auto_packed,
    step_auto_packed,
)
from .pool import PoolState, init_pool_for, make_frame_input
from .render import (
    ORDER_DEPENDENT_ALPHA_MODES,
    RenderItem,
    make_uniform,
    pack_instances,
    planes_to_rows,
    sort_instances_back_to_front,
)
from .trails import TrailSettings, init_trail_state, update_trails, update_trails_stacked
from .settings import EffectModifier, ParticleSpawner, SpawnTransformMode
from .step import StepOutputs


# ---------------------------------------------------------------------------
# Archetype-group batching: spawners with equal (SpawnerStatic, capacity)
# step as ONE vmapped dispatch (the reference gets cross-spawner parallelism
# from rayon's par_iter_mut, `core.rs:583-585`; we get it from vmap). Params
# are stacked too, so members may differ in rates, colors, velocities —
# anything traced. Results stay STACKED between frames (`_GroupBatch`): per
# call the host exchanges ~3 stacked pytrees (~40 buffer handles) instead of
# ~40 per member, and in the steady state the previous frame's stacked
# states feed the next dispatch directly — per-member trees are sliced out
# lazily, only when someone actually reads a slot (events, render,
# checkpoint). Per-member results are bit-identical to solo step_auto calls
# (vmap of the XLA path) or to the vmapped fused kernel on TPU (the
# configuration the parity sweep covers).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _FlatSpec:
    """Static capsule layouts for a flat-dispatch group (VERDICT r4 next
    #1): params / states / frames each travel as ONE flat buffer instead of
    ~30/21/7 leaves — per-dispatch cost on the tunneled attach scales with
    BUFFER COUNT (~8-20 us/handle each way), so a 4-archetype scene frame
    drops from ~400 handles to ~25 (capsule.py module docstring)."""

    p: CapsuleSpec
    s: CapsuleSpec
    f: CapsuleSpec


@partial(jax.jit, static_argnums=(0,))
def _unpack_jit(spec, bufs):
    return _cap_unpack(bufs, spec)


_DUMP_FIELDS = ("px", "py", "pz", "vx", "vy", "vz", "qx", "qy", "qz", "qw",
                "wx", "wy", "wz", "initial_scale", "age", "lifetime", "ptype")


# Compacted dump rows fetched per frame: the tunnel's device->host path
# runs ~15 MB/s, so fetching the FULL pool payload (~560 KB at 8192 lanes)
# cost ~40 ms per spawner per frame; compacting destroyed lanes to the
# front on-device first fetches ~73 KB. Frames destroying more than this
# fall back to the full fetch (row 18 carries the true count).
_DUMP_COMPACT_M = 1024


@partial(jax.jit, static_argnums=(2,))
def _pack_dump_compact(state, destroyed_mask, m):
    """[19, m] f32: _pack_dump rows gathered for the first m DESTROYED
    lanes (stable index order), mask in row 17, the TRUE destroyed count
    broadcast in row 18 (host falls back to the full payload when it
    exceeds m)."""
    m = min(m, int(destroyed_mask.shape[0]))
    order = jnp.argsort(jnp.logical_not(destroyed_mask), stable=True)[:m]
    rows = [getattr(state, k).astype(jnp.float32)[order] for k in _DUMP_FIELDS]
    rows.append(destroyed_mask[order].astype(jnp.float32))
    rows.append(jnp.broadcast_to(
        destroyed_mask.sum().astype(jnp.float32), (m,)))
    return jnp.stack(rows)


@partial(jax.jit, static_argnums=(2,))
def _pack_dump_compact_stacked(states, destroyed_mask, m):
    """Per-GROUP compact dump payload: [S, 19, m] in ONE dispatch (packing
    per slot first materialized each slot's lazy state slice — ~21 tiny
    dispatches per spawner per frame)."""
    return jax.vmap(lambda s, d: _pack_dump_compact(s, d, m))(states, destroyed_mask)


@jax.jit
def _pack_dump(state, destroyed_mask):
    """[18, N] f32: the destroyed-dump payload as ONE buffer — the host
    used to fetch 17 pool arrays per dump spawner per frame (~0.5-2 ms of
    tunnel time EACH); one stacked fetch costs one buffer."""
    rows = [getattr(state, k).astype(jnp.float32) for k in _DUMP_FIELDS]
    rows.append(destroyed_mask.astype(jnp.float32))
    return jnp.stack(rows)


def _curve_many(curve, t):
    """Vectorized host twin of FireworkCurve.sample_clamped (np f32 math,
    same interpolation cases) — the per-record scalar path cost ~0.3-1 ms
    PER PARTICLE in python at dump rates."""
    from .curve import CURVE_CONSTANT, CURVE_EVEN

    t = np.asarray(t, np.float32)
    vs = np.asarray(curve.vs, dtype=np.float32)
    if curve.kind == CURVE_CONSTANT:
        return np.broadcast_to(vs[0], t.shape + vs[0:1].shape[1:]).astype(np.float32)
    if curve.kind == CURVE_EVEN:
        n = len(curve.vs)
        tc = np.clip(t, 0.0, 1.0)
        x = tc * np.float32(n - 1)
        i = np.minimum(np.floor(x).astype(np.int64), n - 2)
        frac = (x - i.astype(np.float32)).astype(np.float32)
        if vs.ndim > 1:
            frac = frac[..., None]
        return (vs[i] + (vs[i + 1] - vs[i]) * frac).astype(np.float32)
    ts = np.asarray(curve.ts, dtype=np.float32)
    tc = np.clip(t, ts[0], ts[-1]).astype(np.float32)
    i = np.clip(np.searchsorted(ts, tc, side="right") - 1, 0, len(ts) - 2)
    frac = ((tc - ts[i]) / (ts[i + 1] - ts[i])).astype(np.float32)
    if vs.ndim > 1:
        frac = frac[..., None]
    return (vs[i] + (vs[i + 1] - vs[i]) * frac).astype(np.float32)


# (static, size, n_frames, s_spec) -> CapsuleSpec of the packed (outputs,
# planes) pair. Filled DURING the trace of _scene_step_combined (tracing
# always runs at least once per signature per process, even with a
# persistent XLA compile cache), read by phase B / lazy batch accessors.
_GROUP_OUT_SPECS: Dict[tuple, CapsuleSpec] = {}


class _GroupBatch:
    """Stacked authority for one archetype group after a batched step.

    Flat groups (built via from_caps) hold the step results as capsule
    buffers; `params`/`states`/`outputs`/`planes` unpack lazily on first
    read (one extra dispatch, paid only when someone actually reads —
    events, render, checkpoint). The steady-state loop feeds the capsule
    buffers straight back into the next dispatch."""

    __slots__ = ("sids", "_params", "_states", "_outputs", "_planes", "dirty",
                 "trails", "tdirty", "pcaps", "scaps", "opcaps",
                 "p_spec", "s_spec", "o_spec", "_op_done", "pad", "rows")

    def __init__(self, sids, params, states, outputs, planes):
        self.sids = sids
        self._params = params  # stacked SpawnerParams (reused across frames)
        self._states = states  # stacked PoolState
        self._outputs = outputs  # stacked StepOutputs
        self._planes = planes  # stacked render planes or None
        self.dirty = False  # True => a member was mutated; restack next step
        self.trails = None  # stacked TrailState (all members trailed alike)
        self.tdirty = False  # True => a member's trail was replaced; restack
        self.pcaps = self.scaps = self.opcaps = None
        self.p_spec = self.s_spec = self.o_spec = None
        self._op_done = True
        # flat groups: stacked arrays have leading dim `pad` (>= len(sids),
        # multiple of 8 — mosaic pads the fleet grid's slot dim to 8 anyway,
        # and pre-padding keeps shapes/executables stable under membership
        # churn); rows[i] = the PERMANENT stacked row of sids[i] (holes from
        # removals are reused by later adds, never compacted)
        self.pad = None
        self.rows = None

    @classmethod
    def from_caps(cls, sids, pcaps, p_spec, scaps, s_spec, opcaps, o_spec,
                  pad=None, rows=None):
        b = cls(sids, None, None, None, None)
        b.pcaps, b.p_spec = pcaps, p_spec
        b.scaps, b.s_spec = scaps, s_spec
        b.opcaps, b.o_spec = opcaps, o_spec
        b._op_done = False
        b.pad = pad
        b.rows = rows
        return b

    @property
    def flat(self) -> bool:
        return self.scaps is not None

    @property
    def params(self):
        if self._params is None and self.pcaps is not None:
            self._params = _unpack_jit(self.p_spec, self.pcaps)
        return self._params

    @property
    def states(self):
        if self._states is None and self.scaps is not None:
            self._states = _unpack_jit(self.s_spec, self.scaps)
        return self._states

    def _ensure_op(self):
        if not self._op_done:
            self._outputs, self._planes = _unpack_jit(self.o_spec, self.opcaps)
            self._op_done = True

    @property
    def outputs(self):
        self._ensure_op()
        return self._outputs

    @property
    def planes(self):
        self._ensure_op()
        return self._planes


def _stack_frames_np(frames):
    """Stack host (numpy) FrameInputs on the host: leaves ride the jit
    call's argument transfer as [S, ...] arrays."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *frames)


def _stack_trees_np(trees):
    """Stack S member pytrees into one [S, ...] tree on the HOST (bit-exact
    numpy round-trip). Stacking inside a jit instead explodes the program to
    S x leaves parameters + as many concats — measured ~170 s of XLA compile
    for a 12-member group vs 1.6 s for the stacked-in/stacked-out program —
    so group (re)formation pays a one-time device->host->device copy of the
    member states here instead. Membership CHURN avoids this path: see
    _restack_take_insert."""
    return jax.tree_util.tree_map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)


# Testing seam: force full host restacking on every group (re)formation so
# the incremental device path can be checked bit-exact against it
# (tests/test_scene.py::test_group_churn_incremental_restack_exact).
_INCREMENTAL_RESTACK = True

# Testing seam: disable flat-capsule dispatch (tree-style args everywhere)
# so the capsule path can be A/B'd bit-exact and perf-compared in-process.
# Flip it only between SCENES (a live scene's batches were built under one
# regime; its padded capsule batches don't re-form as trees mid-flight).
_FLAT_DISPATCH = True


def _pad_target(n: int) -> int:
    """Stacked-group row capacity for n members: next multiple of 8 (mosaic
    pads the fleet kernel's slot dim to 8 regardless — measured 16 pad +
    slice thunks per dispatch at S=12 — so pre-padding is free device-side
    and keeps shapes/executables stable under +-1 membership churn)."""
    return max(8, -(-n // 8) * 8)


def _pow2_pad(k: int) -> int:
    p = 1
    while p < k:
        p *= 2
    return p


@jax.jit
def _restack_take_insert(old, idx_map, pos, changed):
    """Incremental group (re)formation (VERDICT r2 next #9): build the new
    [S_new, ...] stacked tree ON DEVICE from the previous batch's stacked
    tree — one take along axis 0 re-gathers every member whose authority
    still lives in the old batch — then overwrite the changed/new members'
    rows from their standalone trees. Membership churn (add/remove one
    spawner in a 12-member group) thus transfers only the changed members'
    states instead of round-tripping all S through the host
    (scene.py:96-103 trade).

    idx_map [S_new] — old-batch row for each new position (don't-care 0 for
    changed positions); pos [k] — positions overwritten from `changed`, a
    k-tuple of member trees (k is part of the jit cache key)."""
    return _take_insert_tree(old, idx_map, pos, changed)


def _vmapped_packed_step(static, colliders, pack: bool = True):
    """Stacked group step + render planes: the fleet-native kernel where it
    applies (ONE pallas_call for the whole group — vmapping the solo kernel
    re-fetches every small table per slot, ~36 us/slot of pure latency,
    docs/PERF_NOTES.md round 4), else the vmapped solo path.

    pack=False elides the in-kernel render pack entirely (planes None):
    measured ~1 ms/dispatch of per-thunk launch overhead per group on the
    tunneled attach for 9 plane-sized kernel outputs nobody reads. The
    Scene only packs while render demand exists (see Scene._render_demand);
    render_items falls back to the XLA dense pack for the frame that flips
    demand back on."""
    from .ops.fused_step import _fleet_kernel_ok, can_pack_render, fused_step_fleet
    from .ops.fused_step import step_auto as _step_auto

    def run(P, S, F):
        # kernel_stats=True: StepOutputs' aabb/count reductions ride the
        # kernel as SMEM stat rows instead of ~10 XLA thunks re-reading ~5
        # pool planes per group per frame (interactive-glue lever,
        # docs/ROADMAP.md; bit-exact — see _make_kernel kernel_stats).
        if _fleet_kernel_ok(static, S):
            if pack and can_pack_render(static, S.capacity):
                return fused_step_fleet(static, P, colliders, S, F,
                                        pack_render=True, kernel_stats=True)
            st, out = fused_step_fleet(static, P, colliders, S, F, kernel_stats=True)
            return st, out, None
        if not pack:
            st, out = jax.vmap(
                lambda p, s, f: _step_auto(static, p, colliders, s, f, kernel_stats=True)
            )(P, S, F)
            return st, out, None
        return jax.vmap(
            lambda p, s, f: step_auto_packed(static, p, colliders, s, f, kernel_stats=True)
        )(P, S, F)

    return run


@partial(jax.jit, static_argnums=(0,))
def _group_step_stacked(static, P, colliders, S, F):
    """Group step: stacked in, stacked out (formation passes host-stacked
    trees; steady state feeds the previous frame's on-device results)."""
    return _vmapped_packed_step(static, colliders)(P, S, F)


def _group_scan(static, colliders, P, S, F, n_frames, pack: bool = True):
    from .ops.fused_step import multi_step_fleet_stacked

    if n_frames > 1:
        S, _o = multi_step_fleet_stacked(static, P, colliders, S, F, n_frames - 1)
    return _vmapped_packed_step(static, colliders, pack)(P, S, F)


@partial(jax.jit, static_argnums=(0, 5))
def _group_multi_step_stacked(static, P, colliders, S, F, n_frames):
    return _group_scan(static, colliders, P, S, F, n_frames)


def _take_insert_tree(old, idx_map, pos, changed):
    """Body of _restack_take_insert, usable inside a larger jit."""
    base = jax.tree_util.tree_map(lambda x: jnp.take(x, idx_map, axis=0), old)
    if len(changed) == 0:
        return base
    rows = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *changed)
    return jax.tree_util.tree_map(lambda b, c: b.at[pos].set(c), base, rows)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _scene_step_combined(statics, sizes, n_frames, restacks, fspecs, packs, colliders, Ps, Ss, Fs):
    """ONE device dispatch stepping EVERY archetype group (VERDICT r3 next
    #2): the per-group (vmapped) step programs are traced into a single
    jitted computation, so a scene with K archetypes costs one launch per
    frame instead of K. On a tunneled attach each dispatch costs ~1.5-6 ms
    of host round-trip — with 4+ archetypes that overhead dominated the
    whole frame. Device work serializes inside the program, but it is <1 ms
    total at game scales; the round-trips were the wall.

    statics/sizes/restacks are the jit cache key alongside the tree shapes;
    size 1 means an UNSTACKED solo group (same trees the solo path always
    used). KNOWN TRADE-OFF: the key couples the groups, so a NEW scene
    signature (first churn pattern, first appearance of an archetype/count
    combination) retraces the whole scene's program — a one-time compile
    hitch per distinct signature, in exchange for every subsequent frame of
    every signature costing ONE round-trip. Games with a bounded set of
    archetypes reach a fixed signature set quickly; an unbounded stream of
    novel archetypes would be better served stepping those spawners in
    their own Scene. restacks[i] marks a group whose membership churned: its
    Ss[i]/Ps[i] arrive as (old_stacked, changed_rows, idx_map, pos) and the
    incremental take+insert runs INSIDE this same program — a churn frame
    costs the same single dispatch as a steady one (round-trip wall, see
    group_churn_12) plus the changed members' argument transfer.

    fspecs[i] is None (legacy tree-style group: trailed or dump-enabled
    members, or solo) or a _FlatSpec: the group's P/S/F arrive as capsule
    buffers (VERDICT r4 next #1 — per-dispatch cost on the tunnel is per
    BUFFER), are unpacked here behind an optimization_barrier (so the
    slice/bitcast plumbing cannot fuse into the step math and perturb FMA
    contraction — same 1-ulp discipline as the restack barrier), and the
    results are packed back into capsules: (scaps, opcaps[, pcaps])."""
    from .ops.fused_step import multi_step_auto_packed, step_auto_packed

    from .pool import init_pool_traced

    outs = []
    for static, n, rs, fsp, pk, P, S, F in zip(statics, sizes, restacks, fspecs, packs, Ps, Ss, Fs):
        col = colliders if static.any_collision else None
        if fsp is not None:
            # no optimization_barrier here: unpack is pure data movement
            # (slice + bitcast + reshape), so operand VALUES are identical
            # however XLA fuses it — and each barrier materializes every
            # leaf as a copy thunk (~60 us of device launch overhead per
            # thunk through the tunnel; barriers alone added ~130 copies
            # to a one-group frame program)
            F = _cap_unpack(F, fsp.f)
            if rs is not None:
                S = (_cap_unpack(S[0], fsp.s),) + tuple(S[1:])
                P = (_cap_unpack(P[0], fsp.p), P[1])
            else:
                S = _cap_unpack(S, fsp.s)
                P = _cap_unpack(P, fsp.p)
        if rs is not None:
            canonical = rs[0] == "fresh"
            if canonical:
                _tag, k_pad, pr_spec = rs
                s_old, (keys, ens), idx_map, pos = S
                p_old, prows = P
                s_changed = tuple((keys[i], ens[i]) for i in range(k_pad))
                p_changed = tuple(
                    _cap_unpack((prows[i],), pr_spec) for i in range(k_pad))
                rs = (True,) * k_pad
                S = (s_old, s_changed, idx_map, pos)
                P = (p_old, p_changed)
            s_old, s_changed, idx_map, pos = S
            p_old, p_changed = P
            # fresh members (rs flags) ship only (rng_key, enabled) and are
            # materialized here from constants — a fresh pool is ~0.5 MB of
            # zeros/fills whose host->device transfer dominated the churn
            # frame (~30 ms at 8192 lanes on the tunnel)
            cap = s_old.px.shape[-1]
            fill = 1.0 if static.const_lifetime is None else static.const_lifetime
            mats = []
            for fresh, item in zip(rs, s_changed):
                if fresh:
                    key, en = item
                    st = init_pool_traced(cap, static.num_emitters, key,
                                          lifetime_fill=fill)
                    st = dataclasses.replace(st, enabled=jnp.asarray(en))
                    mats.append(st)
                else:
                    mats.append(item)
            # optimization_barrier: materialize the restacked trees exactly
            # as a standalone restack dispatch would — XLA fusing the gather
            # into the step's math otherwise changes FMA contraction ~1 ulp
            S = jax.lax.optimization_barrier(
                _take_insert_tree(s_old, idx_map, pos, tuple(mats)))
            P = jax.lax.optimization_barrier(
                _take_insert_tree(p_old, idx_map, pos, p_changed))
        if n == 1:
            if not pk:
                from .ops.fused_step import multi_step_auto, step_auto

                if n_frames == 1:
                    st1, o1 = step_auto(static, P, col, S, F)
                else:
                    st1, o1 = multi_step_auto(static, P, col, S, F, n_frames)
                outs.append((st1, o1, None))
            elif n_frames == 1:
                outs.append(step_auto_packed(static, P, col, S, F))
            else:
                outs.append(multi_step_auto_packed(static, P, col, S, F, n_frames))
        else:
            outs.append(_group_scan(static, col, P, S, F, n_frames, pack=pk))
        if fsp is not None:
            # pack results into capsules (bit-exact data movement — no
            # barrier, same reasoning as the unpack above); the (outputs,
            # planes) layout is recorded during this trace for phase B
            st, out, planes = outs[-1]
            o_spec = _cap_spec_of((out, planes))
            _GROUP_OUT_SPECS[(static, n, n_frames, fsp.s, pk)] = o_spec
            res = (_cap_pack(st, fsp.s), _cap_pack((out, planes), o_spec))
            if rs is not None:
                res = res + (_cap_pack(P, fsp.p),)
            outs[-1] = res
        elif rs is not None:
            # hand the assembled stacked inputs back too: the batch keeps
            # P as its params authority across frames
            st, out, planes = outs[-1]
            outs[-1] = (st, out, planes, P)
    return tuple(outs)

DEFAULT_CAPACITY = 16384
_FUSED_TILE = 8192  # fused-kernel alignment (ops.fused_step BLOCK_ROWS*LANES)
# estimate_capacity's allowance per ON-DEMAND emitter: on-demand volume is
# caller-driven and unbounded, so this is only a default burst cushion —
# size the pool explicitly (or raise headroom) for heavy on-demand use.
_ON_DEMAND_ALLOWANCE = 256


@dataclasses.dataclass
class Transform:
    translation: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rotation: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)  # xyzw


def estimate_capacity(spawner: ParticleSpawner, headroom: float = 1.5) -> int:
    """Steady-state live-particle estimate for a spawner, with headroom,
    rounded up to the fused kernel's tile (8192) when large.

    rate emitters contribute count/duration x max-lifetime; one-shots their
    burst size; nested emitters count-per-parent x parents (bounded by the
    child/parent lifetime ratio). On-demand is unbounded — caller should size
    explicitly for heavy on-demand use.
    """
    from .settings import EmissionModeKind, EmissionPacingKind

    per_type = [0.0] * len(spawner.particle_settings)
    for es in spawner.emission_settings:
        ps = spawner.particle_settings[es.particle_index]
        life = max(ps.lifetime.min, ps.lifetime.max)
        p = es.emission_pacing
        if p.kind == EmissionPacingKind.ONE_SHOT:
            per_type[es.particle_index] += p.count
        elif p.kind == EmissionPacingKind.COUNT_OVER_DURATION:
            if es.emission_mode.kind == EmissionModeKind.NESTED:
                parents = per_type[es.emission_mode.target_particle_type]
                # each parent emits p.count over its life; children live `life`
                tps = spawner.particle_settings[es.emission_mode.target_particle_type]
                plife = max(max(tps.lifetime.min, tps.lifetime.max), 1e-6)
                per_type[es.particle_index] += parents * p.count * min(life / plife, 1.0) + p.count
            else:
                per_type[es.particle_index] += p.count / max(p.duration, 1e-6) * life
        else:  # on-demand: a modest default burst allowance
            per_type[es.particle_index] += _ON_DEMAND_ALLOWANCE
    total = int(sum(per_type) * headroom) + 64
    if total > _FUSED_TILE // 2:
        total = -(-total // _FUSED_TILE) * _FUSED_TILE  # round up to tile
    else:
        total = max(256, 1 << (total - 1).bit_length())
    return total


class _SpawnerSlot:
    """One spawner's host-side record. After a batched step, state / outputs
    / render_planes live STACKED in the group's `_GroupBatch`; the
    properties slice this slot's column out lazily on first access (21/9/9
    device slices respectively — paid only for slots somebody reads) and
    cache it. Writing any of them detaches the slot from the batch (after
    materializing what the batch still held) and marks the batch dirty so
    the next step restacks from per-slot authorities."""

    def __init__(self, spawner, compiled, state, outputs, capacity, transform,
                 global_transform, parent_velocity, modifier, finished_observers,
                 finished_fired, seed, render_planes=None,
                 trail_settings=None, trail_state=None, layers=1):
        self.layers = layers  # RenderLayers bitmask (render.rs:414-418)
        self.spawner = spawner
        self.compiled = compiled
        self.capacity = capacity
        self.transform = transform
        self.global_transform = global_transform
        self.parent_velocity = parent_velocity
        self.modifier = modifier
        self.finished_observers = finished_observers
        self.finished_fired = finished_fired
        self.seed = seed
        self.trail_settings = trail_settings
        self._trail_state = trail_state
        self._state = state
        self._outputs = outputs
        self._render_planes = render_planes
        self._batch = None  # (batch, idx) when a _GroupBatch holds authority
        # cached (dt, field_table, FrameInput): rebuilt only when dt, this
        # slot's transform/velocity/modifier, or the scene's force fields
        # change (Scene._frame_for) — frame-input construction is pure host
        # numpy but costs real python at 100 spawners x 60 Hz
        self._frame_cache = None
        # True while self._state is exactly init_pool_for's output (a fresh
        # pool): the churn path then ships only the 8-byte rng_key + enabled
        # row and materializes the constants in-program (init_pool_traced)
        self._state_fresh = False

    def _slice(self, tree, idx):
        return jax.tree_util.tree_map(lambda x: x[idx], tree)

    def attach_batch(self, batch: "_GroupBatch", idx: int,
                     materialize_trails: bool = True):
        """Hand authority to a freshly stepped group batch (no setter side
        effects — the batch IS the new value of all three).

        materialize_trails: slice this slot's trail state off the OLD batch
        before re-pointing (the new batch starts with trails=None). Pass
        False only when the caller will install a new stacked trail
        authority on the new batch this same frame."""
        if materialize_trails and self.trail_settings is not None:
            _ = self.trail_state  # resolves against the old batch
        self._batch = (batch, idx)
        self._state = None
        self._outputs = None
        self._render_planes = None

    def _detach(self):
        """Materialize everything the batch still holds for this slot, then
        go standalone and mark the batch for restacking."""
        self._state_fresh = False
        if self._batch is None:
            return
        _ = self.state
        _ = self.outputs
        _ = self.render_planes
        _ = self.trail_state
        batch, _i = self._batch
        batch.dirty = True
        self._batch = None

    @property
    def trail_state(self):
        """Lazy over the group batch (like state): when the group updated
        trails STACKED this frame, slice this slot's column on first read."""
        if self._trail_state is None and self._batch is not None:
            bt = self._batch[0].trails
            if bt is not None:
                self._trail_state = self._slice(bt, self._batch[1])
        return self._trail_state

    @trail_state.setter
    def trail_state(self, v):
        self._trail_state = v
        if self._batch is not None:  # external replacement: restack next step
            self._batch[0].tdirty = True

    @property
    def state(self) -> PoolState:
        if self._state is None and self._batch is not None:
            self._state = self._slice(self._batch[0].states, self._batch[1])
        return self._state

    @state.setter
    def state(self, v):
        self._detach()
        self._state = v
        self._state_fresh = False

    @property
    def outputs(self) -> Optional[StepOutputs]:
        if self._outputs is None and self._batch is not None:
            self._outputs = self._slice(self._batch[0].outputs, self._batch[1])
        return self._outputs

    @outputs.setter
    def outputs(self, v):
        self._detach()
        self._outputs = v

    @property
    def render_planes(self) -> Optional[tuple]:
        if self._render_planes is None and self._batch is not None:
            batch, i = self._batch
            if batch.planes is not None:
                self._render_planes = self._slice(batch.planes, i)
        return self._render_planes

    @render_planes.setter
    def render_planes(self, v):
        self._detach()
        self._render_planes = v


@dataclasses.dataclass(frozen=True)
class DestroyedParticle:
    """Host-side mirror of `ParticleData` handed to `particles_destroyed`
    handlers (`core.rs:164-167,660-667`)."""

    position: Tuple[float, float, float]
    velocity: Tuple[float, float, float]
    rotation: Tuple[float, float, float, float]
    angular_velocity: Tuple[float, float, float]
    initial_scale: float
    scale: float
    age: float
    lifetime: float
    base_color: Tuple[float, float, float, float]
    emissive_color: Tuple[float, float, float, float]
    pbr: bool


@dataclasses.dataclass
class _ColliderSlot:
    """Host-side master copy of one collider-table row.

    `kind` and `identity_rot` are the row's static (retrace-keying)
    properties; everything else is traced, so moving/toggling a collider
    edits this record and re-uploads small arrays without recompiling."""

    kind: int
    identity_rot: bool
    position: Tuple[float, float, float]
    rotation: Tuple[float, float, float, float]
    params: Tuple[float, ...]
    layers: int
    active: bool
    planes: Tuple[Tuple[float, float, float, float], ...] = ()  # hull only


@dataclasses.dataclass
class _FieldSlot:
    """Host-side master copy of one force-field row: `kind` is the static
    (retrace-keying) property; everything else is traced."""

    kind: int
    position: Tuple[float, float, float]
    axis: Tuple[float, float, float]
    strength: float
    radius: float
    frequency: float
    phase: float
    active: bool


def _is_identity_rot(rotation) -> bool:
    return tuple(float(r) for r in rotation) == (0.0, 0.0, 0.0, 1.0)


class Scene:
    def __init__(self, colliders: Optional[List[Collider]] = None, seed: int = 0,
                 force_fields: Optional[List[ForceField]] = None,
                 combined_signature_limit: int = 16):
        """combined_signature_limit bounds the one-program-per-frame
        design's compile hitches (VERDICT r4 next #2): every DISTINCT
        (archetype-set, sizes, churn-mode) combination the combined
        dispatch meets costs a one-time whole-scene trace+compile. Scenes
        with a bounded archetype set stay under the limit and enjoy
        one-dispatch frames forever; a scene that keeps producing novel
        combinations (an unbounded stream of new effects) crosses it and
        permanently degrades to PER-GROUP dispatches — each group's
        program caches by its own signature, so a novel archetype then
        compiles only its own group, at the cost of one extra dispatch
        round-trip per archetype group per frame (~1 ms each on a tunneled
        attach). The churn_storm bench measures both regimes."""
        self._collider_slots: List[_ColliderSlot] = []
        self._collider_ids: Dict[int, int] = {}  # cid -> slot index
        self._next_collider_id = 0
        self._collider_table: Optional[ColliderTable] = None  # cache; None = dirty
        self._field_slots: List[_FieldSlot] = []
        self._field_ids: Dict[int, int] = {}  # fid -> slot index
        self._next_field_id = 0
        self._field_table = None  # cached FieldTable; None = dirty
        self._spawners: Dict[int, _SpawnerSlot] = {}
        self._next_id = 0
        # Render demand gate: the in-kernel render pack costs ~1 ms of
        # per-thunk dispatch overhead per group per frame on a tunneled
        # attach for planes nobody reads, so headless stepping elides it.
        # Any render consumer (render_items, async render) flips this on
        # (sticky); the flipping call itself falls back to the XLA dense
        # pack for that one frame.
        self._render_demand = False
        self._seed = seed
        self.time = 0.0
        self._last_step_dispatches = 0  # archetype groups launched last step
        self._batches: Dict[tuple, _GroupBatch] = {}  # stacked group authority
        self._frame_stacks: Dict[tuple, tuple] = {}  # group key -> (frames, F)
        self._compile_cache: Dict[tuple, CompiledSpawner] = {}
        self._p_row_specs: Dict[object, CapsuleSpec] = {}
        self._combined_limit = int(combined_signature_limit)
        self._combined_signatures: set = set()
        self._per_group_mode = False
        # deferred event surfacing (enable_async_events): (sid, outputs,
        # state, n_frames) snapshots from the PREVIOUS step, delivered at
        # the start of the next one
        self._async_events = False
        self._pending_events: List[tuple] = []
        # pipelined (async) render extract state — see enable_async_render
        self._async_readers: Dict[int, object] = {}
        self._async_enabled = False
        self._async_slots = 3
        self._async_frame_id = 0
        self._async_acquired: List[tuple] = []
        self._async_seen_fid: Dict[tuple, int] = {}
        for col in colliders or []:
            self.add_collider(col)
        for ff in force_fields or []:
            self.add_force_field(ff)

    # ------------------------------------------------------------- authoring
    def add_spawner(
        self,
        spawner: ParticleSpawner,
        capacity: Optional[int] = None,
        transform: Optional[Transform] = None,
        global_transform: Optional[Transform] = None,
        modifier: Optional[EffectModifier] = None,
        sid: Optional[int] = None,
        nested_buffer: int = 4096,
        trail: Optional["TrailSettings"] = None,
        layers: int = 1,
    ) -> int:
        """capacity=None auto-sizes the pool from the spawner's steady-state
        estimate (see estimate_capacity); pass an explicit capacity for
        heavy on-demand use or EffectModifier-scaled emission.

        sid: explicit spawner id (checkpoint restore — ids may be
        non-contiguous after removals and host code holds them); fresh ids
        continue above the highest explicit one.

        nested_buffer: per-frame nested child buffer (a perf knob — cost
        scales with it, overflow defers loss-free; see
        compiled.SpawnerStatic.nested_m).

        trail: TrailSettings enables ribbon trails for this spawner (beyond
        the reference's feature set; see trails.py). Each step() records one
        history point; drain via Scene.trail_items().

        layers: RenderLayers bitmask (default bit 0) — the reference
        extracts `RenderLayers` per render entity and each view draws only
        intersecting entities (`render.rs:414-418,503-506`). Filter with
        render_items(view_layers=...) / trail_items(view_layers=...);
        change later with set_layers."""
        if capacity is None:
            capacity = estimate_capacity(spawner)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
        else:
            if sid in self._spawners:
                raise ValueError(f"spawner id {sid} already in use")
            self._next_id = max(self._next_id, sid + 1)
        # memoize compiles per (settings, nested_buffer): despawn/respawn
        # churn re-adds identical spawners every frame, and a compile builds
        # ~30 param leaves + the static descriptor each time
        try:
            ck = (spawner, int(nested_buffer))
            compiled = self._compile_cache.get(ck)
        except TypeError:  # unhashable (list-valued settings): compile fresh
            ck, compiled = None, None
        if compiled is None:
            compiled = compile_spawner(spawner, nested_buffer=nested_buffer)
            # pin the ~30 param leaves once: numpy params re-transfer per
            # dispatch (per-buffer tunnel overhead dominates churn frames)
            compiled = dataclasses.replace(
                compiled, params=jax.device_put(compiled.params))
            if ck is not None:
                self._compile_cache[ck] = compiled
        seed = self._seed + sid
        t = transform or Transform()
        self._spawners[sid] = _SpawnerSlot(
            spawner=spawner,
            compiled=compiled,
            state=init_pool_for(compiled, capacity, seed),
            outputs=None,
            capacity=capacity,
            transform=t,
            global_transform=global_transform or t,
            parent_velocity=(0.0, 0.0, 0.0),
            modifier=modifier or EffectModifier(),
            finished_observers=[],
            finished_fired=False,
            seed=seed,
            trail_settings=trail,
            trail_state=init_trail_state(trail, capacity) if trail else None,
            layers=layers,
        )
        self._spawners[sid]._state_fresh = True
        return sid

    def set_layers(self, sid: int, layers: int):
        """Move a spawner to different render layers (bitmask; pure host
        metadata — no pool reset)."""
        self._spawners[sid].layers = int(layers)

    def remove_spawner(self, sid: int):
        del self._spawners[sid]
        reader = self._async_readers.pop(sid, None)
        if reader is not None:
            reader.close()

    def set_spawner(self, sid: int, spawner: ParticleSpawner):
        """Settings change => full re-sync, clearing live particles
        (`core.rs:343-365`)."""
        slot = self._spawners[sid]
        slot.spawner = spawner
        slot.compiled = compile_spawner(spawner, nested_buffer=slot.compiled.static.nested_m)
        slot.state = init_pool_for(slot.compiled, slot.capacity, slot.seed)
        slot.outputs = None
        slot.render_planes = None
        slot._state_fresh = True  # AFTER the setters (each _detach clears it)
        slot.finished_fired = False
        if slot.trail_settings is not None:  # full re-sync clears trails too
            slot.trail_state = init_trail_state(slot.trail_settings, slot.capacity)

    def set_colliders(self, colliders: List[Collider]):
        """Replace the whole collider set. Changes the table's static layout,
        so the next step recompiles; prefer add/remove/set_collider for
        incremental edits (those reuse slots and stay compile-free)."""
        self._collider_slots = []
        self._collider_ids = {}
        self._collider_table = None
        for col in colliders or []:
            self.add_collider(col)

    def add_collider(self, collider: Collider) -> int:
        """Add a collider; returns a handle for remove/set_collider.

        Reuses a previously removed slot of the same kind when possible, so
        remove + re-add cycles (the common despawn/respawn pattern) keep the
        collider table's static layout — and therefore the compiled step —
        unchanged. Appending a genuinely new slot retraces once."""
        col_identity = _is_identity_rot(collider.rotation)
        idx = None
        for i, slot in enumerate(self._collider_slots):
            if (
                not slot.active
                and i not in self._collider_ids.values()
                and slot.kind == collider.kind
                and (not slot.identity_rot or col_identity)
                # hull plane counts are STATIC kernel metadata
                # (ColliderTable.hull_counts): reusing a freed hull slot
                # with a different count would silently recompile everything
                and len(slot.planes) == len(collider.planes)
            ):
                idx = i
                break
        new_slot = _ColliderSlot(
            kind=int(collider.kind),
            identity_rot=col_identity if idx is None else self._collider_slots[idx].identity_rot,
            position=tuple(float(v) for v in collider.position),
            rotation=tuple(float(v) for v in collider.rotation),
            params=tuple(float(v) for v in collider.params),
            layers=int(collider.layers),
            planes=tuple(tuple(float(x) for x in pl) for pl in collider.planes),
            active=True,
        )
        if idx is None:
            idx = len(self._collider_slots)
            self._collider_slots.append(new_slot)
        else:
            self._collider_slots[idx] = new_slot
        cid = self._next_collider_id
        self._next_collider_id += 1
        self._collider_ids[cid] = idx
        self._collider_table = None
        return cid

    def remove_collider(self, cid: int):
        """Disable a collider (traced active mask -> no recompile). The slot
        is retained and reused by a later add_collider of the same kind."""
        idx = self._collider_ids.pop(cid)
        self._collider_slots[idx].active = False
        self._collider_table = None

    def set_collider(self, cid: int, position=None, rotation=None, params=None, layers=None):
        """Move/re-shape a collider in place — traced fields only, so no
        recompile. Exception: giving a rotation to a collider that was added
        axis-aligned flips its slot to the rotated code path (one retrace;
        it stays rotation-capable afterwards)."""
        slot = self._collider_slots[self._collider_ids[cid]]
        if position is not None:
            slot.position = tuple(float(v) for v in position)
        if rotation is not None:
            slot.rotation = tuple(float(v) for v in rotation)
            if slot.identity_rot and not _is_identity_rot(rotation):
                slot.identity_rot = False
        if params is not None:
            slot.params = tuple(float(v) for v in params)
        if layers is not None:
            slot.layers = int(layers)
        self._collider_table = None

    @property
    def _colliders(self) -> ColliderTable:
        if self._collider_table is None:
            self._collider_table = self._build_collider_table()
        return self._collider_table

    def _build_collider_table(self) -> ColliderTable:
        import jax.numpy as jnp

        slots = self._collider_slots
        c = len(slots)
        if c == 0:
            return empty_collider_table()
        params = np.zeros((c, 3), dtype=np.float32)
        for i, s in enumerate(slots):
            params[i, : len(s.params)] = s.params
        from .colliders import COLLIDER_HULL, HULL_MAX_PLANES, _HULL_PAD_D

        any_hull = any(s.kind == COLLIDER_HULL for s in slots)
        hp = np.zeros((c, HULL_MAX_PLANES if any_hull else 1, 4), np.float32)
        if any_hull:
            hp[:, :, 3] = _HULL_PAD_D
            for i, s in enumerate(slots):
                if s.kind == COLLIDER_HULL and s.planes:
                    hp[i, : len(s.planes)] = np.asarray(s.planes, np.float32)
        return ColliderTable(
            kinds=tuple(s.kind for s in slots),
            identity_rot=tuple(s.identity_rot for s in slots),
            hull_counts=tuple(
                len(s.planes) if s.kind == COLLIDER_HULL else 0 for s in slots),
            position=jnp.asarray(np.array([s.position for s in slots], dtype=np.float32)),
            rotation=jnp.asarray(np.array([s.rotation for s in slots], dtype=np.float32)),
            params=jnp.asarray(params),
            layers=jnp.asarray(np.array([s.layers for s in slots], dtype=np.uint32)),
            active=jnp.asarray(np.array([s.active for s in slots], dtype=np.float32)),
            hull_planes=jnp.asarray(hp),
        )

    # ------------------------------------------------------- force fields
    def add_force_field(self, field: ForceField) -> int:
        """Add a scene force field (force_fields.py — beyond the reference);
        returns a handle for remove/set_force_field. Same zero-recompile
        discipline as colliders: a freed slot of the same kind is reused, so
        despawn/respawn cycles keep the table's static layout."""
        idx = None
        for i, slot in enumerate(self._field_slots):
            if not slot.active and i not in self._field_ids.values() and slot.kind == field.kind:
                idx = i
                break
        new_slot = _FieldSlot(
            kind=int(field.kind),
            position=tuple(float(v) for v in field.position),
            axis=tuple(float(v) for v in field.axis),
            strength=float(field.strength),
            radius=float(field.radius),
            frequency=float(field.frequency),
            phase=float(field.phase),
            active=True,
        )
        if idx is None:
            idx = len(self._field_slots)
            self._field_slots.append(new_slot)
        else:
            self._field_slots[idx] = new_slot
        fid = self._next_field_id
        self._next_field_id += 1
        self._field_ids[fid] = idx
        self._field_table = None
        return fid

    def remove_force_field(self, fid: int):
        """Disable a field (traced active mask -> no recompile); the slot is
        retained for a later add_force_field of the same kind."""
        idx = self._field_ids.pop(fid)
        self._field_slots[idx].active = False
        self._field_table = None

    def set_force_field(self, fid: int, position=None, axis=None, strength=None,
                        radius=None, frequency=None, phase=None):
        """Move/re-tune a field in place — all traced, never recompiles.
        Stepping `phase` each frame animates turbulence."""
        slot = self._field_slots[self._field_ids[fid]]
        if frequency is not None:
            if frequency <= 0:
                raise ValueError("frequency must be > 0")
            slot.frequency = float(frequency)
        if phase is not None:
            slot.phase = float(phase)
        if position is not None:
            slot.position = tuple(float(v) for v in position)
        if axis is not None:
            from .force_fields import _unit

            slot.axis = _unit(axis)
        if strength is not None:
            slot.strength = float(strength)
        if radius is not None:
            if radius <= 0:
                raise ValueError("radius must be > 0")
            slot.radius = float(radius)
        self._field_table = None

    @property
    def _force_fields(self):
        """FieldTable or None (no fields ever added). Disabled slots stay in
        the table with active=0 — same static layout, zero contribution.
        One packer (compile_force_fields) serves the public API and this
        path, so the row layout cannot desynchronize."""
        if not self._field_slots:
            return None
        if self._field_table is None:
            from .force_fields import compile_force_fields

            s = self._field_slots
            table = compile_force_fields([
                ForceField(kind=x.kind, position=x.position, axis=x.axis,
                           strength=x.strength, radius=x.radius,
                           frequency=x.frequency, phase=x.phase)
                for x in s
            ])
            self._field_table = dataclasses.replace(
                table,
                active=np.asarray([1.0 if x.active else 0.0 for x in s], np.float32),
            )
        return self._field_table

    def set_transform(self, sid: int, transform: Transform, global_transform: Optional[Transform] = None):
        slot = self._spawners[sid]
        slot.transform = transform
        slot.global_transform = global_transform or transform
        slot._frame_cache = None

    def set_parent_velocity(self, sid: int, velocity):
        """Host-side analog of `sync_parent_velocity` (`core.rs:705-742`): the
        caller computes v = v_lin + omega x r for the rigid-body ancestor."""
        slot = self._spawners[sid]
        slot.parent_velocity = tuple(float(v) for v in velocity)
        slot._frame_cache = None

    def set_modifier(self, sid: int, modifier: EffectModifier):
        """Analog of `propagate_particle_spawner_modifier` (`core.rs:690-703`)."""
        slot = self._spawners[sid]
        slot.modifier = modifier
        slot._frame_cache = None

    def queue_particles(self, sid: int, count: int):
        """`ParticleSpawnerData::queue_particles` (`core.rs:284-286`)."""
        slot = self._spawners[sid]
        slot.state = dataclasses.replace(
            slot.state, manual_queued=slot.state.manual_queued + np.int32(count)
        )

    def set_enabled(self, sid: int, enabled: bool):
        import jax.numpy as jnp

        slot = self._spawners[sid]
        slot.state = dataclasses.replace(
            slot.state, enabled=jnp.full_like(slot.state.enabled, bool(enabled))
        )

    def on_finished(self, sid: int, callback: Callable[[int], None]):
        self._spawners[sid].finished_observers.append(callback)

    def enable_async_events(self):
        """Take event surfacing off the sync path (VERDICT r4 next #9):
        finished callbacks and destroyed-particle dumps are delivered at
        the START of the NEXT step() (or at flush_events()) instead of
        inside the step that produced them. Reading a frame's outputs
        forces a device sync; one frame later the device has long finished,
        so the read is a cheap fetch instead of a pipeline stall — the
        analog of the reference's deferred command queue
        (`core.rs:660-667`: destroyed handlers run via deferred commands,
        not inline in the integrator).

        Ordering contract: events of step N are delivered, in spawner-id
        order, before step N+1's simulation runs — exactly once, one frame
        late. Handlers therefore observe a world one frame ahead of the
        deaths they describe; call flush_events() before tearing a scene
        down to drain the final frame's events."""
        self._async_events = True

    def flush_events(self):
        """Deliver any deferred events now (see enable_async_events)."""
        pending, self._pending_events = self._pending_events, []
        for sid, slot, outputs, packed, fin_latch, n_frames in pending:
            # delivered even if the spawner was removed/replaced since the
            # event frame: the deaths happened; the snapshot carries
            # everything the handlers need (reference: deferred commands
            # still run after the producing system, core.rs:660-667)
            if slot.finished_observers and not slot.finished_fired:
                fired_now = (
                    bool(outputs.finished_event)
                    if n_frames == 1
                    else bool(fin_latch)  # step_n: the latch (docstring)
                )
                if fired_now:
                    slot.finished_fired = True
                    for cb in slot.finished_observers:
                        cb(sid)
            if slot.compiled.static.any_destroyed_dump and packed is not None:
                arr = np.asarray(packed)
                if arr.shape[0] > 18 and arr[18][0] > (arr[17] > 0).sum():
                    # compact window overflowed: refetch the full payload
                    # (state snapshot no longer held — deliver from the
                    # CURRENT state; the overflow path is best-effort and
                    # bounded by _DUMP_COMPACT_M deaths/frame otherwise)
                    self._dispatch_destroyed(sid, slot)
                else:
                    self._dispatch_destroyed(sid, slot, packed=arr)

    def _p_row_spec(self, slot: _SpawnerSlot):
        """CapsuleSpec of ONE member's params tree (all-small leaves -> one
        packed buffer), cached per static: the canonical churn path ships
        added members' params as one [k, L] buffer instead of ~40 leaves."""
        key = slot.compiled.static
        spec = self._p_row_specs.get(key)
        if spec is None:
            spec = _cap_spec_of(slot.compiled.params)
            if spec.n_native:
                raise AssertionError("params tree has pool-sized leaves?")
            self._p_row_specs[key] = spec
        return spec

    def _fresh_row_desc(self, slot: _SpawnerSlot, enabled: bool):
        """(rng_key, enabled) descriptor for an in-program fresh pool row
        (init_pool_traced materializes the rest from constants). Padding
        rows use a zero key and enabled=False — they never draw."""
        E = slot.compiled.num_emitters
        if enabled:
            raise ValueError("fresh_row_desc is for disabled padding rows")
        return (np.zeros((2,), np.uint32), np.zeros((E,), bool))

    def _fresh_dead_state(self, slot: _SpawnerSlot):
        """Host-numpy fresh pool with every emitter DISABLED: the padding
        rows of a flat group's stacked state (they step as all-dead,
        no-spawn pools — pure masked lanes the kernel was already paying
        for, since mosaic pads the slot dim to 8)."""
        st = init_pool_for(slot.compiled, slot.capacity, seed=0)
        return dataclasses.replace(
            st, enabled=np.zeros_like(np.asarray(st.enabled)))

    # ------------------------------------------------------------------ step
    def _frame_for(self, slot: _SpawnerSlot, dt: float):
        ff = self._force_fields  # cached table object; new identity on change
        cache = slot._frame_cache
        if cache is not None and cache[0] == dt and cache[1] is ff:
            return cache[2]
        tf = (
            slot.transform
            if slot.spawner.spawn_transform_mode == SpawnTransformMode.LOCAL
            else slot.global_transform
        )
        frame = make_frame_input(
            dt,
            translation=tf.translation,
            rotation=tf.rotation,
            parent_velocity=slot.parent_velocity,
            modifier_scale=slot.modifier.scale,
            modifier_speed=slot.modifier.speed,
            force_fields=ff,
        )
        slot._frame_cache = (dt, ff, frame)
        return frame

    def _frame_dev_for(self, slot: _SpawnerSlot, dt: float):
        """Device-pinned twin of _frame_for for SOLO groups (numpy frames
        re-transfer their ~7 leaves every dispatch; multi groups pin the
        STACKED tree instead, so they keep consuming the numpy frames)."""
        frame = self._frame_for(slot, dt)
        dev = slot._frame_cache[3:]
        if dev and dev[0][0] is frame:
            return dev[0][1]
        fdev = jax.device_put(frame)
        slot._frame_cache = slot._frame_cache[:3] + ((frame, fdev),)
        return fdev

    def step(self, dt: float):
        """Advance every spawner one frame (spawn -> integrate -> notify).

        Spawners sharing an archetype (equal SpawnerStatic + capacity) are
        stepped as ONE vmapped dispatch (`_batched_scene_step`) — a
        100-spawner scene costs one launch per archetype group, not one per
        spawner. Per-spawner behaviour (events, dumps, outputs) is
        unchanged."""
        self.time += float(dt)
        if self._async_events:
            self.flush_events()  # deliver step N-1's events (cheap: the
            # device finished that frame long ago)
        self._last_dt = float(dt)
        self._run_groups(dt, n_frames=1)

    def _run_groups(self, dt: float, n_frames: int):
        """Two phases around ONE device dispatch: phase A assembles every
        group's stacked inputs (restacks, trail plans — all host/small-op
        work), then `_scene_step_combined` launches the whole scene's step
        as a single jitted program, then phase B re-points slots at the
        results and surfaces events. Host round-trips per frame are thus
        O(1) in the number of archetypes (VERDICT r3 next #2)."""
        groups: Dict[tuple, List[int]] = {}
        for sid, slot in self._spawners.items():
            key = (slot.compiled.static, slot.capacity)
            groups.setdefault(key, []).append(sid)
        self._last_step_dispatches = 0
        # evict stacked-frame caches of groups that no longer exist (each
        # entry pins a device tree; level transitions would leak them)
        if len(self._frame_stacks) > len(groups):
            self._frame_stacks = {
                k: v for k, v in self._frame_stacks.items() if k in groups}
        new_batches: Dict[tuple, _GroupBatch] = {}
        prep = []  # phase-A record per group
        any_collision = False
        pack = self._render_demand or self._async_enabled

        # ---- phase A: assemble every group's inputs (host work + small
        # restack ops only; no step dispatch, no device reads) -------------
        for key, sids in groups.items():
            static, _cap = key
            any_collision = any_collision or static.any_collision
            slots = [self._spawners[sid] for sid in sids]
            frames = [self._frame_for(s, dt) for s in slots]
            self._last_step_dispatches += 1
            if len(slots) == 1:
                prep.append((key, sids, slots, slots[0].compiled.params,
                             slots[0].state, self._frame_dev_for(slots[0], dt),
                             False, None, None, None, 1, None))
                continue
            # flat-capsule eligibility (VERDICT r4 next #1): groups whose
            # members have no trails and no destroyed-dump handlers ship
            # P/S/F as ONE buffer each and get capsule results back —
            # trailed/dump groups keep the legacy tree path (their per-frame
            # consumers would unpack every frame anyway)
            flat = (_FLAT_DISPATCH and not static.any_destroyed_dump
                    and all(s.trail_settings is None for s in slots))
            sids_t = tuple(sids)
            batch = self._batches.get(key)
            steady = batch is not None and batch.sids == sids_t and not batch.dirty
            restack = None
            p_spec = s_spec = None
            rows = None
            spad = len(slots)
            if flat:
                # --- padded, hole-stable rows (VERDICT r4 next #1/#2) ----
                # Stacked arrays carry `spad` rows (multiple of 8): members
                # keep PERMANENT rows across membership churn (removals
                # leave garbage holes nobody reads; adds reuse holes), so
                # +-1 member keeps shapes AND the executable. Mosaic pads
                # the fleet slot dim to 8 anyway, so the padding is free.
                prev_ok = (_INCREMENTAL_RESTACK and batch is not None
                           and batch.flat and batch.pad is not None
                           and not steady)
                row_of: Dict[int, int] = {}
                if steady:
                    rows = batch.rows
                    spad = batch.pad
                else:
                    if prev_ok:
                        for s_i, s in enumerate(slots):
                            if s._batch is not None and s._batch[0] is batch:
                                row_of[s_i] = s._batch[1]
                    kept_rows = set(row_of.values())
                    old_pad = batch.pad if prev_ok else 0
                    free = [r for r in range(old_pad) if r not in kept_rows]
                    nxt = old_pad
                    for s_i in range(len(slots)):
                        if s_i in row_of:
                            continue
                        if free:
                            row_of[s_i] = free.pop(0)
                        else:
                            row_of[s_i] = nxt
                            nxt += 1
                    top = max(max(row_of.values()) + 1, len(slots))
                    spad = max(_pad_target(top), old_pad)
                    rows = tuple(row_of[i] for i in range(len(slots)))
            if flat and not steady and prev_ok and any(
                    slots[i]._batch is not None and slots[i]._batch[0] is batch
                    for i in range(len(slots))):
                # incremental: old capsule rows re-gathered on device
                # (identity map — rows are permanent); only changed/new
                # member rows and any NEW padding rows transfer. All-fresh
                # changes are canonicalized to a pow2-padded class so churn
                # uses a bounded executable set per group:
                # {steady, churn-1, churn-2, churn-4, ...}.
                old_pad = batch.pad
                write_rows, changed, fresh, p_changed = [], [], [], []
                p0 = slots[0].compiled.params
                for s_i, s in enumerate(slots):
                    attached = s._batch is not None and s._batch[0] is batch
                    if attached:
                        continue
                    r = row_of[s_i]
                    write_rows.append(r)
                    p_changed.append(s.compiled.params)
                    if s._state_fresh:
                        st = s._state
                        changed.append((np.asarray(st.rng_key), np.asarray(st.enabled)))
                        fresh.append(True)
                    else:
                        changed.append(s.state)
                        fresh.append(False)
                for r in range(old_pad, spad):  # new padding rows: fresh-dead
                    if r in row_of.values():
                        continue
                    write_rows.append(r)
                    p_changed.append(p0)
                    changed.append(self._fresh_row_desc(slots[0], enabled=False))
                    fresh.append(True)
                idx_map = np.arange(spad, dtype=np.int32)
                if all(fresh):
                    # canonical all-fresh class: pow2-padded k, and the
                    # whole churn payload packed into THREE host buffers
                    # (keys, enabled rows, packed params rows) — an
                    # unpacked payload shipped ~40 small numpy leaves per
                    # added member, ~0.5-2 ms of tunnel transfer EACH
                    # (measured ~200 ms/churn-frame in the churn storm)
                    k_pad = _pow2_pad(max(len(changed), 1))
                    while len(changed) < k_pad:  # dummies, dropped via OOB pos
                        write_rows.append(spad)
                        p_changed.append(p0)
                        changed.append(self._fresh_row_desc(slots[0], enabled=False))
                    pr_spec = self._p_row_spec(slots[0])
                    keys = np.stack([c[0] for c in changed])
                    ens = np.stack([c[1] for c in changed])
                    prows = np.stack([
                        _cap_pack_host(pc, pr_spec)[0] for pc in p_changed])
                    pos = np.asarray(write_rows, np.int32)
                    restack = ("fresh", k_pad, pr_spec)
                    S = (batch.scaps, (keys, ens), idx_map, pos)
                    P = (batch.pcaps, prows)
                else:
                    restack = tuple(fresh)
                    pos = np.asarray(write_rows, np.int32)
                    S = (batch.scaps, tuple(changed), idx_map, pos)
                    P = (batch.pcaps, tuple(p_changed))
                p_spec, s_spec = batch.p_spec, batch.s_spec
            elif flat and not steady:
                # formation: stack member trees (+ fresh-dead padding rows)
                # on the host by ROW and ship each as ONE packed buffer
                by_row_s = [None] * spad
                by_row_p = [None] * spad
                for s_i, s in enumerate(slots):
                    by_row_s[rows[s_i]] = s.state
                    by_row_p[rows[s_i]] = s.compiled.params
                pad_state = self._fresh_dead_state(slots[0])
                for r in range(spad):
                    if by_row_s[r] is None:
                        by_row_s[r] = pad_state
                        by_row_p[r] = slots[0].compiled.params
                S_np = _stack_trees_np(by_row_s)
                P_np = _stack_trees_np(by_row_p)
                s_spec = _cap_spec_of(S_np)
                p_spec = _cap_spec_of(P_np)
                S = jax.device_put(_cap_pack_host(S_np, s_spec))
                P = jax.device_put(_cap_pack_host(P_np, p_spec))
            elif flat:
                # steady state: the previous frame's capsule buffers feed
                # the next dispatch directly — 2 handles
                P, S = batch.pcaps, batch.scaps
                p_spec, s_spec = batch.p_spec, batch.s_spec
            elif steady:
                # steady state: the previous frame's stacked trees feed
                # the next dispatch directly — no per-member handles
                P, S = batch.params, batch.states
            else:
                # legacy (trailed/dump) (re)formation: members still
                # attached to the previous batch re-gather on device; only
                # changed/new members' trees transfer. A slot is unchanged
                # iff its authority is still the old batch: every mutation
                # path goes through _detach().
                kept = {}
                if (_INCREMENTAL_RESTACK and batch is not None
                        and batch.flat == flat):
                    for i, s in enumerate(slots):
                        if s._batch is not None and s._batch[0] is batch:
                            kept[i] = s._batch[1]
                if kept:
                    idx_map = np.zeros((len(slots),), np.int32)
                    for i, j in kept.items():
                        idx_map[i] = j
                    pos = np.asarray(
                        [i for i in range(len(slots)) if i not in kept], np.int32)
                    changed, fresh = [], []
                    for i in pos:
                        sl = slots[int(i)]
                        if sl._state_fresh and sl._batch is None:
                            st = sl._state
                            changed.append((np.asarray(st.rng_key),
                                            np.asarray(st.enabled)))
                            fresh.append(True)
                        else:
                            changed.append(sl.state)
                            fresh.append(False)
                    S = (batch.states, tuple(changed), idx_map, pos)
                    P = (batch.params, tuple(slots[int(i)].compiled.params for i in pos))
                    restack = tuple(fresh)
                else:
                    # nothing reusable: stack member trees on the host
                    # (see _stack_trees_np), pin the params once
                    P = jax.device_put(_stack_trees_np([s.compiled.params for s in slots]))
                    S = _stack_trees_np([s.state for s in slots])  # materializes lazies

            # frames by ROW (padding rows reuse the first member's frame —
            # their pools are dead + disabled, dt is irrelevant); cache
            # valid while every row maps to the SAME cached FrameInput
            # object and the row layout is unchanged
            if flat:
                frames_by_row = [frames[0]] * spad
                for s_i in range(len(slots)):
                    frames_by_row[rows[s_i]] = frames[s_i]
            else:
                frames_by_row = frames
            fc = self._frame_stacks.get(key)
            if (fc is not None and len(fc[0]) == len(frames_by_row) and fc[3] == flat
                    and all(a is b for a, b in zip(fc[0], frames_by_row))):
                F, f_spec = fc[1], fc[2]
            else:
                # pin on device: a cached numpy stack still re-transfers its
                # ~7 leaves every dispatch through the tunnel
                stacked = _stack_frames_np(frames_by_row)
                if flat:
                    f_spec = _cap_spec_of(stacked)
                    F = jax.device_put(_cap_pack_host(stacked, f_spec))
                else:
                    f_spec = None
                    F = jax.device_put(stacked)
                self._frame_stacks[key] = (tuple(frames_by_row), F, f_spec, flat)

            # trail plan, decided BEFORE slots re-point at the new batch:
            # all-trailed-alike groups update trails in one vmapped
            # dispatch; t_prev must come from the OLD authority (steady:
            # the old batch's stacked trees, donated in place; else:
            # per-slot states, whose lazy reads still resolve against
            # the old batch here)
            ts_set = {s.trail_settings for s in slots}
            group_trails = None not in ts_set and len(ts_set) == 1
            t_prev = None
            if group_trails:
                if steady and batch.trails is not None and not batch.tdirty:
                    t_prev = batch.trails
                else:
                    # incremental trail restack: a slot's trail authority
                    # is still the old batch iff it is attached AND its
                    # _trail_state cache is empty (an external trail
                    # replacement — the tdirty source — fills the cache
                    # without detaching)
                    tkept = {}
                    if _INCREMENTAL_RESTACK and batch is not None and batch.trails is not None:
                        for i, s in enumerate(slots):
                            if (s._batch is not None and s._batch[0] is batch
                                    and s._trail_state is None):
                                tkept[i] = s._batch[1]
                    if tkept:
                        t_idx = np.zeros((len(slots),), np.int32)
                        for i, j in tkept.items():
                            t_idx[i] = j
                        t_pos = np.asarray(
                            [i for i in range(len(slots)) if i not in tkept], np.int32)
                        t_prev = _restack_take_insert(
                            batch.trails, t_idx, t_pos,
                            tuple(slots[int(i)].trail_state for i in t_pos))
                    else:
                        t_prev = _stack_trees_np([s.trail_state for s in slots])
            fsp = _FlatSpec(p_spec, s_spec, f_spec) if flat else None
            prep.append((key, sids, slots, P, S, F, group_trails, t_prev,
                         restack, fsp, spad, rows))

        # ---- ONE device dispatch for the whole scene (or per-group when
        # the combined-signature limit was crossed; see __init__) ----------
        if prep:
            table = self._colliders if any_collision else None
            sig = (tuple(p[0][0] for p in prep), tuple(p[10] for p in prep),
                   n_frames,
                   tuple(p[8] if p[8] is None or isinstance(p[8][0], str)
                         else len(p[8]) for p in prep),
                   (pack,))
            if not self._per_group_mode:
                self._combined_signatures.add(sig)
                if len(self._combined_signatures) > self._combined_limit:
                    self._per_group_mode = True
            if self._per_group_mode:
                results = tuple(
                    _scene_step_combined(
                        (p[0][0],), (p[10],), n_frames, (p[8],), (p[9],),
                        (pack,), table if p[0][0].any_collision else None,
                        (p[3],), (p[4],), (p[5],))[0]
                    for p in prep)
                self._last_step_dispatches = len(prep)
            else:
                results = _scene_step_combined(
                    tuple(p[0][0] for p in prep),
                    tuple(p[10] for p in prep),
                    n_frames,
                    tuple(p[8] for p in prep),
                    tuple(p[9] for p in prep),
                    (pack,) * len(prep),
                    table,
                    tuple(p[3] for p in prep),
                    tuple(p[4] for p in prep),
                    tuple(p[5] for p in prep),
                )
        else:
            results = ()

        # ---- phase B: re-point authority, trails, events -------------------
        for (key, sids, slots, P, S, F, group_trails, t_prev, restack, fsp, spad, rows), res in zip(prep, results):
            if fsp is not None:
                # capsule results: states + (outputs, planes) stay packed
                # until somebody reads them (lazy unpack on the batch)
                if restack is not None:
                    scaps, opcaps, pcaps = res
                else:
                    scaps, opcaps = res
                    pcaps = P  # steady: reuse; formation: the fresh pack
                o_spec = _GROUP_OUT_SPECS[(key[0], spad, n_frames, fsp.s, pack)]
                nb = _GroupBatch.from_caps(tuple(sids), pcaps, fsp.p,
                                           scaps, fsp.s, opcaps, o_spec,
                                           pad=spad, rows=rows)
                new_batches[key] = nb
                for i, slot in enumerate(slots):
                    slot.attach_batch(nb, rows[i])
                group_trails = False
            else:
                if restack is not None:
                    S2, O, planes, P = res  # P = the program-assembled stacked params
                else:
                    S2, O, planes = res
                if len(slots) == 1:
                    slot = slots[0]
                    slot.state, slot.outputs, slot.render_planes = S2, O, planes
                else:
                    nb = _GroupBatch(tuple(sids), P, S2, O, planes)
                    new_batches[key] = nb
                    for i, slot in enumerate(slots):
                        # a slot leaving the stacked-trail regime must carry
                        # its trail slice with it (off the old batch)
                        slot.attach_batch(nb, i, materialize_trails=not group_trails)
            # per-GROUP dump payload (see _pack_dump_stacked): one dispatch
            # for the whole group; per-slot rows slice off it lazily
            group_dump = None
            if (len(slots) > 1 and key[0].any_destroyed_dump
                    and restack is None and fsp is None):
                group_dump = _pack_dump_compact_stacked(
                    nb.states, nb.outputs.destroyed_mask, _DUMP_COMPACT_M)
            elapsed = np.float32(dt * n_frames)
            if len(slots) > 1 and group_trails:
                nb.trails = update_trails_stacked(t_prev, nb.states, elapsed)
                for slot in slots:
                    slot._trail_state = None  # read lazily off the new batch
            else:
                group_trails = False
            for sid, slot in zip(sids, slots):
                if slot.trail_settings is not None and not group_trails:
                    # one history point per step()/step_n() call (a step_n
                    # fast-forward records only its final frame's point);
                    # elapsed lets update_trails catch slots re-tenanted
                    # INSIDE the window (age grew, but by less than a
                    # continuing tenant's would have)
                    slot.trail_state = update_trails(slot.trail_state, slot.state, elapsed)
                # host-side event surfacing (syncs only when someone
                # cares; enable_async_events defers delivery one frame so
                # the read never stalls the pipeline)
                wants_events = ((slot.finished_observers and not slot.finished_fired)
                                or slot.compiled.static.any_destroyed_dump)
                if wants_events and self._async_events:
                    if not slot.compiled.static.any_destroyed_dump:
                        packed = None
                    elif group_dump is not None:
                        i = sids.index(sid)
                        packed = group_dump[i]
                    else:
                        packed = _pack_dump_compact(
                            slot.state, slot.outputs.destroyed_mask,
                            _DUMP_COMPACT_M)
                    fin = (slot.state.finished_notified
                           if (slot.finished_observers and not slot.finished_fired
                               and n_frames > 1) else False)
                    self._pending_events.append(
                        (sid, slot, slot.outputs, packed, fin, n_frames))
                    continue
                if slot.finished_observers and not slot.finished_fired:
                    fired_now = (
                        bool(slot.outputs.finished_event)
                        if n_frames == 1
                        else bool(slot.state.finished_notified)
                    )
                    if fired_now:
                        slot.finished_fired = True
                        for cb in slot.finished_observers:
                            cb(sid)
                if slot.compiled.static.any_destroyed_dump:
                    if group_dump is not None:
                        arr = np.asarray(group_dump[sids.index(sid)])
                        if arr[18][0] > (arr[17] > 0).sum():
                            self._dispatch_destroyed(sid, slot)  # overflow
                        else:
                            self._dispatch_destroyed(sid, slot, packed=arr)
                    else:
                        self._dispatch_destroyed(sid, slot)
        self._batches = new_batches
        if self._async_enabled:
            self._async_submit_all()

    def step_n(self, dt: float, n_frames: int):
        """Fast-forward n frames in ONE device dispatch per spawner (the
        driver-loop analog of the reference's pipelined headless stepping).
        Finished events are still delivered (latched via finished_notified);
        destroyed-particle dumps of intermediate frames are skipped — use
        step() when per-frame death events matter."""
        if n_frames <= 0:
            return
        self.time += float(dt) * n_frames
        if self._async_events:
            self.flush_events()
        self._last_dt = float(dt)
        self._run_groups(dt, n_frames=n_frames)

    def _dispatch_destroyed(self, sid: int, slot: _SpawnerSlot,
                            outputs=None, state=None, packed=None):
        """Build and deliver `DestroyedParticle` records (`core.rs:660-667`).

        The payload arrives as ONE [18, N] device array (_pack_dump) —
        either precomputed by the async-events path or packed here — so
        the host pays a single buffer fetch instead of 17, and the derived
        fields (scale/colors the reference stores on the clone but our
        pool recomputes) are reconstructed with VECTORIZED numpy curve
        evaluation (_curve_many) instead of per-record python: at
        hundreds of deaths/frame the scalar path cost seconds."""
        if packed is None:
            outputs = outputs if outputs is not None else slot.outputs
            st = state if state is not None else slot.state
            packed = np.asarray(_pack_dump(st, outputs.destroyed_mask))
        mask = packed[17] > 0.0
        if not mask.any():
            return
        idx = np.nonzero(mask)[0]
        f = {k: packed[i][idx] for i, k in enumerate(_DUMP_FIELDS)}
        ptype = f["ptype"].astype(np.int64)
        pbr_flags = slot.compiled.pbr_flags
        dt = np.float32(getattr(self, "_last_dt", 0.0))
        for t, handler in enumerate(slot.compiled.destroyed_handlers):
            if handler is None:
                continue
            sel = np.nonzero(ptype == t)[0]
            if sel.size == 0:
                continue
            ps = slot.spawner.particle_settings[t]
            age = f["age"][sel].astype(np.float32)
            lifetime = f["lifetime"][sel].astype(np.float32)
            iscale = f["initial_scale"][sel].astype(np.float32)
            # Reconstruct the derived fields the reference stores on the
            # destroyed clone (pool state no longer carries them):
            #  - colors: never updated on the death frame -> gradient at
            #    last frame's age percent (spawn color == gradient(0)).
            #  - scale: lifetime-death skips the scale update (A.4 step 2
            #    runs after the cull); collision-death includes it.
            pct_prev = (np.maximum(age - dt, np.float32(0.0)) / lifetime).astype(np.float32)
            died_of_age = age >= lifetime
            first_frame = age == dt
            sc_prev = _curve_many(ps.scale_curve, pct_prev)
            sc_now = _curve_many(ps.scale_curve, (age / lifetime).astype(np.float32))
            scale = np.where(
                died_of_age,
                np.where(first_frame, iscale, (iscale * sc_prev).astype(np.float32)),
                (iscale * sc_now).astype(np.float32),
            ).astype(np.float32)
            base = np.atleast_2d(_curve_many(ps.base_color, pct_prev))
            emis = np.atleast_2d(_curve_many(ps.emissive_color, pct_prev))
            pbr = bool(pbr_flags[t])
            rows = {k: f[k][sel] for k in _DUMP_FIELDS}
            records = [
                DestroyedParticle(
                    position=(rows["px"][i], rows["py"][i], rows["pz"][i]),
                    velocity=(rows["vx"][i], rows["vy"][i], rows["vz"][i]),
                    rotation=(rows["qx"][i], rows["qy"][i], rows["qz"][i], rows["qw"][i]),
                    angular_velocity=(rows["wx"][i], rows["wy"][i], rows["wz"][i]),
                    initial_scale=float(iscale[i]),
                    scale=float(scale[i]),
                    age=float(age[i]),
                    lifetime=float(lifetime[i]),
                    base_color=tuple(float(c) for c in base[i]),
                    emissive_color=tuple(float(c) for c in emis[i]),
                    pbr=pbr,
                )
                for i in range(sel.size)
            ]
            handler(records)

    # ----------------------------------------------------------------- query
    def alive_count(self, sid: Optional[int] = None) -> int:
        if sid is not None:
            return int(self._spawners[sid].state.alive_count())
        return sum(int(s.state.alive_count()) for s in self._spawners.values())

    def aabb(self, sid: int, space: str = "world"):
        """Bounding box of the spawner's live particles (pos ± scale), as
        (min, max).

        space="world": raw world-space box from the step reduction.
        space="local": the reference's `update_aabbs` semantics
        (`render.rs:677-703`): the box KEEPS its world-space half-extents,
        and only its CENTER is transformed into the spawner's local frame by
        the inverse global transform — this is what a consumer culling by
        entity transform expects."""
        slot = self._spawners[sid]
        out = slot.outputs
        if out is None or not bool(out.aabb_valid):
            return None
        mn = np.asarray(out.aabb_min, dtype=np.float32)
        mx = np.asarray(out.aabb_max, dtype=np.float32)
        if space == "world":
            return mn, mx
        center = (mn + mx) * np.float32(0.5)
        half = (mx - mn) * np.float32(0.5)
        tf = slot.global_transform
        # inverse rigid transform: R^-1 (center - translation)
        qx, qy, qz, qw = (np.float32(v) for v in tf.rotation)
        v = center - np.asarray(tf.translation, dtype=np.float32)
        # rotate v by the conjugate quaternion (-q.xyz, q.w)
        ux, uy, uz = -qx, -qy, -qz
        tx = np.float32(2.0) * (uy * v[2] - uz * v[1])
        ty = np.float32(2.0) * (uz * v[0] - ux * v[2])
        tz = np.float32(2.0) * (ux * v[1] - uy * v[0])
        cl = np.array(
            [
                v[0] + qw * tx + (uy * tz - uz * ty),
                v[1] + qw * ty + (uz * tx - ux * tz),
                v[2] + qw * tz + (ux * ty - uy * tx),
            ],
            dtype=np.float32,
        )
        return cl - half, cl + half

    def spawner_ids(self) -> List[int]:
        return list(self._spawners.keys())

    # ---------------------------------------------------------------- render
    def render_items(
        self,
        method: str = "dense",
        camera_pos=None,
        sort_within: str = "auto",
        view_proj=None,
        view_layers: Optional[int] = None,
    ) -> List[RenderItem]:
        """The extract step: one item per (spawner x non-empty type)
        (`render.rs:439-461`), each carrying a dense instance array in the
        64-byte contract layout.

        camera_pos (optional [3] world-space view position) enables draw
        ordering: the item list comes back back-to-front by spawner-origin
        distance (the reference's Transparent3d per-view distance sort,
        `render.rs:541-561`), and each item whose alpha_mode is a
        non-commutative blend (Blend/Premultiplied) additionally gets its
        INSTANCES sorted back-to-front — same-system overlap compositing the
        reference cannot get right, since it draws instances in storage
        order. sort_within: "auto" (order-dependent modes only, default),
        "all", or "none" (item-level ordering only).

        method="dense" (default, the fast path): when the last step ran the
        fused kernel's in-kernel render pack (single-type tile-aligned TPU
        archetypes), the instance rows are assembled from those planes at ~0
        extra device cost; otherwise the device emits full-pool planes with
        dead lanes at scale 0 — a pure elementwise pack — and the native C++
        bridge compacts live lanes while interleaving on the host. Caveat: a
        live particle whose scale curve evaluates to exactly 0 is dropped
        (it is invisible either way). method="compact" keeps the device-side
        prefix-sum compaction (exact liveness, but the scatter costs ~6 ms
        at 1M lanes) — for consumers that must see zero-scale live
        particles. Pipelined rendering should use
        render_pipeline.AsyncRenderReader instead of this synchronous call.

        view_proj (optional 4x4 view-projection matrix, WebGPU 0..1 clip-z
        convention) enables frustum culling: spawners whose world-space AABB
        (the step kernel's pos±scale reduction, SURVEY §2 #22) lies wholly
        outside the frustum are skipped before any packing work — the
        reference gets the same behavior from Bevy's culling of the
        `update_aabbs` box (`render.rs:677-703`). The test is conservative
        (never drops a visible system).

        view_layers (optional bitmask): only spawners whose RenderLayers
        mask intersects it are returned — the reference's per-view layer
        filter (`render.rs:503-506`). None = all layers (single-view)."""
        from .native import compact_dense
        from .render import aabb_intersects_frustum, frustum_planes, pack_instances_dense

        self._render_demand = True  # pack in-kernel from the next step on
        cull_planes = frustum_planes(view_proj) if view_proj is not None else None
        items = []
        for sid, slot in self._spawners.items():
            if view_layers is not None and not (slot.layers & view_layers):
                continue
            if cull_planes is not None:
                box = self.aabb(sid, space="world")
                if box is not None and not aabb_intersects_frustum(box[0], box[1], cull_planes):
                    continue
            for t in range(slot.compiled.num_types):
                if method == "dense" and slot.render_planes is not None and t == 0:
                    rows = planes_to_rows(slot.compiled.static, slot.state, slot.render_planes)
                    count = rows.shape[0]
                elif method == "dense":
                    inst_planes, _count = pack_instances_dense(slot.compiled.params, slot.state, t)
                    rows = compact_dense(np.asarray(inst_planes))
                    count = rows.shape[0]
                else:
                    buf, count = pack_instances(slot.compiled.params, slot.state, t)
                    count = int(count)
                    rows = np.asarray(buf[:count])
                if count == 0:
                    continue
                uniform = make_uniform(slot.compiled, t)
                if camera_pos is not None and (
                    sort_within == "all"
                    or (sort_within == "auto" and uniform.alpha_mode in ORDER_DEPENDENT_ALPHA_MODES)
                ):
                    rows = sort_instances_back_to_front(rows, camera_pos)
                items.append(
                    RenderItem(
                        spawner_id=sid,
                        type_index=t,
                        instances=rows,
                        count=count,
                        uniform=uniform,
                        textures=slot.compiled.textures[t],
                        layers=slot.layers,
                    )
                )
        if camera_pos is not None:
            cam = np.asarray(camera_pos, np.float32).reshape(3)

            def _dist2(item):
                o = np.asarray(
                    self._spawners[item.spawner_id].global_transform.translation,
                    np.float32,
                ) - cam
                return -float(o @ o)

            items.sort(key=_dist2)
        return items

    # ------------------------------------------------- pipelined (async) render
    def enable_async_render(self, n_slots: int = 3):
        """Switch the render extract to the pipelined path: every step()
        dispatches the instance pack asynchronously and a background reader
        thread drains it into native C++ instance rings
        (render_pipeline.AsyncRenderReader), so the device->host transfer
        overlaps the NEXT frame's compute — the analog of Bevy's pipelined
        extract (`render.rs:52-54`: render world draws frame N-1 while the
        main world simulates N). Consume via render_async()/release_async().
        Contract: items are up to one frame stale (latest-wins; a slow
        consumer skips frames, never blocks the simulation)."""
        self._async_enabled = True
        self._render_demand = True
        self._async_slots = int(n_slots)
        for sid in self._spawners:
            self._async_reader_for(sid)

    def disable_async_render(self):
        self.release_async()
        self._async_enabled = False
        for reader in self._async_readers.values():
            reader.close()
        self._async_readers.clear()
        self._async_seen_fid.clear()

    def _async_reader_for(self, sid: int):
        reader = self._async_readers.get(sid)
        if reader is None:
            from .render_pipeline import AsyncRenderReader

            slot = self._spawners[sid]
            reader = AsyncRenderReader(
                slot.capacity, slot.compiled.num_types, n_slots=self._async_slots
            )
            self._async_readers[sid] = reader
        return reader

    def _async_submit_all(self):
        """Enqueue this frame's (still on-device) pack results; non-blocking
        — jax dispatch is async, the reader thread pays the transfer."""
        self._async_frame_id += 1
        fid = self._async_frame_id
        for sid, slot in self._spawners.items():
            reader = self._async_reader_for(sid)
            if slot.render_planes is not None and slot.compiled.num_types == 1:
                # in-kernel pack rode the step kernel: zero extra dispatch
                reader.submit_packed(slot.compiled.static, slot.state,
                                     slot.render_planes, fid)
            else:
                reader.submit(slot.compiled.params, slot.state, fid)

    def render_async(self, view_layers: Optional[int] = None) -> List[RenderItem]:
        """Drain the newest READY frame per (spawner x type) from the native
        rings without blocking on the device: returns instantly with
        whatever the reader thread has finished (usually frame N-1 while
        frame N computes; possibly empty right after the first step).
        Each simulation frame is delivered at most ONCE per (spawner x
        type) and frame ids are strictly increasing (latest-wins: a slow
        consumer skips frames; an empty result means nothing newer than
        what was already delivered — keep drawing the last upload).
        item.frame_id says which step() each buffer belongs to. The
        returned arrays are zero-copy views into ring slots — call
        release_async() when done uploading/drawing (acquiring again
        without releasing is safe but holds slots, shrinking the ring)."""
        self.release_async()
        items = []
        for sid, slot in self._spawners.items():
            if view_layers is not None and not (slot.layers & view_layers):
                continue
            reader = self._async_readers.get(sid)
            if reader is None:
                continue
            for t in range(slot.compiled.num_types):
                got = reader.acquire(t)
                if got is None:
                    continue
                buf, fid = got
                self._async_acquired.append((reader, t))
                if fid <= self._async_seen_fid.get((sid, t), 0):
                    continue  # older ready slot lingering after a newer one
                self._async_seen_fid[(sid, t)] = fid
                if buf.shape[0] == 0:
                    continue
                items.append(RenderItem(
                    spawner_id=sid,
                    type_index=t,
                    instances=buf,
                    count=buf.shape[0],
                    uniform=make_uniform(slot.compiled, t),
                    textures=slot.compiled.textures[t],
                    frame_id=fid,
                    layers=slot.layers,
                ))
        return items

    def release_async(self):
        """Release ring slots acquired by the last render_async() (views
        become invalid; the reader can overwrite those slots again)."""
        for reader, t in self._async_acquired:
            reader.release(t)
        self._async_acquired = []

    def trail_items(self, camera_pos=None,
                    view_layers: Optional[int] = None) -> List["TrailItem"]:
        """Drain ribbon-trail segments for every trailed spawner: one item
        per (spawner x non-empty type) carrying dense [count, 16] f32
        segment records (trails.py module docstring for the layout), live
        segments compacted by the native bridge. camera_pos sorts segments
        back-to-front within non-commutative-blend items (midpoint key) —
        ribbons are alpha-composited like particles.

        Trail items are intentionally NOT frustum-culled: the step kernel's
        AABB covers live particle positions only (pos±scale), not the trail
        history, so culling ribbons by that box could drop visible segments
        trailing behind an off-box spawner. Consumers needing culling should
        test segment bounds themselves (or inflate the spawner box by
        trail length)."""
        from .native import compact_dense
        from .trails import TrailItem, pack_trail_segments, sort_segments_back_to_front

        items = []
        for sid, slot in self._spawners.items():
            if slot.trail_settings is None:
                continue
            if view_layers is not None and not (slot.layers & view_layers):
                continue
            for t in range(slot.compiled.num_types):
                planes, _n = pack_trail_segments(
                    slot.trail_settings, slot.compiled.params, slot.state,
                    slot.trail_state, t,
                )
                rows = compact_dense(np.asarray(planes))
                if rows.shape[0] == 0:
                    continue
                uniform = make_uniform(slot.compiled, t)
                if camera_pos is not None and uniform.alpha_mode in ORDER_DEPENDENT_ALPHA_MODES:
                    rows = sort_segments_back_to_front(rows, camera_pos)
                items.append(TrailItem(
                    spawner_id=sid, type_index=t, segments=rows,
                    count=rows.shape[0], uniform=uniform, layers=slot.layers,
                ))
        return items
