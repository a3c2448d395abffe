"""The per-frame simulation step: spawn -> integrate -> notify.

One jit-compiled function reproduces the reference's main-world system chain
for a single spawner (`/root/reference/src/plugin.rs:46-60`):

  spawn_particles     (`/root/reference/src/core.rs:367-551`)
  update_particles    (`core.rs:577-670`, op order in SURVEY.md §A.4)
  notify_finished     (`core.rs:674-688`)
  update_aabbs        (`/root/reference/src/render.rs:677-703`)

Mechanism differences from the reference (behaviour preserved):
  * Dead particles are masked lanes; spawning claims dead slots by exclusive
    prefix-sum rank over the dead mask instead of Vec::push.
  * Emitters are processed sequentially at *trace* time (E is static), so a
    nested emitter sees particles pushed by earlier emitters this frame —
    exactly the reference's in-order iteration. Newly-pushed parents get
    count 0 from the cadence math and their `last_emitted_age` advanced from
    f32::MIN, as in the reference.
  * Randomness: jax threefry uniforms per (frame, emitter); distribution
    parity, not bitstream parity (SURVEY.md §7 hard part 2).
  * Pool overflow: if fewer dead slots than requested spawns, the overflow is
    dropped (capacity is an explicit knob; the reference's Vec grows
    unboundedly instead).

PERF (TPU): every per-particle quantity stays a separate [N] f32 array —
vectors/quats/colors are never materialized as [N, 3/4] arrays, whose tiny
minor dim would pad to the 128-lane tile (~40x bloat; measured ~10x slowdown
on the color-gradient gathers alone). Quaternion math, samplers and curve
lookups all use the component-split forms.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .cadence import compute_emission_count, emission_next_last
from .colliders import ColliderTable
from .collision import particle_collision
from .compiled import (
    MODE_GLOBAL,
    MODE_NESTED,
    PACING_ON_DEMAND,
    PACING_ONE_SHOT,
    PACING_RATE,
    SpawnerParams,
    SpawnerStatic,
)
from .curve import eval_curve_table, eval_curve_table_channels
from .emission_shape import sample_shape_comp
from .pool import FrameInput, PoolState
from .rand import sample_randf32, sample_randvec3_comp
from .utils.f32 import F32_MIN, rem_euclid
from .utils.quat import quat_from_scaled_axis_comp, quat_mul_comp, quat_rotate_comp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepOutputs:
    """Per-frame device outputs surfaced to the host."""

    alive_count: jax.Array  # int32 scalar
    alive_count_per_type: jax.Array  # [T] int32
    finished_event: jax.Array  # bool scalar: fire ParticleSpawnerFinished now
    aabb_valid: jax.Array  # bool scalar (any live particle)
    aabb_min: jax.Array  # [3] min(pos - scale) over live (render.rs:677-703)
    aabb_max: jax.Array  # [3] max(pos + scale)
    destroyed_mask: jax.Array  # [N] bool (all-False unless dump enabled)
    # Nested-emission accounting (no silent losses): children beyond the
    # per-frame child buffer are DEFERRED — their parents' cadence anchor
    # advances only by what was materialized, so they emerge next frame with
    # total counts conserved (the reference's Vec::push never drops,
    # core.rs:502-545). Children whose claim found no dead slot (pool
    # capacity overflow, an explicit knob) are DROPPED, and counted here.
    nested_deferred: jax.Array  # int32 scalar: children pushed to next frame
    nested_dropped: jax.Array  # int32 scalar: children lost to capacity


def _select_by_type(values, ptype, num_types):
    """values: [T] or [T, ...] param array; ptype: [N] int32 -> per-lane value.
    Unrolled compare-select; T is tiny so this beats a gather."""
    out = jnp.broadcast_to(values[0], ptype.shape + values.shape[1:])
    for t in range(1, num_types):
        v = jnp.broadcast_to(values[t], ptype.shape + values.shape[1:])
        m = ptype == t
        if values.ndim > 1:
            m = m.reshape(m.shape + (1,) * (values.ndim - 1))
        out = jnp.where(m, v, out)
    return out


def _eval_scalar_curve_by_type(ts, vs, n, kind, ptype, t_query, num_types):
    """Evaluate per-type scalar curve tables ([T, K]) at per-lane t."""
    out = eval_curve_table(ts[0], vs[0], n[0], kind[0], t_query)
    for ti in range(1, num_types):
        v = eval_curve_table(ts[ti], vs[ti], n[ti], kind[ti], t_query)
        out = jnp.where(ptype == ti, v, out)
    return out


def _active_flag(static: SpawnerStatic, state: PoolState):
    """`ParticleSpawnerData::active` (`core.rs:288-302`): a global emitter
    counts if enabled; a nested emitter counts only if any particle (of any
    type) exists."""
    any_particles = jnp.any(state.alive)
    active = jnp.zeros((), bool)
    for e in range(static.num_emitters):
        en = state.enabled[e]
        if static.mode_kinds[e] == MODE_NESTED:
            active = active | (en & any_particles)
        else:
            active = active | en
    return active


def _claim_and_init(
    static: SpawnerStatic,
    params: SpawnerParams,
    frame: FrameInput,
    fields: dict,
    e: int,
    n_spawn,
    uni,
    origin_pos,  # (x, y, z) scalars or [N] arrays
    origin_rot,  # (qx, qy, qz, qw) scalars or [N] arrays
    base_vel,  # (vx, vy, vz) scalars or [N] arrays
):
    """Claim `n_spawn` dead slots and initialize them for emitter `e`.

    origin_* are component tuples: scalars for global emission, gathered
    per-lane arrays for nested emission. Spawn initialization follows
    `core.rs:437-468` / SURVEY.md §A.2.

    Slot claim: const-lifetime archetypes (static.ring_claim) take the ring
    window [cursor, cursor+n) mod N — an iota compare, no prefix sum — and
    advance the cursor; otherwise the classic dead-rank prefix claim. Both
    are masked by `dead`, so overflow drops instead of trampling live lanes.
    """
    alive = fields["alive"]
    dead = ~alive
    n = alive.shape[0]
    if static.ring_claim:
        idx = jnp.arange(n, dtype=jnp.int32)
        dist = jnp.mod(idx - fields["ring_cursor"], n)
        spawn = dead & (dist < n_spawn)
        fields["ring_cursor"] = jnp.mod(fields["ring_cursor"] + n_spawn, n)
    else:
        di = dead.astype(jnp.int32)
        rank = jnp.cumsum(di) - di  # exclusive rank among dead slots
        spawn = dead & (rank < n_spawn)

    ti = static.particle_indices[e]

    offx, offy, offz = sample_shape_comp(params.shape_params[e], uni[0], uni[1], uni[2])
    ivx, ivy, ivz = sample_randvec3_comp(params.ivel_params[e], uni[3], uni[4], uni[5])
    radial = sample_randf32(uni[6], params.radial_lo[e], params.radial_hi[e])

    l2 = offx * offx + offy * offy + offz * offz
    inv = jnp.where(l2 > 0, 1.0 / jnp.sqrt(l2), 0.0)  # normalize_or_zero
    rvx, rvy, rvz = offx * inv * radial, offy * inv * radial, offz * inv * radial

    orx, ory, orz, orw = origin_rot
    wvx, wvy, wvz = quat_rotate_comp(orx, ory, orz, orw, ivx, ivy, ivz)
    spd = frame.modifier_speed
    inh = params.inherit[e]
    velx = spd * (wvx + rvx) + inh * base_vel[0]
    vely = spd * (wvy + rvy) + inh * base_vel[1]
    velz = spd * (wvz + rvz) + inh * base_vel[2]

    init_scale = sample_randf32(uni[7], params.initial_scale_lo[ti], params.initial_scale_hi[ti]) * frame.modifier_scale

    def w(name, new):
        fields[name] = jnp.where(spawn, new, fields[name])

    w("px", origin_pos[0] + offx); w("py", origin_pos[1] + offy); w("pz", origin_pos[2] + offz)
    w("vx", velx); w("vy", vely); w("vz", velz)
    # Elided fields are pool-wide invariants (identity quat / zero angvel /
    # constant lifetime, see compiled.SpawnerStatic): the values these writes
    # would store are already in the arrays, so skip the (XLA-kernel-costly)
    # masked writes. Draw shapes stay (12, N) so the threefry stream — and
    # with it trajectory parity vs the oracle — is unchanged.
    if not static.elide_rotation:
        avx, avy, avz = sample_randvec3_comp(params.iangvel_params[e], uni[9], uni[10], uni[11])
        w("qx", params.init_rot[e, 0]); w("qy", params.init_rot[e, 1])
        w("qz", params.init_rot[e, 2]); w("qw", params.init_rot[e, 3])
        w("wx", avx); w("wy", avy); w("wz", avz)
    w("initial_scale", init_scale)
    w("age", 0.0)
    if static.const_lifetime is None:
        w("lifetime", sample_randf32(uni[8], params.lifetime_lo[ti], params.lifetime_hi[ti]))
    if not static.single_type:
        fields["ptype"] = jnp.where(spawn, ti, fields["ptype"])
    # last_emitted_age = f32::MIN for every emitter (core.rs:467)
    fields["last_emitted"] = jnp.where(spawn[None, :], F32_MIN, fields["last_emitted"])
    fields["alive"] = alive | spawn
    return spawn


# Static size of the per-emitter-per-frame nested child buffer: the
# two-stage spawn works in a compact [M] buffer (gathers/scatters sized by
# M, not the pool), so M bounds the per-frame gather work, not the feature.
# 4096/emitter/frame = ~245k children/s at 60 FPS. Overflowing children are
# NOT lost: their parents' cadence anchor advances only by what was
# materialized (cadence.emission_next_last), so the remainder re-emerges on
# subsequent frames — conservation matches the reference's unbounded
# Vec::push (core.rs:502-545) up to a frame of latency, reported per frame
# in StepOutputs.nested_deferred. Caveat: every truncated re-anchoring is
# an f32 round-trip, so under sustained buffer pressure a parent can lose
# at most its FINAL child to rounding at the emission-window boundary —
# the same off-by-one class the reference's own cadence conservation test
# tolerates (core.rs:830-834); fuzz-tested in
# tests/test_nested.py::test_fuzz_nested_buffer_conservation.
MAX_NESTED_SPAWN_PER_FRAME = 4096

# Testing seam: force the M-update scatter write-back even where the ring
# double-window path applies, so equivalence of the two formulations can be
# checked ON TPU (tools/fused_parity_tpu.py check_nested_ring_window).
_FORCE_SCATTER_WRITEBACK = False
# Perf seam: MXU one-hot row fetch inside _monotone_inverse (A/B-able
# in-process; both formulations are exact).
_ONEHOT_INVERSE = True
# Perf-ablation seam (tools/nested_hybrid_ablation_tpu.py): names of nested
# stages to stub out when TIMING the hybrid chain — stubs break semantics
# (they keep shapes and dataflow so nothing dead-code-eliminates) and must
# stay empty in production. Recognized: "inverse", "gather", "rng" (here)
# and "cadence", "preshift", "kmerge" (ops/fused_step.py). ("lewin" is
# retired: the merge branch's last_emitted windows were proven redundant
# under the lazy reset and removed.)
_ABLATE: frozenset = frozenset()


def _monotone_inverse(cum, m: int):
    """Scatter-free inverse of a non-decreasing int array: for each query
    r = 0..m-1, the index of the first lane with cum > r, i.e.
    p(r) = #(cum[i] <= r).

    XLA TPU scatters serialize over their updates (~1 ms for pool-sized
    update vectors, measured in tools/nested_ablation_tpu.py — the sorted /
    unique hints change nothing), so the rank→parent and rank→dead-slot maps
    are computed as block two-level COUNTS instead: a coarse count over the
    128-lane block maxima plus a fine count inside the one straddled block
    (one [m, 128] row gather). Pure compares/reduces/gathers — no scatter."""
    n = cum.shape[0]
    B = 128
    if n % B != 0:  # small/odd pools: pad with +inf sentinels (never counted)
        pad = B - n % B
        cum = jnp.concatenate([cum, jnp.full((pad,), jnp.iinfo(cum.dtype).max, cum.dtype)])
        n += pad
    nb = n // B
    blocks = cum.reshape(nb, B)
    block_max = blocks[:, -1]  # non-decreasing
    r = jnp.arange(m, dtype=cum.dtype)
    nfull = jnp.sum((block_max[None, :] <= r[:, None]).astype(jnp.int32), axis=1)
    sel = jnp.minimum(nfull, nb - 1)
    if jax.default_backend() == "tpu" and _ONEHOT_INVERSE:
        # row fetch on the MXU instead of XLA's ~36 ns/index gather: a
        # one-hot matmul selects exactly one row per output (a single v*1.0
        # product — no accumulation), and the 16-bit split makes the
        # int32 -> f32 round-trip exact for ANY value (each half < 2^16).
        oh = jax.nn.one_hot(sel, nb, dtype=jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        lo = jnp.einsum("mn,nb->mb", oh, (blocks & 0xFFFF).astype(jnp.float32), precision=hp)
        hi = jnp.einsum("mn,nb->mb", oh, (blocks >> 16).astype(jnp.float32), precision=hp)
        blk = (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)
    else:
        blk = jnp.take(blocks, sel, axis=0)  # [m, B]
    fine = jnp.sum((blk <= r[:, None]).astype(jnp.int32), axis=1)
    return nfull * B + jnp.where(nfull < nb, fine, 0)


def nested_child_field_rows(static) -> tuple:
    """The child-buffer row order shared by _nested_spawn's write-back and
    the fused kernel's in-kernel merge (ops/fused_step.py): exactly the f32
    fields a nested spawn writes, elided fields excluded."""
    names = ["px", "py", "pz", "vx", "vy", "vz"]
    if not static.elide_rotation:
        names += ["qx", "qy", "qz", "qw", "wx", "wy", "wz"]
    names += ["initial_scale", "age"]
    if static.const_lifetime is None:
        names.append("lifetime")
    return tuple(names)


def nested_parent_fields(static) -> tuple:
    """The parent-state fields a nested spawn reads (core.rs:502-518):
    position, velocity, and — unless elided pool-wide — rotation. Shared by
    _nested_spawn's gather and the cadence kernel's in-kernel parent fetch
    (ops/fused_step.nested_cadence_pass parent_fields)."""
    if static.elide_rotation:
        return ("px", "py", "pz", "vx", "vy", "vz")
    return ("px", "py", "pz", "qx", "qy", "qz", "qw", "vx", "vy", "vz")


def _nested_spawn(static, params, frame, fields, e, counts, cum, total, frame_key,
                  merge_out=None, parent_vals=None):
    """Nested emission, two-stage (SURVEY.md #9), gather-light & scatter-light.

    Stage 1 (rank space): map each child rank to its parent slot and to the
    dead slot it claims, both via the scatter-free monotone inverse.
    Stage 2 (compact [M] child buffer): gather all parent state with ONE
    stacked gather sized by M, initialize children there, and write back with
    ONE stacked M-update scatter — no pool-sized gathers or scatter-update
    vectors anywhere.

    merge_out (hybrid fast path, ring archetypes on TPU): instead of writing
    the child f32 rows / alive / ptype into the pool here, append a payload
    (child buffer + window scalars) for the fused kernel to merge per tile
    — the kernel already streams every pool field, so the merge removes the
    XLA stage's pool-sized write-backs and claim-mask passes entirely. The
    buffer is pre-shifted by (cursor mod 128) so every kernel tile reads its
    children with a 128-row-ALIGNED dynamic slice (rank and tile origin are
    congruent mod 128; no in-kernel gather or lane rotate needed).
    last_emitted / ring_cursor / dropped accounting stay here either way.

    parent_vals (merge fast path, 128-aligned M): name -> [M] parent state
    already fetched tile-locally by the cadence kernel — skips the
    rank->parent monotone inverse and the pool-wide one-hot gathers here
    entirely (together ~half the nested premium, docs/PERF_NOTES.md)."""
    N = fields["alive"].shape[0]
    M = min(static.nested_m, N)
    ti = static.particle_indices[e]

    # --- rank space ---------------------------------------------------------
    dead = ~fields["alive"]
    di = dead.astype(jnp.int32)

    n_spawn = jnp.minimum(total, M)
    if parent_vals is None:
        # child rank -> parent slot: first lane whose inclusive count-cumsum
        # exceeds the rank (zero-count lanes never win: their cum equals their
        # predecessor's, which is <= r whenever they'd be considered)
        if "inverse" in _ABLATE:  # timing stub: keep cum consumed, skip it
            parent_for_rank = jnp.arange(M, dtype=jnp.int32) + jnp.minimum(cum[-1], 0)
        else:
            parent_for_rank = _monotone_inverse(cum, M)
        child_parent = jnp.clip(parent_for_rank, 0, N - 1)

    # child rank -> pool slot. Ring archetypes (const lifetime): the r-th
    # child takes slot (cursor + r) mod N — pure index math, no dead-rank
    # cumsum or inverse; a ring slot that is somehow still alive (overflow)
    # drops its child via an M-sized dead-check gather. Otherwise: the r-th
    # child claims the r-th dead slot via the scatter-free monotone inverse.
    # Either way the f32 write-back is a scatter with only M (=4096) updates —
    # XLA TPU scatters serialize over their UPDATE count, so M-sized updates
    # are cheap while pool-sized ones cost ~1 ms. The bool/int/2D side
    # (alive, ptype, last_emitted) stays as claimed-mask wheres: measured on
    # v5e, non-f32 scatters are ~4x slower than the masked form
    # (f32-scatter+mask-rest 0.62 ms vs all-scatter 1.38 vs all-gather 1.09
    # on the nested stress).
    rank_ids = jnp.arange(M, dtype=jnp.int32)
    if static.ring_claim:
        cursor = fields["ring_cursor"]
        slot_raw = jnp.mod(cursor + rank_ids, N)
        # ring slots are contiguous mod N, so the dead-status fetch is a
        # dynamic slice of a wrap-padded copy, not an [M] gather
        target_dead = jax.lax.dynamic_slice(
            jnp.concatenate([di, di[:M]]), (cursor,), (M,)) != 0
        slot = jnp.where((rank_ids < n_spawn) & target_dead, slot_raw, N)
        idx = jnp.arange(N, dtype=jnp.int32)
        claimed = dead & (jnp.mod(idx - cursor, N) < n_spawn)
        fields["ring_cursor"] = jnp.mod(cursor + n_spawn, N)
        dropped = n_spawn - jnp.sum(((rank_ids < n_spawn) & target_dead).astype(jnp.int32))
    else:
        dead_cum = jnp.cumsum(di)
        dead_rank = dead_cum - di  # exclusive, for the mask side
        claimed = dead & (dead_rank < n_spawn)
        slot_for_rank = _monotone_inverse(dead_cum, M)  # r-th dead slot, or N
        slot = jnp.where(rank_ids < n_spawn, slot_for_rank, N)  # N => dropped
        dropped = n_spawn - jnp.minimum(n_spawn, dead_cum[-1])  # no dead slot left

    # --- gather parent state: one stacked gather sized by M ------------------
    # With rotation elided, parent rotation is identity pool-wide — skip its
    # 4 rows in the gather and the child-frame rotation below.
    pnames = nested_parent_fields(static)
    # XLA's TPU gather costs ~36 ns/index regardless of table size
    # (docs/PERF_NOTES.md); riding the MXU instead — two one-hot matmuls
    # (rows then lanes) at HIGHEST precision — is ~2x faster at M=4096 and
    # BIT-EXACT (each output is a single v*1.0 product; the bf16x3
    # decomposition reconstructs f32 products with 1.0 exactly;
    # verified array_equal vs the gather in tests/test_nested.py).
    # Per-FIELD einsums sharing the two one-hots: stacking the fields first
    # materializes a [F, N] copy (~5 MB at 131k lanes) that the einsum
    # formulation doesn't need.
    if parent_vals is not None:  # fetched tile-locally by the cadence kernel
        pg = [parent_vals[k] for k in pnames]
    elif "gather" in _ABLATE:  # timing stub: slice instead of gather
        pg = [fields[k][:M] + child_parent.astype(jnp.float32) * 1e-30 for k in pnames]
    elif jax.default_backend() == "tpu" and N % 128 == 0:
        rows_n = N // 128
        pr, pl_ = child_parent // 128, child_parent % 128
        oh_r = jax.nn.one_hot(pr, rows_n, dtype=jnp.float32)  # [M, rows]
        oh_l = jax.nn.one_hot(pl_, 128, dtype=jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        pg = [
            jnp.einsum("ml,ml->m", jnp.einsum("mr,rl->ml", oh_r,
                                              fields[k].reshape(rows_n, 128),
                                              precision=hp),
                       oh_l, precision=hp)
            for k in pnames
        ]
    else:
        pg = jnp.stack([fields[k] for k in pnames])[:, child_parent]  # [F, M]
    ppos = (pg[0], pg[1], pg[2])
    prot = None if static.elide_rotation else (pg[3], pg[4], pg[5], pg[6])
    pvel = (pg[-3], pg[-2], pg[-1])

    # --- initialize children in the [M] buffer (core.rs:506-544 semantics) ---
    # draw only the rows this archetype consumes (0-6 shape/vel/radial,
    # 7 iscale, 8 lifetime unless const, 9-11 angvel unless rotation elided)
    n_rows = 12 if not static.elide_rotation else (9 if static.const_lifetime is None else 8)
    if "rng" in _ABLATE:  # timing stub: skip the threefry draws
        uni = jnp.zeros((n_rows, M), jnp.float32)
    else:
        uni = jax.random.uniform(jax.random.fold_in(frame_key, 1000 + e), (n_rows, M), jnp.float32)
    offx, offy, offz = sample_shape_comp(params.shape_params[e], uni[0], uni[1], uni[2])
    ivx, ivy, ivz = sample_randvec3_comp(params.ivel_params[e], uni[3], uni[4], uni[5])
    radial = sample_randf32(uni[6], params.radial_lo[e], params.radial_hi[e])
    l2 = offx * offx + offy * offy + offz * offz
    inv = jnp.where(l2 > 0, 1.0 / jnp.sqrt(l2), 0.0)
    if prot is None:  # parent rotation identity (elide_rotation)
        wvx, wvy, wvz = ivx, ivy, ivz
    else:
        wvx, wvy, wvz = quat_rotate_comp(*prot, ivx, ivy, ivz)
    spd = frame.modifier_speed
    inh = params.inherit[e]
    velx = spd * (wvx + offx * inv * radial) + inh * pvel[0]
    vely = spd * (wvy + offy * inv * radial) + inh * pvel[1]
    velz = spd * (wvz + offz * inv * radial) + inh * pvel[2]
    init_scale = sample_randf32(uni[7], params.initial_scale_lo[ti], params.initial_scale_hi[ti]) * frame.modifier_scale
    zeros = jnp.zeros((M,), jnp.float32)
    rows = [
        ("px", ppos[0] + offx), ("py", ppos[1] + offy), ("pz", ppos[2] + offz),
        ("vx", velx), ("vy", vely), ("vz", velz),
    ]
    # Elided fields (identity quat / zero angvel / const lifetime) hold their
    # invariant values already — skip their rows in the gather AND the masked
    # write-back (each [N] where costs an XLA kernel; measured ~0.07 ms each
    # in the nested stress chain).
    if not static.elide_rotation:
        rot = params.init_rot[e]
        avx, avy, avz = sample_randvec3_comp(params.iangvel_params[e], uni[9], uni[10], uni[11])
        rows += [
            ("qx", jnp.full((M,), rot[0])), ("qy", jnp.full((M,), rot[1])),
            ("qz", jnp.full((M,), rot[2])), ("qw", jnp.full((M,), rot[3])),
            ("wx", avx), ("wy", avy), ("wz", avz),
        ]
    rows += [("initial_scale", init_scale), ("age", zeros)]
    if static.const_lifetime is None:
        rows.append(("lifetime", sample_randf32(uni[8], params.lifetime_lo[ti], params.lifetime_hi[ti])))
    # --- write back ----------------------------------------------------------
    # (merge_out is only passed by the hybrid fast path, which already
    # gated on backend/ring/chaining — no backend check here so interpret-
    # mode CPU tests can drive the merge kernel)
    if (merge_out is not None and static.ring_claim and N > M
            and not _FORCE_SCATTER_WRITEBACK):
        # hybrid in-kernel merge: hand the [M] child rows + window scalars to
        # the fused kernel. No last_emitted reset is needed here (the
        # reference's per-emitter f32::MIN init, core.rs:467): a merge-claimed
        # slot is dead at EVERY valid nested emitter's cadence pass this frame
        # (merging defers all pool writes to the kernel, so alive is identical
        # across the passes), and each pass's lazy reset already wrote
        # F32_MIN to its own row for dead lanes (merging implies
        # kernel_cadence + skip_global). Rows of global/invalid emitters are
        # never read and start at F32_MIN. Bit-exact vs the write-back
        # formulation's claimed-mask reset — swept on TPU
        # (tools/fused_parity_tpu.py check_nested_kernel_merge) and measured
        # ~0.018 ms/frame at the bench config (the windows ran per emitter,
        # E x 2 dynamic-update-slices each).
        merge_out.append({
            "rows": tuple(rows),           # (name, [M] f32) in child-row order
            "cursor": cursor,              # window start (pre-advance)
            "n_spawn": n_spawn,            # children claiming this frame
            "ti": int(ti),                 # particle type of the children
        })
        return dropped
    if (static.ring_claim and jax.default_backend() == "tpu" and N > M
            and not _FORCE_SCATTER_WRITEBACK):
        # Ring claims are CONTIGUOUS mod N, so the M-row scatter (which XLA
        # serializes over updates) becomes two masked dynamic-slice windows:
        # window 1 at min(cursor, N-M) covers the unwrapped ranks (child
        # values shifted into place with an M-sized concat+slice), window 2
        # at 0 covers the wrap-around ranks. Both merge against the CURRENT
        # window contents, so unclaimed/alive-target lanes keep their values
        # (exact scatter semantics, incl. the dead-target drop) and the two
        # windows compose when they overlap on small pools. Pure
        # slice/elementwise ops — measured cheaper than M-update scatters
        # per row in the chained nested bench.
        cursor0 = cursor  # pre-advance cursor captured in the claim above
        start1 = jnp.minimum(cursor0, N - M)
        shift = cursor0 - start1
        wrapped = jnp.maximum(cursor0 + M - N, 0)
        nc = N - cursor0
        p_ids = jnp.arange(M, dtype=jnp.int32)
        win1_dead = jax.lax.dynamic_slice(di, (start1,), (M,)) != 0
        rank1 = p_ids - shift
        m1 = (rank1 >= 0) & (rank1 < n_spawn) & win1_dead
        m2 = (p_ids < wrapped) & (nc + p_ids < n_spawn) & dead[:M]
        zeros_m = jnp.zeros((M,), jnp.float32)
        start2 = jnp.minimum(nc, M)
        for k, v in rows:
            f = fields[k]
            sh1 = jax.lax.dynamic_slice(jnp.concatenate([zeros_m, v]), (M - shift,), (M,))
            w1 = jax.lax.dynamic_slice(f, (start1,), (M,))
            f = jax.lax.dynamic_update_slice(f, jnp.where(m1, sh1, w1), (start1,))
            sh2 = jax.lax.dynamic_slice(jnp.concatenate([v, zeros_m]), (start2,), (M,))
            f = jax.lax.dynamic_update_slice(f, jnp.where(m2, sh2, f[:M]), (0,))
            fields[k] = f
    else:
        for k, v in rows:
            fields[k] = fields[k].at[slot].set(v, mode="drop")
    if not static.single_type:
        fields["ptype"] = jnp.where(claimed, ti, fields["ptype"])
    fields["alive"] = fields["alive"] | claimed
    # last_emitted_age = f32::MIN for every emitter (core.rs:539-542)
    fields["last_emitted"] = jnp.where(claimed[None, :], F32_MIN, fields["last_emitted"])
    return dropped


def _spawn_phase(
    static: SpawnerStatic,
    params: SpawnerParams,
    state: PoolState,
    frame: FrameInput,
    skip_global: bool = False,
    kernel_cadence: bool = False,
    nested_merge: bool = False,
    nested_carry=None,
):
    """spawn_particles (`core.rs:367-551`) on the SoA pool: all emitters in
    order (global claim-and-init + nested two-stage). Returns the post-spawn
    field dict plus the advanced cadence/bookkeeping scalars; shared by the
    XLA `step` and the hybrid fused path (`ops.fused_step.fused_step_hybrid`,
    which runs this prelude then integrates in the Pallas kernel).

    skip_global: leave global emitters entirely to the caller (the hybrid
    fast path runs them in-kernel AFTER the nested pass). Safe inversion of
    the reference's emitter order: same-frame parents always get emission
    count 0 (cadence from age=0 vs last=F32_MIN) and their last_emitted
    advance from F32_MIN is idempotent, so nested emitters observe nothing
    from this frame's global spawns either way."""
    N = state.capacity
    E = static.num_emitters
    dt = frame.dt

    active = _active_flag(static, state)
    new_key, frame_key = jax.random.split(state.rng_key)

    fields = {
        "px": state.px, "py": state.py, "pz": state.pz,
        "vx": state.vx, "vy": state.vy, "vz": state.vz,
        "qx": state.qx, "qy": state.qy, "qz": state.qz, "qw": state.qw,
        "wx": state.wx, "wy": state.wy, "wz": state.wz,
        "initial_scale": state.initial_scale,
        "age": state.age, "lifetime": state.lifetime,
        "ptype": state.ptype, "alive": state.alive,
        "last_emitted": state.last_emitted,
        "ring_cursor": state.ring_cursor,
    }
    time_in_cycle = state.time_in_cycle
    last_emission = state.last_emission
    enabled = state.enabled
    manual_queued = state.manual_queued
    nested_deferred = jnp.zeros((), jnp.int32)
    nested_dropped = jnp.zeros((), jnp.int32)
    # hybrid in-kernel merge payloads (only the kernel-cadence fast path
    # fills this; None keeps _nested_spawn on the in-place write-back)
    merge_payloads = [] if nested_merge else None

    # Spawn origin per SpawnTransformMode (`core.rs:432-435`): the host passes
    # whichever transform applies in frame.transform_*.
    g_pos = tuple(frame.transform_translation[i] for i in range(3))
    g_rot = tuple(frame.transform_rotation[i] for i in range(4))
    g_vel = tuple(frame.parent_velocity[i] for i in range(3))

    # ------------------------------------------------------------------ spawn
    for e in range(E):
        gate = active & enabled[e]

        if static.mode_kinds[e] == MODE_GLOBAL:
            if skip_global:
                continue  # handled in-kernel by the hybrid fast path
            uni = jax.random.uniform(jax.random.fold_in(frame_key, e), (12, N), jnp.float32)
            pk = static.pacing_kinds[e]
            if pk == PACING_ONE_SHOT:
                n_spawn = jnp.where(gate, params.count[e].astype(jnp.int32), 0)
                # emitter disables itself after the burst (core.rs:397-400)
                enabled = enabled.at[e].set(enabled[e] & ~gate)
            elif pk == PACING_ON_DEMAND:
                n_spawn = jnp.where(gate, manual_queued, 0)
                manual_queued = jnp.where(gate, 0, manual_queued)
            else:  # PACING_RATE / CountOverDuration (core.rs:406-427)
                tic = rem_euclid(time_in_cycle[e] + dt, params.duration[e])
                cnt, next_last = compute_emission_count(
                    tic, last_emission[e], params.duration[e],
                    params.off_start[e], params.off_end[e], params.count[e],
                )
                n_spawn = jnp.where(gate, cnt, 0)
                time_in_cycle = time_in_cycle.at[e].set(jnp.where(gate, tic, time_in_cycle[e]))
                last_emission = last_emission.at[e].set(jnp.where(gate, next_last, last_emission[e]))

            _claim_and_init(
                static, params, frame, fields, e, n_spawn, uni,
                origin_pos=g_pos, origin_rot=g_rot, base_vel=g_vel,
            )
        else:
            # Nested (core.rs:471-546); invalid pacing combos are skipped with
            # a host-side warning (core.rs:481-484) at compile time.
            if not static.nested_valid[e]:
                continue
            target = static.target_types[e]
            M = min(static.nested_m, N)
            if kernel_cadence:
                # whole per-parent cadence + count cumsum in ONE Pallas pass
                # (bit-exact with the XLA branch below; hybrid fast path).
                # When the in-kernel merge will consume the children, the
                # same pass also fetches each rank's parent state tile-
                # locally (gate mirrors _nested_spawn's merge branch).
                # nested_carry (fold fast path, chains only): the SAME
                # values, already computed by the PREVIOUS frame's kernel
                # epilogue on the identical post-frame state
                # (ops.fused_step._make_kernel nested_fold) — skip the pass.
                from .ops.fused_step import nested_cadence_pass

                if nested_carry is not None:
                    new_le, total, pvals = nested_carry[e]
                    cum = None
                else:
                    fetch = None
                    if (merge_payloads is not None and static.ring_claim
                            and N > M and not _FORCE_SCATTER_WRITEBACK
                            and M % 128 == 0):
                        fetch = {k: fields[k] for k in nested_parent_fields(static)}
                    new_le, cum, total, pvals = nested_cadence_pass(
                        static, params, e, fields["alive"], fields["ptype"],
                        fields["age"], fields["lifetime"], fields["last_emitted"][e],
                        gate, skip_global, M, parent_fields=fetch,
                    )
                nested_deferred = nested_deferred + (total - jnp.minimum(total, M))
                fields["last_emitted"] = fields["last_emitted"].at[e].set(new_le)
                nested_dropped = nested_dropped + _nested_spawn(
                    static, params, frame, fields, e, None, cum, total, frame_key,
                    merge_out=merge_payloads, parent_vals=pvals,
                )
                continue
            parent_mask = fields["alive"] & (fields["ptype"] == target) & gate
            base_le = fields["last_emitted"][e]
            if skip_global:
                # Fast-path lazy reset (replaces core.rs:467's eager reset
                # for slots the KERNEL will claim later this frame or next):
                # dead lanes' per-parent cadence anchor goes back to F32_MIN
                # here, while the lane is still dead. Every in-kernel global
                # claim passes through at least one nested pass in the dead
                # state first (in-kernel claims only touch lanes dead at
                # kernel entry, and deaths happen after the claim), so a
                # reclaimed slot never feeds a stale anchor to the cadence.
                # Fuses into the row write below — no extra memory traffic.
                base_le = jnp.where(fields["alive"], base_le, F32_MIN)
            counts, next_last = compute_emission_count(
                fields["age"], base_le, fields["lifetime"],
                params.off_start[e], params.off_end[e], params.count[e],
            )
            counts = jnp.where(parent_mask, counts, 0)
            cum = jnp.cumsum(counts)
            total = cum[-1]
            # Deferral (no silent losses): only children with global rank < M
            # are materialized this frame. A parent whose children were (fully
            # or partially) cut advances its cadence anchor by the number
            # actually emitted, so the remainder re-emerges next frame —
            # count-conserving, like the reference's unbounded Vec::push.
            M = min(static.nested_m, N)
            emitted = jnp.minimum(cum, M) - jnp.minimum(cum - counts, M)
            next_last = jnp.where(
                emitted < counts,
                emission_next_last(
                    base_le, fields["lifetime"],
                    params.off_start[e], params.off_end[e], params.count[e],
                    emitted,
                ),
                next_last,
            )
            nested_deferred = nested_deferred + (total - jnp.minimum(total, M))
            fields["last_emitted"] = fields["last_emitted"].at[e].set(
                jnp.where(parent_mask, next_last, base_le)
            )
            nested_dropped = nested_dropped + _nested_spawn(
                static, params, frame, fields, e, counts, cum, total, frame_key
            )

    stats = (nested_deferred, nested_dropped)
    if nested_merge:
        return (fields, enabled, time_in_cycle, last_emission, manual_queued,
                new_key, stats, merge_payloads)
    return fields, enabled, time_in_cycle, last_emission, manual_queued, new_key, stats


def step(
    static: SpawnerStatic,
    params: SpawnerParams,
    colliders: Optional[ColliderTable],
    state: PoolState,
    frame: FrameInput,
):
    """Advance one spawner's pool by one frame. Pure function; jit over
    (static, collider kinds) as the compile key."""
    E = static.num_emitters
    T = static.num_types
    dt = frame.dt

    fields, enabled, time_in_cycle, last_emission, manual_queued, new_key, spawn_stats = _spawn_phase(
        static, params, state, frame
    )

    # -------------------------------------------------------------- integrate
    alive0 = fields["alive"]
    ptype = fields["ptype"]
    age_new = fields["age"] + dt
    dead_by_age = age_new >= fields["lifetime"]
    age_pct = age_new / fields["lifetime"]

    # Gather-free scale-curve eval (same unrolled compare-select the fused
    # kernel uses — (kind, n) are compile-time constants): the jnp.take form
    # costs ~36 ns/index on TPU, a full-pool gather tax per frame. Bit-equal
    # math (identical clamp/floor/lerp), verified by goldens + the sweep.
    from .ops.fused_step import _eval_curve_static

    k0, n0 = static.scale_curve_meta[0]
    scale_factor = _eval_curve_static(params.scale_ts[0], params.scale_vs[0], k0, n0, age_pct)
    for t in range(1, T):
        kt, nt = static.scale_curve_meta[t]
        sft = _eval_curve_static(params.scale_ts[t], params.scale_vs[t], kt, nt, age_pct)
        scale_factor = jnp.where(ptype == t, sft, scale_factor)
    scale_new = fields["initial_scale"] * scale_factor

    vx, vy, vz = fields["vx"], fields["vy"], fields["vz"]
    px, py, pz = fields["px"], fields["py"], fields["pz"]
    if static.any_collision and colliders is not None and colliders.count > 0:
        restitution = _select_by_type(params.restitution, ptype, T)
        friction = _select_by_type(params.friction, ptype, T)
        destroy_flag = _select_by_type(params.destroy_on_collision, ptype, T)
        lane_mask = _select_by_type(params.collision_mask, ptype, T)
        cpx, cpy, cpz, cvx, cvy, cvz, cdestroy = particle_collision(
            colliders, px, py, pz, vx, vy, vz, dt, restitution, friction, destroy_flag, lane_mask
        )
        has_col = jnp.zeros_like(alive0)
        for t in range(T):
            if static.collision_types[t]:
                has_col = has_col | (ptype == t)
        npx = jnp.where(has_col, cpx, px + vx * dt)
        npy = jnp.where(has_col, cpy, py + vy * dt)
        npz = jnp.where(has_col, cpz, pz + vz * dt)
        nvx = jnp.where(has_col, cvx, vx)
        nvy = jnp.where(has_col, cvy, vy)
        nvz = jnp.where(has_col, cvz, vz)
        should_destroy = has_col & cdestroy
    else:
        npx, npy, npz = px + vx * dt, py + vy * dt, pz + vz * dt
        nvx, nvy, nvz = vx, vy, vz
        should_destroy = jnp.zeros_like(alive0)

    moved = alive0 & ~dead_by_age  # lanes that execute the move (A.4 step 3)
    survivor = moved & ~should_destroy

    ax = _select_by_type(params.acceleration[:, 0], ptype, T)
    ay = _select_by_type(params.acceleration[:, 1], ptype, T)
    az = _select_by_type(params.acceleration[:, 2], ptype, T)
    ff = frame.force_fields
    if ff is not None and len(ff.kinds) > 0:
        # scene force fields (beyond the reference; force_fields.py): add
        # onto the per-type constant accel, evaluated at the post-move
        # position, before drag — the A.4 op order with position-dependent
        # acceleration
        from .force_fields import field_accel

        ffx, ffy, ffz = field_accel(
            ff.kinds, jnp.asarray(ff.position), jnp.asarray(ff.axis),
            jnp.asarray(ff.params), jnp.asarray(ff.active).reshape(-1, 1),
            npx, npy, npz,
        )
        fm = _select_by_type(params.field_mask, ptype, T)  # per-type opt-out
        ax, ay, az = ax + fm * ffx, ay + fm * ffy, az + fm * ffz
    lin_drag = _select_by_type(params.linear_drag, ptype, T)
    aax = _select_by_type(params.angular_acceleration[:, 0], ptype, T)
    aay = _select_by_type(params.angular_acceleration[:, 1], ptype, T)
    aaz = _select_by_type(params.angular_acceleration[:, 2], ptype, T)
    ang_drag = _select_by_type(params.angular_drag, ptype, T)

    # semi-implicit drag on the post-bounce velocity (A.4 step 5)
    dvx = nvx + (ax - nvx * lin_drag) * dt
    dvy = nvy + (ay - nvy * lin_drag) * dt
    dvz = nvz + (az - nvz * lin_drag) * dt

    wx, wy, wz = fields["wx"], fields["wy"], fields["wz"]
    sqx, sqy, sqz, sqw = quat_from_scaled_axis_comp(wx * dt, wy * dt, wz * dt)
    rqx, rqy, rqz, rqw = quat_mul_comp(sqx, sqy, sqz, sqw, fields["qx"], fields["qy"], fields["qz"], fields["qw"])
    wx2 = wx + (aax - ang_drag * wx) * dt
    wy2 = wy + (aay - ang_drag * wy) * dt
    wz2 = wz + (aaz - ang_drag * wz) * dt

    # --- commit, matching exactly what the reference's per-particle clone sees
    # (scale and colors are recomputed from age at pack/event time, render.py)
    if static.derived_alive:
        # keep the derived-alive invariant (alive == age < lifetime) across
        # engine paths: collision-destroyed lanes read dead via age
        life = (jnp.float32(static.const_lifetime)
                if static.const_lifetime is not None else fields["lifetime"])
        fields["age"] = jnp.where(
            moved & should_destroy, life,
            jnp.where(alive0, age_new, fields["age"]),
        )
    else:
        fields["age"] = jnp.where(alive0, age_new, fields["age"])
    fields["px"] = jnp.where(moved, npx, fields["px"])
    fields["py"] = jnp.where(moved, npy, fields["py"])
    fields["pz"] = jnp.where(moved, npz, fields["pz"])
    fields["vx"] = jnp.where(survivor, dvx, jnp.where(moved, nvx, fields["vx"]))
    fields["vy"] = jnp.where(survivor, dvy, jnp.where(moved, nvy, fields["vy"]))
    fields["vz"] = jnp.where(survivor, dvz, jnp.where(moved, nvz, fields["vz"]))
    fields["qx"] = jnp.where(survivor, rqx, fields["qx"])
    fields["qy"] = jnp.where(survivor, rqy, fields["qy"])
    fields["qz"] = jnp.where(survivor, rqz, fields["qz"])
    fields["qw"] = jnp.where(survivor, rqw, fields["qw"])
    fields["wx"] = jnp.where(survivor, wx2, fields["wx"])
    fields["wy"] = jnp.where(survivor, wy2, fields["wy"])
    fields["wz"] = jnp.where(survivor, wz2, fields["wz"])
    fields["alive"] = survivor

    destroyed = alive0 & ~survivor
    if static.any_destroyed_dump:
        dump_mask = jnp.zeros_like(destroyed)
        for t in range(T):
            if static.destroyed_dump_types[t]:
                dump_mask = dump_mask | (destroyed & (ptype == t))
    else:
        dump_mask = jnp.zeros_like(destroyed)

    # ------------------------------------------------------ notify + aabb
    alive_new = fields["alive"]
    all_empty = ~jnp.any(alive_new)
    # re-evaluate active() on post-frame state (core.rs:678-687)
    any_particles = ~all_empty
    active_now = jnp.zeros((), bool)
    for e in range(E):
        en = enabled[e]
        if static.mode_kinds[e] == MODE_NESTED:
            active_now = active_now | (en & any_particles)
        else:
            active_now = active_now | en
    finished = all_empty & ~active_now & ~state.finished_notified
    finished_notified = state.finished_notified | finished

    # AABB over live particles: pos +- scale (render.rs:677-703). All
    # survivors received the scale update this frame, so scale == scale_new.
    s = scale_new
    inf = jnp.float32(jnp.inf)
    mins = []
    maxs = []
    for c in ("px", "py", "pz"):
        v = fields[c]
        mins.append(jnp.min(jnp.where(alive_new, v - s, inf)))
        maxs.append(jnp.max(jnp.where(alive_new, v + s, -inf)))
    aabb_min = jnp.stack(mins)
    aabb_max = jnp.stack(maxs)

    per_type = jnp.stack([jnp.sum((alive_new & (ptype == t)).astype(jnp.int32)) for t in range(T)])

    new_state = PoolState(
        px=fields["px"], py=fields["py"], pz=fields["pz"],
        vx=fields["vx"], vy=fields["vy"], vz=fields["vz"],
        qx=fields["qx"], qy=fields["qy"], qz=fields["qz"], qw=fields["qw"],
        wx=fields["wx"], wy=fields["wy"], wz=fields["wz"],
        initial_scale=fields["initial_scale"],
        age=fields["age"], lifetime=fields["lifetime"],
        ptype=fields["ptype"], alive=alive_new,
        last_emitted=fields["last_emitted"],
        time_in_cycle=time_in_cycle, last_emission=last_emission, enabled=enabled,
        manual_queued=manual_queued, finished_notified=finished_notified,
        ring_cursor=fields["ring_cursor"],
        rng_key=new_key,
    )
    outputs = StepOutputs(
        alive_count=jnp.sum(alive_new.astype(jnp.int32)),
        alive_count_per_type=per_type,
        finished_event=finished,
        aabb_valid=any_particles,
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        destroyed_mask=dump_mask,
        nested_deferred=spawn_stats[0],
        nested_dropped=spawn_stats[1],
    )
    return new_state, outputs


@partial(jax.jit, static_argnums=(0,))
def step_jit(static: SpawnerStatic, params: SpawnerParams, colliders: Optional[ColliderTable], state: PoolState, frame: FrameInput):
    return step(static, params, colliders, state, frame)


@partial(jax.jit, static_argnums=(0, 5))
def multi_step(
    static: SpawnerStatic,
    params: SpawnerParams,
    colliders: Optional[ColliderTable],
    state: PoolState,
    frame: FrameInput,
    n_frames: int,
):
    """Advance n_frames in one dispatch via lax.scan (same frame input each
    step). Amortizes host->device dispatch latency — the TPU analog of the
    reference's pipelined simulate-while-rendering (`src/render.rs:52-54`).
    Returns (final_state, outputs_of_last_frame)."""

    if n_frames < 1:
        raise ValueError("multi_step needs n_frames >= 1")

    def body(s, _):
        s2, out = step(static, params, colliders, s, frame)
        return s2, None

    final, _ = jax.lax.scan(body, state, None, length=n_frames - 1)
    return step(static, params, colliders, final, frame)
