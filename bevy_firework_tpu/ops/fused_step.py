"""Fused Pallas TPU kernel for the emission + integrate hot path.

The XLA-composed `step()` emits ~30 small kernels per frame (one per fused
where-chain); at 131k lanes that costs ~0.6 ms/frame of device time, ~12x the
HBM speed-of-light for the state touched.  This module fuses the entire
per-lane pipeline into ONE Pallas kernel pass over the pool:

  emission cadence + bookkeeping (SMEM scalars)         core.rs:395-427
  -> slot claim (ring window or dead-rank prefix)       core.rs:386-469
  -> spawn-lane init (on-core PRNG, shape/vel samplers) core.rs:437-468
  -> age/cull                                           core.rs:594-599
  -> scale curve                                        core.rs:601-605
  -> move or collide (<=4 substeps, unrolled colliders) core.rs:607-631,744-800
  -> drag, quaternion rotation, angular drag            core.rs:641-650

Division of labor:
  * XLA prelude: assemble two small scalar rows (dyn/estate) + one rng
    split. (The previous scalar-op prelude — ~46 fusions + 40 copies — was
    ~45% of a 131k-lane frame.)
  * Pallas kernel (this file): everything else, touching only the ACTIVE
    field arrays (see active_f32_fields — elided invariants never enter).
  * XLA epilogue: alive/AABB stats + the finished flag (dead-code-
    eliminated inside multi-frame scans except the finished latch).

Dispatch (`step_auto`):
  * global-only archetypes -> `fused_step`: everything in-kernel.
  * nested archetypes -> `fused_step_hybrid`: the XLA spawn phase handles
    nested emitters FIRST (cross-tile parent gathers need XLA), then the
    kernel runs the GLOBAL emitters' pipeline + integrate. The order
    inversion keeps spawn counts exact: same-frame parents always emit 0
    children, their last_emitted advance from f32::MIN is idempotent, and
    reclaimed slots get their per-parent cadence anchors lazily reset while
    dead (step._spawn_phase skip_global). Claim PRIORITY under pool
    overflow differs (nested children before globals) — both paths drop
    overflow either way. `kernel_global=False` keeps all spawning in the
    shared XLA phase for lane-exact parity testing.

Colors and scale are NOT part of pool state (see pool.PoolState docstring) —
they are recomputed from age at instance-pack time, so this kernel only
evaluates the scale curve (needed for the AABB partials).

Curve evaluation inside the kernel uses K-unrolled compare-selects on scalar
table entries instead of gathers (K = 8, T <= a few): pure VPU work.

RNG note: in-kernel spawns use the hardware PRNG stream, the XLA path uses
threefry; both draw identical distributions (SURVEY.md §7 hard part 2 needs
distribution parity only), so the paths agree exactly on deterministic
configs and statistically otherwise.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cadence import compute_emission_count
from ..colliders import ColliderTable
from ..colliders import COLLIDER_HULL
from ..collision import (
    _ray_capsule,
    _ray_cone,
    _ray_cuboid,
    _ray_cylinder,
    _ray_halfspace,
    _ray_hull,
    _ray_sphere,
)
from ..compiled import (
    MODE_GLOBAL,
    PACING_ON_DEMAND,
    PACING_ONE_SHOT,
    PACING_RATE,
    SpawnerParams,
    SpawnerStatic,
)
from ..pool import FrameInput, PoolState
from ..step import StepOutputs
from ..utils.f32 import F32_MIN, rem_euclid
from ..force_fields import field_accel
from ..utils.quat import quat_from_scaled_axis_comp, quat_mul_comp, quat_rotate_comp

LANES = 128
BLOCK_ROWS = 64  # minimum tile: 64 x 128 = 8192 lanes (the capacity granule)
BLOCK_ROWS_WIDE = 128  # preferred tile when capacity allows (measured faster)
# The looped narrow phase (kind-grouped fori_loop over SMEM collider rows,
# per-iteration broad-phase skip) engages at this many colliders; below it
# the colliders are fully unrolled (the reference stress scenes run 2-3).
# Unrolled cost grows superlinearly past C~24 (code-size scheduling blowup,
# docs/PERF_NOTES.md "Collider-count scaling"); the loop is constant-code.
LOOP_MIN_COLLIDERS = 5

# Testing seams: disable the hybrid's in-kernel nested child merge so the
# XLA write-back formulation can be A/B'd bit-exact on TPU
# (tools/fused_parity_tpu.py check_nested_kernel_merge), or force it ON
# off-TPU so interpret-mode CPU tests cover the merge kernel path.
_NESTED_KERNEL_MERGE = True
_FORCE_NESTED_MERGE_CPU = False
# Nested-cadence fold (VERDICT r4 next #3): multi-frame chains compute each
# frame's nested cadence + parent fetch in the PREVIOUS frame's kernel
# epilogue, making a steady nested frame ONE kernel + the [M] child stage.
# _NESTED_FOLD turns the chain fast path off (A/B seam);
# _FORCE_NESTED_FOLD_CPU enables it off-TPU for interpret-mode tests.
_NESTED_FOLD = True
_FORCE_NESTED_FOLD_CPU = False

_F32_FIELDS = (
    "px", "py", "pz", "vx", "vy", "vz",
    "qx", "qy", "qz", "qw", "wx", "wy", "wz",
    "initial_scale", "age", "lifetime",
)
N_SMALL = 17  # count of small leading inputs (see kernel unpack)
# dyn-row int32 slots holding each unrolled sub-frame's PRNG seed
# (dyn = [mq, cursor, seed0, anyp, seed1..seed7, pad]; max unroll 8)
_SEED_SLOTS = (2, 4, 5, 6, 7, 8, 9, 10)
MAX_UNROLL = 8
CPOS_IDX = 10  # index of cpos in the smalls list (crot/cpar/clay follow)


def active_f32_fields(static: SpawnerStatic):
    """The f32 pool fields the fused kernel actually streams for this
    archetype. Elided fields are invariant arrays (see SpawnerStatic
    elide_rotation / const_lifetime): the kernel substitutes their
    compile-time constants and passes the arrays through untouched, saving
    one HBM read + one write per field per frame — for the common
    no-rotation single-type constant-lifetime archetype (sparks/stress_test)
    that halves the step's memory traffic."""
    names = ["px", "py", "pz", "vx", "vy", "vz"]
    if not static.elide_rotation:
        names += ["qx", "qy", "qz", "qw", "wx", "wy", "wz"]
    names += ["initial_scale", "age"]
    if static.const_lifetime is None:
        names.append("lifetime")
    return tuple(names)
TWO_PI = np.float32(2.0 * np.pi)
PI = np.float32(np.pi)


def can_fuse(static: SpawnerStatic) -> bool:
    """The pallas fast path covers global-only archetypes (collision ok)."""
    return all(m == MODE_GLOBAL for m in static.mode_kinds)


def can_unroll(static: SpawnerStatic) -> bool:
    """Multi-frame in-kernel unroll (fused_step(unroll=U)): U frames per
    kernel invocation, reading/writing the pool ONCE — HBM traffic and
    launch overhead amortize U-fold in headless chains. Sound exactly where
    every cross-frame dependency lives in (fields + SMEM scalars): ring
    claims are per-lane iota-vs-cursor math (no cross-tile dead-rank carry,
    which frame 2 could never see), deaths derive from age, and no
    per-frame dump plane is emitted. Nested archetypes are excluded (their
    XLA spawn stage runs between frames)."""
    return (
        can_fuse(static)
        and static.ring_claim
        and static.derived_alive
        and not static.any_destroyed_dump
    )


def _u01(bits):
    """uint32 random bits -> f32 uniform [0, 1) from the top 24 bits.
    (mosaic has no uint32->f32 cast; after the shift the value fits in int32,
    which does cast)."""
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _prefix_exclusive(di):
    """Exclusive prefix sum over a tile in row-major lane order, via
    Hillis-Steele masked rolls (mosaic has no cumsum primitive).
    di: [R, 128] int32. Returns (exclusive, total_scalar)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, di.shape, 1)
    s = di
    sh = 1
    while sh < di.shape[1]:
        rolled = pltpu.roll(s, sh, 1)
        s = s + jnp.where(lane >= sh, rolled, 0)
        sh *= 2
    row_tot = jax.lax.broadcast_in_dim(s[:, di.shape[1] - 1], di.shape, (0,))
    row = jax.lax.broadcasted_iota(jnp.int32, di.shape, 0)
    r = row_tot
    sh = 1
    while sh < di.shape[0]:
        rolled = pltpu.roll(r, sh, 0)
        r = r + jnp.where(row >= sh, rolled, 0)
        sh *= 2
    incl = s + (r - row_tot)
    return incl - di, incl[di.shape[0] - 1, di.shape[1] - 1]


def _randvec3_row(row, u_mag, u_dev, u_azim):
    """RandVec3.generate() from a compiled 7-float row (scalars)."""
    mag = row[0] + (row[1] - row[0]) * u_mag
    a = u_dev * row[2]
    b = u_azim * TWO_PI
    sa, ca = jnp.sin(a), jnp.cos(a)
    lx, ly, lz = sa * jnp.cos(b), ca, -sa * jnp.sin(b)
    dx, dy, dz = quat_rotate_comp(row[3], row[4], row[5], row[6], lx, ly, lz)
    return mag * dx, mag * dy, mag * dz


def _shape_row(row, u0, u1, u2):
    """EmissionShape.generate_point() from a compiled 8-float row
    ([kind, radius, quat, box ey, ez] — emission_shape.compile)."""
    kind, radius = row[0], row[1]
    u = u0 * TWO_PI
    v = u1 * PI
    rr = u2 * radius
    cu = jnp.cos(u)
    sx, sy, sz = -jnp.sin(v) * cu * rr, jnp.sin(u) * rr, -jnp.cos(v) * cu * rr
    lx = rr * jnp.cos(u)
    lz = -rr * jnp.sin(u)
    # circle / ring (edge, r pinned) / box (uniform volume) share ONE
    # local->world rotation: select the local point by kind first (same
    # structure as emission_shape.sample_shape_comp — a 3-rotate fan-out
    # tripped an XLA CPU fusion anomaly on the step path)
    is_sphere = kind == 1.0
    is_circle = kind == 2.0
    is_box = kind == 3.0
    is_ring = kind == 4.0
    llx = jnp.where(is_circle, lx, jnp.where(is_ring, radius * jnp.cos(u), (u0 * 2.0 - 1.0) * radius))
    lly = jnp.where(is_box, (u1 * 2.0 - 1.0) * row[6], 0.0)
    llz = jnp.where(is_circle, lz, jnp.where(is_ring, -radius * jnp.sin(u), (u2 * 2.0 - 1.0) * row[7]))
    rx, ry, rz = quat_rotate_comp(row[2], row[3], row[4], row[5], llx, lly, llz)
    rot_sel = is_circle | is_box | is_ring
    ox = jnp.where(is_sphere, sx, jnp.where(rot_sel, rx, 0.0))
    oy = jnp.where(is_sphere, sy, jnp.where(rot_sel, ry, 0.0))
    oz = jnp.where(is_sphere, sz, jnp.where(rot_sel, rz, 0.0))
    return ox, oy, oz


def _eval_curve_static(ts, vs, kind, n, t):
    """sample_clamped specialized on the curve's compile-time (kind, n):
    a constant curve is one scalar broadcast, an n-knot curve unrolls exactly
    n-1 segments. Matches curve.curve_index_frac semantics exactly."""
    if kind == 0:  # CURVE_CONSTANT
        return jnp.full(t.shape, vs[0])
    if kind == 1:  # CURVE_EVEN: implicit knots at i/(n-1)
        x = jnp.clip(t, 0.0, 1.0) * np.float32(n - 1)
        i = jnp.clip(jnp.floor(x), 0.0, np.float32(n - 2))
        frac = x - i
        v0 = jnp.full(t.shape, vs[0])
        v1 = jnp.full(t.shape, vs[1])
        for k in range(1, n - 1):
            sel = i == k
            v0 = jnp.where(sel, vs[k], v0)
            v1 = jnp.where(sel, vs[k + 1], v1)
        return v0 + (v1 - v0) * frac
    # CURVE_UNEVEN: explicit knots ts[0..n-1]
    tun = jnp.clip(t, ts[0], ts[n - 1])
    i = jnp.zeros_like(t)
    for k in range(1, n - 1):
        i = i + (tun >= ts[k]).astype(jnp.float32)
    t0 = jnp.full(t.shape, ts[0])
    t1 = jnp.full(t.shape, ts[1])
    v0 = jnp.full(t.shape, vs[0])
    v1 = jnp.full(t.shape, vs[1])
    for k in range(1, n - 1):
        sel = i == k
        t0 = jnp.where(sel, ts[k], t0)
        t1 = jnp.where(sel, ts[k + 1], t1)
        v0 = jnp.where(sel, vs[k], v0)
        v1 = jnp.where(sel, vs[k + 1], v1)
    frac = (tun - t0) / (t1 - t0)
    return v0 + (v1 - v0) * frac


def _eval_gradient_static(ts, vs_rows, kind, n, t):
    """4-channel gradient sample sharing one index/frac computation across
    channels (each channel then costs only its v0/v1 selects + one lerp).
    vs_rows: indexable giving per-channel [K] value rows."""
    C = 4
    if kind == 0:  # CURVE_CONSTANT
        return [jnp.full(t.shape, vs_rows[c][0]) for c in range(C)]
    if kind == 1:  # CURVE_EVEN
        x = jnp.clip(t, 0.0, 1.0) * np.float32(n - 1)
        i = jnp.clip(jnp.floor(x), 0.0, np.float32(n - 2))
        frac = x - i
        sels = [i == k for k in range(1, n - 1)]
    else:  # CURVE_UNEVEN
        tun = jnp.clip(t, ts[0], ts[n - 1])
        i = jnp.zeros_like(t)
        for k in range(1, n - 1):
            i = i + (tun >= ts[k]).astype(jnp.float32)
        t0 = jnp.full(t.shape, ts[0])
        t1 = jnp.full(t.shape, ts[1])
        sels = [i == k for k in range(1, n - 1)]
        for k, sel in zip(range(1, n - 1), sels):
            t0 = jnp.where(sel, ts[k], t0)
            t1 = jnp.where(sel, ts[k + 1], t1)
        frac = (tun - t0) / (t1 - t0)
    out = []
    for c in range(C):
        vs = vs_rows[c]
        v0 = jnp.full(t.shape, vs[0])
        v1 = jnp.full(t.shape, vs[1])
        for k, sel in zip(range(1, n - 1), sels):
            v0 = jnp.where(sel, vs[k], v0)
            v1 = jnp.where(sel, vs[k + 1], v1)
        out.append(v0 + (v1 - v0) * frac)
    return out


def _ray_kind(k, ox, oy, oz, rdx, rdy, rdz, p0, p1, p2):
    """Dispatch the kind-k primitive ray test (k is compile-time static)."""
    if k == 0:
        return _ray_halfspace(ox, oy, oz, rdx, rdy, rdz)
    if k == 1:
        return _ray_sphere(ox, oy, oz, rdx, rdy, rdz, p0)
    if k == 2:
        return _ray_cuboid(ox, oy, oz, rdx, rdy, rdz, p0, p1, p2)
    if k == 3:
        return _ray_capsule(ox, oy, oz, rdx, rdy, rdz, p0, p1)
    if k == 4:
        return _ray_cylinder(ox, oy, oz, rdx, rdy, rdz, p0, p1)
    return _ray_cone(ox, oy, oz, rdx, rdy, rdz, p0, p1)


def _collider_perm(kinds, identity_rot):
    """Stable permutation grouping colliders by (kind, identity_rot) for the
    looped narrow phase. Returns (perm, permuted_kinds, permuted_identity,
    groups) with groups = ((kind, identity, start, count), ...) covering the
    permuted order contiguously."""
    order = sorted(range(len(kinds)), key=lambda i: (kinds[i], not identity_rot[i], i))
    pk = tuple(kinds[i] for i in order)
    pi = tuple(bool(identity_rot[i]) for i in order)
    return tuple(order), pk, pi, _collider_groups(pk, pi)


def _collider_groups(kinds, identity_rot):
    """Contiguous (kind, identity, start, count) runs of an already-grouped
    collider order (see _collider_perm)."""
    groups = []
    i = 0
    while i < len(kinds):
        j = i
        while j < len(kinds) and kinds[j] == kinds[i] and identity_rot[j] == identity_rot[i]:
            j += 1
        groups.append((kinds[i], bool(identity_rot[i]), i, j - i))
        i = j
    return tuple(groups)


def _collide_tile(kinds, identity_rot, cpos, crot, cpar, clay, px, py, pz, vx, vy, vz, dt,
                  restitution, friction, destroy_flag, lane_mask, participating,
                  scratch=None, loop_groups=None, cidx=None, chul=None,
                  hull_counts=()):
    """particle_collision (core.rs:744-800) on one tile; mirrors
    collision.particle_collision lane-for-lane for `participating` lanes
    (alive + collision-enabled type; other lanes' outputs are ignored by the
    caller, so they start with delta=0 and are never touched).

    Substep 1 always runs; substep 2 only executes when some lane in the
    tile still has travel budget after its first hit (a bounce continuing
    within the frame, or a lane inside a collider being pushed out), and
    substeps 3+4 only when a lane hit something AGAIN in substep 2. Skipped
    substeps are exact no-ops for every lane (delta==0 => miss/hit/inside all
    false), so the gating preserves bit-exact parity with the XLA path.

    `scratch` is 8 VMEM refs (px,py,pz,vx,vy,vz,delta f32 + flags i32) used
    to carry state across the gated regions: mosaic fails to legalize an
    scf.if yielding this many vectors (a lax.cond here died in
    tpu.vpad layout inference), so the branches are side-effecting pl.when
    blocks instead. scratch=None runs all 4 substeps straight-line.

    Narrow-phase form (chosen by the caller at C >= LOOP_MIN_COLLIDERS):

    - `loop_groups=None` (few colliders): the per-collider ray tests are
      fully unrolled; cpos/crot/cpar/clay are loaded [C, _] arrays.
      Unrolled code size grows superlinearly in cost past C~24
      (docs/PERF_NOTES.md), hence the second form.
    - `loop_groups=((kind, identity, start, count), ...)` (many colliders):
      colliders arrive PERMUTED into contiguous (kind, identity_rot) groups;
      cpos/crot/cpar/clay are SMEM refs read per-iteration by scalar index,
      and `cidx` is an SMEM [C, 1] int32 ref of each row's ORIGINAL table
      index. Each group is one lax.fori_loop whose body is gated by a
      scalar broad-phase test (the substep's active-lane AABB, expanded by
      the longest remaining ray, vs the collider's bounding volume) — a
      skipped iteration saves serial loop time, unlike the unrolled form
      where a skipped test only frees already-parallel VPU slots. Winner
      selection is the lexicographic min of (dist, original index), which
      is order-independent, so the group permutation cannot change results:
      the XLA path's first-in-table-order-wins tie rule (real ties happen —
      dist==0 for a lane inside two overlapping colliders) is preserved
      exactly. Disabled colliders (layers==0 via masked_layers) fail the
      broad phase, so toggled-off dynamic colliders cost nothing."""
    BIG = np.float32(1e30)
    orig_delta = dt
    delta = jnp.where(participating, dt, 0.0).astype(jnp.float32)
    destroyed = jnp.zeros(px.shape, bool)
    done = jnp.zeros(px.shape, bool)

    def conj_rot(qx, qy, qz, qw, x, y, z):
        return quat_rotate_comp(-qx, -qy, -qz, qw, x, y, z)

    def one_collider(ci, k, px, py, pz, dx, dy, dz):
        """Unrolled-path ray test vs collider ci (static index into loaded
        arrays): (dist or BIG, world-space normal)."""
        qx, qy, qz, qw = crot[ci, 0], crot[ci, 1], crot[ci, 2], crot[ci, 3]
        if identity_rot[ci]:
            ox, oy, oz = px - cpos[ci, 0], py - cpos[ci, 1], pz - cpos[ci, 2]
            rdx, rdy, rdz = dx, dy, dz
        else:
            ox, oy, oz = conj_rot(qx, qy, qz, qw, px - cpos[ci, 0], py - cpos[ci, 1], pz - cpos[ci, 2])
            rdx, rdy, rdz = conj_rot(qx, qy, qz, qw, dx, dy, dz)
        p0, p1, p2 = cpar[ci, 0], cpar[ci, 1], cpar[ci, 2]
        if k == COLLIDER_HULL:
            # plane-set hull rows from the chul small, sliced to the hull's
            # STATIC plane count — a 6-plane box unrolls 6 evals, not the
            # padded HULL_MAX_PLANES width
            dist, nx, ny, nz = _ray_hull(
                ox, oy, oz, rdx, rdy, rdz,
                chul[ci].reshape(-1, 4)[: hull_counts[ci]])
        else:
            dist, nx, ny, nz = _ray_kind(k, ox, oy, oz, rdx, rdy, rdz, p0, p1, p2)
        layer_ok = (lane_mask & clay[ci, 0]) != 0
        dist = jnp.where(layer_ok, dist, BIG)
        if identity_rot[ci]:
            wnx, wny, wnz = nx, ny, nz
        else:
            wnx, wny, wnz = quat_rotate_comp(qx, qy, qz, qw, nx, ny, nz)
        return dist, wnx, wny, wnz

    def substep(px, py, pz, vx, vy, vz, delta, done, destroyed):
        lane_active = (~done) & (delta > 0.0)
        speed2 = vx * vx + vy * vy + vz * vz
        speed = jnp.sqrt(speed2)
        ok = speed2 > 0.0
        inv = jnp.where(ok, 1.0 / jnp.where(speed > 0, speed, 1.0), 0.0)
        dx = jnp.where(ok, vx * inv, 0.0)
        dy = jnp.where(ok, vy * inv, 1.0)
        dz = jnp.where(ok, vz * inv, 0.0)
        max_dist = speed * delta

        if loop_groups is None:
            best = jnp.full(px.shape, BIG)
            bnx = jnp.zeros_like(px)
            bny = jnp.zeros_like(px)
            bnz = jnp.zeros_like(px)
            for ci, k in enumerate(kinds):
                dist, wnx, wny, wnz = one_collider(ci, k, px, py, pz, dx, dy, dz)
                closer = (dist <= max_dist) & (dist < best)
                bnx = jnp.where(closer, wnx, bnx)
                bny = jnp.where(closer, wny, bny)
                bnz = jnp.where(closer, wnz, bnz)
                best = jnp.where(closer, dist, best)
        else:
            # looped narrow phase: per-substep scalar AABB + reach, then one
            # fori_loop per (kind, identity) group with a lax.cond-gated body
            # carrying (best, best original index, normal)
            part = lane_active
            any_part = jnp.any(part)
            bminx = jnp.min(jnp.where(part, px, BIG))
            bmaxx = jnp.max(jnp.where(part, px, -BIG))
            bminy = jnp.min(jnp.where(part, py, BIG))
            bmaxy = jnp.max(jnp.where(part, py, -BIG))
            bminz = jnp.min(jnp.where(part, pz, BIG))
            bmaxz = jnp.max(jnp.where(part, pz, -BIG))
            reach = jnp.max(jnp.where(part, max_dist, 0.0)) * np.float32(1.001) + np.float32(0.01)

            best = jnp.full(px.shape, BIG)
            bci = jnp.full(px.shape, np.int32(2**31 - 1))
            bnx = jnp.zeros_like(px)
            bny = jnp.zeros_like(px)
            bnz = jnp.zeros_like(px)
            carry = (best, bci, bnx, bny, bnz)

            for k, ident, start, count in loop_groups:

                def body(ci, carry, k=k, ident=ident):
                    cx, cy, cz = cpos[ci, 0], cpos[ci, 1], cpos[ci, 2]
                    lay = clay[ci, 0]
                    p0, p1, p2 = cpar[ci, 0], cpar[ci, 1], cpar[ci, 2]
                    if not ident:
                        qx, qy, qz, qw = crot[ci, 0], crot[ci, 1], crot[ci, 2], crot[ci, 3]
                    # scalar broad phase: substep AABB + max reach vs the
                    # collider's bounding volume (conservative: skipped only
                    # when no lane's ray can reach it; `inside` hits imply
                    # overlap, which the AABB contains)
                    if k == 0:  # halfspace: box support distance to the plane
                        if ident:
                            near = (bminy - cy) <= reach
                        else:
                            nx_, ny_, nz_ = quat_rotate_comp(qx, qy, qz, qw, np.float32(0), np.float32(1), np.float32(0))
                            ccx, ccy, ccz = (bminx + bmaxx) * 0.5, (bminy + bmaxy) * 0.5, (bminz + bmaxz) * 0.5
                            hx, hy, hz = (bmaxx - bminx) * 0.5, (bmaxy - bminy) * 0.5, (bmaxz - bminz) * 0.5
                            signed = (ccx - cx) * nx_ + (ccy - cy) * ny_ + (ccz - cz) * nz_
                            support = jnp.abs(nx_) * hx + jnp.abs(ny_) * hy + jnp.abs(nz_) * hz
                            near = (signed - support) <= reach
                    else:
                        if k == 1:  # sphere
                            radius = p0
                        elif k == 2:  # cuboid: bounding sphere of the half-extents
                            radius = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
                        elif k == 3:  # capsule: radius + half-segment
                            radius = p0 + p1
                        elif k == COLLIDER_HULL:  # precomputed bounding radius
                            radius = p0
                        else:  # cylinder / cone
                            radius = jnp.sqrt(p0 * p0 + p1 * p1)
                        # rotation never changes an origin-centered bounding sphere
                        qx_ = jnp.clip(cx, bminx, bmaxx)
                        qy_ = jnp.clip(cy, bminy, bmaxy)
                        qz_ = jnp.clip(cz, bminz, bmaxz)
                        d2 = (cx - qx_) ** 2 + (cy - qy_) ** 2 + (cz - qz_) ** 2
                        rr = radius + reach
                        near = d2 <= rr * rr
                    cond = (lay != 0) & near & any_part

                    def hit(c, k=k, ident=ident):
                        best, bci, bnx, bny, bnz = c
                        if ident:
                            ox, oy, oz = px - cx, py - cy, pz - cz
                            rdx, rdy, rdz = dx, dy, dz
                        else:
                            ox, oy, oz = conj_rot(qx, qy, qz, qw, px - cx, py - cy, pz - cz)
                            rdx, rdy, rdz = conj_rot(qx, qy, qz, qw, dx, dy, dz)
                        if k == COLLIDER_HULL:
                            # dynamic VMEM ref row load (pl.ds) + static
                            # extracts; padded rows (n=0, d=BIG) are exact
                            # no-ops in the slab math, so the loop
                            # evaluates the table-max plane count with no
                            # count branch (VERDICT r4 next #4). KNOWN
                            # 1-2 ulp seam: with the hull-planes operand
                            # present, Mosaic FMA-fuses the SPHERE body's
                            # quadratic differently than the XLA oracle
                            # (isolated: slab+sphere drifts ~1e-7,
                            # slab+cuboid/capsule/hull all exact) — the
                            # sweep's hulls-in-loop check asserts <=2e-6
                            # with this cause documented
                            row = chul[pl.ds(ci, 1), :]
                            planes = row.reshape(-1, 4)[: max(hull_counts)]
                            dist, nx, ny, nz = _ray_hull(
                                ox, oy, oz, rdx, rdy, rdz, planes)
                        else:
                            dist, nx, ny, nz = _ray_kind(k, ox, oy, oz, rdx, rdy, rdz, p0, p1, p2)
                        layer_ok = (lane_mask & lay) != 0
                        dist = jnp.where(layer_ok, dist, BIG)
                        if ident:
                            wnx, wny, wnz = nx, ny, nz
                        else:
                            wnx, wny, wnz = quat_rotate_comp(qx, qy, qz, qw, nx, ny, nz)
                        oidx = cidx[ci, 0]
                        closer = (dist <= max_dist) & (
                            (dist < best) | ((dist == best) & (oidx < bci))
                        )
                        return (
                            jnp.where(closer, dist, best),
                            jnp.where(closer, oidx, bci),
                            jnp.where(closer, wnx, bnx),
                            jnp.where(closer, wny, bny),
                            jnp.where(closer, wnz, bnz),
                        )

                    return jax.lax.cond(cond, hit, lambda c: c, carry)

                carry = jax.lax.fori_loop(start, start + count, body, carry)
            best, _bci, bnx, bny, bnz = carry
        hit = (best <= max_dist) & lane_active
        dist = jnp.where(hit, best, 0.0)
        nx, ny, nz = bnx, bny, bnz

        inside = hit & (dist == 0.0)
        surface = hit & (dist > 0.0)
        miss = lane_active & ~hit

        n_zero = (nx == 0.0) & (ny == 0.0) & (nz == 0.0)
        v_zero = ~ok
        fnx = jnp.where(n_zero, jnp.where(v_zero, 0.0, dx), nx)
        fny = jnp.where(n_zero, jnp.where(v_zero, 1.0, dy), ny)
        fnz = jnp.where(n_zero, jnp.where(v_zero, 0.0, dz), nz)
        push = jnp.maximum(speed, 1.0) * delta
        px = jnp.where(inside, px + push * fnx, px)
        py = jnp.where(inside, py + push * fny, py)
        pz = jnp.where(inside, pz + push * fnz, pz)

        px_s = px + dx * dist
        py_s = py + dy * dist
        pz_s = pz + dz * dist
        vdotn = vx * nx + vy * ny + vz * nz
        pjx, pjy, pjz = vdotn * nx, vdotn * ny, vdotn * nz
        rjx, rjy, rjz = vx - pjx, vy - pjy, vz - pjz
        proj_len = jnp.abs(vdotn)
        rej_len2 = rjx * rjx + rjy * rjy + rjz * rjz
        rej_len = jnp.sqrt(rej_len2)
        friction_dv = jnp.minimum(proj_len, rej_len) * friction
        rinv = jnp.where(rej_len2 > 0, 1.0 / jnp.where(rej_len > 0, rej_len, 1.0), 0.0)
        nvx = rjx - friction_dv * rjx * rinv - restitution * pjx
        nvy = rjy - friction_dv * rjy * rinv - restitution * pjy
        nvz = rjz - friction_dv * rjz * rinv - restitution * pjz
        px = jnp.where(surface, px_s + nx * 1e-4, px)
        py = jnp.where(surface, py_s + ny * 1e-4, py)
        pz = jnp.where(surface, pz_s + nz * 1e-4, pz)
        vx = jnp.where(surface, nvx, vx)
        vy = jnp.where(surface, nvy, vy)
        vz = jnp.where(surface, nvz, vz)
        delta = jnp.where(surface, jnp.clip(delta - dist, 0.0, orig_delta), delta)

        kill = hit & (destroy_flag > 0.0)
        destroyed = destroyed | kill
        done = done | kill

        px = jnp.where(miss, px + vx * delta, px)
        py = jnp.where(miss, py + vy * delta, py)
        pz = jnp.where(miss, pz + vz * delta, pz)
        delta = jnp.where(miss, 0.0, delta)
        return px, py, pz, vx, vy, vz, delta, done, destroyed

    def still_active(s):
        return jnp.any((~s[7]) & (s[6] > 0.0))

    state = substep(px, py, pz, vx, vy, vz, delta, done, destroyed)
    if scratch is None:  # straight-line fallback (no gating)
        for _ in range(3):
            state = substep(*state)
        px, py, pz, vx, vy, vz, _delta, _done, destroyed = state
        return px, py, pz, vx, vy, vz, destroyed

    svec = scratch[:7]  # px,py,pz,vx,vy,vz,delta
    sflags = scratch[7]

    def store(s):
        for ref, val in zip(svec, s[:7]):
            ref[:, :] = val
        sflags[:, :] = s[7].astype(jnp.int32) + 2 * s[8].astype(jnp.int32)

    def load():
        flags = sflags[:, :]
        return tuple(ref[:, :] for ref in svec) + ((flags & 1) != 0, (flags & 2) != 0)

    store(state)

    @pl.when(still_active(state))
    def _():
        store(substep(*load()))

    s2 = load()

    @pl.when(still_active(s2))
    def _():
        store(substep(*substep(*load())))

    out = load()
    return out[0], out[1], out[2], out[3], out[4], out[5], out[8]


def _n_render_planes(static: SpawnerStatic, pack_render) -> int:
    """Render-plane output count: 0 (off), 9 (f32: scale + 8 color
    channels), or the full f16 record — 12 with rotation elided (identity
    synthesized host-side), 16 otherwise."""
    if not pack_render:
        return 0
    if pack_render == "f16":
        return 12 if static.elide_rotation else 16
    return 9


def _exact_row_fetch(oh, mat_i32):
    """Bit-exact MXU row selection: out[lane, r] = mat_i32[prow[r], lane],
    where oh[row, r] = (row == prow[r]) as f32. Mosaic's f32 dots are NOT
    exact at any precision (measured ~2.6e-6 rel even at HIGHEST), so the
    value matrix is split into four byte planes — each byte in [0, 255] is
    exactly representable in bf16, every product is b*1.0 or b*0.0, and the
    f32 accumulator adds at most one nonzero — making each plane dot exact
    by construction; the int32 reassembly is lossless for any bit pattern."""
    acc = None
    for k in range(4):
        plane = ((mat_i32 >> (8 * k)) & 0xFF).astype(jnp.float32)
        d = jax.lax.dot_general(
            plane, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32) << (8 * k)
        acc = d if acc is None else acc | d
    return acc


def _make_nested_cadence_kernel(static: SpawnerStatic, e: int, lazy_reset: bool, M: int,
                                fetch_names: tuple = ()):
    """One Pallas pass computing a nested emitter's ENTIRE per-parent cadence
    (core.rs:490-498) over the pool: lazy dead-lane anchor reset, emission
    counts, the cross-tile inclusive count cumsum (Hillis-Steele + SMEM
    carry, same trick as the claim rank), the deferral-truncated
    `last_emitted` advance, and the spawn total. The XLA form of this math
    was ~30 fusions per nested emitter per frame (cadence chain + [N]
    cumsum + masked wheres), the dominant kernel-count cost of the nested
    stress scene.

    fetch_names (merge fast path): ALSO emit each child rank's parent state
    for the named fields, eliminating the XLA stage's rank->parent monotone
    inverse and pool-wide one-hot gathers (measured ~half the nested premium,
    docs/PERF_NOTES.md ablation) — the r-th child's parent lives in exactly
    the tile whose global rank window [c0, c0+tile_tot) contains r, where its
    state is VMEM-LOCAL. Per 128-rank chunk overlapping the window (@pl.when
    skips the rest): parent row = #(row-last cum <= r) over sublanes, the
    row's lane cums + field rows are fetched bit-exactly on the MXU
    (_exact_row_fetch byte planes), parent lane = #(lane cum <= r), and the
    chunk row of each [M/128, 128] rank-major output is merged read-modify-
    write (outputs use a constant index map; tile 0 zero-inits). Ranks
    outside every window keep 0 — downstream masks by n_spawn.

    Bit-exact with step._spawn_phase's XLA branch: identical op order for
    compute_emission_count and cadence.emission_next_last; parent fetch
    verified lane-exact vs the XLA one-hot gathers (tests/test_fused_step.py,
    tools/fused_parity_tpu.py check_nested_kernel_merge)."""
    single = static.single_type
    target = static.target_types[e]
    nf = len(fetch_names)

    def kernel(prow_ref, alive_ref, *rest):
        idx = 0
        ptype_ref = None
        if not single:
            ptype_ref = rest[idx]
            idx += 1
        life_ref = rest[idx]; idx += 1
        age_ref = rest[idx]; idx += 1
        le_ref = rest[idx]; idx += 1
        pf_refs = rest[idx : idx + nf]; idx += nf
        out_le = rest[idx]; idx += 1
        out_cum = None
        if not nf:  # cum feeds the XLA monotone inverse only in non-fetch mode
            out_cum = rest[idx]; idx += 1
        out_total = rest[idx]; idx += 1
        out_pf = rest[idx : idx + nf]; idx += nf
        carry = rest[idx]  # SMEM scratch: counts seen in prior tiles

        tid = pl.program_id(0)

        @pl.when(tid == 0)
        def _():
            carry[0] = 0
            for o in out_pf:
                o[:, :] = jnp.zeros(o.shape, jnp.float32)

        off_s, off_e, cnt = prow_ref[0, 0], prow_ref[0, 1], prow_ref[0, 2]
        gate = prow_ref[0, 4] != 0.0
        alive_t = alive_ref[:, :] != 0
        age = age_ref[:, :]
        life = life_ref[:, :]
        base_le = le_ref[:, :]
        if lazy_reset:
            # fast-path lazy reset (see step._spawn_phase skip_global)
            base_le = jnp.where(alive_t, base_le, F32_MIN)
        pm = alive_t & gate
        if not single:
            pm = pm & (ptype_ref[:, :] == target)
        counts, next_full = compute_emission_count(age, base_le, life, off_s, off_e, cnt)
        counts = jnp.where(pm, counts, 0)
        excl, tile_tot = _prefix_exclusive(counts)
        c0 = carry[0]
        cum = excl + counts + c0
        carry[0] = c0 + tile_tot
        out_total[0, 0] = c0 + tile_tot  # idempotent; last tile's value wins
        emitted = jnp.minimum(cum, M) - jnp.minimum(cum - counts, M)
        # cadence.emission_next_last, same f32 op order
        last_pct = base_le / life
        clamped = jnp.maximum(last_pct, off_s)
        between = (off_e - off_s) / cnt
        trunc = (clamped + emitted.astype(jnp.float32) * between) * life
        nl = jnp.where(emitted < counts, trunc, next_full)
        out_le[:, :] = jnp.where(pm, nl, base_le)
        if out_cum is not None:
            out_cum[:, :] = cum

        if nf:
            rows_t = cum.shape[0]
            # per-row inclusive totals (lane 127 of each row, row-major order)
            rowlast = cum[:, LANES - 1 :]  # [rows_t, 1]
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_t, LANES), 0)
            lane_iota_s = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            rank_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            pf_i32 = [jax.lax.bitcast_convert_type(r[:, :], jnp.int32) for r in pf_refs]
            for c in range(M // LANES):
                lo = c * LANES

                @pl.when((c0 < lo + LANES) & (c0 + tile_tot > lo))
                def _(c=c, lo=lo):
                    ranks = rank_lane + lo  # [1, 128] global ranks of chunk c
                    # parent row: count of rows fully consumed before rank r
                    prow = jnp.sum((rowlast <= ranks).astype(jnp.int32), axis=0,
                                   keepdims=True)  # [1, 128]
                    oh = (row_iota == prow).astype(jnp.float32)  # [rows_t, 128r]
                    # the parent row's lane cums, then lane within the row
                    lc = _exact_row_fetch(oh, cum)  # [128 lanes, 128 ranks]
                    fine = jnp.sum((lc <= ranks).astype(jnp.int32), axis=0,
                                   keepdims=True)  # [1, 128]
                    lane_oh = lane_iota_s == fine  # [128 lanes, 128 ranks]
                    m = (ranks >= c0) & (ranks < c0 + tile_tot)
                    for o, vi in zip(out_pf, pf_i32):
                        vals = jax.lax.bitcast_convert_type(
                            _exact_row_fetch(oh, vi), jnp.float32)
                        v = jnp.sum(jnp.where(lane_oh, vals, 0.0), axis=0,
                                    keepdims=True)  # [1, 128]
                        o[c : c + 1, :] = jnp.where(m, v, o[c : c + 1, :])

    return kernel


def nested_cadence_pass(static, params, e, alive, ptype, age, lifetime, le_row, gate,
                        lazy_reset: bool, M: int, parent_fields=None):
    """Run the nested-cadence kernel; returns (new_le [N] f32, cum [N] i32
    inclusive or None, total i32 scalar, parent_vals dict or None). Inputs
    are pool-shaped [N] arrays. parent_fields (merge fast path, requires
    M % 128 == 0): dict name -> [N] f32 of parent-state fields; the kernel
    then also returns parent_vals name -> [M] f32 (the r-th child's parent
    state, zeros for ranks >= total) and skips the cum output, which only
    feeds the XLA monotone inverse the fetch replaces."""
    from ..step import _ABLATE

    fetch_names = tuple(parent_fields) if parent_fields else ()
    if "cadence" in _ABLATE:  # timing stub: keep inputs consumed, skip the pass
        N = alive.shape[0]
        z = (age[0] + lifetime[0] + le_row[0]) * 0.0 + gate.astype(jnp.float32) * 0.0
        pv = None
        if fetch_names:
            pv = {k: jnp.zeros((M,), jnp.float32) + parent_fields[k][0] * 0.0
                  for k in fetch_names}
        return (le_row + z,
                None if fetch_names else jnp.zeros((N,), jnp.int32) + alive[0].astype(jnp.int32) * 0,
                jnp.zeros((), jnp.int32), pv)
    N = alive.shape[0]
    assert not fetch_names or M % LANES == 0, (M, "parent fetch needs 128-aligned M")
    rows = N // LANES
    block_rows = BLOCK_ROWS_WIDE if rows % BLOCK_ROWS_WIDE == 0 else BLOCK_ROWS
    grid = rows // block_rows
    z = jnp.zeros((), jnp.float32)
    prow = jnp.stack(
        [params.off_start[e], params.off_end[e], params.count[e], z,
         gate.astype(jnp.float32), z, z, z]
    ).reshape(1, 8)
    kernel = _make_nested_cadence_kernel(static, e, lazy_reset, M, fetch_names)

    def blocked(dtype=jnp.float32):
        return pl.BlockSpec((block_rows, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM)

    def const_block(r):  # whole-array block, same for every grid step
        return pl.BlockSpec((r, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    inputs = [prow, alive.astype(jnp.int32).reshape(rows, LANES)]
    in_specs = [smem_spec, blocked()]
    if not static.single_type:
        inputs.append(ptype.reshape(rows, LANES))
        in_specs.append(blocked())
    inputs += [lifetime.reshape(rows, LANES), age.reshape(rows, LANES), le_row.reshape(rows, LANES)]
    in_specs += [blocked(), blocked(), blocked()]
    for k in fetch_names:
        inputs.append(parent_fields[k].reshape(rows, LANES))
        in_specs.append(blocked())
    m_rows = M // LANES if fetch_names else 0
    out_specs = [blocked()]
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)]
    if not fetch_names:
        out_specs.append(blocked())
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    out_specs.append(smem_spec)
    out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))
    out_specs += [const_block(m_rows)] * len(fetch_names)
    out_shape += [jax.ShapeDtypeStruct((m_rows, LANES), jnp.float32)] * len(fetch_names)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(*inputs)
    if fetch_names:
        new_le, total = outs[0], outs[1]
        parent_vals = {k: v.reshape(M) for k, v in zip(fetch_names, outs[2:])}
        return new_le.reshape(N), None, total[0, 0], parent_vals
    new_le, cum, total = outs
    return new_le.reshape(N), cum.reshape(N), total[0, 0], None


class _SlotView:
    """Pallas-ref proxy prepending a fixed leading index (fleet kernel mode).

    The fleet kernel runs a whole same-archetype spawner GROUP in one
    pallas_call: grid = (S slots, tiles), per-slot small tables stacked
    [S, ...] and whole-array VMEM/SMEM resident (constant index map => ONE
    HBM fetch for the entire grid — a separately vmapped kernel re-fetches
    every small per slot, measured ~36 us/slot of pure latency at 8192-lane
    pools, docs/PERF_NOTES.md round 4). The kernel body's existing indexing
    (`ref[e]`, `ref[0, k]`, `ref[:, :]`, writes) works unchanged through
    this proxy, which prepends the slot id (per-slot smalls) or the blocked
    leading 0 (per-slot [1, rows, lanes] field blocks)."""

    __slots__ = ("ref", "sid")

    def __init__(self, ref, sid):
        self.ref = ref
        self.sid = sid

    def _key(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return (self.sid,) + idx

    def __getitem__(self, idx):
        return self.ref[self._key(idx)]

    def __setitem__(self, idx, val):
        self.ref[self._key(idx)] = val


def _make_kernel(static: SpawnerStatic, collider_kinds, collider_identity, dump: bool,
                 kernel_spawn: bool, block_rows: int, pack_render: bool = False,
                 unroll: int = 1, field_kinds: tuple = (), nested_merge: tuple = (),
                 shard_npool: Optional[int] = None, fleet: bool = False,
                 hull_counts: tuple = (), nested_fold: tuple = (),
                 kernel_stats: bool = False):
    E = static.num_emitters
    T = static.num_types
    C = len(collider_kinds)
    fields = active_f32_fields(static)
    nf = len(fields)
    single = static.single_type  # ptype array elided (identically 0)
    elide_rot = static.elide_rotation  # q = identity, w = 0 invariants
    const_life = static.const_lifetime  # lifetime array invariant
    # derived alive (ring + no dump + global-only): alive == age < lifetime,
    # with collision-destroys writing age = lifetime. No alive array I/O.
    derived = static.derived_alive and can_fuse(static)
    # kernel_spawn: run the GLOBAL emitters' whole emission pipeline
    # in-kernel — per-emitter cadence + bookkeeping on SMEM scalars (every
    # tile recomputes the same scalar math — trivially cheap — and writes
    # the updated rows idempotently), claim, RNG, init. The XLA prelude
    # reduces to assembling two small rows — at 131k lanes the scalar-op
    # prelude/epilogue was ~45% of the frame. On nested archetypes the XLA
    # spawn phase handles nested emitters FIRST and the kernel then claims
    # for the global ones (safe order inversion — see step._spawn_phase
    # skip_global). With kernel_spawn False the kernel is a pure integrator
    # (the lane-exact-parity testing configuration).
    cad = kernel_spawn
    any_hull = COLLIDER_HULL in collider_kinds
    # RNG draw budget: 3 shape + 3 velocity + 1 radial + 1 scale, then
    # lifetime and angular-velocity draws only if those fields are live.
    n_draws = 8 + (0 if const_life is not None else 1) + (0 if elide_rot else 3)
    # Nested-cadence FOLD (VERDICT r4 next #3): when set, this kernel ALSO
    # computes the NEXT frame's per-parent nested cadence + parent fetch for
    # each valid nested emitter as an epilogue over the post-frame state —
    # exactly what the standalone nested_cadence_pass would compute at the
    # start of the next frame (same expressions on the same values; the pass
    # reads post-frame state either way). A multi-frame chain then runs ONE
    # kernel per nested frame instead of [cadence pass -> child stage ->
    # kernel]. nested_fold = (M, fetch_names, fold_emitter_ids).
    if nested_fold:
        fold_M, fold_fetch, fold_es = nested_fold
        n_fold = len(fold_es)
        nf_fetch = len(fold_fetch)
        assert cad and unroll == 1 and not fleet and shard_npool is None
        assert static.ring_claim
        assert fold_M % LANES == 0
    else:
        n_fold = 0
        nf_fetch = 0
    # In-kernel StepOutputs stats (interactive-glue lever, docs/ROADMAP.md):
    # the XLA epilogue's AABB + alive counts re-read ~5 pool planes and cost
    # ~10 scheduled thunks per group per frame (~20-60 us each through the
    # tunnel). With kernel_stats the kernel emits two SMEM stat rows —
    # [min_xyz, max_xyz] f32 and [alive, per-type...] i32 — accumulated
    # across tiles in SMEM scratch; BIT-EXACT vs the XLA reductions (f32
    # min/max and i32 sums are associative). Enabled on the interactive
    # Scene path; chains keep the XLA epilogue (its stats dead-code-
    # eliminate inside scans, while kernel outputs would always compute).
    if kernel_stats:
        assert T <= 7, "stats row holds alive + up to 7 per-type counts"

    def kernel(*refs):
        (
            fscal_ref,  # [1, 16] f32: dt, mod_scale, mod_speed, pvel xyz, trans xyz, rot xyzw
            shape_ref,  # [E, 8] compiled emission-shape rows
            ivel_ref,  # [E, 7]
            iang_ref,  # [E, 7]
            emisc_ref,  # [E, 8]: radial_lo, radial_hi, inherit, init_rot xyzw
            trand_ref,  # [T, 8]: iscale_lo, iscale_hi, life_lo, life_hi
            tphys_ref,  # [T, 8]: accel xyz, lin_drag, ang_accel xyz, ang_drag
            tcoll_ref,  # [T, 4]: restitution, friction, destroy, unused
            tmask_ref,  # [T, 1] int32 collision layer mask
            cmeta_ref,  # [T, 2, K] f32: scale ts, scale vs
            cpos_ref,  # [C', 3]
            crot_ref,  # [C', 4]
            cpar_ref,  # [C', 3]
            clay_ref,  # [C', 1] int32
            cadp_ref,  # [E, 8] f32: count, duration, off_start, off_end (cadence params)
            dyn_ref,  # SMEM [1, 16] int32: mq, ring_cursor, seeds (_SEED_SLOTS)
            estate_ref,  # SMEM [E, 8] f32: time_in_cycle, last_emission, enabled
        ) = refs[:N_SMALL]
        pos = N_SMALL
        gmeta_ref = None  # [T, 10, K] f32: base ts + rgba vs, emis ts + rgba vs
        if pack_render:
            gmeta_ref = refs[pos]
            pos += 1
        has_coll = C > 0 and static.any_collision
        looped = has_coll and C >= LOOP_MIN_COLLIDERS
        cidx_ref = None
        if looped:  # SMEM [C, 1] i32: original table index per permuted row
            cidx_ref = refs[pos]
            pos += 1
        ffpos_ref = ffaxis_ref = ffpar_ref = ffact_ref = None
        if field_kinds:  # scene force fields (force_fields.py)
            ffpos_ref, ffaxis_ref, ffpar_ref, ffact_ref = refs[pos : pos + 4]
            pos += 4
        chul_ref = None
        if any_hull:  # [C, HULL_MAX_PLANES*4] hull plane rows (colliders.py)
            chul_ref = refs[pos]
            pos += 1
        child_ref = nwin_ref = None
        if nested_merge:  # hybrid in-kernel child merge (step._nested_spawn)
            child_ref = refs[pos]      # VMEM [n*n_rows*rows_b, 128] f32
            nwin_ref = refs[pos + 1]   # SMEM [n, 2] int32: cursor, n_spawn
            pos += 2
        fold_le_in = ()
        if n_fold:  # per nested emitter: this frame's last_emitted row
            fold_le_in = refs[pos : pos + n_fold]
            pos += n_fold
        alive_ref = None
        if not derived:
            alive_ref = refs[pos]
            pos += 1
        ptype_ref = None
        if not single:
            ptype_ref = refs[pos]
            pos += 1
        field_in = refs[pos : pos + nf]
        n_scratch = (1 + (1 if n_fold else 0) + (2 if kernel_stats else 0)
                     + (8 if has_coll else 0))
        dead_carry = refs[-n_scratch]  # SMEM scratch: dead slots seen in prior tiles
        sidx = -n_scratch + 1
        fold_carry = None
        if n_fold:  # SMEM [n_fold] cum carry
            fold_carry = refs[sidx]
            sidx += 1
        stats_scr_f = stats_scr_i = None
        if kernel_stats:  # SMEM stat accumulators across tiles
            stats_scr_f = refs[sidx]
            stats_scr_i = refs[sidx + 1]
            sidx += 2
        coll_scratch = refs[-8:] if has_coll else None  # VMEM substep carries
        outs = refs[pos + nf : -n_scratch]
        oi = 0
        out_alive_ref = None
        if not derived:
            out_alive_ref = outs[oi]
            oi += 1
        out_ptype_ref = None
        if not single:
            out_ptype_ref = outs[oi]
            oi += 1
        out_dump_ref = None
        if dump:
            out_dump_ref = outs[oi]
            oi += 1
        out_field = outs[oi : oi + nf]
        out_dyn_ref = out_estate_ref = None
        obase = oi + nf
        if cad:  # SMEM scalar outputs: updated cadence/bookkeeping state
            out_dyn_ref = outs[obase]
            out_estate_ref = outs[obase + 1]
            obase += 2
        out_stats_f = out_stats_i = None
        if kernel_stats:  # SMEM stat rows (see kernel_stats note above)
            out_stats_f = outs[obase]
            out_stats_i = outs[obase + 1]
            obase += 2
        # in-kernel render pack planes: f32 mode = scale + base rgba +
        # emissive rgba (positions/rotations reuse the state outputs);
        # f16 mode = the FULL instance record as f16 planes (pos, scale,
        # [quat], colors) for the halved-bandwidth render hand-off.
        n_render = _n_render_planes(static, pack_render)
        render_outs = outs[obase : obase + n_render] if n_render else None
        obase += n_render
        fold_le_out = fold_tot_out = fold_pf_out = None
        if n_fold:  # next frame's cadence outputs (epilogue below)
            fold_le_out = outs[obase : obase + n_fold]
            fold_tot_out = outs[obase + n_fold]  # SMEM [n_fold, 1] i32
            fold_pf_out = outs[obase + n_fold + 1 :]  # n_fold*nf_fetch const blocks

        if fleet:
            # fleet mode: grid = (S, tiles). Per-slot smalls are [S, ...]
            # whole-array resident; blocked big refs carry a leading block
            # dim of 1. Wrap both so the body below stays identical.
            sid = pl.program_id(0)

            def _w(r, i=sid):
                return _SlotView(r, i) if r is not None else None

            fscal_ref = _w(fscal_ref); shape_ref = _w(shape_ref)  # noqa: E702
            ivel_ref = _w(ivel_ref); iang_ref = _w(iang_ref)  # noqa: E702
            emisc_ref = _w(emisc_ref); trand_ref = _w(trand_ref)  # noqa: E702
            tphys_ref = _w(tphys_ref); tcoll_ref = _w(tcoll_ref)  # noqa: E702
            tmask_ref = _w(tmask_ref); cmeta_ref = _w(cmeta_ref)  # noqa: E702
            cadp_ref = _w(cadp_ref); dyn_ref = _w(dyn_ref)  # noqa: E702
            estate_ref = _w(estate_ref); gmeta_ref = _w(gmeta_ref)  # noqa: E702
            ffpos_ref = _w(ffpos_ref); ffaxis_ref = _w(ffaxis_ref)  # noqa: E702
            ffpar_ref = _w(ffpar_ref); ffact_ref = _w(ffact_ref)  # noqa: E702
            out_dyn_ref = _w(out_dyn_ref); out_estate_ref = _w(out_estate_ref)  # noqa: E702
            out_stats_f = _w(out_stats_f); out_stats_i = _w(out_stats_i)  # noqa: E702
            # blocked refs: [1, block_rows, LANES] blocks -> fixed leading 0
            alive_ref = _w(alive_ref, 0); ptype_ref = _w(ptype_ref, 0)  # noqa: E702
            out_alive_ref = _w(out_alive_ref, 0); out_ptype_ref = _w(out_ptype_ref, 0)  # noqa: E702
            out_dump_ref = _w(out_dump_ref, 0)
            field_in = [_w(r, 0) for r in field_in]
            out_field = [_w(r, 0) for r in out_field]
            if render_outs is not None:
                render_outs = [_w(r, 0) for r in render_outs]
            # colliders (cpos/crot/cpar/clay/cidx) stay SHARED — one scene
            # table serves every slot (the group's colliders are identical).

        f = {name: field_in[i][:, :] for i, name in enumerate(fields)}
        fs = fscal_ref[0]
        dt = fs[0]
        mod_scale, mod_speed = fs[1], fs[2]
        pvel = (fs[3], fs[4], fs[5])
        trans = (fs[6], fs[7], fs[8])
        orot = (fs[9], fs[10], fs[11], fs[12])

        tid = pl.program_id(1) if fleet else pl.program_id(0)
        n_tiles = pl.num_programs(1) if fleet else pl.num_programs(0)
        tile = block_rows * LANES
        sharded = shard_npool is not None
        if cad:
            # Shardedness is a COMPILE-TIME property (shard_npool static):
            # under shard_map over the particle axis each device's kernel
            # sees only its sub-pool, so claims must use GLOBAL lane indices
            # (dyn slot 11) and the GLOBAL capacity for the cursor ring /
            # dead-rank math to match the unsharded kernel. npool stays a
            # Python int either way — the per-lane ring-rank modulo below
            # strength-reduces to multiply+shift only when its divisor is a
            # compile-time constant; a dynamic SMEM divisor is a true
            # per-lane integer division and cost round 3 a 1.8x hot-path
            # regression (tools/bisect_kernel_tpu.py, commit 0e70d84).
            npool = shard_npool if sharded else n_tiles * tile
            lane_base = dyn_ref[0, 11] if sharded else 0

        if cad and not static.ring_claim:  # SMEM rank carry for prefix claim

            @pl.when(tid == 0)
            def _():
                # Sharded: start from this shard's global dead-slot rank
                # offset (exclusive prefix of prior shards' dead counts,
                # computed by the shard_map caller); 0 when unsharded.
                dead_carry[0] = dyn_ref[0, 13] if sharded else 0

        ptype = None if single else ptype_ref[:, :]
        if cad:
            # scalar state threaded across the unrolled sub-frames (python
            # jnp scalars; written back once after the loop)
            mq = dyn_ref[0, 0]
            cursor0 = dyn_ref[0, 1]
            anyp = dyn_ref[0, 3] != 0
            tic_s = [estate_ref[e, 0] for e in range(E)]
            last_s = [estate_ref[e, 1] for e in range(E)]
            en_s = [estate_ref[e, 2] != 0.0 for e in range(E)]
            cursor_new = cursor0
        for _u in range(unroll):
            # each sub-frame recomputes liveness from the current fields
            # (derived: alive == age < lifetime; unroll > 1 requires it)
            if derived:
                alive0 = f["age"] < (np.float32(const_life) if const_life is not None
                                     else f["lifetime"])
            else:
                alive0 = alive_ref[:, :] != 0
            dead = ~alive0

            # ---------------- in-kernel nested child merge ------------------------
            # Hybrid fast path: the XLA nested stage computed this frame's
            # [M] child rows (step._nested_spawn merge_out); each child of
            # rank r claims ring slot (cursor_e + r) mod N, so the ranks a
            # tile owns are CONTIGUOUS and — because the buffer was
            # pre-shifted by (cursor_e mod 128) — 128-row-ALIGNED: one
            # dynamic sublane slice per (emitter x field), no gather. This
            # replaces the XLA stage's pool-sized write-backs / claim-mask
            # passes with reads the kernel already pays for. Runs BEFORE the
            # global claim (matching _spawn_phase's nested-first order) so
            # merged children are alive to the claim and integrate this
            # frame like the reference's spawn->update order.
            if nested_merge and _u == 0:
                n_merge, merge_tis, child_names, rows_b = nested_merge
                n_cr = len(child_names)
                rowi = jax.lax.broadcasted_iota(jnp.int32, dead.shape, 0)
                lanei = jax.lax.broadcasted_iota(jnp.int32, dead.shape, 1)
                p_flat = rowi * LANES + lanei
                t0g = lane_base + tid * tile
                # unconditional per tile: a gating scf.if around loads with
                # dynamic starts fails Mosaic legalization, and the child
                # buffer is VMEM-resident anyway (constant index map => one
                # HBM fetch for the whole grid) — off-window tiles read a
                # clamped slice and mask everything out
                for mi in range(n_merge):
                    c_e = nwin_ref[mi, 0]
                    n_e = nwin_ref[mi, 1]
                    delta = jnp.mod(t0g - c_e, npool)
                    sdelta = jnp.where(delta >= npool - tile, delta - npool, delta)
                    ti_m = merge_tis[mi]
                    c128 = jnp.mod(c_e, LANES)
                    # rank = (slot - cursor) mod npool is linear in the slot
                    # EXCEPT at slot == cursor, where it jumps by +npool. A
                    # tile containing that point (always when the pool is a
                    # single tile; the cursor tile otherwise) holds ranks
                    # from BOTH linear segments, so try both shifts — their
                    # rank windows are provably disjoint (they differ by
                    # npool >= n_e) and off-segment lanes mask to false.
                    for sd in (sdelta, sdelta + npool):
                        start_row = jnp.clip(
                            (sd + c128) // LANES + (block_rows + 1),
                            0, rows_b - block_rows,
                        )
                        # the clamp only bites on tiles whose rank range has
                        # no overlap with [0, n_e) — there the mask is all-
                        # false and the (in-bounds) read is discarded
                        rank = sd + p_flat
                        m = (~alive0) & (rank >= 0) & (rank < n_e)
                        for ri_, name in enumerate(child_names):
                            base_row = (mi * n_cr + ri_) * rows_b
                            sl = child_ref[pl.dslice(base_row + start_row, block_rows), :]
                            f[name] = jnp.where(m, sl, f[name])
                        alive0 = alive0 | m
                        if not single:
                            ptype = jnp.where(m, ti_m, ptype)
                dead = ~alive0

            # ---------------- in-kernel cadence (global-only archetypes) ----------
            # spawn_particles' per-emitter count/bookkeeping (core.rs:395-427) on
            # SMEM scalars: every tile computes the same values; outputs are
            # written idempotently. Matches step.py's _spawn_phase math exactly.
            if cad:
                # Seed by GLOBAL tile id so sharded shards draw the same
                # stream as the unsharded kernel's corresponding tiles
                # (lane_base is tile-aligned by the shard_map contract;
                # reduces to `tid` exactly when unsharded).
                gtid = lane_base // tile + tid
                pltpu.prng_seed(dyn_ref[0, _SEED_SLOTS[_u]] + gtid * 1000003)
                en_in = en_s
                # active() is nested-aware (core.rs:288-302): a nested emitter
                # counts only while particles exist (pre-spawn flag in dyn[3],
                # read once before the sub-frame loop — nested archetypes
                # never unroll, so the pre-spawn value is the frame's value)
                active = jnp.zeros((), bool)
                for e in range(E):
                    if static.mode_kinds[e] == MODE_GLOBAL:
                        active = active | en_in[e]
                    else:
                        active = active | (en_in[e] & anyp)
                bounds = [jnp.zeros((), jnp.int32)]
                new_tic, new_last, new_en = [], [], []
                for e in range(E):
                    tic0_, last0_ = tic_s[e], last_s[e]
                    if static.mode_kinds[e] != MODE_GLOBAL:
                        # nested: spawned by the XLA phase; scalars pass through
                        new_en.append(en_in[e])
                        new_tic.append(tic0_)
                        new_last.append(last0_)
                        bounds.append(bounds[-1])
                        continue
                    gate = active & en_in[e]
                    tic0, last0 = tic_s[e], last_s[e]
                    cnt_p, dur = cadp_ref[e, 0], cadp_ref[e, 1]
                    off_s, off_e = cadp_ref[e, 2], cadp_ref[e, 3]
                    pk = static.pacing_kinds[e]
                    if pk == PACING_ONE_SHOT:
                        n_sp = jnp.where(gate, cnt_p.astype(jnp.int32), 0)
                        new_en.append(en_in[e] & ~gate)  # disable after burst
                        new_tic.append(tic0)
                        new_last.append(last0)
                    elif pk == PACING_ON_DEMAND:
                        n_sp = jnp.where(gate, mq, 0)
                        mq = jnp.where(gate, 0, mq)
                        new_en.append(en_in[e])
                        new_tic.append(tic0)
                        new_last.append(last0)
                    else:  # PACING_RATE / CountOverDuration
                        tic = rem_euclid(tic0 + dt, dur)
                        cnt, next_last = compute_emission_count(tic, last0, dur, off_s, off_e, cnt_p)
                        n_sp = jnp.where(gate, cnt, 0)
                        new_en.append(en_in[e])
                        new_tic.append(jnp.where(gate, tic, tic0))
                        new_last.append(jnp.where(gate, next_last, last0))
                    bounds.append(bounds[-1] + n_sp)
                total_spawn = bounds[-1]
                cursor_new = jnp.mod(cursor0 + total_spawn, npool) if static.ring_claim else cursor0
                tic_s, last_s, en_s = new_tic, new_last, new_en

            # ---------------- in-kernel slot claim --------------------------------
            # The sequential-emitter Vec::push order (core.rs:386-469) is exactly:
            # the r-th claimable slot is claimed by emitter e iff S_{e-1} <= r <
            # S_e, with S the cumulative spawn counts.
            #   * ring archetypes (const lifetime, FIFO deaths): r is the ring
            #     distance (lane - cursor) mod N — pure iota math, no prefix scan
            #     (the Hillis-Steele scan costs ~25% of the 1M step).
            #   * otherwise: r is the dead-slot rank, a cross-tile prefix sum
            #     (tile-local scan + SMEM carry; the grid runs sequentially on
            #     one core, so the carry is exact).
            if cad and static.ring_claim:
                base = lane_base + tid * tile
                row = jax.lax.broadcasted_iota(jnp.int32, dead.shape, 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, dead.shape, 1)
                gidx = base + row * LANES + lane
                # Overflow corner (one frame's total global spawn > pool
                # capacity N): ranks are mod N, so emitter windows
                # [S_{e-1}, S_e) beyond N are unreachable here and later
                # emitters drop entirely, while the XLA path advances its
                # cursor per emitter and wraps onto remaining dead lanes —
                # the two paths then claim different (equally overflowed)
                # subsets. Both drop the overflow either way; capacity is the
                # explicit knob (SURVEY.md §7 hard part 1), and a pool this
                # under-provisioned is mis-sized by >1 full frame of emission.
                rank = jnp.mod(gidx - cursor0, npool)
                spawned_any = dead & (rank < total_spawn)
                # spawn-block gate: does the ring window [cursor, cursor+total)
                # (possibly wrapped) overlap this tile? scalar interval tests.
                t0, t1 = base, base + block_rows * LANES
                b = cursor0 + total_spawn
                overlap_nowrap = (t1 > cursor0) & (t0 < b)
                overlap_wrap = (t0 < (b - npool)) | (t1 > cursor0)
                tile_has_spawn = (total_spawn > 0) & jnp.where(b > npool, overlap_wrap, overlap_nowrap)
            elif cad:
                rank_local, dead_in_tile = _prefix_exclusive(dead.astype(jnp.int32))
                carry_before = dead_carry[0]
                rank = rank_local + carry_before
                dead_carry[0] = carry_before + dead_in_tile
                spawned_any = dead & (rank < total_spawn)

                # The RNG + samplers cost ~half the kernel but only tiles
                # containing the first `total_spawn` dead ranks have claimed
                # lanes — skip the whole block elsewhere (~1 tile in 16).
                tile_has_spawn = (carry_before < total_spawn) & (dead_in_tile > 0)
            else:  # hybrid: spawn already happened in the XLA spawn phase
                spawned_any = jnp.zeros(dead.shape, bool)

            def spawn_block(args):
                if single:
                    fvals = args
                    ptype_l = None
                else:
                    fvals, ptype_l = args
                fd = dict(zip(fields, fvals))
                bits = pltpu.bitcast(pltpu.prng_random_bits((n_draws,) + dead.shape), jnp.uint32)
                u = _u01(bits)
                for e in range(E):
                    if static.mode_kinds[e] != MODE_GLOBAL:
                        continue  # nested children spawned by the XLA phase
                    m = dead & (rank >= bounds[e]) & (rank < bounds[e + 1])
                    srow = shape_ref[e]
                    em = emisc_ref[e]
                    offx, offy, offz = _shape_row(srow, u[0], u[1], u[2])
                    ivx, ivy, ivz = _randvec3_row(ivel_ref[e], u[3], u[4], u[5])
                    radial = em[0] + (em[1] - em[0]) * u[6]
                    l2 = offx * offx + offy * offy + offz * offz
                    inv = jnp.where(l2 > 0, 1.0 / jnp.sqrt(jnp.where(l2 > 0, l2, 1.0)), 0.0)
                    wvx, wvy, wvz = quat_rotate_comp(*orot, ivx, ivy, ivz)
                    velx = mod_speed * (wvx + offx * inv * radial) + em[2] * pvel[0]
                    vely = mod_speed * (wvy + offy * inv * radial) + em[2] * pvel[1]
                    velz = mod_speed * (wvz + offz * inv * radial) + em[2] * pvel[2]
                    ti = static.particle_indices[e]
                    tr = trand_ref[ti]
                    iscale = (tr[0] + (tr[1] - tr[0]) * u[7]) * mod_scale
                    ui = 8
                    if const_life is None:
                        life = tr[2] + (tr[3] - tr[2]) * u[ui]
                        ui += 1
                    if not elide_rot:
                        avx, avy, avz = _randvec3_row(iang_ref[e], u[ui], u[ui + 1], u[ui + 2])

                    def W(name, val):
                        fd[name] = jnp.where(m, val, fd[name])

                    W("px", trans[0] + offx); W("py", trans[1] + offy); W("pz", trans[2] + offz)
                    W("vx", velx); W("vy", vely); W("vz", velz)
                    if not elide_rot:
                        W("qx", em[3]); W("qy", em[4]); W("qz", em[5]); W("qw", em[6])
                        W("wx", avx); W("wy", avy); W("wz", avz)
                    W("initial_scale", iscale)
                    W("age", jnp.float32(0.0))
                    if const_life is None:
                        W("lifetime", life)
                    if not single:
                        ptype_l = jnp.where(m, ti, ptype_l)
                fvals = tuple(fd[name] for name in fields)
                return fvals if single else (fvals, ptype_l)

            if cad and E > 0:
                init_args = tuple(f[name] for name in fields)
                if single:
                    fvals = jax.lax.cond(tile_has_spawn, spawn_block, lambda a: a, init_args)
                else:
                    fvals, ptype = jax.lax.cond(
                        tile_has_spawn, spawn_block, lambda a: a, (init_args, ptype)
                    )
                f = dict(zip(fields, fvals))
            alive_sp = alive0 | spawned_any

            # ---------------- integrate ------------------------------------------
            age_new = f["age"] + dt
            lifetime = np.float32(const_life) if const_life is not None else f["lifetime"]
            dead_by_age = age_new >= lifetime
            age_pct = age_new / lifetime

            def by_type(ref, col):
                out = jnp.full(alive0.shape, ref[0, col])
                for t in range(1, T):
                    out = jnp.where(ptype == t, ref[t, col], out)
                return out

            k0, n0 = static.scale_curve_meta[0]
            sf = _eval_curve_static(cmeta_ref[0, 0], cmeta_ref[0, 1], k0, n0, age_pct)
            for t in range(1, T):
                kt, nt = static.scale_curve_meta[t]
                sft = _eval_curve_static(cmeta_ref[t, 0], cmeta_ref[t, 1], kt, nt, age_pct)
                sf = jnp.where(ptype == t, sft, sf)
            scale_new = f["initial_scale"] * sf

            px, py, pz = f["px"], f["py"], f["pz"]
            vx, vy, vz = f["vx"], f["vy"], f["vz"]
            if C > 0 and static.any_collision:
                restitution = by_type(tcoll_ref, 0)
                friction = by_type(tcoll_ref, 1)
                destroy_flag = by_type(tcoll_ref, 2)
                lane_mask = by_type(tmask_ref, 0)
                if single:
                    has_col = jnp.full(alive0.shape, static.collision_types[0])
                else:
                    has_col = jnp.zeros(alive0.shape, bool)
                    for t in range(T):
                        if static.collision_types[t]:
                            has_col = has_col | (ptype == t)
                cpx, cpy, cpz, cvx, cvy, cvz, cdes = _collide_tile(
                    collider_kinds, collider_identity,
                    *((cpos_ref, crot_ref, cpar_ref, clay_ref) if looped
                      else (cpos_ref[:, :], crot_ref[:, :], cpar_ref[:, :], clay_ref[:, :])),
                    px, py, pz, vx, vy, vz, dt, restitution, friction, destroy_flag, lane_mask,
                    alive_sp & ~dead_by_age & has_col, coll_scratch,
                    loop_groups=_collider_groups(collider_kinds, collider_identity) if looped else None,
                    cidx=cidx_ref,
                    # looped: the VMEM ref (dynamic pl.ds row loads);
                    # unrolled: the loaded array
                    chul=(chul_ref if looped else chul_ref[:, :]) if any_hull else None,
                    hull_counts=hull_counts,
                )
                npx = jnp.where(has_col, cpx, px + vx * dt)
                npy = jnp.where(has_col, cpy, py + vy * dt)
                npz = jnp.where(has_col, cpz, pz + vz * dt)
                nvx = jnp.where(has_col, cvx, vx)
                nvy = jnp.where(has_col, cvy, vy)
                nvz = jnp.where(has_col, cvz, vz)
                should_destroy = has_col & cdes
            else:
                npx, npy, npz = px + vx * dt, py + vy * dt, pz + vz * dt
                nvx, nvy, nvz = vx, vy, vz
                should_destroy = jnp.zeros(alive0.shape, bool)

            moved = alive_sp & ~dead_by_age
            survivor = moved & ~should_destroy

            ax, ay, az = by_type(tphys_ref, 0), by_type(tphys_ref, 1), by_type(tphys_ref, 2)
            if field_kinds:
                # scene force fields: add onto the per-type accel at the
                # post-move position, before drag (force_fields.py; same
                # helper as the XLA path, indexing the small VMEM tables).
                # trand col 4 = per-type affected_by_fields mask.
                ffx, ffy, ffz = field_accel(
                    field_kinds, ffpos_ref, ffaxis_ref, ffpar_ref, ffact_ref,
                    npx, npy, npz,
                )
                fm = by_type(trand_ref, 4)
                ax, ay, az = ax + fm * ffx, ay + fm * ffy, az + fm * ffz
            lin_drag = by_type(tphys_ref, 3)
            aax, aay, aaz = by_type(tphys_ref, 4), by_type(tphys_ref, 5), by_type(tphys_ref, 6)
            ang_drag = by_type(tphys_ref, 7)

            dvx = nvx + (ax - nvx * lin_drag) * dt
            dvy = nvy + (ay - nvy * lin_drag) * dt
            dvz = nvz + (az - nvz * lin_drag) * dt

            if derived:
                # collision-destroys must read dead next frame: age := lifetime
                # (the per-lane `lifetime` — a constant or the streamed field)
                f["age"] = jnp.where(
                    moved & should_destroy, lifetime,
                    jnp.where(alive_sp, age_new, f["age"]),
                )
            else:
                f["age"] = jnp.where(alive_sp, age_new, f["age"])
            f["px"] = jnp.where(moved, npx, f["px"])
            f["py"] = jnp.where(moved, npy, f["py"])
            f["pz"] = jnp.where(moved, npz, f["pz"])
            f["vx"] = jnp.where(survivor, dvx, jnp.where(moved, nvx, f["vx"]))
            f["vy"] = jnp.where(survivor, dvy, jnp.where(moved, nvy, f["vy"]))
            f["vz"] = jnp.where(survivor, dvz, jnp.where(moved, nvz, f["vz"]))
            if not elide_rot:
                # quaternion rotation + angular drag (core.rs:645-650); with
                # rotation elided these are compile-time no-ops (q=id, w=0)
                sqx, sqy, sqz, sqw = quat_from_scaled_axis_comp(f["wx"] * dt, f["wy"] * dt, f["wz"] * dt)
                rqx, rqy, rqz, rqw = quat_mul_comp(sqx, sqy, sqz, sqw, f["qx"], f["qy"], f["qz"], f["qw"])
                wx2 = f["wx"] + (aax - ang_drag * f["wx"]) * dt
                wy2 = f["wy"] + (aay - ang_drag * f["wy"]) * dt
                wz2 = f["wz"] + (aaz - ang_drag * f["wz"]) * dt
                f["qx"] = jnp.where(survivor, rqx, f["qx"])
                f["qy"] = jnp.where(survivor, rqy, f["qy"])
                f["qz"] = jnp.where(survivor, rqz, f["qz"])
                f["qw"] = jnp.where(survivor, rqw, f["qw"])
                f["wx"] = jnp.where(survivor, wx2, f["wx"])
                f["wy"] = jnp.where(survivor, wy2, f["wy"])
                f["wz"] = jnp.where(survivor, wz2, f["wz"])

            if cad:
                cursor0 = cursor_new  # next sub-frame claims off the advanced ring

        if cad:  # write back the final scalar state (once, not per sub-frame)
            out_dyn_ref[0, 0] = mq
            out_dyn_ref[0, 1] = cursor_new
            for e in range(E):
                out_estate_ref[e, 0] = tic_s[e]
                out_estate_ref[e, 1] = last_s[e]
                out_estate_ref[e, 2] = en_s[e].astype(jnp.float32)

        if pack_render:
            # Render-contract extract fused into the step: the separate XLA
            # dense pack re-reads the whole pool and pays ~20 table gathers
            # (~2 ms at 1M lanes); here the fields are already in registers
            # and the gradients are K-unrolled compare-selects, so the only
            # extra cost is writing these 9 planes (~0.05 ms at 1M).
            # scale==0 marks dead lanes (pack_instances_dense contract).
            bk0, bn0, ek0, en0 = static.color_curve_meta[0]
            bch = _eval_gradient_static(gmeta_ref[0, 0], [gmeta_ref[0, 1 + c] for c in range(4)], bk0, bn0, age_pct)
            ech = _eval_gradient_static(gmeta_ref[0, 5], [gmeta_ref[0, 6 + c] for c in range(4)], ek0, en0, age_pct)
            for t in range(1, T):
                bkt, bnt, ekt, ent = static.color_curve_meta[t]
                bt = _eval_gradient_static(gmeta_ref[t, 0], [gmeta_ref[t, 1 + c] for c in range(4)], bkt, bnt, age_pct)
                et = _eval_gradient_static(gmeta_ref[t, 5], [gmeta_ref[t, 6 + c] for c in range(4)], ekt, ent, age_pct)
                for c in range(4):
                    bch[c] = jnp.where(ptype == t, bt[c], bch[c])
                    ech[c] = jnp.where(ptype == t, et[c], ech[c])
            inst_scale = jnp.where(survivor, scale_new, 0.0)
            if pack_render == "f16":
                h = lambda x: x.astype(jnp.float16)
                render_outs[0][:, :] = h(f["px"])
                render_outs[1][:, :] = h(f["py"])
                render_outs[2][:, :] = h(f["pz"])
                render_outs[3][:, :] = h(inst_scale)
                ci = 4
                if not elide_rot:
                    render_outs[4][:, :] = h(f["qx"])
                    render_outs[5][:, :] = h(f["qy"])
                    render_outs[6][:, :] = h(f["qz"])
                    render_outs[7][:, :] = h(f["qw"])
                    ci = 8
                for c in range(4):
                    render_outs[ci + c][:, :] = h(bch[c])
                    render_outs[ci + 4 + c][:, :] = h(ech[c])
            else:
                render_outs[0][:, :] = inst_scale
                for c in range(4):
                    render_outs[1 + c][:, :] = bch[c]
                    render_outs[5 + c][:, :] = ech[c]

        if not derived:
            out_alive_ref[:, :] = survivor.astype(jnp.int32)
        if not single:
            out_ptype_ref[:, :] = ptype
        if dump:
            destroyed = alive_sp & ~survivor
            if single:
                dmask = destroyed if static.destroyed_dump_types[0] else jnp.zeros(alive0.shape, bool)
            else:
                dmask = jnp.zeros(alive0.shape, bool)
                for t in range(T):
                    if static.destroyed_dump_types[t]:
                        dmask = dmask | (destroyed & (ptype == t))
            out_dump_ref[:, :] = dmask.astype(jnp.int32)
        for i, name in enumerate(fields):
            out_field[i][:, :] = f[name]

        if kernel_stats:
            # ---------------- in-kernel StepOutputs stats ---------------------
            # Exactly the XLA epilogue's reductions (aabb over pos +- scale,
            # alive + per-type counts) on values already in registers;
            # accumulated across tiles via SMEM scratch, output rows written
            # idempotently (last tile's combined value wins). f32 min/max and
            # i32 add are exact, so this is BIT-EXACT vs _fused_epilogue.
            first_tile = tid == 0
            inf_f = jnp.float32(np.inf)
            tile_stats_f = []
            for c in ("px", "py", "pz"):
                tile_stats_f.append(jnp.min(jnp.where(survivor, f[c] - scale_new, inf_f)))
            for c in ("px", "py", "pz"):
                tile_stats_f.append(jnp.max(jnp.where(survivor, f[c] + scale_new, -inf_f)))
            for k in range(3):
                v = jnp.where(first_tile, tile_stats_f[k],
                              jnp.minimum(stats_scr_f[k], tile_stats_f[k]))
                stats_scr_f[k] = v
                out_stats_f[0, k] = v
            for k in range(3, 6):
                v = jnp.where(first_tile, tile_stats_f[k],
                              jnp.maximum(stats_scr_f[k], tile_stats_f[k]))
                stats_scr_f[k] = v
                out_stats_f[0, k] = v
            out_stats_f[0, 6] = jnp.float32(0.0)
            out_stats_f[0, 7] = jnp.float32(0.0)
            tile_counts = [jnp.sum(survivor.astype(jnp.int32))]
            if single:
                pass  # per-type == total
            else:
                for t in range(T):
                    tile_counts.append(
                        jnp.sum((survivor & (ptype == t)).astype(jnp.int32)))
            for k, tc in enumerate(tile_counts):
                v = jnp.where(first_tile, tc, stats_scr_i[k] + tc)
                stats_scr_i[k] = v
                out_stats_i[0, k] = v
            for k in range(len(tile_counts), 8):
                out_stats_i[0, k] = jnp.int32(0)

        if n_fold:
            # ---------------- folded nested cadence (next frame) -------------
            # Identical math to _make_nested_cadence_kernel, evaluated on the
            # POST-frame tile state (survivor/ptype/f) — which is exactly the
            # pre-spawn state the standalone pass reads next frame. The gate
            # reduces to the post-frame enabled flag: pm is masked by alive,
            # and active() is true whenever this emitter is enabled and any
            # parent lane is alive (its own nested contribution), so the
            # active factor can never flip a lane that alive hasn't already
            # masked (proof in fused_step_hybrid's fold notes).
            @pl.when(tid == 0)
            def _():
                for j in range(n_fold):
                    fold_carry[j] = 0
                for o in fold_pf_out:
                    o[:, :] = jnp.zeros(o.shape, jnp.float32)

            # lifetime as a TRACED SMEM scalar (cadp col 4), NOT the python
            # constant: a literal divisor lets the compiler rewrite x/c into
            # x*(1/c), drifting the anchor 1 ulp off the standalone pass
            # (which divides by the streamed lifetime array).
            age_post = f["age"]
            alive_post = survivor
            pf_i32 = [jax.lax.bitcast_convert_type(f[nm], jnp.int32)
                      for nm in fold_fetch]
            rows_t = age_post.shape[0]
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_t, LANES), 0)
            lane_iota_s = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            rank_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            for j, e in enumerate(fold_es):
                base_le = fold_le_in[j][:, :]
                # lazy dead-lane anchor reset (step._spawn_phase skip_global)
                base_le = jnp.where(alive_post, base_le, F32_MIN)
                pm = alive_post & en_s[e]
                if not single:
                    pm = pm & (ptype == static.target_types[e])
                off_s_f, off_e_f = cadp_ref[e, 2], cadp_ref[e, 3]
                cnt_f = cadp_ref[e, 0]
                # per-lane lifetime when streamed; else the traced SMEM
                # scalar (NOT the python constant — see cadp col 4 note)
                life_c = (f["lifetime"] if const_life is None
                          else cadp_ref[e, 4])
                counts, next_full = compute_emission_count(
                    age_post, base_le, life_c, off_s_f, off_e_f, cnt_f)
                counts = jnp.where(pm, counts, 0)
                excl, tile_tot = _prefix_exclusive(counts)
                c0 = fold_carry[j]
                cum = excl + counts + c0
                fold_carry[j] = c0 + tile_tot
                fold_tot_out[j, 0] = c0 + tile_tot  # last tile's value wins
                emitted = jnp.minimum(cum, fold_M) - jnp.minimum(cum - counts, fold_M)
                # cadence.emission_next_last, same f32 op order
                last_pct = base_le / life_c
                clamped = jnp.maximum(last_pct, off_s_f)
                between = (off_e_f - off_s_f) / cnt_f
                trunc = (clamped + emitted.astype(jnp.float32) * between) * life_c
                nl = jnp.where(emitted < counts, trunc, next_full)
                fold_le_out[j][:, :] = jnp.where(pm, nl, base_le)
                # parent fetch: same chunk loop as _make_nested_cadence_kernel
                rowlast = cum[:, LANES - 1 :]  # [rows_t, 1]
                for c in range(fold_M // LANES):
                    lo = c * LANES

                    @pl.when((c0 < lo + LANES) & (c0 + tile_tot > lo))
                    def _(c=c, lo=lo, j=j, cum=cum, c0=c0, tile_tot=tile_tot,
                          rowlast=rowlast):
                        ranks = rank_lane + lo
                        prow = jnp.sum((rowlast <= ranks).astype(jnp.int32),
                                       axis=0, keepdims=True)
                        oh = (row_iota == prow).astype(jnp.float32)
                        lc = _exact_row_fetch(oh, cum)
                        fine = jnp.sum((lc <= ranks).astype(jnp.int32),
                                       axis=0, keepdims=True)
                        lane_oh = lane_iota_s == fine
                        m = (ranks >= c0) & (ranks < c0 + tile_tot)
                        for fi_, vi in enumerate(pf_i32):
                            o = fold_pf_out[j * nf_fetch + fi_]
                            vals = jax.lax.bitcast_convert_type(
                                _exact_row_fetch(oh, vi), jnp.float32)
                            v = jnp.sum(jnp.where(lane_oh, vals, 0.0), axis=0,
                                        keepdims=True)
                            o[c : c + 1, :] = jnp.where(m, v, o[c : c + 1, :])

    return kernel


def _pack_fused_smalls(static: SpawnerStatic, params: SpawnerParams, colliders, frame: FrameInput):
    """Assemble the kernel's small VMEM inputs. Param-derived packs are
    loop-invariant; XLA hoists them out of scan loops. fscal (the only
    per-frame pack here) is built as ONE concatenate — an .at[].set chain
    costs several tiny XLA kernels per frame, which dominate small pools."""
    E = static.num_emitters
    T = static.num_types

    f1 = lambda x: jnp.asarray(x, jnp.float32).reshape(-1)
    fscal = jnp.concatenate(
        [
            f1(frame.dt), f1(frame.modifier_scale), f1(frame.modifier_speed),
            f1(frame.parent_velocity), f1(frame.transform_translation),
            f1(frame.transform_rotation), jnp.zeros((3,), jnp.float32),
        ]
    ).reshape(1, 16)

    emisc = jnp.zeros((E, 8), jnp.float32)
    emisc = emisc.at[:, 0].set(params.radial_lo)
    emisc = emisc.at[:, 1].set(params.radial_hi)
    emisc = emisc.at[:, 2].set(params.inherit)
    emisc = emisc.at[:, 3:7].set(params.init_rot)

    trand = jnp.zeros((T, 8), jnp.float32)
    trand = trand.at[:, 0].set(params.initial_scale_lo)
    trand = trand.at[:, 1].set(params.initial_scale_hi)
    trand = trand.at[:, 2].set(params.lifetime_lo)
    trand = trand.at[:, 3].set(params.lifetime_hi)
    trand = trand.at[:, 4].set(params.field_mask)  # affected_by_fields

    tphys = jnp.zeros((T, 8), jnp.float32)
    tphys = tphys.at[:, 0:3].set(params.acceleration)
    tphys = tphys.at[:, 3].set(params.linear_drag)
    tphys = tphys.at[:, 4:7].set(params.angular_acceleration)
    tphys = tphys.at[:, 7].set(params.angular_drag)

    tcoll = jnp.zeros((T, 4), jnp.float32)
    tcoll = tcoll.at[:, 0].set(params.restitution)
    tcoll = tcoll.at[:, 1].set(params.friction)
    tcoll = tcoll.at[:, 2].set(params.destroy_on_collision)
    tmask = params.collision_mask.astype(jnp.int32).reshape(T, 1)

    cmeta = jnp.stack([params.scale_ts, params.scale_vs], axis=1)  # [T, 2, K]

    if colliders is not None and len(colliders.kinds) > 0 and static.any_collision:
        cpos, crot, cpar = colliders.position, colliders.rotation, colliders.params
        from ..colliders import masked_layers

        clay = masked_layers(colliders).astype(jnp.int32).reshape(-1, 1)
    else:
        cpos = jnp.zeros((1, 3), jnp.float32)
        crot = jnp.zeros((1, 4), jnp.float32)
        cpar = jnp.zeros((1, 3), jnp.float32)
        clay = jnp.zeros((1, 1), jnp.int32)

    # per-emitter cadence params for the in-kernel cadence (param-derived)
    cadp = jnp.zeros((E, 8), jnp.float32)
    cadp = cadp.at[:, 0].set(params.count)
    cadp = cadp.at[:, 1].set(params.duration)
    cadp = cadp.at[:, 2].set(params.off_start)
    cadp = cadp.at[:, 3].set(params.off_end)
    # col 4: the pool lifetime as a TRACED scalar for the nested-cadence fold
    # (const-lifetime archetypes share one value pool-wide). The fold must
    # NOT use the compile-time constant: XLA rewrites division by a literal
    # (x / c -> x * (1/c)) and the folded anchor then drifts 1 ulp from the
    # standalone pass, which divides by the streamed lifetime array.
    cadp = cadp.at[:, 4].set(params.lifetime_lo[0])

    return [fscal, params.shape_params, params.ivel_params, params.iangvel_params, emisc,
            trand, tphys, tcoll, tmask, cmeta, cpos, crot, cpar, clay, cadp]
    # dyn + estate (per-frame SMEM scalars) are appended by the caller


def _pack_gmeta(params):
    """[T, 10, K] gradient tables for the in-kernel render pack:
    rows = [base_ts, base r, g, b, a, emis_ts, emis r, g, b, a]."""
    return jnp.concatenate(
        [
            params.base_ts[:, None, :],
            jnp.moveaxis(params.base_vs, -1, 1),
            params.emis_ts[:, None, :],
            jnp.moveaxis(params.emis_vs, -1, 1),
        ],
        axis=1,
    )


def _run_fused_kernel(static, params, colliders, frame, dyn, estate, alive, ptype, f32_fields,
                      kernel_spawn: bool = True, pack_render: bool = False, unroll=1,
                      nested_payloads=None, shard_npool: Optional[int] = None,
                      fleet_S: Optional[int] = None, nested_fold=None,
                      kernel_stats: bool = False):
    """Invoke the fused Pallas kernel on one pool pass.

    alive: [N] bool, ptype: [N] i32, f32_fields: name -> [N] f32 covering
    `active_f32_fields(static)` (elided fields are invariant and never enter
    the kernel). dyn: int32[8] (manual_queued, ring_cursor, seed); estate:
    f32[E, 8] (time_in_cycle, last_emission, enabled) — the kernel runs the
    whole emission cadence on these for global-only archetypes and returns
    the updated rows; for hybrid (nested) archetypes the kernel is a pure
    integrator and dyn/estate are ignored dummies. Returns (alive_new,
    ptype_new_or_None, dump_mask, new_fields, dyn_new_or_None,
    estate_new_or_None).

    fleet_S: run a whole same-archetype GROUP in this one pallas_call —
    grid (S, tiles), per-slot smalls stacked [S, ...] and whole-array
    resident (see _SlotView). params/frame/dyn/estate and every pool array
    then carry a leading [S] axis; colliders stay a single shared table.
    Slot-for-slot bit-exact with S separate fused_step calls (the fleet
    parity check), ~10-30x cheaper per slot than vmapping the solo kernel
    (which re-fetches every small per slot)."""
    fleet = fleet_S is not None
    N = alive.shape[-1]
    assert N % (BLOCK_ROWS * LANES) == 0, (
        f"pool capacity {N} must be a multiple of {BLOCK_ROWS * LANES} for the fused kernel"
    )
    rows = N // LANES
    # widest tile the capacity divides into (128 rows measured ~20% faster
    # than 64 at 131k; 8192-lane pools keep the 64-row minimum tile)
    block_rows = BLOCK_ROWS_WIDE if rows % BLOCK_ROWS_WIDE == 0 else BLOCK_ROWS
    grid = rows // block_rows
    if fleet:
        assert nested_payloads is None and shard_npool is None, (
            "fleet kernel covers global-only unsharded archetypes")

    kinds = colliders.kinds if (colliders is not None and static.any_collision) else ()
    identity = colliders.identity_rot if (colliders is not None and static.any_collision) else ()
    any_hull = COLLIDER_HULL in kinds
    looped = len(kinds) >= LOOP_MIN_COLLIDERS
    hull_counts = colliders.hull_counts if any_hull else ()
    perm = None
    if looped:  # group by (kind, identity) for the fori_loop narrow phase
        perm, kinds, identity, _groups = _collider_perm(kinds, identity)
        if any_hull:  # counts travel with their permuted rows (the loop
            # pads every hull to the table max anyway — _SmemPlanes)
            hull_counts = tuple(hull_counts[i] for i in perm)
    dump = static.any_destroyed_dump
    single = static.single_type
    derived = static.derived_alive and can_fuse(static)
    cad = kernel_spawn
    E = static.num_emitters
    ff = frame.force_fields
    field_kinds = ff.kinds if (ff is not None and len(ff.kinds) > 0) else ()
    # hybrid in-kernel nested merge: pre-shift each child buffer by
    # (cursor mod 128) so the kernel's per-tile reads are row-aligned
    # dynamic slices (see the kernel's merge block / step._nested_spawn)
    n_merge = len(nested_payloads) if nested_payloads else 0
    merge_info = ()
    child_buf = nwin_arr = None
    if n_merge:
        assert kernel_spawn, "nested merge requires the in-kernel spawn path"
        from ..step import _ABLATE, nested_child_field_rows

        child_names = nested_child_field_rows(static)
        m_len = nested_payloads[0]["rows"][0][1].shape[0]
        pad_rows = block_rows + 1
        rows_b = pad_rows + (m_len + LANES) // LANES + block_rows
        bufs = []
        nwin = []
        for p in nested_payloads:
            names = tuple(nm for nm, _v in p["rows"])
            assert names == child_names, (names, child_names)
            c = p["cursor"].astype(jnp.int32)
            c128 = jnp.mod(c, LANES)
            zero_b = jnp.zeros((rows_b * LANES,), jnp.float32)
            if "preshift" in _ABLATE:  # timing stub: static-offset placement
                c128 = 0
            for _nm, v in p["rows"]:
                bufs.append(
                    jax.lax.dynamic_update_slice(
                        zero_b, v, (pad_rows * LANES + c128,)
                    ).reshape(rows_b, LANES)
                )
            nwin.append(jnp.stack([c, p["n_spawn"].astype(jnp.int32)]))
        child_buf = jnp.concatenate(bufs, axis=0)  # [n*n_rows*rows_b, 128]
        nwin_arr = jnp.stack(nwin)  # [n, 2] int32
        merge_info = (n_merge, tuple(p["ti"] for p in nested_payloads),
                      child_names, rows_b)
        if "kmerge" in _ABLATE:  # timing stub: pay the XLA payload build but
            # drop the kernel-side merge block (consume the buffer so the
            # build isn't dead-code-eliminated)
            f32_fields = dict(f32_fields)
            f32_fields["age"] = f32_fields["age"] + child_buf.sum() * 1e-38
            n_merge = 0
            merge_info = ()
            child_buf = nwin_arr = None

    # nested-cadence fold: (M, fetch_names, fold_emitter_ids, le_rows) —
    # le_rows are this frame's post-advance last_emitted rows, one [N] per
    # folded emitter; the kernel emits next frame's (new_le, total,
    # parent_vals) as extra outputs (see _make_kernel's fold epilogue).
    n_fold = len(nested_fold[2]) if nested_fold else 0
    fold_kernel_arg = tuple(nested_fold[:3]) if nested_fold else ()
    kernel = _make_kernel(static, kinds, identity, dump, kernel_spawn, block_rows, pack_render,
                          unroll=unroll, field_kinds=field_kinds, nested_merge=merge_info,
                          shard_npool=shard_npool, fleet=fleet,
                          hull_counts=hull_counts, nested_fold=fold_kernel_arg,
                          kernel_stats=kernel_stats)

    if fleet:
        # per-slot smalls stacked [S, ...]; colliders shared (the group's
        # table is identical per slot, so drop the vmapped copies)
        smalls = jax.vmap(
            lambda p, f: _pack_fused_smalls(static, p, colliders, f)
        )(params, frame) + [dyn, estate]
        for si in (CPOS_IDX, CPOS_IDX + 1, CPOS_IDX + 2, CPOS_IDX + 3):
            smalls[si] = smalls[si][0]
    else:
        smalls = _pack_fused_smalls(static, params, colliders, frame) + [dyn, estate]
    if looped:
        # permute the collider rows to match (static gather, tiny [C, _]
        # arrays; positions may be traced for dynamic colliders)
        pidx = np.asarray(perm, np.int32)
        for si in (CPOS_IDX, CPOS_IDX + 1, CPOS_IDX + 2, CPOS_IDX + 3):
            smalls[si] = smalls[si][pidx, :]
    if pack_render:
        smalls.append(jax.vmap(_pack_gmeta)(params) if fleet else _pack_gmeta(params))
    if looped:  # original table index per permuted row (exact tie-break)
        smalls.append(jnp.asarray(np.asarray(perm, np.int32).reshape(-1, 1)))
    if field_kinds:  # force-field tables (position / axis / params / active)
        act = jnp.asarray(ff.active, jnp.float32)
        smalls += [
            jnp.asarray(ff.position, jnp.float32),
            jnp.asarray(ff.axis, jnp.float32),
            jnp.asarray(ff.params, jnp.float32),
            act.reshape(act.shape + (1,)) if fleet else act.reshape(-1, 1),
        ]
    if any_hull:  # hull plane rows, SHARED across fleet slots like cpos
        hp = colliders.hull_planes
        if looped:
            hp = hp[pidx]
        smalls.append(hp.reshape(hp.shape[0], -1))

    def blocked():
        if fleet:
            return pl.BlockSpec((1, block_rows, LANES), lambda s, g: (s, g, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((block_rows, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM)

    small_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    fields = active_f32_fields(static)
    nf = len(fields)

    n_small = (N_SMALL + (1 if pack_render else 0) + (1 if looped else 0)
               + (4 if field_kinds else 0) + (1 if any_hull else 0)
               + (2 if n_merge else 0))
    # big inputs: [fold le rows], [alive], [ptype], fields (kernel unpack order)
    n_big_in = n_fold + (0 if derived else 1) + (0 if single else 1) + nf
    n_extra = (0 if derived else 1) + (0 if single else 1) + (1 if dump else 0)
    # looped narrow phase reads collider rows (cpos/crot/cpar/clay, smalls
    # indices CPOS_IDX..+3) by dynamic scalar index — they live in SMEM there
    cspec = smem_spec if looped else small_spec
    in_specs = (
        [small_spec] * CPOS_IDX + [cspec] * 4 + [small_spec] * (N_SMALL - 2 - CPOS_IDX - 4)
        + [smem_spec] * 2
        + ([small_spec] if pack_render else []) + ([smem_spec] if looped else [])
        + ([small_spec] * 4 if field_kinds else [])
        + ([small_spec] if any_hull else [])
        + ([small_spec, smem_spec] if n_merge else [])
        + [blocked()] * n_big_in
    )
    big = (fleet_S, rows, LANES) if fleet else (rows, LANES)
    out_specs = [blocked()] * (n_extra + nf)
    out_shape = (
        [jax.ShapeDtypeStruct(big, jnp.int32)] * n_extra
        + [jax.ShapeDtypeStruct(big, jnp.float32)] * nf
    )
    if cad:  # SMEM scalar outputs: updated bookkeeping (dyn', estate')
        out_specs = out_specs + [smem_spec, smem_spec]
        dyn_shape = (fleet_S, 1, 16) if fleet else (1, 16)
        est_shape = (fleet_S, E, 8) if fleet else (E, 8)
        out_shape = out_shape + [
            jax.ShapeDtypeStruct(dyn_shape, jnp.int32),
            jax.ShapeDtypeStruct(est_shape, jnp.float32),
        ]
    if kernel_stats:  # SMEM stat rows: aabb f32 + counts i32
        st_shape = (fleet_S, 1, 8) if fleet else (1, 8)
        out_specs = out_specs + [smem_spec, smem_spec]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct(st_shape, jnp.float32),
            jax.ShapeDtypeStruct(st_shape, jnp.int32),
        ]
    n_render = _n_render_planes(static, pack_render)
    if n_render:
        rdtype = jnp.float16 if pack_render == "f16" else jnp.float32
        out_specs = out_specs + [blocked()] * n_render
        out_shape = out_shape + [jax.ShapeDtypeStruct(big, rdtype)] * n_render
    if n_fold:  # next-frame cadence outputs: le rows, totals, parent fetches
        M_f, fetch_names_f, _fold_es = nested_fold[:3]
        m_rows_f = M_f // LANES
        pf_spec = pl.BlockSpec((m_rows_f, LANES), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)
        out_specs = (out_specs + [blocked()] * n_fold + [smem_spec]
                     + [pf_spec] * (n_fold * len(fetch_names_f)))
        out_shape = (out_shape
                     + [jax.ShapeDtypeStruct(big, jnp.float32)] * n_fold
                     + [jax.ShapeDtypeStruct((n_fold, 1), jnp.int32)]
                     + [jax.ShapeDtypeStruct((m_rows_f, LANES), jnp.float32)]
                     * (n_fold * len(fetch_names_f)))

    field_arrays = [f32_fields[name].reshape(big) for name in fields]
    inputs = smalls[:]
    if n_merge:
        inputs += [child_buf, nwin_arr]
    if n_fold:
        inputs += [r.reshape(big) for r in nested_fold[3]]
    if not derived:
        inputs.append(alive.astype(jnp.int32).reshape(big))
    if not single:
        inputs.append(ptype.reshape(big))
    inputs = inputs + field_arrays

    # alias field inputs onto field outputs (in-place update)
    first_field_in = n_small + n_big_in - nf
    first_field_out = n_extra
    aliases = {first_field_in + i: first_field_out + i for i in range(nf)}
    if n_fold:  # alias the le input rows onto the folded le outputs
        fold_out_base = (n_extra + nf + (2 if cad else 0)
                         + (2 if kernel_stats else 0) + n_render)
        for j in range(n_fold):
            aliases[n_small + j] = fold_out_base + j

    results = pl.pallas_call(
        kernel,
        grid=(fleet_S, grid) if fleet else (grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)]
        + ([pltpu.SMEM((n_fold,), jnp.int32)] if n_fold else [])
        + ([pltpu.SMEM((8,), jnp.float32), pltpu.SMEM((8,), jnp.int32)]
           if kernel_stats else [])
        + (
            [pltpu.VMEM((block_rows, LANES), jnp.float32)] * 7
            + [pltpu.VMEM((block_rows, LANES), jnp.int32)]
            if (len(kinds) > 0 and static.any_collision)
            else []
        ),
        input_output_aliases=aliases,
    )(*inputs)

    out_n = (fleet_S, N) if fleet else (N,)
    ri = 0
    alive_new = None
    if not derived:
        alive_new = results[ri].reshape(out_n) != 0
        ri += 1
    ptype_new = None
    if not single:
        ptype_new = results[ri].reshape(out_n)
        ri += 1
    dump_mask = (results[ri].reshape(out_n) != 0) if dump else jnp.zeros(out_n, bool)
    new_fields = {name: results[n_extra + i].reshape(out_n) for i, name in enumerate(fields)}
    if derived:  # alive == age < lifetime (cheap XLA epilogue, DCE-able in scans)
        alive_new = new_fields["age"] < (
            np.float32(static.const_lifetime) if static.const_lifetime is not None
            else new_fields["lifetime"])
    dyn_new = results[n_extra + nf] if cad else None
    estate_new = results[n_extra + nf + 1] if cad else None
    rbase = n_extra + nf + (2 if cad else 0)
    stats_rows = None
    if kernel_stats:
        stats_rows = (results[rbase], results[rbase + 1])  # f32 aabb, i32 counts
        rbase += 2
    render_planes = (
        tuple(results[rbase + i].reshape(out_n) for i in range(n_render))
        if n_render else None
    )
    fold_out = None
    if n_fold:
        fb = rbase + n_render
        le_list = [results[fb + j].reshape(out_n) for j in range(n_fold)]
        totals = results[fb + n_fold]  # [n_fold, 1] i32
        pf_flat = results[fb + n_fold + 1 :]
        nfn = len(fetch_names_f)
        pvals = [
            {k: pf_flat[j * nfn + fi].reshape(M_f) for fi, k in enumerate(fetch_names_f)}
            for j in range(n_fold)
        ]
        fold_out = (le_list, totals, pvals)
    return (alive_new, ptype_new, dump_mask, new_fields, dyn_new, estate_new,
            render_planes, fold_out, stats_rows)


def _pack_scalar_rows(static, manual_queued, ring_cursor, seeds, any_alive,
                      time_in_cycle, last_emission, enabled, shard_row=None):
    """Assemble the kernel's per-frame SMEM scalar rows. SINGLE source of
    truth for the dyn/estate column layout (matches the kernel unpack /
    _SEED_SLOTS: dyn = [manual_queued, ring_cursor, seed0, any_alive_pre,
    seed1, seed2, seed3, pad]; seeds is one PRNG seed per unrolled
    sub-frame; estate rows = [time_in_cycle, last_emission, enabled,
    pad...]).

    shard_row: optional (lane_base, dead_rank_offset) int32 scalars for
    shard_map-over-particle-axis execution (dyn slots 11 and 13; the global
    capacity is a compile-time constant of the kernel build, NOT a dyn
    slot — see _make_kernel shard_npool); zeros (= unsharded: local
    indexing) when absent. Slot 12 is reserved (held the global capacity
    through round 3)."""
    E = static.num_emitters
    z = jnp.zeros((), jnp.int32)
    s = list(seeds) + [z] * (8 - len(seeds))  # dyn row always has 8 seed slots
    lb, dro = shard_row if shard_row is not None else (z, z)
    dyn = jnp.stack(
        [manual_queued, ring_cursor, s[0], any_alive,
         s[1], s[2], s[3], s[4], s[5], s[6], s[7],
         lb, z, dro, z, z]
    ).reshape(1, 16)
    estate = jnp.concatenate(
        [
            time_in_cycle.reshape(E, 1),
            last_emission.reshape(E, 1),
            enabled.astype(jnp.float32).reshape(E, 1),
            jnp.zeros((E, 5), jnp.float32),
        ],
        axis=1,
    )
    return dyn, estate


def fused_step(
    static: SpawnerStatic,
    params: SpawnerParams,
    colliders: Optional[ColliderTable],
    state: PoolState,
    frame: FrameInput,
    pack_render: bool = False,
    unroll: int = 1,
    shard_axis: Optional[str] = None,
    _shard_override: Optional[tuple] = None,
    kernel_stats: bool = False,
):
    """Drop-in replacement for step() on global-only archetypes, with the
    per-lane pipeline in one Pallas kernel. Same state/outputs contract.
    pack_render=True additionally returns the in-kernel render-pack planes
    (scale + base rgba + emissive rgba) as a third result.

    unroll > 1 advances THAT MANY frames in the one kernel invocation
    (can_unroll archetypes only): the pool is read and written once for U
    frames, amortizing HBM traffic and launch overhead in headless chains.
    Bit-equal to U sequential calls — the per-frame RNG keys split in the
    same order and the kernel reseeds per sub-frame (outputs are the final
    frame's; intermediates are never materialized, exactly like a scan
    whose intermediate outputs are dead).

    shard_axis: set when called INSIDE a jax.shard_map whose named axis
    shards the pool's particle dimension (parallel.sharding
    make_sharded_step). state/destroyed_mask leaves then hold this shard's
    slice; scalar state and frame/params are replicated. The kernel claims
    with GLOBAL lane indices (dyn slots 11/13 + a STATIC global capacity —
    the mesh axis size is a trace-time constant, so the per-lane ring-rank
    modulo keeps its constant divisor; see _make_kernel shard_npool) so the
    set of slots claimed per emitter matches the unsharded kernel exactly,
    and the epilogue's AABB/count reductions turn into psum/pmin/pmax
    collectives (the one small all-reduce SURVEY §2a predicts; everything
    per-lane stays shard-local, riding zero communication).

    _shard_override: testing seam — explicit (lane_base, global_npool,
    dead_rank_offset) in place of the shard_map-derived ones, so a single
    chip can validate the compiled kernel's global-index claim math by
    manually splitting a pool (tools/fused_parity_tpu.py); global_npool
    must be a Python int (it is a compile-time kernel constant); the
    epilogue reductions then stay LOCAL (the caller stitches shards)."""
    assert can_fuse(static)
    assert unroll == 1 or (can_unroll(static) and 1 < unroll <= MAX_UNROLL)
    E = static.num_emitters
    kernel_stats = kernel_stats and static.num_types <= 7  # stats-row capacity

    shard_row = None
    shard_npool = None
    if _shard_override is not None:
        lb, npg, dro = _shard_override
        assert isinstance(npg, int), "_shard_override global_npool must be a Python int"
        shard_npool = npg
        shard_row = (jnp.asarray(lb, jnp.int32), jnp.asarray(dro, jnp.int32))
    elif shard_axis is not None:
        n_local = state.capacity
        idx = jax.lax.axis_index(shard_axis)
        n_shards = jax.lax.axis_size(shard_axis)  # Python int (static mesh)
        lane_base = (idx * n_local).astype(jnp.int32)
        shard_npool = n_local * n_shards
        if static.ring_claim:
            dro = jnp.zeros((), jnp.int32)
        else:
            # exclusive prefix of prior shards' dead counts = this shard's
            # starting global dead rank for the in-kernel prefix claim
            local_dead = jnp.sum((~state.alive).astype(jnp.int32))
            g = jax.lax.all_gather(local_dead, shard_axis)
            dro = jnp.sum(
                jnp.where(jnp.arange(g.shape[0]) < idx, g, 0)
            ).astype(jnp.int32)
        shard_row = (lane_base, dro)

    # The whole emission pipeline (cadence, bookkeeping, claim, RNG, init)
    # runs in-kernel; the XLA prelude just assembles two small scalar rows.
    # Per-sub-frame keys split exactly as U sequential fused_step calls.
    key = state.rng_key
    seeds = []
    for _ in range(unroll):
        key, frame_key = jax.random.split(key)
        seeds.append(jax.lax.bitcast_convert_type(frame_key[0], jnp.int32))
    new_key = key
    dyn, estate = _pack_scalar_rows(
        static, state.manual_queued, state.ring_cursor, seeds, jnp.zeros((), jnp.int32),
        state.time_in_cycle, state.last_emission, state.enabled, shard_row=shard_row,
    )

    f32_fields = {name: getattr(state, name) for name in active_f32_fields(static)}
    alive_new, ptype_new, dump_mask, new_fields, dyn_new, estate_new, planes, _fold, _stats = _run_fused_kernel(
        static, params, colliders, frame, dyn, estate, state.alive, state.ptype, f32_fields,
        pack_render=pack_render, unroll=unroll, shard_npool=shard_npool,
        kernel_stats=kernel_stats and shard_npool is None,
    )
    manual_queued = dyn_new[0, 0]
    new_cursor = dyn_new[0, 1]
    time_in_cycle = estate_new[:, 0]
    last_emission = estate_new[:, 1]
    enabled = estate_new[:, 2] != 0.0

    # Elided fields pass through untouched (they are pool-wide invariants:
    # q=identity / w=0 / lifetime=const — see active_f32_fields).
    full_fields = {name: getattr(state, name) for name in _F32_FIELDS}
    full_fields.update(new_fields)
    if ptype_new is None:
        ptype_new = state.ptype

    # last_emitted is only consumed by nested emitters, which never take this
    # path — leave it untouched (dead lanes' values are meaningless anyway).
    st, out = _fused_epilogue(
        static, params, state, alive_new, ptype_new, full_fields, dump_mask,
        state.last_emitted, enabled, time_in_cycle, last_emission, manual_queued,
        new_cursor, new_key, shard_axis=shard_axis, stats_row=_stats,
    )
    if pack_render:
        return st, out, planes
    return st, out


def _fused_epilogue(
    static, params, state, alive_new, ptype_new, new_fields, dump_mask,
    last_emitted, enabled, time_in_cycle, last_emission, manual_queued,
    ring_cursor, new_key, spawn_stats=None, shard_axis=None, stats_row=None,
):
    """Stats + finished flag (XLA; dead-code-eliminated when the caller only
    consumes the state, e.g. under a multi-frame scan). active() is
    nested-aware (core.rs:288-302): a nested emitter counts only while
    particles exist. shard_axis: inside a shard_map over the particle axis,
    the AABB/count reductions become psum/pmin/pmax so outputs are the
    GLOBAL values (replicated on every shard). stats_row: the kernel's
    in-kernel stat rows ([1,8] f32 aabb, [1,8] i32 counts — _make_kernel
    kernel_stats); when given, the pool-wide recompute below is skipped
    entirely (bit-exact: the kernel runs the identical reductions)."""
    T = static.num_types
    if stats_row is not None:
        assert shard_axis is None
        sfr, sir = stats_row
        aabb_min = sfr[0, 0:3]
        aabb_max = sfr[0, 3:6]
        alive_count = sir[0, 0]
        # single-type kernels store only the total (per-type == total)
        per_type = sir[0, 0:1] if T == 1 else sir[0, 1 : 1 + T]
        return _epilogue_tail(
            static, state, alive_new, ptype_new, new_fields, dump_mask,
            last_emitted, enabled, time_in_cycle, last_emission, manual_queued,
            ring_cursor, new_key, spawn_stats,
            aabb_min, aabb_max, alive_count, per_type,
        )
    if static.const_lifetime is not None:
        age_pct = new_fields["age"] / np.float32(static.const_lifetime)
    else:
        age_pct = new_fields["age"] / new_fields["lifetime"]
    # Gather-free curve eval: (kind, n) are compile-time constants, so the
    # segment select unrolls to compare-selects. The previous [N]-index
    # jnp.take form cost ~36 ns/index on TPU (three gathers over the whole
    # pool PER FRAME just for the AABB scale), which made this epilogue the
    # dominant device cost of the interactive per-frame Scene path
    # (~0.2 ms/spawner at 8192 lanes — docs/PERF_NOTES.md round 4).
    k0, n0 = static.scale_curve_meta[0]
    sf = _eval_curve_static(params.scale_ts[0], params.scale_vs[0], k0, n0, age_pct)
    for t in range(1, T):
        kt, nt = static.scale_curve_meta[t]
        sft = _eval_curve_static(params.scale_ts[t], params.scale_vs[t], kt, nt, age_pct)
        sf = jnp.where(ptype_new == t, sft, sf)
    scale = new_fields["initial_scale"] * sf
    inf = jnp.float32(jnp.inf)
    aabb_min = jnp.stack(
        [jnp.min(jnp.where(alive_new, new_fields[c] - scale, inf)) for c in ("px", "py", "pz")]
    )
    aabb_max = jnp.stack(
        [jnp.max(jnp.where(alive_new, new_fields[c] + scale, -inf)) for c in ("px", "py", "pz")]
    )
    alive_count = jnp.sum(alive_new.astype(jnp.int32))
    per_type = jnp.stack([jnp.sum((alive_new & (ptype_new == t)).astype(jnp.int32)) for t in range(T)])
    if shard_axis is not None:  # global stats: SURVEY §2a's one small all-reduce
        aabb_min = jax.lax.pmin(aabb_min, shard_axis)
        aabb_max = jax.lax.pmax(aabb_max, shard_axis)
        alive_count = jax.lax.psum(alive_count, shard_axis)
        per_type = jax.lax.psum(per_type, shard_axis)
    return _epilogue_tail(
        static, state, alive_new, ptype_new, new_fields, dump_mask,
        last_emitted, enabled, time_in_cycle, last_emission, manual_queued,
        ring_cursor, new_key, spawn_stats,
        aabb_min, aabb_max, alive_count, per_type,
    )


def _epilogue_tail(
    static, state, alive_new, ptype_new, new_fields, dump_mask,
    last_emitted, enabled, time_in_cycle, last_emission, manual_queued,
    ring_cursor, new_key, spawn_stats,
    aabb_min, aabb_max, alive_count, per_type,
):
    all_empty = alive_count == 0
    any_particles = ~all_empty
    active_now = jnp.zeros((), bool)
    for e in range(static.num_emitters):
        if static.mode_kinds[e] == MODE_GLOBAL:
            active_now = active_now | enabled[e]
        else:
            active_now = active_now | (enabled[e] & any_particles)
    finished = all_empty & ~active_now & ~state.finished_notified
    finished_notified = state.finished_notified | finished

    new_state = PoolState(
        **new_fields,
        ptype=ptype_new,
        alive=alive_new,
        last_emitted=last_emitted,
        time_in_cycle=time_in_cycle,
        last_emission=last_emission,
        enabled=enabled,
        manual_queued=manual_queued,
        finished_notified=finished_notified,
        ring_cursor=ring_cursor,
        rng_key=new_key,
    )
    zero = jnp.zeros((), jnp.int32)
    outputs = StepOutputs(
        alive_count=alive_count,
        alive_count_per_type=per_type,
        finished_event=finished,
        aabb_valid=any_particles,
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        destroyed_mask=dump_mask,
        nested_deferred=spawn_stats[0] if spawn_stats else zero,
        nested_dropped=spawn_stats[1] if spawn_stats else zero,
    )
    return new_state, outputs


def fused_step_fleet(
    static: SpawnerStatic,
    params,  # [S]-stacked SpawnerParams
    colliders: Optional[ColliderTable],  # ONE shared scene table
    states,  # [S]-stacked PoolState (equal capacities)
    frames,  # [S]-stacked FrameInput
    pack_render: bool = False,
    unroll: int = 1,
    kernel_stats: bool = False,
):
    """Step a whole same-archetype spawner GROUP in ONE kernel invocation
    (VERDICT r3 next #2): grid = (S, tiles) with per-slot smalls stacked and
    whole-array VMEM/SMEM resident. vmap of fused_step re-fetches every
    small table per slot (~36 us of fetch latency per 8192-lane slot,
    docs/PERF_NOTES.md round 4 — 100 spawners paid ~3.6 ms/frame of pure
    overhead); here the whole group's tables are fetched once.

    Slot-for-slot BIT-EXACT with vmap(fused_step): the per-slot key splits,
    dyn seeds, and in-kernel tile seeds (tid is the within-slot tile id)
    are identical. The reference analog is par_iter_mut over spawners
    (/root/reference/src/core.rs:583-585)."""
    assert can_fuse(static)
    assert unroll == 1 or (can_unroll(static) and 1 < unroll <= MAX_UNROLL)
    S = states.alive.shape[0]
    kernel_stats = kernel_stats and static.num_types <= 7  # stats-row capacity

    def prelude(state):
        key = state.rng_key
        seeds = []
        for _ in range(unroll):
            key, frame_key = jax.random.split(key)
            seeds.append(jax.lax.bitcast_convert_type(frame_key[0], jnp.int32))
        dyn, estate = _pack_scalar_rows(
            static, state.manual_queued, state.ring_cursor, seeds,
            jnp.zeros((), jnp.int32),
            state.time_in_cycle, state.last_emission, state.enabled,
        )
        return dyn, estate, key

    dyn, estate, new_key = jax.vmap(prelude)(states)

    f32_fields = {name: getattr(states, name) for name in active_f32_fields(static)}
    alive_new, ptype_new, dump_mask, new_fields, dyn_new, estate_new, planes, _fold, _stats = _run_fused_kernel(
        static, params, colliders, frames, dyn, estate, states.alive, states.ptype,
        f32_fields, pack_render=pack_render, unroll=unroll, fleet_S=S,
        kernel_stats=kernel_stats,
    )
    manual_queued = dyn_new[:, 0, 0]
    new_cursor = dyn_new[:, 0, 1]
    time_in_cycle = estate_new[:, :, 0]
    last_emission = estate_new[:, :, 1]
    enabled = estate_new[:, :, 2] != 0.0

    full_fields = {name: getattr(states, name) for name in _F32_FIELDS}
    full_fields.update(new_fields)
    if ptype_new is None:
        ptype_new = states.ptype

    if kernel_stats:
        # per-slot stat rows replace the vmapped pool-wide recompute
        def epi(p, st, alive, pt, fields_row, dmask, le, en, tic, le2, mq, cur, nk, srf, sri):
            return _fused_epilogue(
                static, p, st, alive, pt, fields_row, dmask, le, en, tic, le2, mq,
                cur, nk, stats_row=(srf, sri),
            )

        st, out = jax.vmap(epi)(
            params, states, alive_new, ptype_new, full_fields, dump_mask,
            states.last_emitted, enabled, time_in_cycle, last_emission,
            manual_queued, new_cursor, new_key, _stats[0], _stats[1],
        )
    else:
        def epi(p, st, alive, pt, fields_row, dmask, le, en, tic, le2, mq, cur, nk):
            return _fused_epilogue(
                static, p, st, alive, pt, fields_row, dmask, le, en, tic, le2, mq, cur, nk,
            )

        st, out = jax.vmap(epi)(
            params, states, alive_new, ptype_new, full_fields, dump_mask,
            states.last_emitted, enabled, time_in_cycle, last_emission, manual_queued,
            new_cursor, new_key,
        )
    if pack_render:
        return st, out, planes
    return st, out


def fused_step_hybrid(
    static: SpawnerStatic,
    params: SpawnerParams,
    colliders: Optional[ColliderTable],
    state: PoolState,
    frame: FrameInput,
    kernel_global: bool = True,
    pack_render: bool = False,
    nested_carry=None,
    fold_out: bool = False,
    kernel_stats: bool = False,
):
    """Nested/mixed archetypes. Default (kernel_global=True, the production
    fast path): the XLA spawn phase handles NESTED emitters only (cross-tile
    parent gathers need XLA), then the kernel runs the global emitters'
    full pipeline + integrate — exact spawn COUNTS vs step() (cadence is
    draw-independent) but hardware-PRNG draws, so trajectory parity is
    distributional for globally-spawned particles. With kernel_global=False
    all spawning stays in the shared XLA phase and trajectories are
    bit-identical to step() — the lane-exact parity testing configuration.
    Overflow note: when dead slots run out, the fast path gives nested
    children claim priority over global spawns (reverse of step()'s emitter
    order) — both paths drop overflow either way (the reference's Vec grows
    unboundedly instead, SURVEY.md §7 hard part 1)."""
    from ..step import _spawn_phase

    E = static.num_emitters
    kernel_stats = kernel_stats and static.num_types <= 7  # stats-row capacity

    # pre-spawn liveness for the in-kernel active() flag (core.rs:288-302)
    any_alive_pre = jnp.any(state.alive)
    # The merge defers pool writes to the kernel, so a nested emitter does
    # not see an EARLIER nested emitter's same-frame children (reference
    # semantics: sequential Vec pushes, core.rs:471-546). That visibility is
    # PROVABLY unobservable, so chained nesting merges too (VERDICT r3 next
    # #3b; round 3 gated it off): a same-frame child always has age = 0 and
    # last_emitted = F32_MIN, so its cadence (core.rs:490-498 / SURVEY A.1)
    # computes passed_since = min(0, off_end) - max(MIN/dur, off_start)
    # = -off_start <= 0, hence emission count 0 (Rust's saturating usize
    # cast; cadence.compute_emission_count clamps identically) — an age-0
    # parent NEVER emits on its spawn frame. The only other effect, its
    # last_emitted advancing F32_MIN -> (a value <= off_start*duration), is
    # observably idempotent: every future cadence clamps the anchor with
    # max(last/dur, off_start), so all anchors below the clamp form ONE
    # equivalence class — the merge path leaves F32_MIN where the write-back
    # path stores the clamped-away value. Merge-on vs write-back parity on a
    # chained archetype (exact for every field; last_emitted canonicalized
    # into the clamp class) is pinned by tests/test_nested.py and the
    # sweep's nested-chained-merge check.
    merging = (kernel_global and _NESTED_KERNEL_MERGE and static.ring_claim
               and (jax.default_backend() == "tpu" or _FORCE_NESTED_MERGE_CPU))
    # nested-cadence fold (VERDICT r4 next #3, chain fast path): nested_carry
    # holds the (new_le, total, parent_vals) this frame's cadence pass WOULD
    # compute — already produced by the PREVIOUS frame's kernel epilogue on
    # the identical post-frame state (_make_kernel nested_fold). fold_out
    # asks this frame's kernel to produce the next frame's carry the same
    # way. Gate proof (epilogue gate = post-frame enabled only): the
    # standalone pass's gate is active() & enabled[e]; its pm also masks by
    # alive, and active() >= enabled[e] & any_alive — an enabled nested
    # emitter with ANY alive lane forces active() true via its own term
    # (core.rs:288-302), while with no alive lane pm is all-false anyway.
    assert nested_carry is None or merging, "nested carry requires the merge path"
    assert not fold_out or merging, "nested fold requires the merge path"
    if merging:
        (fields, enabled, time_in_cycle, last_emission, manual_queued, new_key,
         spawn_stats, nested_payloads) = _spawn_phase(
            static, params, state, frame, skip_global=True,
            kernel_cadence=True, nested_merge=True, nested_carry=nested_carry,
        )
    else:
        nested_payloads = None
        fields, enabled, time_in_cycle, last_emission, manual_queued, new_key, spawn_stats = _spawn_phase(
            static, params, state, frame, skip_global=kernel_global,
            kernel_cadence=kernel_global,
        )

    if kernel_global:
        # global emitters run fully in-kernel (cadence + claim + RNG init),
        # AFTER the XLA nested pass — safe order inversion, see _spawn_phase.
        # The kernel's hardware PRNG gets a dedicated key split so no key
        # material is shared with the threefry stream stored in state.rng_key.
        new_key, kernel_key = jax.random.split(new_key)
        seed = jax.lax.bitcast_convert_type(kernel_key[1], jnp.int32)
        dyn, estate = _pack_scalar_rows(
            static, manual_queued, fields["ring_cursor"], [seed],
            any_alive_pre.astype(jnp.int32),
            time_in_cycle, last_emission, enabled,
        )
    else:
        dyn = jnp.zeros((1, 16), jnp.int32)  # ignored: kernel has no spawn pipeline
        estate = jnp.zeros((E, 8), jnp.float32)
    f32_fields = {name: fields[name] for name in active_f32_fields(static)}
    fold_spec = None
    if fold_out:
        from ..step import nested_parent_fields

        fold_es = tuple(
            e for e in range(E)
            if static.mode_kinds[e] != MODE_GLOBAL and static.nested_valid[e]
        )
        M = min(static.nested_m, state.capacity)
        fold_spec = (M, nested_parent_fields(static), fold_es,
                     [fields["last_emitted"][e] for e in fold_es])
    alive_new, ptype_new, dump_mask, new_fields, dyn_new, estate_new, planes, fold_raw, _stats = _run_fused_kernel(
        static, params, colliders, frame, dyn, estate, fields["alive"], fields["ptype"], f32_fields,
        kernel_spawn=kernel_global, pack_render=pack_render,
        nested_payloads=nested_payloads, nested_fold=fold_spec,
        kernel_stats=kernel_stats,
    )
    if kernel_global:
        manual_queued = dyn_new[0, 0]
        cursor_out = dyn_new[0, 1]
        time_in_cycle = estate_new[:, 0]
        last_emission = estate_new[:, 1]
        enabled = estate_new[:, 2] != 0.0
    else:
        cursor_out = fields["ring_cursor"]
    # Elided fields pass through from the spawn phase (which already wrote
    # any spawn-time values; under the elision invariants those writes are
    # the constants the kernel assumed).
    full_fields = {name: fields[name] for name in _F32_FIELDS}
    full_fields.update(new_fields)
    if ptype_new is None:
        ptype_new = fields["ptype"]

    st, out = _fused_epilogue(
        static, params, state, alive_new, ptype_new, full_fields, dump_mask,
        fields["last_emitted"], enabled, time_in_cycle, last_emission, manual_queued,
        cursor_out, new_key, spawn_stats, stats_row=_stats,
    )
    res = (st, out)
    if pack_render:
        res = res + (planes,)
    if fold_out:
        le_list, totals, pvals = fold_raw
        carry = {
            e: (le_list[j], totals[j, 0], pvals[j])
            for j, e in enumerate(fold_spec[2])
        }
        res = res + (carry,)
    return res


def can_fold_nested(static: SpawnerStatic, capacity: int) -> bool:
    """The nested-cadence fold applies where the FULL hybrid fast path runs:
    merge-capable ring archetypes with a 128-aligned child buffer smaller
    than the pool, at least one valid nested emitter, on a tile-aligned
    pool. (Testing seams — _ABLATE stage stubs, forced scatter write-back —
    are checked by the caller so ablation tools keep timing the unfolded
    chain.)"""
    if can_fuse(static) or not static.ring_claim:
        return False
    if not (_NESTED_FOLD and _NESTED_KERNEL_MERGE):
        return False
    M = min(static.nested_m, capacity)
    return (
        capacity % (BLOCK_ROWS * LANES) == 0
        and M % LANES == 0
        and capacity > M
        and any(
            static.mode_kinds[e] != MODE_GLOBAL and static.nested_valid[e]
            for e in range(static.num_emitters)
        )
    )


def _seed_nested_carry(static, params, state):
    """Seed the fold carry for a chain's first frame: the standalone cadence
    pass per valid nested emitter on the chain's initial state — exactly
    what _spawn_phase(kernel_cadence=True) would run, hoisted out of the
    scan so every in-scan frame consumes the previous kernel's epilogue."""
    from ..step import _active_flag, nested_parent_fields

    M = min(static.nested_m, state.capacity)
    active = _active_flag(static, state)
    fetch = {k: getattr(state, k) for k in nested_parent_fields(static)}
    carry = {}
    for e in range(static.num_emitters):
        if static.mode_kinds[e] == MODE_GLOBAL or not static.nested_valid[e]:
            continue
        gate = active & state.enabled[e]
        new_le, _cum, total, pvals = nested_cadence_pass(
            static, params, e, state.alive, state.ptype, state.age,
            state.lifetime, state.last_emitted[e], gate, True, M,
            parent_fields=fetch,
        )
        carry[e] = (new_le, total, pvals)
    return carry


def _chain_nested_folded(static, params, colliders, state, frame, n_frames):
    """Chain n nested frames with the cadence fold: seed once, then each
    scan frame is [XLA child stage -> ONE kernel whose epilogue emits the
    next frame's carry]; the last frame consumes its carry without folding.
    Final state is bit-identical to the unfolded chain (the pending carry
    dropped at chain end is a pure function of the final state — the next
    chain's seed recomputes it)."""
    hoist = _scan_hoist(static, state)
    if hoist is None:
        to_carry, from_carry = (lambda s: s), (lambda c: c)
    else:
        to_carry, from_carry = hoist
    ncarry = _seed_nested_carry(static, params, state)
    if n_frames > 1:

        def body(c, _):
            sc, nc = c
            s2, _o, nc2 = fused_step_hybrid(
                static, params, colliders, from_carry(sc), frame,
                nested_carry=nc, fold_out=True,
            )
            return (to_carry(s2), nc2), None

        (sc, ncarry), _ = jax.lax.scan(
            body, (to_carry(state), ncarry), None, length=n_frames - 1
        )
        state = from_carry(sc)
    return fused_step_hybrid(
        static, params, colliders, state, frame, nested_carry=ncarry
    )


def step_auto(static, params, colliders, state, frame, kernel_stats: bool = False):
    """Dispatch: on TPU with a tile-aligned pool, global-only archetypes take
    the all-in-kernel fused path and nested/mixed archetypes the hybrid path
    (XLA spawn + kernel integrate); else the XLA path (CPU backend, odd
    capacities). kernel_stats: compute StepOutputs' aabb/count stats
    in-kernel (interactive Scene path; see _make_kernel kernel_stats)."""
    from ..step import step

    if jax.default_backend() == "tpu" and state.capacity % (BLOCK_ROWS * LANES) == 0:
        if can_fuse(static):
            return fused_step(static, params, colliders, state, frame,
                              kernel_stats=kernel_stats)
        return fused_step_hybrid(static, params, colliders, state, frame,
                                 kernel_stats=kernel_stats)
    return step(static, params, colliders, state, frame)


@partial(jax.jit, static_argnums=(0,))
def step_auto_jit(static, params, colliders, state, frame):
    return step_auto(static, params, colliders, state, frame)


def can_pack_render(static: SpawnerStatic, capacity: int) -> bool:
    """The in-kernel render pack applies where the fused/hybrid kernel runs
    and the pool holds ONE particle type (the host compaction then needs no
    per-type partition; multi-type archetypes use the XLA per-type pack)."""
    return (
        jax.default_backend() == "tpu"
        and capacity % (BLOCK_ROWS * LANES) == 0
        and static.single_type
    )


def step_auto_packed(static, params, colliders, state, frame, kernel_stats: bool = False):
    """step_auto + the render extract: returns (state, outputs, planes) where
    planes is the in-kernel 9-plane pack (scale + base rgba + emissive rgba)
    when the kernel path applies, else None (caller falls back to the XLA
    per-type dense pack). The full 16-plane render contract = state positions
    + rotations + these planes (render.planes_to_rows assembles them)."""
    from ..step import step

    if can_pack_render(static, state.capacity):
        if can_fuse(static):
            return fused_step(static, params, colliders, state, frame, pack_render=True,
                              kernel_stats=kernel_stats)
        return fused_step_hybrid(static, params, colliders, state, frame, pack_render=True,
                                 kernel_stats=kernel_stats)
    s, o = step_auto(static, params, colliders, state, frame, kernel_stats=kernel_stats)
    return s, o, None


@partial(jax.jit, static_argnums=(0,))
def step_auto_packed_jit(static, params, colliders, state, frame):
    return step_auto_packed(static, params, colliders, state, frame)


@partial(jax.jit, static_argnums=(0, 5))
def multi_step_auto_packed(static, params, colliders, state, frame, n_frames: int):
    """multi_step_auto whose FINAL frame also emits the in-kernel render
    planes (the only frame a renderer consumes)."""
    if n_frames < 1:
        raise ValueError("multi_step_auto_packed needs n_frames >= 1")
    if n_frames > 1:
        state, _o = _multi_step_impl(static, params, colliders, state, frame, n_frames - 1)
    return step_auto_packed(static, params, colliders, state, frame)


def _scan_hoist(static, state):
    """Scan-carry hoisting for multi-frame chains: pool arrays invariant
    under this archetype (elided rotation / lifetime / ptype — see
    active_f32_fields — and, for global-only archetypes, last_emitted) are
    pulled OUT of the scan carry (a scan copies every carried leaf per
    iteration even if the body returns it untouched, silently paying back
    the elided HBM traffic), and derived alive is reconstructed from age.
    Returns (to_carry, from_carry) or None when no hoisting applies."""
    import dataclasses as _dc

    if not (jax.default_backend() == "tpu" and state.capacity % (BLOCK_ROWS * LANES) == 0):
        return None
    af = set(active_f32_fields(static))
    names = [n for n in _F32_FIELDS if n not in af]
    if static.single_type:
        names.append("ptype")
    if can_fuse(static):
        names.append("last_emitted")  # only nested emitters mutate it
    if not names:
        return None
    invariant = {n: getattr(state, n) for n in names}
    derived = static.derived_alive and can_fuse(static)
    pool_names = [f.name for f in _dc.fields(PoolState)]

    def to_carry(s):
        return {
            n: getattr(s, n)
            for n in pool_names
            if n not in invariant and not (derived and n == "alive")
        }

    def from_carry(c):
        kw = dict(c)
        kw.update(invariant)
        if derived:  # alive is derived state (see SpawnerStatic.derived_alive)
            kw["alive"] = kw["age"] < (
                np.float32(static.const_lifetime) if static.const_lifetime is not None
                else kw["lifetime"])
        return PoolState(**kw)

    return to_carry, from_carry


def _chain(step_fn, state, n_frames: int, hoist):
    """lax.scan over step_fn with optional carry hoisting; returns the final
    (state, outputs) — intermediate outputs are dead-code-eliminated."""
    if hoist is None:

        def body(s, _):
            s2, _o = step_fn(s)
            return s2, None

        final, _ = jax.lax.scan(body, state, None, length=n_frames - 1)
        return step_fn(final)

    to_carry, from_carry = hoist

    def body(c, _):
        s2, _o = step_fn(from_carry(c))
        return to_carry(s2), None

    carry, _ = jax.lax.scan(body, to_carry(state), None, length=n_frames - 1)
    return step_fn(from_carry(carry))


def _chain_with_unroll(static, colliders, state, n_frames, single, make_unrolled):
    """Chain n frames with the in-kernel multi-frame unroll where it
    applies: can_unroll archetypes step U frames per kernel invocation
    (fused_step(unroll=U), bit-equal to U sequential steps; the pool is
    read/written once per U frames). Remainder frames chain as singles.

    U policy (measured, PERF_NOTES "Multi-frame unroll"): U=MAX_UNROLL
    wherever the kernel is bandwidth/launch bound; collision archetypes
    cap at U=2 — the narrow phase is VPU-code bound and x4 replication
    hits the same code-size scheduling blowup as high collider counts
    (0.60 vs 0.40 ms @1M, 2 colliders)."""
    hoist = _scan_hoist(static, state)
    unrollable = (
        jax.default_backend() == "tpu"
        and state.capacity % (BLOCK_ROWS * LANES) == 0
        and can_unroll(static)
    )
    has_coll = colliders is not None and len(colliders.kinds) > 0 and static.any_collision
    U = 2 if has_coll else MAX_UNROLL
    if not unrollable or n_frames < U:
        return _chain(single, state, n_frames, hoist)
    n_u, rem = divmod(n_frames, U)
    ustep = make_unrolled(U)
    if rem == 0:
        return _chain(ustep, state, n_u, hoist)
    state, _o = _chain(ustep, state, n_u, hoist)
    return _chain(single, state, rem, hoist)


def _multi_step_impl(static, params, colliders, state, frame, n_frames: int):
    """n frames in one dispatch: lax.scan with invariant-array carry
    hoisting (_scan_hoist) + the in-kernel unroll (_chain_with_unroll).
    Merge-capable nested archetypes take the cadence-folded chain
    (_chain_nested_folded): one kernel per frame instead of
    [cadence pass -> child stage -> kernel]."""
    from ..step import _ABLATE, _FORCE_SCATTER_WRITEBACK

    if (
        n_frames >= 2
        and can_fold_nested(static, state.capacity)
        # off-TPU the fold needs BOTH force seams: the folded hybrid body
        # asserts the merge path, which on CPU only _FORCE_NESTED_MERGE_CPU
        # enables
        and (jax.default_backend() == "tpu"
             or (_FORCE_NESTED_FOLD_CPU and _FORCE_NESTED_MERGE_CPU))
        and not _ABLATE
        and not _FORCE_SCATTER_WRITEBACK
    ):
        return _chain_nested_folded(static, params, colliders, state, frame, n_frames)
    return _chain_with_unroll(
        static, colliders, state, n_frames,
        lambda s: step_auto(static, params, colliders, s, frame),
        lambda U: lambda s: fused_step(static, params, colliders, s, frame, unroll=U),
    )


@partial(jax.jit, static_argnums=(0, 5))
def multi_step_auto(static, params, colliders, state, frame, n_frames: int):
    """n frames in one dispatch (see _multi_step_impl). See step.multi_step."""
    if n_frames < 1:
        raise ValueError("multi_step_auto needs n_frames >= 1")
    return _multi_step_impl(static, params, colliders, state, frame, n_frames)


def _fleet_kernel_ok(static, states) -> bool:
    """The fleet-native kernel applies where the solo fused kernel would:
    TPU backend, tile-aligned per-slot capacity, global-only archetype."""
    return (
        jax.default_backend() == "tpu"
        and states.capacity % (BLOCK_ROWS * LANES) == 0
        and can_fuse(static)
    )


@partial(jax.jit, static_argnums=(0, 5))
def multi_step_fleet_stacked(static, params, colliders, states, frames, n_frames: int):
    """n frames of a whole fleet ([S]-stacked params/states/frames) in one
    dispatch. On TPU with tile-aligned capacities every FRAME is one
    fleet-native kernel launch for the whole group (fused_step_fleet) with
    the usual in-kernel multi-frame unroll; elsewhere the vmapped XLA step."""
    if n_frames < 1:
        raise ValueError("multi_step_fleet_stacked needs n_frames >= 1")
    if _fleet_kernel_ok(static, states):
        return _chain_with_unroll(
            static, colliders, states, n_frames,
            lambda s: fused_step_fleet(static, params, colliders, s, frames),
            lambda U: lambda s: fused_step_fleet(
                static, params, colliders, s, frames, unroll=U),
        )
    vstep = jax.vmap(lambda p, s, f: step_auto(static, p, colliders, s, f))
    return _chain_with_unroll(
        static, colliders, states, n_frames,
        lambda s: vstep(params, s, frames),
        lambda U: lambda s: jax.vmap(
            lambda p, st, f: fused_step(static, p, colliders, st, f, unroll=U)
        )(params, s, frames),
    )


def step_auto_fleet(static, params, colliders, states, frames):
    """One frame of an [S]-stacked fleet: the fleet-native kernel where it
    applies, else the vmapped step_auto (bit-identical per slot)."""
    if _fleet_kernel_ok(static, states):
        return fused_step_fleet(static, params, colliders, states, frames)
    return jax.vmap(
        lambda p, s, f: step_auto(static, p, colliders, s, f)
    )(params, states, frames)


@partial(jax.jit, static_argnums=(0, 5))
def multi_step_fleet(static, params, colliders, states, frames, n_frames: int):
    """multi_step_fleet_stacked with ONE shared params tree (the common
    fleet shape: S spawners of one configuration; broadcast once here)."""
    S = states.alive.shape[0]
    P = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S,) + jnp.shape(x)), params)
    return multi_step_fleet_stacked(static, P, colliders, states, frames, n_frames)
