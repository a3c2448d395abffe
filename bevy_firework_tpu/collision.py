"""Vectorized particle-vs-scene collision kernel.

Replaces the reference's substepped raycast-and-bounce loop
(`/root/reference/src/core.rs:744-800`, SURVEY.md §3.4 / §A.5) with a
branchless per-lane computation over an analytic collider table:

  while delta > 0 and n_steps < 4:
    hit = nearest solid raycast(pos, dir(vel), |vel|*delta)
    - inside (distance == 0): push out along hit normal, falling back to the
      velocity direction (or +Y) when the normal is zero;
      pos += max(|vel|, 1) * normal * delta        [delta NOT consumed]
    - hit: advance to hit point; split velocity into normal projection /
      tangential rejection; friction impulse min(|proj|,|reject|)*friction
      opposing the tangential direction; normal response -restitution*proj;
      offset pos 1e-4 along the normal; delta -= distance (clamped to
      [0, orig_delta])
    - destroy_on_collision: freeze the lane, mark destroyed
    - miss: advect pos += vel*delta; delta = 0

Solid-cast semantics match parry: a ray starting inside a shape reports
distance 0 with a zero normal (which the reference's fallback path then
handles), otherwise distance is the entry point along the unit direction.
"""

from __future__ import annotations

import jax.numpy as jnp

from .colliders import (
    COLLIDER_CAPSULE,
    COLLIDER_CONE,
    COLLIDER_CUBOID,
    COLLIDER_CYLINDER,
    COLLIDER_HALFSPACE,
    COLLIDER_HULL,
    COLLIDER_SPHERE,
    ColliderTable,
)
from .utils.quat import quat_rotate

import numpy as np

# numpy scalars (not traced jnp arrays) so the raycast helpers can be inlined
# into pallas kernels without captured-constant errors
BIG = np.float32(1e30)
EPS = np.float32(1e-12)


def _normalize_or_zero(vx, vy, vz):
    l2 = vx * vx + vy * vy + vz * vz
    inv = jnp.where(l2 > 0, 1.0 / jnp.sqrt(l2), 0.0)
    return vx * inv, vy * inv, vz * inv


def _quat_conj_rotate(q, vx, vy, vz):
    """Rotate vector by q^-1 (unit q)."""
    qc = jnp.stack([-q[0], -q[1], -q[2], q[3]])
    v = jnp.stack([vx, vy, vz], axis=-1)
    out = quat_rotate(qc, v)
    return out[..., 0], out[..., 1], out[..., 2]


def _quat_rotate_c(q, vx, vy, vz):
    v = jnp.stack([vx, vy, vz], axis=-1)
    out = quat_rotate(q, v)
    return out[..., 0], out[..., 1], out[..., 2]


def _ray_halfspace(ox, oy, oz, dx, dy, dz):
    """Plane through local origin, +Y normal, solid lower halfspace."""
    inside = oy <= 0.0
    t = -oy / jnp.where(jnp.abs(dy) < EPS, jnp.where(dy < 0, -EPS, EPS), dy)
    hit_surface = (dy < 0.0) & (t >= 0.0)
    dist = jnp.where(inside, 0.0, jnp.where(hit_surface, t, BIG))
    nx = jnp.zeros_like(ox)
    ny = jnp.where(inside, 0.0, 1.0)
    nz = jnp.zeros_like(ox)
    return dist, nx, ny, nz


def _ray_sphere(ox, oy, oz, dx, dy, dz, r):
    c = ox * ox + oy * oy + oz * oz - r * r
    inside = c <= 0.0
    b = ox * dx + oy * dy + oz * dz
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    valid = (disc >= 0.0) & (t >= 0.0)
    dist = jnp.where(inside, 0.0, jnp.where(valid, t, BIG))
    hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
    nx, ny, nz = _normalize_or_zero(hx, hy, hz)
    zero = jnp.zeros_like(ox)
    return dist, jnp.where(inside, zero, nx), jnp.where(inside, zero, ny), jnp.where(inside, zero, nz)


def _ray_cuboid(ox, oy, oz, dx, dy, dz, hx, hy, hz):
    inside = (jnp.abs(ox) <= hx) & (jnp.abs(oy) <= hy) & (jnp.abs(oz) <= hz)

    def slab(o, d, h):
        invd = 1.0 / jnp.where(jnp.abs(d) < EPS, jnp.where(d < 0, -EPS, EPS), d)
        t1 = (-h - o) * invd
        t2 = (h - o) * invd
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    tx0, tx1 = slab(ox, dx, hx)
    ty0, ty1 = slab(oy, dy, hy)
    tz0, tz1 = slab(oz, dz, hz)
    tmin = jnp.maximum(jnp.maximum(tx0, ty0), tz0)
    tmax = jnp.minimum(jnp.minimum(tx1, ty1), tz1)
    valid = (tmax >= tmin) & (tmin >= 0.0)
    dist = jnp.where(inside, 0.0, jnp.where(valid, tmin, BIG))
    # entering face normal: the axis achieving tmin, signed opposite the ray
    is_x = tmin == tx0
    is_y = (~is_x) & (tmin == ty0)
    nx = jnp.where(is_x, -jnp.sign(dx), 0.0)
    ny = jnp.where(is_y, -jnp.sign(dy), 0.0)
    nz = jnp.where(is_x | is_y, 0.0, -jnp.sign(dz))
    zero = jnp.zeros_like(ox)
    return dist, jnp.where(inside, zero, nx), jnp.where(inside, zero, ny), jnp.where(inside, zero, nz)


def _ray_infinite_cylinder(ox, oz, dx, dz, r):
    """2D circle intersection in the XZ plane. Returns (t_enter, valid)."""
    a = dx * dx + dz * dz
    b = ox * dx + oz * dz
    c = ox * ox + oz * oz - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(a < EPS, EPS, a)
    t = (-b - sq) / safe_a
    valid = (disc >= 0.0) & (a >= EPS) & (t >= 0.0)
    return t, valid


def _ray_capsule(ox, oy, oz, dx, dy, dz, r, hs):
    # inside: distance from point to segment [(0,-hs,0),(0,hs,0)] <= r
    cy = jnp.clip(oy, -hs, hs)
    d2 = ox * ox + (oy - cy) * (oy - cy) + oz * oz
    inside = d2 <= r * r

    # side wall
    t_side, v_side = _ray_infinite_cylinder(ox, oz, dx, dz, r)
    y_at = oy + t_side * dy
    v_side = v_side & (jnp.abs(y_at) <= hs)

    # cap spheres at (0, +-hs, 0)
    def cap(cyy):
        oy2 = oy - cyy
        b = ox * dx + oy2 * dy + oz * dz
        c = ox * ox + oy2 * oy2 + oz * oz - r * r
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = -b - sq
        return t, (disc >= 0.0) & (t >= 0.0)

    t_top, v_top = cap(hs)
    t_bot, v_bot = cap(-hs)
    t_caps = jnp.where(v_top, t_top, BIG)
    t_caps = jnp.minimum(t_caps, jnp.where(v_bot, t_bot, BIG))
    t = jnp.minimum(jnp.where(v_side, t_side, BIG), t_caps)
    valid = t < BIG
    dist = jnp.where(inside, 0.0, jnp.where(valid, t, BIG))
    hxp, hyp, hzp = ox + t * dx, oy + t * dy, oz + t * dz
    cy_hit = jnp.clip(hyp, -hs, hs)
    nx, ny, nz = _normalize_or_zero(hxp, hyp - cy_hit, hzp)
    zero = jnp.zeros_like(ox)
    return dist, jnp.where(inside, zero, nx), jnp.where(inside, zero, ny), jnp.where(inside, zero, nz)


def _ray_cylinder(ox, oy, oz, dx, dy, dz, r, hh):
    rad2 = ox * ox + oz * oz
    inside = (rad2 <= r * r) & (jnp.abs(oy) <= hh)

    t_side, v_side = _ray_infinite_cylinder(ox, oz, dx, dz, r)
    y_at = oy + t_side * dy
    v_side = v_side & (jnp.abs(y_at) <= hh)

    def cap(cy, sign):
        t = (cy - oy) / jnp.where(jnp.abs(dy) < EPS, jnp.where(dy < 0, -EPS, EPS), dy)
        xx, zz = ox + t * dx, oz + t * dz
        ok = (t >= 0.0) & (xx * xx + zz * zz <= r * r) & (sign * dy < 0.0)
        return t, ok

    t_top, v_top = cap(hh, 1.0)
    t_bot, v_bot = cap(-hh, -1.0)

    t = jnp.where(v_side, t_side, BIG)
    t = jnp.minimum(t, jnp.where(v_top, t_top, BIG))
    t = jnp.minimum(t, jnp.where(v_bot, t_bot, BIG))
    valid = t < BIG
    dist = jnp.where(inside, 0.0, jnp.where(valid, t, BIG))

    hit_top = valid & v_top & (t == jnp.where(v_top, t_top, BIG))
    hit_bot = valid & v_bot & (t == jnp.where(v_bot, t_bot, BIG))
    sx, sy2, sz = ox + t * dx, oy + t * dy, oz + t * dz
    snx, _, snz = _normalize_or_zero(sx, jnp.zeros_like(sx), sz)
    nx = jnp.where(hit_top | hit_bot, 0.0, snx)
    ny = jnp.where(hit_top, 1.0, jnp.where(hit_bot, -1.0, 0.0))
    nz = jnp.where(hit_top | hit_bot, 0.0, snz)
    zero = jnp.zeros_like(ox)
    return dist, jnp.where(inside, zero, nx), jnp.where(inside, zero, ny), jnp.where(inside, zero, nz)


def _ray_cone(ox, oy, oz, dx, dy, dz, r, hh):
    """Cone with tip at (0, +hh, 0), base disk radius r at y = -hh."""
    k = r / (2.0 * hh)  # radius growth per unit below the tip
    # lateral surface: x^2+z^2 = k^2 (hh - y)^2, y in [-hh, hh]
    w = hh - oy  # distance below tip
    inside = (oy >= -hh) & (oy <= hh) & (ox * ox + oz * oz <= (k * w) * (k * w))

    a = dx * dx + dz * dz - k * k * dy * dy
    b = ox * dx + oz * dz + k * k * w * dy
    c = ox * ox + oz * oz - k * k * w * w
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(jnp.abs(a) < EPS, EPS, a)
    t1 = (-b - sq) / safe_a
    t2 = (-b + sq) / safe_a
    tlo = jnp.minimum(t1, t2)
    thi = jnp.maximum(t1, t2)
    # linear case (ray parallel to cone surface): a ~ 0 -> t = -c / (2b)
    t_lin = -c / jnp.where(jnp.abs(b) < EPS, EPS, 2.0 * b)
    use_lin = jnp.abs(a) < EPS

    def side_ok(t):
        y = oy + t * dy
        return (t >= 0.0) & (y >= -hh) & (y <= hh) & (disc >= 0.0)

    t_side = jnp.where(use_lin & (t_lin >= 0.0), t_lin, jnp.where(side_ok(tlo), tlo, jnp.where(side_ok(thi), thi, BIG)))
    t_side = jnp.where(use_lin, jnp.where((t_lin >= 0.0) & (jnp.abs(oy + t_lin * dy) <= hh), t_lin, BIG), t_side)

    # base disk
    t_base = (-hh - oy) / jnp.where(jnp.abs(dy) < EPS, jnp.where(dy < 0, -EPS, EPS), dy)
    bx, bz = ox + t_base * dx, oz + t_base * dz
    v_base = (t_base >= 0.0) & (bx * bx + bz * bz <= r * r) & (dy > 0.0)

    t = jnp.minimum(t_side, jnp.where(v_base, t_base, BIG))
    valid = t < BIG
    dist = jnp.where(inside, 0.0, jnp.where(valid, t, BIG))

    hit_base = valid & v_base & (t == jnp.where(v_base, t_base, BIG))
    sxh, syh, szh = ox + t * dx, oy + t * dy, oz + t * dz
    # lateral normal: gradient of f = x^2+z^2-k^2(hh-y)^2 -> (2x, 2k^2(hh-y), 2z)
    gnx, gny, gnz = _normalize_or_zero(sxh, k * k * (hh - syh), szh)
    nx = jnp.where(hit_base, 0.0, gnx)
    ny = jnp.where(hit_base, -1.0, gny)
    nz = jnp.where(hit_base, 0.0, gnz)
    zero = jnp.zeros_like(ox)
    return dist, jnp.where(inside, zero, nx), jnp.where(inside, zero, ny), jnp.where(inside, zero, nz)


def _ray_hull(ox, oy, oz, dx, dy, dz, planes):
    """Convex plane-set hull (COLLIDER_HULL, VERDICT r3 missing #1): inside
    is the intersection of half-spaces n·x <= d (planes [P, 4] rows of
    (nx, ny, nz, d), unit normals, local space). Slab-style entry/exit over
    the planes — the cuboid test generalized to arbitrary plane sets; the
    entering plane's normal is the hit normal. Degenerate padding rows
    (n = 0, d = BIG) never constrain, so every hull unrolls to the padded
    width with no count branch. Inside => dist 0, zero normal (the response
    path's penetration fallbacks then apply, core.rs:766-775)."""
    P = planes.shape[0]
    t_enter = jnp.full_like(ox, -BIG)
    t_exit = jnp.full_like(ox, BIG)
    nx = jnp.zeros_like(ox)
    ny = jnp.zeros_like(ox)
    nz = jnp.zeros_like(ox)
    inside = ox * 0.0 >= 0.0  # all-true of the right shape
    miss = ~inside
    for p in range(P):
        pnx, pny, pnz, pd = planes[p, 0], planes[p, 1], planes[p, 2], planes[p, 3]
        denom = pnx * dx + pny * dy + pnz * dz
        num = pd - (pnx * ox + pny * oy + pnz * oz)
        inside = inside & (num >= 0.0)
        parallel = jnp.abs(denom) < EPS
        t = num / jnp.where(parallel, jnp.where(denom < 0, -EPS, EPS), denom)
        miss = miss | (parallel & (num < 0.0))  # outside a parallel slab
        take = (denom < 0.0) & (~parallel) & (t > t_enter)
        nx = jnp.where(take, pnx, nx)
        ny = jnp.where(take, pny, ny)
        nz = jnp.where(take, pnz, nz)
        t_enter = jnp.where(take, t, t_enter)
        t_exit = jnp.where((denom > 0.0) & (~parallel), jnp.minimum(t_exit, t), t_exit)
    valid = (~miss) & (t_exit >= t_enter) & (t_enter >= 0.0)
    dist = jnp.where(inside, 0.0, jnp.where(valid, t_enter, BIG))
    zero = jnp.zeros_like(ox)
    keep = valid & ~inside
    return (dist, jnp.where(keep, nx, zero), jnp.where(keep, ny, zero),
            jnp.where(keep, nz, zero))


def raycast_scene(table: ColliderTable, lane_mask_u32, px, py, pz, dx, dy, dz, max_dist):
    """Nearest solid hit over all colliders, per lane.

    Returns (hit: bool[N], dist: f32[N], nx, ny, nz world-space normals).
    Colliders whose `layers` doesn't intersect the lane's filter mask are
    skipped (avian SpatialQueryFilter semantics).
    """
    from .colliders import masked_layers

    best = jnp.full_like(px, BIG)
    bnx = jnp.zeros_like(px)
    bny = jnp.zeros_like(px)
    bnz = jnp.zeros_like(px)
    eff_layers = masked_layers(table)  # disabled colliders -> layers 0
    for ci, k in enumerate(table.kinds):
        q = table.rotation[ci]
        cp = table.position[ci]
        if table.identity_rot[ci]:
            ox, oy, oz = px - cp[0], py - cp[1], pz - cp[2]
            rdx, rdy, rdz = dx, dy, dz
        else:
            ox, oy, oz = _quat_conj_rotate(q, px - cp[0], py - cp[1], pz - cp[2])
            rdx, rdy, rdz = _quat_conj_rotate(q, dx, dy, dz)
        p = table.params[ci]
        if k == COLLIDER_HALFSPACE:
            dist, nx, ny, nz = _ray_halfspace(ox, oy, oz, rdx, rdy, rdz)
        elif k == COLLIDER_SPHERE:
            dist, nx, ny, nz = _ray_sphere(ox, oy, oz, rdx, rdy, rdz, p[0])
        elif k == COLLIDER_CUBOID:
            dist, nx, ny, nz = _ray_cuboid(ox, oy, oz, rdx, rdy, rdz, p[0], p[1], p[2])
        elif k == COLLIDER_CAPSULE:
            dist, nx, ny, nz = _ray_capsule(ox, oy, oz, rdx, rdy, rdz, p[0], p[1])
        elif k == COLLIDER_CYLINDER:
            dist, nx, ny, nz = _ray_cylinder(ox, oy, oz, rdx, rdy, rdz, p[0], p[1])
        elif k == COLLIDER_CONE:
            dist, nx, ny, nz = _ray_cone(ox, oy, oz, rdx, rdy, rdz, p[0], p[1])
        elif k == COLLIDER_HULL:
            dist, nx, ny, nz = _ray_hull(
                ox, oy, oz, rdx, rdy, rdz,
                table.hull_planes[ci, : table.hull_counts[ci]])
        else:
            continue
        layer_ok = (lane_mask_u32 & eff_layers[ci]) != 0
        dist = jnp.where(layer_ok, dist, BIG)
        closer = (dist <= max_dist) & (dist < best)
        if table.identity_rot[ci]:
            wnx, wny, wnz = nx, ny, nz
        else:
            wnx, wny, wnz = _quat_rotate_c(q, nx, ny, nz)
        bnx = jnp.where(closer, wnx, bnx)
        bny = jnp.where(closer, wny, bny)
        bnz = jnp.where(closer, wnz, bnz)
        best = jnp.where(closer, dist, best)
    hit = best <= max_dist
    return hit, jnp.where(hit, best, 0.0), bnx, bny, bnz


def particle_collision(table: ColliderTable, px, py, pz, vx, vy, vz, dt, restitution, friction, destroy_flag, lane_mask_u32):
    """Vectorized port of `particle_collision` (`core.rs:744-800`).

    All per-lane inputs are [N] f32 (restitution/friction/destroy gathered per
    particle type by the caller). Returns (px,py,pz, vx,vy,vz, destroyed).
    """
    orig_delta = jnp.asarray(dt, jnp.float32)
    delta = jnp.broadcast_to(orig_delta, px.shape).astype(jnp.float32)
    destroyed = jnp.zeros(px.shape, bool)
    done = jnp.zeros(px.shape, bool)

    for _ in range(4):
        lane_active = (~done) & (delta > 0.0)

        speed2 = vx * vx + vy * vy + vz * vz
        speed = jnp.sqrt(speed2)
        # Dir3::try_from(vel): unit direction; zero/non-normalizable -> +Y
        ok = speed2 > 0.0
        inv = jnp.where(ok, 1.0 / jnp.where(speed > 0, speed, 1.0), 0.0)
        dx = jnp.where(ok, vx * inv, 0.0)
        dy = jnp.where(ok, vy * inv, 1.0)
        dz = jnp.where(ok, vz * inv, 0.0)

        max_dist = speed * delta
        hit, dist, nx, ny, nz = raycast_scene(table, lane_mask_u32, px, py, pz, dx, dy, dz, max_dist)
        hit = hit & lane_active

        inside = hit & (dist == 0.0)
        surface = hit & (dist > 0.0)
        miss = lane_active & ~hit

        # --- inside: push out along normal (zero-normal fallbacks, core.rs:766-775)
        n_zero = (nx == 0.0) & (ny == 0.0) & (nz == 0.0)
        v_zero = ~ok
        fnx = jnp.where(n_zero, jnp.where(v_zero, 0.0, dx), nx)
        fny = jnp.where(n_zero, jnp.where(v_zero, 1.0, dy), ny)
        fnz = jnp.where(n_zero, jnp.where(v_zero, 0.0, dz), nz)
        push = jnp.maximum(speed, 1.0) * delta
        px = jnp.where(inside, px + push * fnx, px)
        py = jnp.where(inside, py + push * fny, py)
        pz = jnp.where(inside, pz + push * fnz, pz)

        # --- surface hit: advance, bounce (core.rs:776-787)
        px_s = px + dx * dist
        py_s = py + dy * dist
        pz_s = pz + dz * dist
        vdotn = vx * nx + vy * ny + vz * nz
        pjx, pjy, pjz = vdotn * nx, vdotn * ny, vdotn * nz  # project_onto (unit normal)
        rjx, rjy, rjz = vx - pjx, vy - pjy, vz - pjz  # reject_from
        proj_len = jnp.abs(vdotn)
        rej_len = jnp.sqrt(rjx * rjx + rjy * rjy + rjz * rjz)
        friction_dv = jnp.minimum(proj_len, rej_len) * friction
        rnx, rny, rnz = _normalize_or_zero(rjx, rjy, rjz)
        nvx = rjx - friction_dv * rnx - restitution * pjx
        nvy = rjy - friction_dv * rny - restitution * pjy
        nvz = rjz - friction_dv * rnz - restitution * pjz
        px = jnp.where(surface, px_s + nx * 1e-4, px)
        py = jnp.where(surface, py_s + ny * 1e-4, py)
        pz = jnp.where(surface, pz_s + nz * 1e-4, pz)
        vx = jnp.where(surface, nvx, vx)
        vy = jnp.where(surface, nvy, vy)
        vz = jnp.where(surface, nvz, vz)
        delta = jnp.where(surface, jnp.clip(delta - dist, 0.0, orig_delta), delta)

        # destroy-on-collision: freeze lane immediately (core.rs:788-791)
        kill = hit & (destroy_flag > 0.0)
        destroyed = destroyed | kill
        done = done | kill

        # --- miss: advect and finish (core.rs:792-795)
        px = jnp.where(miss, px + vx * delta, px)
        py = jnp.where(miss, py + vy * delta, py)
        pz = jnp.where(miss, pz + vz * delta, pz)
        delta = jnp.where(miss, 0.0, delta)

    return px, py, pz, vx, vy, vz, destroyed
