"""Independent NumPy-f32 oracle transliterating the reference's semantics.

This is NOT the engine — it's an AoS, per-particle, scalar reimplementation of
the Rust systems (`/root/reference/src/core.rs`), kept deliberately close to
the original's op order so the vectorized TPU engine can be validated against
it (SURVEY.md §4: "Cross-implementation parity tests replace visual
inspection").  Randomized draws are injected so deterministic configs
(constant ranges, Point shapes) need no RNG at all.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from bevy_firework_tpu.cadence import np_compute_emission_count
from bevy_firework_tpu.settings import (
    EmissionModeKind,
    EmissionPacingKind,
    ParticleSpawner,
)
from bevy_firework_tpu.utils.f32 import F32_MIN, np_rem_euclid
from bevy_firework_tpu.utils.quat import np_quat_mul, np_quat_rotate

F = np.float32


def v3(x=0.0, y=0.0, z=0.0):
    return np.array([x, y, z], dtype=np.float32)


@dataclasses.dataclass
class OParticle:
    position: np.ndarray
    velocity: np.ndarray
    rotation: np.ndarray  # xyzw
    angular_velocity: np.ndarray
    initial_scale: float
    scale: float
    age: float
    lifetime: float
    base_color: np.ndarray
    emissive_color: np.ndarray
    last_emitted_age: List[float]


@dataclasses.dataclass
class OEmission:
    last_emission: float = 0.0
    time_passed_in_cycle: float = 0.0
    enabled: bool = True


@dataclasses.dataclass
class OracleState:
    particles: List[List[OParticle]]
    emission: List[OEmission]
    manual_queued: int = 0
    finished_notified: bool = False


def oracle_init(spawner: ParticleSpawner) -> OracleState:
    return OracleState(
        particles=[[] for _ in spawner.particle_settings],
        emission=[OEmission(enabled=spawner.starts_enabled) for _ in spawner.emission_settings],
    )


def _active(spawner: ParticleSpawner, st: OracleState) -> bool:
    enabled = False
    any_parts = any(len(p) > 0 for p in st.particles)
    for e_set, e_dat in zip(spawner.emission_settings, st.emission):
        if e_set.emission_mode.kind == EmissionModeKind.NESTED:
            enabled |= e_dat.enabled and any_parts
        else:
            enabled |= e_dat.enabled
    return enabled


def _const(r):
    assert r.min == r.max, "oracle needs constant RandF32 for deterministic runs"
    return F(r.min)


def _const_vec3(rv):
    assert rv.spread == 0.0 and rv.magnitude.min == rv.magnitude.max
    d = np.asarray(rv.direction, dtype=np.float32)
    n = np.linalg.norm(d)
    d = d / n if n > 0 else v3(0, 1, 0)
    return (d * F(rv.magnitude.min)).astype(np.float32)


def _spawn_one(spawner, e_i, origin_pos, origin_rot, base_vel, modifier_scale, modifier_speed):
    es = spawner.emission_settings[e_i]
    ps = spawner.particle_settings[es.particle_index]
    assert es.emission_shape.kind == 0, "oracle supports Point shape only"
    offset = v3()
    ivel = _const_vec3(es.initial_velocity)
    radial = _const(es.initial_velocity_radial)
    off_dir = v3()  # normalize_or_zero(0) = 0
    vel = F(modifier_speed) * (np_quat_rotate(origin_rot, ivel) + off_dir * radial)
    if es.inherit_parent_velocity:
        vel = vel + base_vel
    init_scale = F(_const(ps.initial_scale) * F(modifier_scale))
    return OParticle(
        position=(origin_pos + offset).astype(np.float32),
        velocity=vel.astype(np.float32),
        rotation=np.asarray(es.initial_rotation, dtype=np.float32),
        angular_velocity=_const_vec3(es.initial_angular_velocity),
        initial_scale=init_scale,
        scale=init_scale,
        age=F(0.0),
        lifetime=_const(ps.lifetime),
        base_color=np.asarray(ps.base_color.sample_clamped(0.0), dtype=np.float32),
        emissive_color=np.asarray(ps.emissive_color.sample_clamped(0.0), dtype=np.float32),
        last_emitted_age=[F32_MIN] * len(spawner.emission_settings),
    )


def oracle_spawn(spawner: ParticleSpawner, st: OracleState, dt, origin_pos, origin_rot, parent_velocity, modifier_scale=1.0, modifier_speed=1.0):
    """`spawn_particles` (`core.rs:367-551`)."""
    if not _active(spawner, st):
        return
    for e_i, es in enumerate(spawner.emission_settings):
        ed = st.emission[e_i]
        if not ed.enabled:
            continue
        pac = es.emission_pacing
        if es.emission_mode.kind == EmissionModeKind.GLOBAL:
            if pac.kind == EmissionPacingKind.ONE_SHOT:
                ed.enabled = False
                n = int(pac.count)
            elif pac.kind == EmissionPacingKind.ON_DEMAND:
                n = st.manual_queued
                st.manual_queued = 0
            else:
                ed.time_passed_in_cycle = np_rem_euclid(F(ed.time_passed_in_cycle) + F(dt), F(pac.duration))
                n, ed.last_emission = np_compute_emission_count(
                    ed.time_passed_in_cycle, ed.last_emission, pac.duration,
                    pac.offset_start, pac.offset_end, pac.count,
                )
            for _ in range(n):
                st.particles[es.particle_index].append(
                    _spawn_one(spawner, e_i, origin_pos, origin_rot, np.asarray(parent_velocity, np.float32), modifier_scale, modifier_speed)
                )
        else:
            if pac.kind != EmissionPacingKind.COUNT_OVER_DURATION:
                continue
            target = es.emission_mode.target_particle_type
            n_parents = len(st.particles[target])  # range fixed before pushes
            for p_i in range(n_parents):
                parent = st.particles[target][p_i]
                n, new_last = np_compute_emission_count(
                    parent.age, parent.last_emitted_age[e_i], parent.lifetime,
                    pac.offset_start, pac.offset_end, pac.count,
                )
                parent.last_emitted_age[e_i] = new_last
                for _ in range(n):
                    st.particles[es.particle_index].append(
                        _spawn_one(spawner, e_i, parent.position, parent.rotation, parent.velocity, modifier_scale, modifier_speed)
                    )


def _quat_from_scaled_axis(v):
    angle = F(np.linalg.norm(v))
    if angle < 1e-8:
        return np.array([0, 0, 0, 1], dtype=np.float32)
    axis = v / angle
    h = F(0.5) * angle
    s = np.sin(h)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, np.cos(h)], dtype=np.float32)


def _collide_plane(pos, vel, delta, restitution, friction, destroy, plane_y=0.0):
    """`particle_collision` (`core.rs:744-800`) against a single +Y halfspace
    at height plane_y (solid)."""
    orig_delta = F(delta)
    n_steps = 0
    should_destroy = False
    pos = pos.copy()
    vel = vel.copy()
    while delta > 0.0 and n_steps < 4:
        speed = F(np.linalg.norm(vel))
        d = vel / speed if speed > 0 else v3(0, 1, 0)
        max_dist = F(speed * delta)
        hit = None
        if pos[1] <= plane_y:
            hit = (F(0.0), v3(0, 0, 0))
        elif d[1] < 0:
            t = F((plane_y - pos[1]) / d[1])
            if 0.0 <= t <= max_dist:
                hit = (t, v3(0, 1, 0))
        if hit is not None:
            dist, normal = hit
            if dist == 0.0:
                if np.all(normal == 0):
                    normal = d if speed > 0 else v3(0, 1, 0)
                pos = pos + max(speed, F(1.0)) * normal * F(delta)
            else:
                pos = pos + (d if speed > 0 else v3()) * dist
                vdotn = F(np.dot(vel, normal))
                proj = vdotn * normal
                rej = vel - proj
                rej_len = F(np.linalg.norm(rej))
                friction_dv = F(min(abs(vdotn), rej_len) * F(friction))
                rn = rej / rej_len if rej_len > 0 else v3()
                vel = rej - friction_dv * rn - F(restitution) * proj
                pos = pos + normal * F(1e-4)
                delta = F(np.clip(F(delta) - dist, 0.0, orig_delta))
            should_destroy = destroy
            if should_destroy:
                return pos, vel, True
        else:
            pos = pos + vel * F(delta)
            delta = F(0.0)
        n_steps += 1
    return pos, vel, should_destroy


def oracle_update(spawner: ParticleSpawner, st: OracleState, dt, plane_collider_y: Optional[float] = None):
    """`update_particles` (`core.rs:577-670`), A.4 op order. Returns destroyed
    particles per type."""
    dt = F(dt)
    destroyed_all = []
    for i, ps in enumerate(spawner.particle_settings):
        destroyed = []
        kept = []
        for p0 in st.particles[i]:
            p = dataclasses.replace(p0, last_emitted_age=list(p0.last_emitted_age))
            p.age = F(p.age + dt)
            if p.age >= p.lifetime:
                destroyed.append(p)
                continue
            age_pct = F(p.age / p.lifetime)
            p.scale = F(p.initial_scale * F(ps.scale_curve.sample_clamped(age_pct)))
            if ps.collision_settings is not None and plane_collider_y is not None:
                new_pos, new_vel, should_destroy = _collide_plane(
                    p.position, p.velocity, dt,
                    ps.collision_settings.restitution, ps.collision_settings.friction,
                    ps.collision_settings.destroy_on_collision, plane_collider_y,
                )
            else:
                new_pos = p.position + p.velocity * dt
                new_vel = p.velocity
                should_destroy = False
            p.position = new_pos.astype(np.float32)
            p.velocity = new_vel.astype(np.float32)
            if should_destroy:
                destroyed.append(p)
                continue
            accel = np.asarray(ps.acceleration, np.float32)
            p.velocity = (p.velocity + (accel - p.velocity * F(ps.linear_drag)) * dt).astype(np.float32)
            p.rotation = np_quat_mul(_quat_from_scaled_axis(p.angular_velocity * dt), p.rotation)
            p.angular_velocity = (
                p.angular_velocity
                + (np.asarray(ps.angular_acceleration, np.float32) - F(ps.angular_drag) * p.angular_velocity) * dt
            ).astype(np.float32)
            p.base_color = np.asarray(ps.base_color.sample_clamped(age_pct), dtype=np.float32)
            p.emissive_color = np.asarray(ps.emissive_color.sample_clamped(age_pct), dtype=np.float32)
            kept.append(p)
        st.particles[i] = kept
        destroyed_all.append(destroyed)
    return destroyed_all


def oracle_step(spawner, st, dt, origin_pos=None, origin_rot=None, parent_velocity=None, plane_collider_y=None, modifier_scale=1.0, modifier_speed=1.0):
    oracle_spawn(
        spawner, st, dt,
        origin_pos if origin_pos is not None else v3(),
        origin_rot if origin_rot is not None else np.array([0, 0, 0, 1], np.float32),
        parent_velocity if parent_velocity is not None else v3(),
        modifier_scale, modifier_speed,
    )
    destroyed = oracle_update(spawner, st, dt, plane_collider_y)
    finished = (
        all(len(p) == 0 for p in st.particles)
        and not _active(spawner, st)
        and not st.finished_notified
    )
    if finished:
        st.finished_notified = True
    return destroyed, finished
