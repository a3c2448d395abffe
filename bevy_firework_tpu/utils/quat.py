"""Quaternion math, vectorized for jax (and usable with numpy arrays).

Quaternions are stored as (..., 4) arrays in xyzw order (matching glam/bevy's
`Quat` memory layout, which is also the render-contract layout for the
instance buffer — `/root/reference/src/render.rs:95-103`).

The integrator needs `from_scaled_axis` (`/root/reference/src/core.rs:645-647`)
and the spawn path needs rotate-vector plus `from_rotation_arc` for the Circle
emission shape (`/root/reference/src/emission_shape.rs:32-37`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2 (apply q2's rotation first, then q1's)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4).

    Uses the standard t = 2 q_vec × v; v' = v + w t + q_vec × t form (what glam
    does), which keeps the op count low on the VPU.
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_scaled_axis(v, eps=1e-12):
    """glam `Quat::from_scaled_axis`: axis*angle vector -> quaternion.

    Zero vector maps to identity.
    """
    angle = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    safe = jnp.maximum(angle, eps)
    half = 0.5 * angle
    s = jnp.sin(half) / safe
    w = jnp.cos(half)
    xyz = v * s
    small = angle < 1e-8
    xyz = jnp.where(small, jnp.zeros_like(xyz), xyz)
    w = jnp.where(small[..., 0:1] if small.ndim == xyz.ndim else small, jnp.ones_like(w), w)
    return jnp.concatenate([xyz, w], axis=-1)


def quat_normalize(q, eps=1e-12):
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# Component-split variants (the TPU hot-path forms)
#
# On TPU, [N, 3]/[N, 4] arrays pad their minor dimension to the 128-lane tile
# (~40x memory bloat when materialized); the step kernel therefore keeps every
# quantity as separate [N] component arrays and uses these helpers.
# ---------------------------------------------------------------------------


def quat_rotate_comp(qx, qy, qz, qw, vx, vy, vz):
    """Rotate vector components by quaternion components (broadcasting)."""
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    ox = vx + qw * tx + (qy * tz - qz * ty)
    oy = vy + qw * ty + (qz * tx - qx * tz)
    oz = vz + qw * tz + (qx * ty - qy * tx)
    return ox, oy, oz


def quat_mul_comp(x1, y1, z1, w1, x2, y2, z2, w2):
    """Hamilton product components: (q1 ⊗ q2)."""
    return (
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    )


def quat_from_scaled_axis_comp(vx, vy, vz, eps=1e-12):
    """glam `Quat::from_scaled_axis` on components; zero vector -> identity."""
    angle = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    safe = jnp.maximum(angle, eps)
    half = 0.5 * angle
    s = jnp.sin(half) / safe
    small = angle < 1e-8
    s = jnp.where(small, 0.0, s)
    w = jnp.where(small, 1.0, jnp.cos(half))
    return vx * s, vy * s, vz * s, w


# ---------------------------------------------------------------------------
# Host-side (numpy, compile-time) helpers
# ---------------------------------------------------------------------------


def np_quat_from_rotation_arc(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Shortest-arc rotation taking unit vector src to unit vector dst.

    Matches glam `Quat::from_rotation_arc` semantics: antiparallel inputs
    rotate pi about an arbitrary axis orthogonal to src.  Used at spawner
    compile time for the Circle emission shape's plane orientation
    (`/root/reference/src/emission_shape.rs:34`).
    """
    src = np.asarray(src, dtype=np.float32)
    dst = np.asarray(dst, dtype=np.float32)
    d = float(np.dot(src, dst))
    if d > 1.0 - 1e-6:
        return np.array([0, 0, 0, 1], dtype=np.float32)
    if d < -1.0 + 1e-6:
        axis = np_any_orthonormal(src)
        return np.array([axis[0], axis[1], axis[2], 0.0], dtype=np.float32)
    c = np.cross(src, dst)
    w = 1.0 + d
    q = np.array([c[0], c[1], c[2], w], dtype=np.float32)
    return (q / np.linalg.norm(q)).astype(np.float32)


def np_any_orthonormal(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.float32)
    if abs(v[0]) <= abs(v[1]) and abs(v[0]) <= abs(v[2]):
        o = np.array([0.0, -v[2], v[1]], dtype=np.float32)
    elif abs(v[1]) <= abs(v[2]):
        o = np.array([-v[2], 0.0, v[0]], dtype=np.float32)
    else:
        o = np.array([-v[1], v[0], 0.0], dtype=np.float32)
    return (o / np.linalg.norm(o)).astype(np.float32)


def np_quat_from_rotation_y(angle: float) -> np.ndarray:
    h = 0.5 * float(angle)
    return np.array([0.0, np.sin(h), 0.0, np.cos(h)], dtype=np.float32)


def np_quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    q = np.asarray(q, dtype=np.float32)
    v = np.asarray(v, dtype=np.float32)
    qv, w = q[:3], q[3]
    t = 2.0 * np.cross(qv, v)
    return (v + w * t + np.cross(qv, t)).astype(np.float32)


def np_quat_mul(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        dtype=np.float32,
    )
