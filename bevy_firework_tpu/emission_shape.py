"""Emission shapes: where on the spawner a particle appears.

Authoring equivalents of `EmissionShape::{Point, Sphere, Circle}`
(`/root/reference/src/emission_shape.rs:6-40`) with vectorized samplers.

Distributions replicated deliberately, quirks included (SURVEY.md A.3):
  * Point  -> zero offset.
  * Sphere(R): u ~ U[0,2π), v ~ U[0,π), r ~ U[0,1);
      offset = PitchYaw(u, v).to_unit_vec() * r * R
    — linear-in-r and pitch/yaw angle draws bias samples toward the center
    and the convention's poles; this is the reference's behaviour, not a bug.
  * Circle{normal, radius}: u ~ U[0,2π), r ~ U[0,1);
      offset = rotation_arc(+Y -> normal) ⊗ rot_y(u) ⊗ (r·radius, 0, 0)
    — a center-biased disk in the plane perpendicular to `normal`.

Beyond the reference (its set is Point/Sphere/Circle,
`emission_shape.rs:6-15`):
  * Box{half_extents, normal}: offset = arc(+Y->normal) ⊗
      ((2u-1)·hx, (2v-1)·hy, (2r-1)·hz) — UNIFORM in the oriented volume.
  * Ring{normal, radius}: the circle's EDGE, uniform in angle (the disk's
    deliberate center bias does not apply to the new shape).

Each shape consumes up to 3 uniforms per spawn; the compiled form is
(kind, radius, arc_quat, 2 extra extents) so one branchless kernel serves
every emitter.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .rand import TWO_PI, pitch_yaw_to_unit_vec
from .utils.quat import np_quat_from_rotation_arc, quat_rotate

SHAPE_POINT = 0
SHAPE_SPHERE = 1
SHAPE_CIRCLE = 2
SHAPE_BOX = 3  # beyond the reference: uniform in an oriented box volume
SHAPE_RING = 4  # beyond the reference: uniform on the circle EDGE (no bias)

PI = np.float32(np.pi)


@dataclasses.dataclass(frozen=True)
class EmissionShape:
    kind: int = SHAPE_POINT
    radius: float = 0.0  # sphere/circle/ring radius; box half-extent x
    normal: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    extents: Tuple[float, float] = (0.0, 0.0)  # box half-extents y, z

    @staticmethod
    def point() -> "EmissionShape":
        return EmissionShape(SHAPE_POINT)

    @staticmethod
    def sphere(radius: float) -> "EmissionShape":
        return EmissionShape(SHAPE_SPHERE, float(radius))

    @staticmethod
    def circle(normal, radius: float) -> "EmissionShape":
        return EmissionShape(SHAPE_CIRCLE, float(radius), tuple(float(x) for x in normal))

    @staticmethod
    def box(half_extents, normal=(0.0, 1.0, 0.0)) -> "EmissionShape":
        """Uniform in an oriented box volume (+Y of the local frame maps to
        `normal`). Beyond the reference's shape set."""
        hx, hy, hz = (float(v) for v in half_extents)
        return EmissionShape(SHAPE_BOX, hx, tuple(float(x) for x in normal), (hy, hz))

    @staticmethod
    def ring(normal, radius: float) -> "EmissionShape":
        """Uniform on the circle EDGE in the plane perpendicular to
        `normal` — no center bias. Beyond the reference's shape set."""
        return EmissionShape(SHAPE_RING, float(radius), tuple(float(x) for x in normal))

    def to_dict(self):
        return {"kind": ["point", "sphere", "circle", "box", "ring"][self.kind],
                "radius": self.radius, "normal": list(self.normal),
                "extents": list(self.extents)}

    @staticmethod
    def from_dict(d):
        kind = {"point": SHAPE_POINT, "sphere": SHAPE_SPHERE, "circle": SHAPE_CIRCLE,
                "box": SHAPE_BOX, "ring": SHAPE_RING}[d["kind"]]
        return EmissionShape(kind, float(d.get("radius", 0.0)),
                             tuple(float(x) for x in d.get("normal", (0, 1, 0))),
                             tuple(float(x) for x in d.get("extents", (0.0, 0.0))))

    def compile(self) -> np.ndarray:
        """Pack to f32[8]: [kind, radius, qx, qy, qz, qw, ey, ez] with
        q = arc(+Y->normal); ey/ez are the box half-extents (unused
        elsewhere)."""
        n = np.asarray(self.normal, dtype=np.float32)
        ln = np.linalg.norm(n)
        n = n / ln if ln > 0 else np.array([0, 1, 0], np.float32)
        q = np_quat_from_rotation_arc(np.array([0, 1, 0], np.float32), n)
        return np.array([float(self.kind), self.radius, q[0], q[1], q[2], q[3],
                         self.extents[0], self.extents[1]], dtype=np.float32)


def sample_shape_comp(params, u0, u1, u2):
    """Vectorized EmissionShape::generate_point, component-split (TPU hot
    path). params: f32[6] compiled row; u0,u1,u2: uniforms [0,1), shape [...].
    Returns (x, y, z)."""
    from .utils.quat import quat_rotate_comp

    params = jnp.asarray(params, jnp.float32)
    kind = params[..., 0]
    radius = params[..., 1]
    u0 = jnp.asarray(u0, jnp.float32)
    u1 = jnp.asarray(u1, jnp.float32)
    u2 = jnp.asarray(u2, jnp.float32)

    # Sphere: PitchYaw(u*2π, v*π).to_unit_vec() * r * R
    u = jnp.asarray(u0, jnp.float32) * TWO_PI
    v = jnp.asarray(u1, jnp.float32) * PI
    r = jnp.asarray(u2, jnp.float32)
    rr = r * radius
    # pitch_yaw_to_unit_vec(pitch=u, yaw=v) expanded on components
    cu = jnp.cos(u)
    sx, sy, sz = -jnp.sin(v) * cu * rr, jnp.sin(u) * rr, -jnp.cos(v) * cu * rr

    # Circle: arc(Y->normal) ⊗ rot_y(u·2π) applied to (r·R, 0, 0).
    # rot_y(a) * (x,0,0) = (x·cos a, 0, -x·sin a)
    lx, lz = rr * jnp.cos(u), -rr * jnp.sin(u)

    # circle / ring / box share the one local->world rotation: select the
    # LOCAL point by kind, rotate once (also keeps the spawn graph the same
    # size as before the new shapes — a larger fan-out of rotates tripped an
    # XLA CPU fusion anomaly where claim masks diverged between fusions)
    is_sphere = kind == SHAPE_SPHERE
    is_circle = kind == SHAPE_CIRCLE
    is_box = kind == SHAPE_BOX
    is_ring = kind == SHAPE_RING
    llx = jnp.where(is_circle, lx, jnp.where(is_ring, radius * jnp.cos(u), (u0 * 2.0 - 1.0) * radius))
    lly = jnp.where(is_box, (u1 * 2.0 - 1.0) * params[..., 6], 0.0)
    llz = jnp.where(is_circle, lz, jnp.where(is_ring, -radius * jnp.sin(u), (u2 * 2.0 - 1.0) * params[..., 7]))
    rx, ry, rz = quat_rotate_comp(params[..., 2], params[..., 3], params[..., 4], params[..., 5], llx, lly, llz)

    rot_sel = is_circle | is_box | is_ring
    ox = jnp.where(is_sphere, sx, jnp.where(rot_sel, rx, 0.0))
    oy = jnp.where(is_sphere, sy, jnp.where(rot_sel, ry, 0.0))
    oz = jnp.where(is_sphere, sz, jnp.where(rot_sel, rz, 0.0))
    return ox, oy, oz


def sample_shape(params, u0, u1, u2):
    """As sample_shape_comp but returning stacked offsets [..., 3]."""
    x, y, z = sample_shape_comp(params, u0, u1, u2)
    return jnp.stack([x, y, z], axis=-1)
