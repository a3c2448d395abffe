"""Random-range value types from the public config surface.

Re-implementations of `bevy_utilitarian`'s `RandF32` / `RandVec3` / `PitchYaw`
(registry-only dependency of the reference — the crate source is not in the
reference tree, so these are rebuilt from usage semantics, SURVEY.md L0):

  * `RandF32 {min, max}`: `.generate()` draws uniform in [min, max);
    `RandF32.constant(x)` => min == max == x (`/root/reference/src/core.rs:190`).
  * `RandVec3 {magnitude: RandF32, direction: Vec3, spread: f32}`: draws a
    direction inside a cone of half-angle `spread` radians around `direction`,
    scaled by a magnitude draw (`/root/reference/examples/sparks.rs:76-80`).
  * `PitchYaw(pitch, yaw).to_unit_vec()`: spherical angles -> unit vector,
    used by the Sphere emission shape (`/root/reference/src/emission_shape.rs:28-30`).

Bitstream parity with the Rust `rand` crate is impossible and not required
(SURVEY.md §7 hard part 2); what is preserved is the *distribution family* and
counted-draw determinism under the jax threefry PRNG.  Our documented
conventions (stable API of this framework):

  * PitchYaw -> unit vector uses the Y-up aviation convention
    dir = (-sin(yaw)·cos(pitch), sin(pitch), -cos(yaw)·cos(pitch)),
    i.e. yaw about +Y then pitch toward +Y, applied to -Z forward.
  * RandVec3 cone sampling: deviation angle a ~ U[0, spread), azimuth
    b ~ U[0, 2π); the deviated axis is rotated into `direction`'s frame with a
    shortest-arc rotation from +Y. Axis-biased (not solid-angle-uniform), in
    the same spirit as the reference's center-biased disk/sphere sampling.

All samplers take pre-drawn uniforms in [0,1) so that one fused kernel can
batch-generate randomness for a whole pool (u-columns are allocated by the
spawn engine, see step.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .utils.quat import np_quat_from_rotation_arc, quat_rotate

TWO_PI = np.float32(2.0 * np.pi)


@dataclasses.dataclass(frozen=True)
class RandF32:
    min: float = 0.0
    max: float = 0.0

    @staticmethod
    def constant(x: float) -> "RandF32":
        return RandF32(float(x), float(x))

    def to_dict(self):
        return {"min": self.min, "max": self.max}

    @staticmethod
    def from_dict(d):
        return RandF32(float(d["min"]), float(d["max"]))


def sample_randf32(u, lo, hi):
    """u in [0,1) -> uniform [lo, hi). All f32, broadcasts."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    return lo + (hi - lo) * jnp.asarray(u, jnp.float32)


@dataclasses.dataclass(frozen=True)
class RandVec3:
    magnitude: RandF32 = RandF32(0.0, 0.0)
    direction: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    spread: float = 0.0

    @staticmethod
    def constant(v) -> "RandVec3":
        v = np.asarray(v, dtype=np.float32)
        mag = float(np.linalg.norm(v))
        if mag == 0.0:
            return RandVec3(RandF32.constant(0.0), (0.0, 1.0, 0.0), 0.0)
        d = (v / mag).astype(np.float32)
        return RandVec3(RandF32.constant(mag), (float(d[0]), float(d[1]), float(d[2])), 0.0)

    def to_dict(self):
        return {
            "magnitude": self.magnitude.to_dict(),
            "direction": list(self.direction),
            "spread": self.spread,
        }

    @staticmethod
    def from_dict(d):
        return RandVec3(
            RandF32.from_dict(d["magnitude"]),
            tuple(float(x) for x in d["direction"]),
            float(d["spread"]),
        )

    def compile(self) -> np.ndarray:
        """Pack to a flat f32[7] param row: [mag_lo, mag_hi, spread, qx,qy,qz,qw]
        where q is the shortest-arc rotation from +Y to `direction`."""
        d = np.asarray(self.direction, dtype=np.float32)
        n = np.linalg.norm(d)
        d = d / n if n > 0 else np.array([0, 1, 0], dtype=np.float32)
        q = np_quat_from_rotation_arc(np.array([0, 1, 0], np.float32), d)
        return np.array(
            [self.magnitude.min, self.magnitude.max, self.spread, q[0], q[1], q[2], q[3]],
            dtype=np.float32,
        )


def sample_randvec3_comp(params, u_mag, u_dev, u_azim):
    """Vectorized RandVec3.generate(), component-split (TPU hot path).

    params: f32[7] compiled row; u_*: uniforms in [0,1), shape [...].
    Returns (x, y, z) arrays.
    """
    from .utils.quat import quat_rotate_comp

    params = jnp.asarray(params, jnp.float32)
    mag = sample_randf32(u_mag, params[..., 0], params[..., 1])
    spread = params[..., 2]
    a = jnp.asarray(u_dev, jnp.float32) * spread  # deviation from axis
    b = jnp.asarray(u_azim, jnp.float32) * TWO_PI  # azimuth about axis
    sa, ca = jnp.sin(a), jnp.cos(a)
    lx, ly, lz = sa * jnp.cos(b), ca, -sa * jnp.sin(b)  # +Y frame
    dx, dy, dz = quat_rotate_comp(params[..., 3], params[..., 4], params[..., 5], params[..., 6], lx, ly, lz)
    return mag * dx, mag * dy, mag * dz


def sample_randvec3(params, u_mag, u_dev, u_azim):
    """As sample_randvec3_comp but returning a stacked [..., 3] array."""
    x, y, z = sample_randvec3_comp(params, u_mag, u_dev, u_azim)
    return jnp.stack([x, y, z], axis=-1)


def pitch_yaw_to_unit_vec(pitch, yaw):
    """Documented convention (see module docstring)."""
    cp = jnp.cos(pitch)
    return jnp.stack([-jnp.sin(yaw) * cp, jnp.sin(pitch), -jnp.cos(yaw) * cp], axis=-1)
