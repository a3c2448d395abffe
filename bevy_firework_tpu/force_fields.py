"""Force fields: scene-level acceleration sources (beyond the reference).

bevy_firework has no force fields — particle acceleration is a per-type
constant (`/root/reference/src/core.rs:111,641-643`). This module adds the
classic VFX field set as a scene-level table mirroring the dynamic-collider
design: `kinds` is a static tuple (the evaluator unrolls per field at trace
time; F is small), every geometric/strength parameter is a traced array
(moving or re-tuning a field never recompiles), and a traced `active` mask
lets fields toggle with zero recompiles via Scene slot reuse.

Field kinds:

  * POINT — radial acceleration toward (strength > 0) or away from
    (strength < 0) `position`, with linear falloff over `radius`:
    a = strength * max(0, 1 - d/radius) * (center - p) / d.
  * VORTEX — tangential acceleration around the axis line through
    `position` along unit `axis` (right-handed; negative strength spins the
    other way), falling off with DISTANCE TO THE AXIS d_ax:
    a = strength * max(0, 1 - d_ax/radius) * (axis x r) / d_ax.
  * AXIAL — radial acceleration toward (strength > 0) or away from the
    axis line, same d_ax falloff: a = -strength * w * r_perp / d_ax.
    Vortex + axial + an updraft acceleration = the classic tornado funnel.
  * TURBULENCE — swirl everywhere: the analytic CURL of a 3-octave sine
    vector potential, a = strength * w(d) * curl psi, with fixed
    incommensurate wave directions and per-octave amplitudes 1, 0.5, 0.25
    (equal velocity per octave). The CURL itself is divergence-free (div
    curl = 0 — no sinks/sources from the swirl); the radial falloff w(d)
    reintroduces div(w*v) = grad(w)·v, which is zero wherever w is flat
    (d << radius or d > radius) and measured <= 0.2% of |a| near the
    falloff shell — make radius large for effectively divergence-free
    everywhere. `frequency` sets the spatial scale and `phase`
    decorrelates multiple fields (or animates when stepped).

Fields contribute to the frame's acceleration term, evaluated at the
POST-MOVE position, and add onto the per-type constant acceleration before
drag: vel += (accel_type + fields - vel*drag) * dt — the reference's A.4
op order with a position-dependent accel. Lanes at a field's singular
locus (the point center / the vortex axis) receive zero from that field.

The math helpers operate on component scalars-or-arrays and index tables
as `t[i, j]`, so the SAME code runs in the XLA step and inside the Pallas
kernel against SMEM/VMEM refs (the collision.py pattern).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FIELD_POINT = 0  # params: (strength, radius)
FIELD_VORTEX = 1  # params: (strength, radius); axis = unit vector
FIELD_AXIAL = 2  # params: (strength, radius); pull toward the axis line
FIELD_TURBULENCE = 3  # params: (strength, radius, frequency, phase)

_EPS = np.float32(1e-6)


def _unit(axis):
    a = np.asarray(axis, np.float64)
    n = float(np.linalg.norm(a))
    if n < 1e-9:
        raise ValueError("ForceField axis must be non-zero")
    return tuple((a / n).astype(float))


@dataclasses.dataclass(frozen=True)
class ForceField:
    kind: int
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    axis: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    strength: float = 1.0
    radius: float = 5.0
    frequency: float = 1.0  # turbulence spatial scale
    phase: float = 0.0  # turbulence decorrelation / animation offset

    def __post_init__(self):
        if self.kind not in (FIELD_POINT, FIELD_VORTEX, FIELD_AXIAL, FIELD_TURBULENCE):
            raise ValueError(f"unknown ForceField kind {self.kind!r}")
        if self.radius <= 0.0:
            raise ValueError("ForceField.radius must be > 0 (falloff range)")

    @staticmethod
    def point(position, strength, radius):
        """Attractor (strength > 0) / repulsor (strength < 0)."""
        return ForceField(FIELD_POINT, tuple(position), (0.0, 1.0, 0.0),
                          float(strength), float(radius))

    @staticmethod
    def vortex(position, axis, strength, radius):
        """Tangential swirl around the axis line through `position`."""
        return ForceField(FIELD_VORTEX, tuple(position),
                          _unit(axis), float(strength), float(radius))

    @staticmethod
    def axial(position, axis, strength, radius):
        """Pull toward (strength > 0) / push away from the axis line."""
        return ForceField(FIELD_AXIAL, tuple(position),
                          _unit(axis), float(strength), float(radius))

    @staticmethod
    def turbulence(position, strength, radius, frequency=1.0, phase=0.0):
        """Divergence-free curl-noise swirl (spherical falloff from
        `position` over `radius`; make radius large for "everywhere")."""
        if frequency <= 0.0:
            raise ValueError("ForceField.turbulence frequency must be > 0")
        return ForceField(FIELD_TURBULENCE, tuple(position), (0.0, 1.0, 0.0),
                          float(strength), float(radius),
                          frequency=float(frequency), phase=float(phase))


@dataclasses.dataclass(frozen=True)
class FieldTable:
    """Compiled field set: [F] rows; `kinds` static, parameters traced
    (host numpy — tables ride FrameInput, whose leaves ride the jit call's
    argument transfer, see pool.make_frame_input)."""

    kinds: Tuple[int, ...]  # static, per field
    position: np.ndarray  # [F, 3]
    axis: np.ndarray  # [F, 3] unit (vortex/axial)
    params: np.ndarray  # [F, 4]: strength, radius, frequency, phase
    active: np.ndarray  # [F] f32 — 1.0 live, 0.0 disabled (traced toggle)

    @property
    def count(self) -> int:
        return len(self.kinds)


jax.tree_util.register_dataclass(
    FieldTable,
    data_fields=["position", "axis", "params", "active"],
    meta_fields=["kinds"],
)


def compile_force_fields(fields: List[ForceField]) -> FieldTable:
    f32 = np.float32
    return FieldTable(
        kinds=tuple(f.kind for f in fields),
        position=np.asarray([f.position for f in fields], f32).reshape(-1, 3),
        axis=np.asarray([f.axis for f in fields], f32).reshape(-1, 3),
        params=np.asarray(
            [(f.strength, f.radius, f.frequency, f.phase) for f in fields], f32
        ).reshape(-1, 4),
        active=np.ones((len(fields),), f32),
    )


# Turbulence wave basis: 3 octaves x 3 potential components of fixed,
# incommensurate, non-axis-aligned unit directions (chosen once; scaled by
# the traced frequency at eval time). Deliberately irrational-looking so no
# lattice/axis artifact survives the curl.
_TURB_DIRS = np.float32([
    # octave 0: psi_x, psi_y, psi_z wave vectors
    [[0.537, 0.721, -0.438], [-0.631, 0.442, 0.637], [0.289, -0.817, 0.499]],
    # octave 1
    [[-0.758, 0.288, 0.585], [0.421, -0.693, -0.585], [0.652, 0.598, 0.466]],
    # octave 2
    [[0.118, -0.937, 0.329], [-0.869, -0.159, -0.468], [0.504, 0.434, -0.747]],
])
_TURB_PHASE = np.float32([
    [0.7, 2.3, 4.1], [1.9, 5.2, 0.4], [3.3, 1.1, 5.8],
])  # per (octave, component), plus the field's own phase offset
_TURB_AMP = np.float32([1.0, 0.5, 0.25])  # per octave, divided by |k| below


def _curl_sine_noise(freq, phase, rx, ry, rz):
    """Analytic curl of psi_c = sum_o (amp_o/|k_o|) sin(k_{c,o} . r + phi):
    each partial d psi_c / d axis = amp_o k_axis/|k_o| cos(...) — evaluated
    with the |k| cancellation folded in. Divergence-free by construction
    (of the curl itself; the caller's falloff multiplies it afterwards)."""
    cx = jnp.zeros_like(rx)
    cy = jnp.zeros_like(rx)
    cz = jnp.zeros_like(rx)
    for o in range(3):
        ko = freq * np.float32(2.0 ** o)
        dpsi = []
        for c in range(3):
            d = _TURB_DIRS[o, c]
            arg = ko * (np.float32(d[0]) * rx + np.float32(d[1]) * ry + np.float32(d[2]) * rz) \
                + np.float32(_TURB_PHASE[o, c]) + phase
            # the potential's A_o = amp_o/|k_o|; the curl's k factor cancels
            # it exactly, so evaluate amp_o * cos directly (one traced
            # div/mul pair fewer, one rounding fewer)
            g = np.float32(_TURB_AMP[o]) * jnp.cos(arg)
            dpsi.append((g * np.float32(d[0]), g * np.float32(d[1]), g * np.float32(d[2])))
        # curl: (dpsi_z/dy - dpsi_y/dz, dpsi_x/dz - dpsi_z/dx, dpsi_y/dx - dpsi_x/dy)
        cx = cx + dpsi[2][1] - dpsi[1][2]
        cy = cy + dpsi[0][2] - dpsi[2][0]
        cz = cz + dpsi[1][0] - dpsi[0][1]
    return cx, cy, cz


def field_accel(kinds, fpos, faxis, fpar, factive, px, py, pz):
    """Summed field acceleration at component positions. Tables are indexed
    `t[i, j]` — 2-D jnp arrays OR pallas refs (factive is [F, 1]) — and
    kinds is the static tuple, so the per-field evaluation unrolls at trace
    time."""
    ax = jnp.zeros_like(px)
    ay = jnp.zeros_like(px)
    az = jnp.zeros_like(px)
    for i, k in enumerate(kinds):
        s = fpar[i, 0] * factive[i, 0]
        radius = fpar[i, 1]
        rx = px - fpos[i, 0]
        ry = py - fpos[i, 1]
        rz = pz - fpos[i, 2]
        if k == FIELD_TURBULENCE:
            d2 = rx * rx + ry * ry + rz * rz
            d = jnp.sqrt(d2)
            w = jnp.maximum(0.0, 1.0 - d * (1.0 / radius))
            tx, ty, tz = _curl_sine_noise(fpar[i, 2], fpar[i, 3], rx, ry, rz)
            g = s * w
            ax = ax + g * tx
            ay = ay + g * ty
            az = az + g * tz
        elif k == FIELD_POINT:
            d2 = rx * rx + ry * ry + rz * rz
            d = jnp.sqrt(d2)
            w = jnp.maximum(0.0, 1.0 - d * (1.0 / radius))
            g = jnp.where(d > _EPS, s * w / jnp.maximum(d, _EPS), 0.0)
            ax = ax - g * rx
            ay = ay - g * ry
            az = az - g * rz
        else:  # FIELD_VORTEX / FIELD_AXIAL: geometry about the axis line
            ux, uy, uz = faxis[i, 0], faxis[i, 1], faxis[i, 2]
            # tangent = axis x r; |tangent| == distance to the axis
            tx = uy * rz - uz * ry
            ty = uz * rx - ux * rz
            tz = ux * ry - uy * rx
            d_ax = jnp.sqrt(tx * tx + ty * ty + tz * tz)
            w = jnp.maximum(0.0, 1.0 - d_ax * (1.0 / radius))
            g = jnp.where(d_ax > _EPS, s * w / jnp.maximum(d_ax, _EPS), 0.0)
            if k == FIELD_VORTEX:
                ax = ax + g * tx
                ay = ay + g * ty
                az = az + g * tz
            else:  # toward the axis: -r_perp = -(r - (r.u)u)
                dot = rx * ux + ry * uy + rz * uz
                ax = ax - g * (rx - dot * ux)
                ay = ay - g * (ry - dot * uy)
                az = az - g * (rz - dot * uz)
    return ax, ay, az
