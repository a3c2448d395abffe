"""Static analytic collider scene description.

The reference raycasts particles against arbitrary avian3d colliders through a
BVH (`/root/reference/src/core.rs:756-765`).  The TPU-native design replaces
the spatial query with a small table of analytic primitives replicated to all
lanes (SURVEY.md #11): each collider is (kind, position, rotation, params,
layers) and the narrow-phase kernel evaluates every primitive branchlessly and
takes the nearest hit.  This covers every collider used by the reference
examples: cuboid (`examples/collision.rs:48`), sphere
(`examples/one_shot.rs:65`), cylinder & cone (`examples/textures.rs:195,211`),
plus halfspace and capsule.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

COLLIDER_HALFSPACE = 0  # params: () — plane through origin, +Y normal (local)
COLLIDER_SPHERE = 1  # params: (radius,)
COLLIDER_CUBOID = 2  # params: (hx, hy, hz) half-extents
COLLIDER_CAPSULE = 3  # params: (radius, half_segment) — segment along local Y
COLLIDER_CYLINDER = 4  # params: (radius, half_height) — axis local Y
COLLIDER_CONE = 5  # params: (base_radius, half_height) — tip at +hh, base at -hh


@dataclasses.dataclass(frozen=True)
class Collider:
    kind: int
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rotation: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)  # xyzw
    params: Tuple[float, ...] = ()
    layers: int = 0xFFFFFFFF

    @staticmethod
    def halfspace(position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        return Collider(COLLIDER_HALFSPACE, tuple(position), tuple(rotation), (), layers)

    @staticmethod
    def sphere(radius, position=(0, 0, 0), layers=0xFFFFFFFF):
        return Collider(COLLIDER_SPHERE, tuple(position), (0, 0, 0, 1), (float(radius),), layers)

    @staticmethod
    def cuboid(half_extents, position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        return Collider(COLLIDER_CUBOID, tuple(position), tuple(rotation), tuple(float(h) for h in half_extents), layers)

    @staticmethod
    def capsule(radius, half_segment, position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        return Collider(COLLIDER_CAPSULE, tuple(position), tuple(rotation), (float(radius), float(half_segment)), layers)

    @staticmethod
    def cylinder(radius, half_height, position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        return Collider(COLLIDER_CYLINDER, tuple(position), tuple(rotation), (float(radius), float(half_height)), layers)

    @staticmethod
    def cone(base_radius, half_height, position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        return Collider(COLLIDER_CONE, tuple(position), tuple(rotation), (float(base_radius), float(half_height)), layers)


@dataclasses.dataclass(frozen=True)
class ColliderTable:
    """Compiled collider set: [C] rows.

    `kinds` and `identity_rot` are static Python tuples so the narrow-phase
    kernel unrolls one analytic raycast per collider at trace time (C is
    small) and elides the world<->local quaternion rotations for
    axis-aligned colliders (floors etc. — two rotations per collider per
    substep); the geometric parameters are traced arrays so moving a
    collider does not recompile.
    """

    kinds: Tuple[int, ...]  # static, per collider
    identity_rot: Tuple[bool, ...]  # static, per collider: unrotated?
    position: jax.Array  # [C, 3]
    rotation: jax.Array  # [C, 4] xyzw
    params: jax.Array  # [C, 3] (pad unused with 0)
    layers: jax.Array  # [C] uint32
    active: jax.Array  # [C] f32 — 1.0 live, 0.0 disabled (traced: toggling a
    # collider on/off never recompiles; see Scene.add_collider/remove_collider)

    @property
    def count(self) -> int:
        return len(self.kinds)


jax.tree_util.register_dataclass(
    ColliderTable,
    data_fields=["position", "rotation", "params", "layers", "active"],
    meta_fields=["kinds", "identity_rot"],
)


def compile_colliders(colliders: List[Collider]) -> ColliderTable:
    c = len(colliders)
    params = np.zeros((max(c, 1), 3), dtype=np.float32)
    for i, col in enumerate(colliders):
        params[i, : len(col.params)] = col.params
    return ColliderTable(
        kinds=tuple(int(col.kind) for col in colliders),
        identity_rot=tuple(tuple(col.rotation) == (0.0, 0.0, 0.0, 1.0) for col in colliders),
        position=jnp.asarray(np.array([col.position for col in colliders], dtype=np.float32).reshape(c, 3)),
        rotation=jnp.asarray(np.array([col.rotation for col in colliders], dtype=np.float32).reshape(c, 4)),
        params=jnp.asarray(params[:c]),
        layers=jnp.asarray(np.array([col.layers for col in colliders], dtype=np.uint32).reshape(c)),
        active=jnp.ones((c,), jnp.float32),
    )


def masked_layers(table: ColliderTable) -> jax.Array:
    """Effective layer masks: disabled colliders get layers=0, which every
    narrow-phase consumer already skips ((lane_mask & 0) != 0 is false)."""
    return jnp.where(table.active > 0, table.layers, jnp.uint32(0))


def empty_collider_table() -> ColliderTable:
    return compile_colliders([])
