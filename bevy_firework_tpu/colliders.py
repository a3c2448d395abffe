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
# Convex hull as a plane set (VERDICT r3 missing #1): up to HULL_MAX_PLANES
# half-spaces n·x <= d in LOCAL space, padded with degenerate rows (n = 0,
# d = +BIG — always satisfied, never constrains). params: (bounding_radius,
# n_planes, 0); plane rows live in ColliderTable.hull_planes. Closes most of
# the practical gap to the reference's "arbitrary avian colliders"
# (`/root/reference/src/core.rs:756-765`) analytically.
COLLIDER_HULL = 6

HULL_MAX_PLANES = 16
_HULL_PAD_D = 1e30  # padding plane offset: 0·x <= BIG is always satisfied


@dataclasses.dataclass(frozen=True)
class Collider:
    kind: int
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rotation: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)  # xyzw
    params: Tuple[float, ...] = ()
    layers: int = 0xFFFFFFFF
    planes: Tuple[Tuple[float, float, float, float], ...] = ()  # hull only

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

    @staticmethod
    def hull(planes, position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        """Convex hull from a LOCAL-space plane set: each plane is
        (nx, ny, nz, d) meaning n·x <= d inside (normals point OUT). Normals
        are normalized here; at most HULL_MAX_PLANES planes. The planes must
        bound a finite volume for the broad phase (the bounding radius is
        derived by support-point sampling)."""
        rows = []
        for nx, ny, nz, d in planes:
            n = np.asarray((nx, ny, nz), np.float64)
            ln = float(np.linalg.norm(n))
            if ln <= 0:
                raise ValueError("hull plane with zero normal")
            rows.append((n[0] / ln, n[1] / ln, n[2] / ln, float(d) / ln))
        if not 4 <= len(rows) <= HULL_MAX_PLANES:
            raise ValueError(f"hull needs 4..{HULL_MAX_PLANES} planes, got {len(rows)}")
        radius = _hull_bounding_radius(rows)
        return Collider(COLLIDER_HULL, tuple(position), tuple(rotation),
                        (float(radius), float(len(rows)), 0.0), layers,
                        planes=tuple(tuple(r) for r in rows))

    @staticmethod
    def hull_from_points(points, position=(0, 0, 0), rotation=(0, 0, 0, 1), layers=0xFFFFFFFF):
        """Convex hull of LOCAL-space points (authoring convenience): brute
        force over point triples — O(n^3), fine for the tens of points a
        hand-authored hull has. The resulting plane set is deduplicated and
        capped at HULL_MAX_PLANES (an over-tessellated hull raises; simplify
        the point set)."""
        pts = np.asarray(points, np.float64)
        if pts.shape[0] < 4:
            raise ValueError("hull_from_points needs >= 4 points")
        center = pts.mean(axis=0)
        eps = 1e-7 * max(1.0, float(np.abs(pts).max()))
        planes = []
        n_pts = pts.shape[0]
        for i in range(n_pts):
            for j in range(i + 1, n_pts):
                for k in range(j + 1, n_pts):
                    n = np.cross(pts[j] - pts[i], pts[k] - pts[i])
                    ln = np.linalg.norm(n)
                    if ln < eps:
                        continue
                    n = n / ln
                    d = float(n @ pts[i])
                    if n @ center > d:  # make the normal point OUT
                        n, d = -n, -d
                    if np.all(pts @ n <= d + eps):  # supporting plane
                        # dedup tolerance scales with the point magnitudes
                        # (eps above): a fixed absolute tolerance made
                        # rotated/large-coordinate faces fail dedup and
                        # spuriously overflow HULL_MAX_PLANES
                        d_tol = 100.0 * eps
                        dup = any(
                            abs(d - p[3]) < d_tol and float(n @ np.asarray(p[:3])) > 1.0 - 1e-5
                            for p in planes
                        )
                        if not dup:
                            planes.append((float(n[0]), float(n[1]), float(n[2]), d))
        if len(planes) > HULL_MAX_PLANES:
            raise ValueError(
                f"hull has {len(planes)} faces > {HULL_MAX_PLANES}; simplify the points")
        return Collider.hull(planes, position, rotation, layers)


def _hull_bounding_radius(rows) -> float:
    """Conservative bounding-sphere radius about the LOCAL origin for a
    plane-set hull: the max distance of any plane-triple intersection vertex
    that satisfies every plane (the hull's vertices)."""
    import itertools

    n = np.asarray([r[:3] for r in rows], np.float64)
    d = np.asarray([r[3] for r in rows], np.float64)
    best = 0.0
    for i, j, k in itertools.combinations(range(len(rows)), 3):
        A = np.stack([n[i], n[j], n[k]])
        if abs(np.linalg.det(A)) < 1e-9:
            continue
        v = np.linalg.solve(A, np.asarray([d[i], d[j], d[k]]))
        if np.all(n @ v <= d + 1e-6):
            best = max(best, float(np.linalg.norm(v)))
    if best == 0.0:
        raise ValueError("hull planes do not bound a finite volume")
    return best


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
    # static per-collider hull plane counts (0 for non-hulls): the unrolled
    # narrow phase evaluates exactly this many plane rows instead of the
    # padded HULL_MAX_PLANES width (a 6-plane box costs 6 evals, not 16)
    hull_counts: Tuple[int, ...]
    position: jax.Array  # [C, 3]
    rotation: jax.Array  # [C, 4] xyzw
    params: jax.Array  # [C, 3] (pad unused with 0)
    layers: jax.Array  # [C] uint32
    active: jax.Array  # [C] f32 — 1.0 live, 0.0 disabled (traced: toggling a
    # collider on/off never recompiles; see Scene.add_collider/remove_collider)
    # hull plane rows [C, HULL_MAX_PLANES, 4] (nx, ny, nz, d in local space;
    # degenerate padding rows n=0, d=BIG). A [C, 1, 4] zero placeholder when
    # the scene has no hull (static `any_hull` keeps non-hull kernels free
    # of the extra small input).
    hull_planes: jax.Array

    @property
    def count(self) -> int:
        return len(self.kinds)

    @property
    def any_hull(self) -> bool:
        return COLLIDER_HULL in self.kinds


jax.tree_util.register_dataclass(
    ColliderTable,
    data_fields=["position", "rotation", "params", "layers", "active", "hull_planes"],
    meta_fields=["kinds", "identity_rot", "hull_counts"],
)


def compile_colliders(colliders: List[Collider]) -> ColliderTable:
    c = len(colliders)
    params = np.zeros((max(c, 1), 3), dtype=np.float32)
    for i, col in enumerate(colliders):
        params[i, : len(col.params)] = col.params
    any_hull = any(col.kind == COLLIDER_HULL for col in colliders)
    hp = np.zeros((max(c, 1), HULL_MAX_PLANES if any_hull else 1, 4), np.float32)
    if any_hull:
        hp[:, :, 3] = _HULL_PAD_D  # padding rows: 0·x <= BIG, never constrains
        for i, col in enumerate(colliders):
            if col.kind == COLLIDER_HULL:
                hp[i, : len(col.planes)] = np.asarray(col.planes, np.float32)
    return ColliderTable(
        hull_planes=jnp.asarray(hp[:c]),
        hull_counts=tuple(
            len(col.planes) if col.kind == COLLIDER_HULL else 0 for col in colliders),
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
