"""Collision kernel tests: engine vs oracle plane-bounce parity, plus
analytic raycast checks per primitive (SURVEY.md §3.4 / A.5)."""

import pytest
import jax.numpy as jnp
import numpy as np

from bevy_firework_tpu import (
    Collider,
    EmissionPacing,
    EmissionSettings,
    ParticleCollisionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_colliders,
    compile_spawner,
    init_pool,
    make_frame_input,
    step_jit,
)
from bevy_firework_tpu.collision import particle_collision, raycast_scene
from tests.oracle import oracle_init, oracle_step


def collide_spawner(restitution=0.6, friction=0.2, destroy=False, vel=(1.0, -3.0, 0.0), lifetime=3.0):
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(
                lifetime=RandF32.constant(lifetime),
                initial_scale=RandF32.constant(0.1),
                linear_drag=0.0,
                acceleration=(0.0, -9.81, 0.0),
                collision_settings=ParticleCollisionSettings(
                    restitution=restitution, friction=friction, destroy_on_collision=destroy
                ),
            )
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.one_shot(1),
                initial_velocity=RandVec3.constant(vel),
            )
        ],
    )


def run_engine_collision(sp, n_frames, dt, plane_y=0.0, start=(0.0, 1.0, 0.0)):
    from bevy_firework_tpu.scene import Scene, Transform

    scene = Scene(colliders=[Collider.halfspace(position=(0, plane_y, 0))])
    scene.add_spawner(sp, capacity=64, transform=Transform(translation=start))
    frames = []
    for _ in range(n_frames):
        scene.step(dt)
        st = next(iter(scene._spawners.values())).state
        alive = np.asarray(st.alive)
        frames.append(
            {
                "count": int(alive.sum()),
                "pos": np.stack([np.asarray(st.px)[alive], np.asarray(st.py)[alive], np.asarray(st.pz)[alive]], -1),
                "vel": np.stack([np.asarray(st.vx)[alive], np.asarray(st.vy)[alive], np.asarray(st.vz)[alive]], -1),
            }
        )
    return frames


def run_oracle_collision(sp, n_frames, dt, plane_y=0.0, start=(0.0, 1.0, 0.0)):
    st = oracle_init(sp)
    frames = []
    for _ in range(n_frames):
        oracle_step(sp, st, dt, origin_pos=np.asarray(start, np.float32), plane_collider_y=plane_y)
        parts = [p for pl in st.particles for p in pl]
        frames.append(
            {
                "count": len(parts),
                "pos": np.array([p.position for p in parts]).reshape(-1, 3),
                "vel": np.array([p.velocity for p in parts]).reshape(-1, 3),
            }
        )
    return frames


def test_plane_bounce_matches_oracle():
    sp = collide_spawner()
    dt = 1.0 / 60.0
    ef = run_engine_collision(sp, 120, dt)
    of = run_oracle_collision(sp, 120, dt)
    for fi, (a, b) in enumerate(zip(ef, of)):
        assert a["count"] == b["count"], fi
        np.testing.assert_allclose(a["pos"], b["pos"], atol=1e-4, err_msg=f"frame {fi} pos")
        np.testing.assert_allclose(a["vel"], b["vel"], atol=1e-4, err_msg=f"frame {fi} vel")


def test_destroy_on_collision():
    sp = collide_spawner(destroy=True, vel=(0.0, -5.0, 0.0))
    dt = 1.0 / 60.0
    ef = run_engine_collision(sp, 30, dt)
    of = run_oracle_collision(sp, 30, dt)
    for fi, (a, b) in enumerate(zip(ef, of)):
        assert a["count"] == b["count"], (fi, a["count"], b["count"])
    assert ef[-1]["count"] == 0  # particle destroyed on first impact


def test_restitution_bounce_height():
    """e=0.8, no friction/drag/gravity-after... approximate: vertical drop on
    the plane reflects vy to -e*vy at impact."""
    sp = collide_spawner(restitution=0.8, friction=0.0, vel=(0.0, -4.0, 0.0))
    dt = 1.0 / 120.0
    frames = run_engine_collision(sp, 60, dt, start=(0.0, 0.5, 0.0))
    vys = [f["vel"][0][1] for f in frames if f["count"]]
    assert min(vys) < -3.0  # falling
    assert max(vys) > 2.0  # bounced upward with most of the speed


# ---------------------------------------------------------------- raycasts


def _cast(colliders, origin, direction, max_dist=100.0):
    table = compile_colliders(colliders)
    o = [jnp.asarray([v], jnp.float32) for v in origin]
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    dv = [jnp.asarray([v], jnp.float32) for v in d]
    mask = jnp.asarray([0xFFFFFFFF], jnp.uint32)
    hit, dist, nx, ny, nz = raycast_scene(table, mask, *o, *dv, jnp.asarray([max_dist], jnp.float32))
    return bool(hit[0]), float(dist[0]), (float(nx[0]), float(ny[0]), float(nz[0]))


def test_ray_sphere():
    hit, dist, n = _cast([Collider.sphere(1.0, position=(0, 0, -5))], (0, 0, 0), (0, 0, -1))
    assert hit and abs(dist - 4.0) < 1e-5
    np.testing.assert_allclose(n, (0, 0, 1), atol=1e-5)
    hit, dist, n = _cast([Collider.sphere(1.0, position=(0, 0, 0))], (0, 0, 0), (0, 0, -1))
    assert hit and dist == 0.0 and n == (0, 0, 0)  # solid: inside
    hit, _, _ = _cast([Collider.sphere(1.0, position=(0, 5, 0))], (0, 0, 0), (0, -1, 0))
    assert not hit


def test_ray_cuboid():
    c = [Collider.cuboid((1, 2, 3), position=(0, -3, 0))]
    hit, dist, n = _cast(c, (0, 1, 0), (0, -1, 0))
    assert hit and abs(dist - 2.0) < 1e-5
    np.testing.assert_allclose(n, (0, 1, 0), atol=1e-5)
    hit, dist, n = _cast(c, (0, -3, 0), (0, -1, 0))
    assert hit and dist == 0.0
    hit, _, _ = _cast(c, (5, 1, 0), (0, -1, 0))
    assert not hit


def test_ray_cuboid_rotated():
    # cube rotated 45 deg about Z: vertical ray hits the tilted face
    s, cths = np.sin(np.pi / 8), np.cos(np.pi / 8)
    c = [Collider.cuboid((1, 1, 1), position=(0, -2, 0), rotation=(0, 0, s, cths))]
    hit, dist, n = _cast(c, (0, 1, 0), (0, -1, 0))
    assert hit
    nn = np.asarray(n)
    assert abs(np.linalg.norm(nn) - 1.0) < 1e-4
    assert nn[1] > 0.5  # upward-ish face normal


def test_ray_cylinder_and_caps():
    c = [Collider.cylinder(1.0, 0.5, position=(0, 0, 0))]
    hit, dist, n = _cast(c, (0, 3, 0), (0, -1, 0))
    assert hit and abs(dist - 2.5) < 1e-5
    np.testing.assert_allclose(n, (0, 1, 0), atol=1e-5)
    hit, dist, n = _cast(c, (3, 0, 0), (-1, 0, 0))
    assert hit and abs(dist - 2.0) < 1e-5
    np.testing.assert_allclose(n, (1, 0, 0), atol=1e-5)
    hit, _, _ = _cast(c, (3, 2, 0), (-1, 0, 0))
    assert not hit


def test_ray_cone():
    # tip at y=+1, base radius 1 at y=-1
    c = [Collider.cone(1.0, 1.0, position=(0, 0, 0))]
    hit, dist, n = _cast(c, (0, -3, 0), (0, 1, 0))  # hits base from below
    assert hit and abs(dist - 2.0) < 1e-4
    np.testing.assert_allclose(n, (0, -1, 0), atol=1e-4)
    hit, dist, n = _cast(c, (3, 0, 0), (-1, 0, 0))  # hits side at y=0, r=0.5
    assert hit and abs(dist - 2.5) < 1e-3
    nn = np.asarray(n)
    assert nn[0] > 0.5 and nn[1] > 0.0  # outward+up slope normal
    hit, _, _ = _cast(c, (3, 0.9, 0), (-1, 0, 0))  # near tip: radius 0.05
    assert hit
    hit, _, _ = _cast(c, (3, 1.2, 0), (-1, 0, 0))  # above tip
    assert not hit


def test_ray_capsule():
    c = [Collider.capsule(0.5, 1.0, position=(0, 0, 0))]
    hit, dist, n = _cast(c, (0, 3, 0), (0, -1, 0))  # top cap at y=1.5
    assert hit and abs(dist - 1.5) < 1e-5
    np.testing.assert_allclose(n, (0, 1, 0), atol=1e-5)
    hit, dist, _ = _cast(c, (3, 0.7, 0), (-1, 0, 0))  # side wall
    assert hit and abs(dist - 2.5) < 1e-5


def test_layer_filter():
    """Collider layers vs particle filter_mask (SpatialQueryFilter analog)."""
    table = compile_colliders([Collider.halfspace(position=(0, 0, 0), layers=0b10)])
    one = jnp.ones((4,), jnp.float32)
    px, py, pz = one * 0.0, one * 1.0, one * 0.0
    vx, vy, vz = one * 0.0, one * -10.0, one * 0.0
    rest = one * 0.0
    fric = one * 0.0
    dest = one * 0.0
    mask_hit = jnp.full((4,), 0b10, jnp.uint32)
    mask_miss = jnp.full((4,), 0b01, jnp.uint32)
    _, py2, _, _, _, _, _ = particle_collision(table, px, py, pz, vx, vy, vz, jnp.float32(1.0), rest, fric, dest, mask_hit)
    assert float(py2[0]) >= 0.0  # stopped at the plane
    _, py3, _, _, _, _, _ = particle_collision(table, px, py, pz, vx, vy, vz, jnp.float32(1.0), rest, fric, dest, mask_miss)
    assert float(py3[0]) < -8.0  # passed through


def test_four_substep_cap():
    """A particle squeezed between two planes bounces at most 4 times/frame."""
    table = compile_colliders([
        Collider.halfspace(position=(0, 0, 0)),
        Collider.halfspace(position=(0, 0.2, 0), rotation=(1, 0, 0, 0)),  # flipped: pushes down
    ])
    one = jnp.ones((1,), jnp.float32)
    out = particle_collision(table, one * 0, one * 0.1, one * 0, one * 0, one * -50.0, one * 0,
                             jnp.float32(0.1), one * 1.0, one * 0.0, one * 0.0,
                             jnp.full((1,), 0xFFFFFFFF, jnp.uint32))
    assert np.isfinite(np.asarray(out[:6])).all()


# ---------------------------------------------------------------------------
# Convex hull (plane set) — VERDICT r3 missing #1
# ---------------------------------------------------------------------------


def _box_hull_planes(hx, hy, hz):
    return [
        (1, 0, 0, hx), (-1, 0, 0, hx),
        (0, 1, 0, hy), (0, -1, 0, hy),
        (0, 0, 1, hz), (0, 0, -1, hz),
    ]


def test_ray_hull_box_matches_cuboid():
    """A 6-plane axis-aligned hull behaves exactly like the cuboid
    primitive: entry distance, face normal, inside => dist 0, miss."""
    hull = [Collider.hull(_box_hull_planes(1, 2, 3), position=(0, -3, 0))]
    box = [Collider.cuboid((1, 2, 3), position=(0, -3, 0))]
    for origin, d in (((0, 1, 0), (0, -1, 0)), ((0, -3, 0), (0, -1, 0)),
                      ((5, 1, 0), (0, -1, 0)), ((0.5, 4.0, 2.0), (0, -1, 0))):
        h1, d1, n1 = _cast(hull, origin, d)
        h2, d2, n2 = _cast(box, origin, d)
        assert h1 == h2, (origin, d)
        assert abs(d1 - d2) < 1e-5
        np.testing.assert_allclose(n1, n2, atol=1e-5)


def test_ray_hull_from_points_tetrahedron():
    """hull_from_points builds a supporting plane set; a ray into a slanted
    face returns that face's (unit, outward) normal."""
    pts = [(0, 0, 0), (2, 0, 0), (0, 2, 0), (0, 0, 2)]
    col = Collider.hull_from_points(pts, position=(0, -3, 0))
    assert len(col.planes) == 4
    # vertical ray down onto the slanted face x+y+z=2 (normal (1,1,1)/sqrt3)
    hit, dist, n = _cast([col], (0.4, 1.0, 0.4), (0, -1, 0))
    assert hit
    np.testing.assert_allclose(n, np.ones(3) / np.sqrt(3.0), atol=1e-5)
    # inside: solid => dist 0, zero normal
    hit, dist, n = _cast([col], (0.2, -2.8, 0.2), (0, -1, 0))
    assert hit and dist == 0.0 and tuple(n) == (0, 0, 0)
    # miss past the base
    hit, _, _ = _cast([col], (3.0, 1.0, 3.0), (0, -1, 0))
    assert not hit


def test_ray_hull_rotated():
    s8, c8 = np.sin(np.pi / 8), np.cos(np.pi / 8)
    hull = [Collider.hull(_box_hull_planes(1, 1, 1), position=(0, -2, 0),
                          rotation=(0, 0, s8, c8))]
    box = [Collider.cuboid((1, 1, 1), position=(0, -2, 0), rotation=(0, 0, s8, c8))]
    h1, d1, n1 = _cast(hull, (0, 1, 0), (0, -1, 0))
    h2, d2, n2 = _cast(box, (0, 1, 0), (0, -1, 0))
    assert h1 and h2 and abs(d1 - d2) < 1e-5
    np.testing.assert_allclose(n1, n2, atol=1e-5)


@pytest.mark.slow
def test_hull_bounce_matches_box_bounce():
    """End-to-end: particles bouncing on a hull floor follow the same
    trajectories as on an equivalent cuboid floor (same claim slots, same
    response math; hull vs cuboid entry distances agree to f32 rounding)."""
    sp = collide_spawner(vel=(0.8, -3.0, 0.1))
    c = compile_spawner(sp)
    frame = make_frame_input(1 / 50)
    hull_table = compile_colliders(
        [Collider.hull(_box_hull_planes(50, 1, 50), position=(0, -1.5, 0))])
    box_table = compile_colliders(
        [Collider.cuboid((50, 1, 50), position=(0, -1.5, 0))])
    sH = init_pool(1024, 1, seed=0, lifetime_fill=3.0)
    sB = init_pool(1024, 1, seed=0, lifetime_fill=3.0)
    for _ in range(40):
        sH, _o = step_jit(c.static, c.params, hull_table, sH, frame)
        sB, _o2 = step_jit(c.static, c.params, box_table, sB, frame)
    alive = np.asarray(sH.alive)
    assert np.array_equal(alive, np.asarray(sB.alive)) and alive.sum() > 0
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        a, b = np.asarray(getattr(sH, f))[alive], np.asarray(getattr(sB, f))[alive]
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_hull_from_points_large_rotated_box_dedups_to_six_faces():
    """Plane dedup must scale its tolerance with the point magnitudes: a
    rotated box at coordinates of order hundreds produces per-triple d
    values differing by ~1e-4 absolute, which a fixed 1e-6 tolerance failed
    to merge (spurious HULL_MAX_PLANES overflow)."""
    rng = np.random.RandomState(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    corners = np.array([[sx * 300.0, sy * 250.0, sz * 400.0]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    pts = corners @ R.T + np.array([120.0, -80.0, 55.0])
    col = Collider.hull_from_points(pts)
    assert len(col.planes) == 6


# ---------------------------------------------------------------------------
# hull_decomposition — trimesh -> compound convex pieces (VERDICT r4 next #8)
# ---------------------------------------------------------------------------


def _l_prism_mesh():
    """Concave L-shaped prism: the 2D L outline (0,0)(2,0)(2,1)(1,1)(1,2)(0,2)
    extruded to z in {0,1}; top/bottom faces fanned from the reflex vertex
    (the L is star-shaped from (1,1))."""
    outline = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    pts = [(x, y, z) for z in (0.0, 1.0) for (x, y) in outline]
    n = len(outline)
    tris = []
    for z0, base in ((0, 0), (1, n)):
        for i in range(n):
            j = (i + 1) % n
            if outline[i] == (1, 1) or outline[j] == (1, 1):
                continue
            tris.append((base + 3, base + i, base + j))  # fan from (1,1,z)
    for i in range(n):  # side quads
        j = (i + 1) % n
        tris.append((i, j, n + j))
        tris.append((i, n + j, n + i))
    return np.asarray(pts, np.float64), np.asarray(tris, np.int64)


def _inside_any(pieces, p, tol=1e-6):
    p = np.asarray(p, np.float64)
    for col in pieces:
        n = np.asarray([pl[:3] for pl in col.planes])
        d = np.asarray([pl[3] for pl in col.planes])
        if np.all(n @ p <= d + tol):
            return True
    return False


def test_hull_decomposition_convex_mesh_is_one_piece():
    from bevy_firework_tpu import hull_decomposition

    pts = np.asarray([(0, 0, 0), (2, 0, 0), (0, 2, 0), (0, 0, 2)], np.float64)
    tris = np.asarray([(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)], np.int64)
    pieces = hull_decomposition(pts, tris)
    assert len(pieces) == 1 and len(pieces[0].planes) == 4


def test_hull_decomposition_l_prism():
    """The concave L splits into convex pieces whose union covers the L's
    vertices but NOT the notch, and raycasts against the compound behave
    like the true L surface."""
    from bevy_firework_tpu import hull_decomposition

    pts, tris = _l_prism_mesh()
    pieces = hull_decomposition(pts, tris, max_pieces=8)
    assert 2 <= len(pieces) <= 8
    for p in pts:  # coverage: every input vertex is in some piece
        assert _inside_any(pieces, p, tol=1e-5), p
    # the notch (outside the L) stays uncovered
    assert not _inside_any(pieces, (1.5, 1.5, 0.5))
    assert not _inside_any(pieces, (1.05, 1.6, 0.5))
    # compound raycast: ray down over the lower arm hits y=1; over the
    # upper arm hits y=2; into the notch passes y in (1, 2] and hits y=1...
    # no — (1.5, *) is outside the upper arm so it falls to the lower arm top
    hit, dist, n = _cast(pieces, (1.5, 3.0, 0.5), (0, -1, 0))
    assert hit and abs(dist - 2.0) < 1e-4 and abs(n[1] - 1.0) < 1e-4
    hit, dist, n = _cast(pieces, (0.5, 3.0, 0.5), (0, -1, 0))
    assert hit and abs(dist - 1.0) < 1e-4 and abs(n[1] - 1.0) < 1e-4
    hit, _, _ = _cast(pieces, (2.5, 3.0, 0.5), (0, -1, 0))
    assert not hit


def test_hull_decomposition_deterministic():
    from bevy_firework_tpu import hull_decomposition

    pts, tris = _l_prism_mesh()
    a = hull_decomposition(pts, tris)
    b = hull_decomposition(pts, tris)
    assert [p.planes for p in a] == [p.planes for p in b]
