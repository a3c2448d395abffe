"""Scene-API soak: a seeded random op sequence over the full public surface
(spawner/collider CRUD, stepping, fast-forward, events, render/trail drains,
checkpoint round-trip) with invariants checked after every op. The reference
gets this class of coverage from being embedded in live Bevy apps; headless,
a fuzzer is the closest analog."""

import os

import numpy as np
import pytest

from bevy_firework_tpu import (
    BlendMode,
    Collider,
    EffectModifier,
    EmissionMode,
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    TrailSettings,
    Transform,
    instances_to_bytes,
)
from bevy_firework_tpu import ForceField
from bevy_firework_tpu.emission_shape import EmissionShape
from bevy_firework_tpu.checkpoint import load_scene, save_scene
from bevy_firework_tpu.settings import ParticleCollisionSettings

pytestmark = pytest.mark.slow  # excluded by default; CI test-slow job runs these

# a small fixed archetype pool bounds compile count while still crossing the
# big config axes: rate/one-shot/on-demand pacing, collision, nested
# emission, multi-type, blend modes, trails
ARCHETYPES = [
    ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.4))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(400.0))],
    ),
    ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32(0.2, 0.5), blend_mode=BlendMode.ADD,
            collision_settings=ParticleCollisionSettings(restitution=0.4, friction=0.2))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(600.0),
            initial_velocity=RandVec3(RandF32(1.0, 3.0), (0, 1, 0), 0.4))],
    ),
    ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(1.0))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.one_shot(40))],
    ),
    ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.6))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.on_demand())],
    ),
    ParticleSpawner(  # box + ring emission (beyond-reference shapes)
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.5))],
        emission_settings=[
            EmissionSettings(emission_pacing=EmissionPacing.rate(200.0),
                             emission_shape=EmissionShape.box((0.5, 0.2, 0.8))),
            EmissionSettings(emission_pacing=EmissionPacing.rate(200.0),
                             emission_shape=EmissionShape.ring((0.0, 1.0, 0.0), 1.5)),
        ],
    ),
    ParticleSpawner(  # nested: type-1 children off type-0 parents
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.8)),
            ParticleSettings(lifetime=RandF32.constant(0.3), blend_mode=BlendMode.BLEND),
        ],
        emission_settings=[
            EmissionSettings(emission_pacing=EmissionPacing.rate(30.0)),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(6.0, 0.0, 0.0, 1.0),
            ),
        ],
    ),
]

def _random_view_proj(rng):
    """Random perspective view-projection (WebGPU 0..1 clip-z): eye anywhere
    around the scene volume, looking at a random target near the spawner
    cloud. Returns (view_proj [4,4] f32, eye [3])."""
    eye = rng.uniform(-10.0, 10.0, 3).astype(np.float32)
    target = rng.uniform(-3.0, 3.0, 3).astype(np.float32)
    fwd = target - eye
    n = float(np.linalg.norm(fwd))
    if n < 1e-3:
        fwd, n = np.array([0.0, 0.0, -1.0], np.float32), 1.0
    fwd = fwd / n
    upw = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(float(fwd @ upw)) > 0.99:
        upw = np.array([1.0, 0.0, 0.0], np.float32)
    right = np.cross(fwd, upw)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    rot = np.stack([right, up, -fwd]).astype(np.float32)  # world -> camera
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = rot
    view[:3, 3] = -rot @ eye
    fovy = float(rng.uniform(0.6, 1.6))
    zn, zf = 0.1, 100.0
    f = 1.0 / np.tan(fovy / 2.0)
    proj = np.array(
        [
            [f, 0.0, 0.0, 0.0],
            [0.0, f, 0.0, 0.0],
            [0.0, 0.0, zf / (zn - zf), zn * zf / (zn - zf)],
            [0.0, 0.0, -1.0, 0.0],
        ],
        dtype=np.float32,
    )
    return (proj @ view).astype(np.float32), eye


COLLIDER_MAKERS = [
    lambda rng: Collider.halfspace(position=(0.0, float(rng.uniform(-1.5, -0.2)), 0.0)),
    lambda rng: Collider.sphere(float(rng.uniform(0.2, 0.8)), position=tuple(rng.uniform(-2, 2, 3))),
    lambda rng: Collider.cuboid(tuple(rng.uniform(0.2, 0.8, 3)), position=tuple(rng.uniform(-2, 2, 3))),
    lambda rng: Collider.capsule(0.3, 0.5, position=tuple(rng.uniform(-2, 2, 3))),
]


def check_invariants(scene, trailed):
    for sid in scene.spawner_ids():
        slot = scene._spawners[sid]
        st = slot.state
        alive = np.asarray(st.alive)
        n_alive = int(alive.sum())
        assert n_alive == scene.alive_count(sid)
        assert n_alive <= slot.capacity
        for f in ("px", "py", "pz", "vx", "vy", "vz", "age"):
            v = np.asarray(getattr(st, f))[alive]
            assert np.isfinite(v).all(), f"non-finite {f} in spawner {sid}"
        assert (np.asarray(st.age)[alive] <= np.asarray(st.lifetime)[alive]).all()
    # the exact-liveness extract agrees with the pool masks
    per_sid = {}
    for item in scene.render_items(method="compact"):
        assert item.instances.shape[1] == 16
        assert len(instances_to_bytes(item.instances)) == item.count * 64
        assert np.isfinite(item.instances).all()
        per_sid[item.spawner_id] = per_sid.get(item.spawner_id, 0) + item.count
    for sid, n in per_sid.items():
        assert n == scene.alive_count(sid)
    for item in scene.trail_items():
        assert item.spawner_id in trailed
        assert np.isfinite(item.segments).all()
        assert (item.segments[:, 3] > 0).all()  # live segments only
    # camera-sorted drains and AABB queries never corrupt anything
    cam = (0.0, 2.0, -8.0)
    for item in scene.render_items(camera_pos=cam):
        assert np.isfinite(item.instances).all()
    scene.trail_items(camera_pos=cam)
    for sid in scene.spawner_ids():
        if scene.alive_count(sid):
            lo, hi = scene.aabb(sid)
            assert np.isfinite(lo).all() and np.isfinite(hi).all()
            lo2, hi2 = scene.aabb(sid, space="local")
            assert np.isfinite(lo2).all() and np.isfinite(hi2).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_scene_soak(seed, tmp_path):
    rng = np.random.RandomState(100 + seed)
    scene = Scene(seed=seed, colliders=[Collider.halfspace(position=(0, -1, 0))])
    trailed = set()
    collider_ids = []

    def op_add_spawner():
        i = int(rng.randint(len(ARCHETYPES)))
        nested = len(ARCHETYPES) - 1  # the nested archetype (multi-type)
        trail = TrailSettings(length=int(rng.randint(2, 6))) if (i != nested and rng.rand() < 0.3) else None
        sid = scene.add_spawner(
            ARCHETYPES[i], capacity=256,
            transform=Transform(translation=tuple(rng.uniform(-3, 3, 3))),
        ) if trail is None else scene.add_spawner(
            ARCHETYPES[i], capacity=256,
            transform=Transform(translation=tuple(rng.uniform(-3, 3, 3))),
            trail=trail,
        )
        if trail is not None:
            trailed.add(sid)

    def op_remove_spawner():
        ids = scene.spawner_ids()
        if ids:
            sid = ids[int(rng.randint(len(ids)))]
            scene.remove_spawner(sid)
            trailed.discard(sid)

    def op_set_spawner():
        ids = scene.spawner_ids()
        if ids:
            scene.set_spawner(ids[int(rng.randint(len(ids)))],
                              ARCHETYPES[int(rng.randint(len(ARCHETYPES)))])

    def op_add_collider():
        cid = scene.add_collider(COLLIDER_MAKERS[int(rng.randint(len(COLLIDER_MAKERS)))](rng))
        collider_ids.append(cid)

    def op_remove_collider():
        if collider_ids:
            scene.remove_collider(collider_ids.pop(int(rng.randint(len(collider_ids)))))

    def op_move_collider():
        if collider_ids:
            scene.set_collider(collider_ids[int(rng.randint(len(collider_ids)))],
                               position=tuple(rng.uniform(-2, 2, 3)))

    def op_transform_modifier():
        ids = scene.spawner_ids()
        if ids:
            sid = ids[int(rng.randint(len(ids)))]
            scene.set_transform(sid, Transform(translation=tuple(rng.uniform(-3, 3, 3))))
            scene.set_modifier(sid, EffectModifier(scale=float(rng.uniform(0.5, 2.0)),
                                                   speed=float(rng.uniform(0.5, 2.0))))

    def op_queue_and_toggle():
        ids = scene.spawner_ids()
        if ids:
            sid = ids[int(rng.randint(len(ids)))]
            scene.queue_particles(sid, int(rng.randint(1, 20)))
            scene.set_enabled(sid, bool(rng.rand() < 0.8))

    field_ids = []

    def op_field():
        r = rng.rand()
        if r < 0.45 or not field_ids:
            maker = [
                lambda: ForceField.point(tuple(rng.uniform(-3, 3, 3)), float(rng.uniform(-6, 6)), float(rng.uniform(2, 8))),
                lambda: ForceField.vortex(tuple(rng.uniform(-3, 3, 3)), (0.0, 1.0, 0.0), float(rng.uniform(-5, 5)), float(rng.uniform(2, 8))),
                lambda: ForceField.axial(tuple(rng.uniform(-3, 3, 3)), (0.0, 1.0, 0.0), float(rng.uniform(-5, 5)), float(rng.uniform(2, 8))),
            ][int(rng.randint(3))]
            field_ids.append(scene.add_force_field(maker()))
        elif r < 0.8:
            scene.set_force_field(field_ids[int(rng.randint(len(field_ids)))],
                                  position=tuple(rng.uniform(-3, 3, 3)),
                                  strength=float(rng.uniform(-6, 6)))
        else:
            scene.remove_force_field(field_ids.pop(int(rng.randint(len(field_ids)))))

    def op_set_layers():
        ids = scene.spawner_ids()
        if ids:
            scene.set_layers(ids[int(rng.randint(len(ids)))], int(rng.randint(1, 4)))

    def op_render_views():
        """Randomized render_items drains (VERDICT r2 next #8): mixed
        method / camera_pos / sort_within / view_proj / view_layers, with
        the item-set invariant the round-2 `planes`-shadowing bug violated:
        every non-empty layer-matching spawner is present unless PROVABLY
        off-frustum (aabb_intersects_frustum is conservative, so an
        intersecting box must never be culled)."""
        from bevy_firework_tpu import aabb_intersects_frustum, frustum_planes

        method = ("dense", "compact")[int(rng.randint(2))]
        camera = tuple(rng.uniform(-8, 8, 3)) if rng.rand() < 0.5 else None
        sw = ("auto", "all", "none")[int(rng.randint(3))]
        vp = _random_view_proj(rng)[0] if rng.rand() < 0.6 else None
        vl = int(rng.randint(1, 4)) if rng.rand() < 0.3 else None
        items = scene.render_items(method=method, camera_pos=camera,
                                   sort_within=sw, view_proj=vp, view_layers=vl)
        present = {it.spawner_id for it in items}
        planes = frustum_planes(vp) if vp is not None else None
        for sid in scene.spawner_ids():
            slot = scene._spawners[sid]
            if vl is not None and not (slot.layers & vl):
                assert sid not in present, f"spawner {sid} leaked through layer filter"
                continue
            if scene.alive_count(sid) == 0:
                continue
            if planes is not None:
                box = scene.aabb(sid, space="world")
                if box is not None and not aabb_intersects_frustum(box[0], box[1], planes):
                    assert sid not in present, f"off-frustum spawner {sid} not culled"
                    continue
            assert sid in present, (
                f"non-empty spawner {sid} missing from render_items("
                f"method={method}, camera={camera is not None}, vp={vp is not None}, vl={vl})"
            )
        for it in items:
            assert np.isfinite(it.instances).all()
        # trail drains stay uncorrupted under the same random views
        for it in scene.trail_items(camera_pos=camera, view_layers=vl):
            assert it.spawner_id in trailed
            assert np.isfinite(it.segments).all()

    def op_async_cycle():
        """Pipelined-extract surface under churn: enable, step, drain with
        the one-frame-stale contract (frame ids monotonically increase per
        (spawner, type); arrays finite), release, disable."""
        scene.enable_async_render()
        try:
            seen = {}
            for _ in range(int(rng.randint(2, 5))):
                scene.step(1 / 60)
                for it in scene.render_async():
                    key = (it.spawner_id, it.type_index)
                    assert it.frame_id > seen.get(key, -1)
                    seen[key] = it.frame_id
                    assert np.isfinite(it.instances).all()
                scene.release_async()
        finally:
            scene.disable_async_render()

    def op_step():
        scene.step(float(rng.choice([1 / 120, 1 / 60, 1 / 30])))

    def op_step_n():
        scene.step_n(1 / 60, int(rng.randint(2, 6)))

    def op_checkpoint_roundtrip():
        path = os.path.join(tmp_path, "soak.ckpt")
        save_scene(path, scene)
        restored = load_scene(path, colliders=None)
        a = {(i.spawner_id, i.type_index): i.instances
             for i in scene.render_items(method="compact")}
        b = {(i.spawner_id, i.type_index): i.instances
             for i in restored.render_items(method="compact")}
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    ops = [op_add_spawner, op_remove_spawner, op_set_spawner, op_add_collider,
           op_remove_collider, op_move_collider, op_transform_modifier,
           op_queue_and_toggle, op_field, op_step, op_step, op_step, op_step_n,
           op_checkpoint_roundtrip, op_set_layers, op_render_views, op_async_cycle]
    weights = np.array([2, 1, 1, 1.5, 1, 1.5, 1.5, 1.5, 1.5, 6, 6, 6, 2, 0.5,
                        1, 3, 0.7], float)
    weights /= weights.sum()

    op_add_spawner()  # never start empty
    for _ in range(70):
        ops[int(rng.choice(len(ops), p=weights))]()
        check_invariants(scene, trailed)
