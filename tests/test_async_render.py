"""Pipelined render extract through the Scene facade (VERDICT r2 item 4).

Scene.enable_async_render() routes every step()'s instance pack through
render_pipeline.AsyncRenderReader + the native instance rings: dispatch is
non-blocking, the device->host transfer happens on a reader thread, and
render_async() returns the newest READY frame — the analog of Bevy's
pipelined extract (render world draws frame N-1 while frame N simulates,
`/root/reference/src/render.rs:52-54`)."""

import time

import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    Scene,
)


def _sparks(rate=1000.0, lifetime=0.75):
    return ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(lifetime))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(rate))],
    )


def _drain_until(scene, want_fid, timeout=10.0):
    """Poll render_async, accumulating the newest item per (spawner, type),
    until every accumulated item reports frame_id >= want_fid (frames are
    delivered once each; the reader thread is free-running, so tests must
    wait — a renderer would just draw whatever is ready). Instances are
    copied out of the ring views so they survive the next poll's release."""
    import dataclasses as _dc

    deadline = time.time() + timeout
    best = {}
    while time.time() < deadline:
        for it in scene.render_async():
            best[(it.spawner_id, it.type_index)] = _dc.replace(
                it, instances=it.instances.copy()
            )
        if best and all(it.frame_id >= want_fid for it in best.values()):
            break
        time.sleep(0.01)
    scene.release_async()
    return list(best.values())


def test_async_render_matches_sync_pack():
    scene = Scene()
    scene.enable_async_render()
    scene.add_spawner(_sparks(), capacity=2048)
    for _ in range(60):
        scene.step(1 / 60)
    items = _drain_until(scene, 60)
    assert items and items[0].frame_id == 60
    sync = scene.render_items()
    assert items[0].count == sync[0].count == 750
    # same instances (order may differ between pack paths): compare sorted
    for col in (0, 1, 2, 3):
        np.testing.assert_allclose(
            np.sort(items[0].instances[:, col]),
            np.sort(sync[0].instances[:, col]),
            atol=1e-6,
        )
    scene.release_async()
    scene.disable_async_render()


def test_async_render_one_frame_stale_contract():
    """frame_id never exceeds the number of step() calls, and with a waiting
    consumer it reaches exactly the latest frame (latest-wins ring)."""
    scene = Scene()
    scene.enable_async_render()
    scene.add_spawner(_sparks(), capacity=2048)
    seen = []
    for f in range(1, 31):
        scene.step(1 / 60)
        items = scene.render_async()
        for it in items:
            assert 1 <= it.frame_id <= f  # never from the future
            seen.append(it.frame_id)
    assert seen, "reader never published a frame in 30 steps"
    assert seen == sorted(set(seen)), (
        "frame ids must be strictly increasing (each frame delivered once)"
    )
    items = _drain_until(scene, 30)
    assert items and items[0].frame_id == 30
    scene.release_async()
    scene.disable_async_render()


def test_async_render_multi_type_and_removal():
    """Multi-type spawners go through the per-type XLA pack; removing a
    spawner closes its reader without disturbing the others."""
    scene = Scene()
    scene.enable_async_render()
    multi = scene.add_spawner(
        ParticleSpawner(
            particle_settings=[
                ParticleSettings(lifetime=RandF32.constant(0.75)),
                ParticleSettings(lifetime=RandF32.constant(0.75)),
            ],
            emission_settings=[
                EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.rate(500.0)),
                EmissionSettings(particle_index=1, emission_pacing=EmissionPacing.rate(500.0)),
            ],
        ),
        capacity=2048,
    )
    single = scene.add_spawner(_sparks(), capacity=2048)
    for _ in range(60):
        scene.step(1 / 60)
    items = _drain_until(scene, 60)
    keys = {(it.spawner_id, it.type_index) for it in items}
    assert keys == {(multi, 0), (multi, 1), (single, 0)}
    counts = {(it.spawner_id, it.type_index): it.count for it in items}
    # steady state ~= rate * lifetime (f32 cadence can land one spawn on the
    # lifetime boundary at a given frame: allow +-1)
    assert abs(counts[(multi, 0)] - 375) <= 1
    assert abs(counts[(multi, 1)] - 375) <= 1
    assert abs(counts[(single, 0)] - 750) <= 1
    scene.release_async()
    scene.remove_spawner(multi)
    scene.step(1 / 60)
    items = _drain_until(scene, 61)
    assert {(it.spawner_id, it.type_index) for it in items} == {(single, 0)}
    scene.release_async()
    scene.disable_async_render()


def test_async_render_layers_filter():
    """render_async(view_layers=...) applies the same RenderLayers filter
    as the synchronous path (render.rs:503-506)."""
    scene = Scene()
    scene.enable_async_render()
    a = scene.add_spawner(_sparks(), capacity=2048)
    b = scene.add_spawner(_sparks(), capacity=2048, layers=0b10)
    for _ in range(30):
        scene.step(1 / 60)
    deadline = time.time() + 10
    got = set()
    while time.time() < deadline and got != {a}:
        got = {it.spawner_id for it in scene.render_async(view_layers=0b01)}
        time.sleep(0.01)
    assert got == {a}
    deadline = time.time() + 10
    got = set()
    while time.time() < deadline and got != {b}:
        got = {it.spawner_id for it in scene.render_async(view_layers=0b10)}
        time.sleep(0.01)
    assert got == {b}
    scene.release_async()
    scene.disable_async_render()
