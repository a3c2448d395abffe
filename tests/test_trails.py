"""Trail/ribbon tests: circular history correctness, respawn reset, segment
records, taper, step_n cadence, sorting (trails.py — beyond the reference's
feature set, `/root/reference/README.md:21-50`)."""

import pytest
import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    TrailSettings,
)


def ballistic_spawner(n=8, lifetime=1.0):
    return ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(lifetime), initial_scale=RandF32.constant(1.0),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.one_shot(n),
            initial_velocity=RandVec3.constant((1.0, 0.0, 0.0)))],
    )


def test_history_matches_past_positions():
    """K=4 history of a constant-velocity burst: every segment endpoint is
    an exact past integrator position; widths/alphas taper linearly."""
    K = 4
    scene = Scene(seed=1)
    scene.add_spawner(ballistic_spawner(n=8), capacity=256,
                      trail=TrailSettings(length=K, width=0.5))
    dt = 1 / 60
    for _ in range(6):
        scene.step(dt)
    items = scene.trail_items()
    assert len(items) == 1
    seg = items[0].segments
    assert items[0].count == seg.shape[0] == 8 * (K - 1)
    # x positions after 6 frames: v = 1 => x(f) = f*dt; segment s spans
    # frames (6-s, 6-s-1)
    for s in range(K - 1):
        rows = seg[np.isclose(seg[:, 0], (6 - s) * dt)]
        assert rows.shape[0] == 8, f"segment {s}"
        np.testing.assert_allclose(rows[:, 4], (5 - s) * dt, rtol=1e-6)
        # taper: w = scale * width * (1 - s/(K-1)) at each end
        np.testing.assert_allclose(rows[:, 3], 0.5 * (1 - s / (K - 1)), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(rows[:, 7], 0.5 * (1 - (s + 1) / (K - 1)), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(rows[:, 11] / rows[0, 9] * rows[0, 9], rows[:, 11])
    # alpha taper: a0/a1 scale with the same factors (base alpha constant 1)
    assert (seg[:, 11] >= seg[:, 15]).all()


def test_history_saturates_and_rings():
    """After >K frames the buffer rings: still exactly K-1 segments per
    particle, spanning the most recent K positions only."""
    K = 3
    scene = Scene(seed=1)
    scene.add_spawner(ballistic_spawner(n=4, lifetime=5.0), capacity=256,
                      trail=TrailSettings(length=K, width=1.0, taper=False))
    dt = 1 / 60
    for _ in range(10):
        scene.step(dt)
    seg = scene.trail_items()[0].segments
    assert seg.shape[0] == 4 * (K - 1)
    xs = np.sort(np.unique(np.round(np.concatenate([seg[:, 0], seg[:, 4]]), 6)))
    np.testing.assert_allclose(xs, [8 * dt, 9 * dt, 10 * dt], rtol=1e-5)
    # taper=False: all widths equal scale * width
    np.testing.assert_allclose(seg[:, 3], seg[:, 7])


def test_respawn_resets_history_no_teleport_segments():
    """Ring-pool slot reuse: a dying particle's slot is re-tenanted and the
    new tenant must NOT inherit history — no segment may span farther than
    one frame's travel."""
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.2), initial_scale=RandF32.constant(1.0),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(300.0),
            initial_velocity=RandVec3(RandF32(min=1.0, max=4.0), (1.0, 0.0, 0.0), 0.3))],
    )
    scene = Scene(seed=2)
    scene.add_spawner(sp, capacity=64, trail=TrailSettings(length=6, width=0.2))
    dt = 1 / 60
    max_step = 4.0 * dt * 1.5  # max speed x dt, generous margin
    for f in range(120):  # several lifetimes => constant slot churn
        scene.step(dt)
        for item in scene.trail_items():
            d = item.segments[:, 0:3] - item.segments[:, 4:7]
            lens = np.sqrt((d * d).sum(axis=1))
            assert lens.max(initial=0.0) <= max_step, f"teleport segment at frame {f}"


def test_trail_items_empty_and_step_n_cadence():
    scene = Scene(seed=1)
    scene.add_spawner(ballistic_spawner(), capacity=256)  # no trail
    scene.step(1 / 60)
    assert scene.trail_items() == []

    scene2 = Scene(seed=1)
    scene2.add_spawner(ballistic_spawner(), capacity=256,
                       trail=TrailSettings(length=8))
    scene2.step_n(1 / 60, 5)  # fast-forward records ONE point
    assert scene2.trail_items() == []  # 1 point => no segments yet
    scene2.step(1 / 60)
    seg = scene2.trail_items()[0].segments
    assert seg.shape[0] == 8  # exactly one segment per particle


def test_sorted_trail_segments():
    scene = Scene(seed=3)
    scene.add_spawner(ballistic_spawner(n=16), capacity=256,
                      trail=TrailSettings(length=4))
    for _ in range(8):
        scene.step(1 / 60)
    cam = (0.0, 1.0, -4.0)
    items = scene.trail_items(camera_pos=cam)
    seg = items[0].segments
    mid = 0.5 * (seg[:, 0:3] + seg[:, 4:7]) - np.asarray(cam, np.float32)
    d2 = (mid * mid).sum(axis=1)
    assert (np.diff(d2) <= 1e-6).all()
    plain = scene.trail_items()[0].segments
    np.testing.assert_array_equal(np.sort(seg, axis=0), np.sort(plain, axis=0))


def test_set_spawner_clears_trails():
    scene = Scene(seed=1)
    sid = scene.add_spawner(ballistic_spawner(), capacity=256,
                            trail=TrailSettings(length=4))
    for _ in range(5):
        scene.step(1 / 60)
    assert scene.trail_items()
    scene.set_spawner(sid, ballistic_spawner(n=4))
    assert scene.trail_items() == []  # full re-sync clears history too


def test_viewer_draws_trails():
    """Software viewer composites ribbon segments: a pixel on the motion
    path BEHIND the particle head lights up only when trails are passed."""
    from bevy_firework_tpu.viewer import Camera, render_frame

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(5.0), initial_scale=RandF32.constant(0.15),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.one_shot(4),
            initial_velocity=RandVec3.constant((1.0, 0.0, 0.0)))],
    )
    scene = Scene(seed=1)
    scene.add_spawner(sp, capacity=256, trail=TrailSettings(length=8, width=1.0))
    for _ in range(30):
        scene.step(1 / 10)  # long steps => long visible trail
    cam = Camera(position=(2.5, 0.0, 6.0), look_at=(2.5, 0.0, 0.0))
    W, H = 160, 120
    with_trails = render_frame(scene.render_items(), cam, W, H,
                               trail_items=scene.trail_items())
    without = render_frame(scene.render_items(), cam, W, H)
    # head at x=3.0; probe the path point x=2.7 (inside the 8-point history,
    # well clear of the 0.15-scale disc): screen px = focal*(x-2.5)/6 + W/2
    focal = 0.5 * W / np.tan(0.5 * cam.fov)
    px = int(focal * (2.7 - 2.5) / 6.0 + W * 0.5)
    py = H // 2
    assert with_trails[py, px].max() > 0.1
    assert without[py, px].max() <= 0.05
    assert (with_trails > 0.05).sum() > (without > 0.05).sum()


def test_trails_with_archetype_batched_spawners():
    """Two same-archetype spawners step as ONE vmapped group dispatch;
    each keeps its own independent trail history (read off the lazy
    batch slice)."""
    scene = Scene(seed=4)
    a = scene.add_spawner(ballistic_spawner(n=4), capacity=256,
                          trail=TrailSettings(length=4, width=0.3))
    b = scene.add_spawner(ballistic_spawner(n=4), capacity=256,
                          trail=TrailSettings(length=4, width=0.3))
    from bevy_firework_tpu import Transform
    scene.set_transform(b, Transform(translation=(0.0, 10.0, 0.0)))
    for _ in range(6):
        scene.step(1 / 60)
    assert scene._last_step_dispatches == 1  # batched
    items = {it.spawner_id: it for it in scene.trail_items()}
    assert set(items) == {a, b}
    # spawner b's ribbon rides its own origin, 10 units up
    assert np.abs(items[a].segments[:, 1]).max() < 1.0
    assert items[b].segments[:, 1].min() > 9.0
    # identical spawners at different origins: same local trajectory
    np.testing.assert_allclose(items[a].segments[:, 0], items[b].segments[:, 0], atol=1e-5)


@pytest.mark.slow
def test_step_n_window_retenant_does_not_bridge_history():
    """A slot whose tenant dies INSIDE a step_n window and is re-claimed
    comes back OLDER than the previous record (age grew) — the elapsed-
    aware restart rule must cut the history, or a segment teleports from
    the dead tenant's last position to the new tenant's. The emitter moves
    100 units between windows, so a bridged segment is unmistakable
    (pre-fix this measured a 100-unit segment)."""
    from bevy_firework_tpu import Transform

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.2), initial_scale=RandF32.constant(1.0),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(300.0),
            initial_velocity=RandVec3.constant((4.0, 0.0, 0.0)))],
    )
    scene = Scene(seed=2)
    sid = scene.add_spawner(sp, capacity=64, trail=TrailSettings(length=6, width=0.2))
    dt = 1 / 60
    scene.step(dt)  # record a point with young tenants
    for w in range(8):
        scene.set_transform(sid, Transform(translation=(0.0, 0.0, 100.0 * w)))
        scene.step_n(dt, 30)  # 2.5 lifetimes: every slot churns mid-window
        for item in scene.trail_items():
            d = item.segments[:, 0:3] - item.segments[:, 4:7]
            lens = np.sqrt((d * d).sum(axis=1))
            # max credible span between two records of ONE tenant
            assert lens.max(initial=0.0) <= 4.0 * dt * 30 * 1.05, lens.max()

    # and continuing tenants must NOT restart spuriously: long-lived
    # particles keep accumulating history across step_n records
    scene2 = Scene(seed=1)
    scene2.add_spawner(ballistic_spawner(n=4, lifetime=10.0), capacity=256,
                       trail=TrailSettings(length=6))
    scene2.step(dt)
    for _ in range(4):
        scene2.step_n(dt, 10)
    seg = scene2.trail_items()[0].segments
    assert seg.shape[0] == 4 * 4  # 5 records so far => 4 segments/particle
    d = seg[:, 0:3] - seg[:, 4:7]
    np.testing.assert_allclose(
        np.sqrt((d * d).sum(1)), 10 * dt, rtol=1e-4)  # 10-frame spans


@pytest.mark.slow
def test_group_stacked_trails_match_per_slot_path():
    """A fully-trailed archetype group updates trails in ONE vmapped
    dispatch (batch.trails authority); results must equal the per-slot
    update path exactly, survive member mutation (restack), and slice
    correctly for checkpoint/trail_items readers."""
    from bevy_firework_tpu import Transform

    def build(seed):
        sc = Scene(seed=seed)
        a = sc.add_spawner(ballistic_spawner(n=6), capacity=256,
                           trail=TrailSettings(length=5, width=0.3))
        b = sc.add_spawner(ballistic_spawner(n=6), capacity=256,
                           transform=Transform(translation=(0.0, 7.0, 0.0)),
                           trail=TrailSettings(length=5, width=0.3))
        return sc, a, b

    scene, a, b = build(9)
    for _ in range(8):
        scene.step(1 / 60)
    batch = next(iter(scene._batches.values()))
    assert batch.trails is not None  # the stacked path engaged

    # reference: identical scene but defeat stacking via distinct settings
    ref, ra, rb = build(9)
    ref._spawners[rb].trail_settings = TrailSettings(length=5, width=0.3, taper=False)
    for _ in range(8):
        ref.step(1 / 60)
    assert next(iter(ref._batches.values())).trails is None  # per-slot path

    got = {it.spawner_id: it.segments for it in scene.trail_items()}
    # positions/widths of spawner `a` identical across paths (same sim)
    want = {it.spawner_id: it.segments for it in ref.trail_items()}
    np.testing.assert_array_equal(got[a], want[ra])
    pos_cols = [0, 1, 2, 4, 5, 6]  # endpoint positions (widths differ: taper)
    np.testing.assert_array_equal(got[b][:, pos_cols], want[rb][:, pos_cols])

    # member mutation restacks without corruption
    scene.set_spawner(b, ballistic_spawner(n=4))
    for _ in range(4):
        scene.step(1 / 60)
    items = {it.spawner_id: it for it in scene.trail_items()}
    assert items[b].segments.shape[0] == 4 * 3  # 4 records => 3 segments each
    assert np.abs(items[a].segments[:, 1]).max() < 1.0  # a unaffected


@pytest.mark.slow
def test_group_trail_authority_survives_transitions():
    """The stacked trail authority must hand off correctly at every group
    transition (each case crashed or silently lost history before the fix):
    member removal (survivor goes single-slot), member addition (restack),
    settings divergence (stacked -> per-slot), and set_spawner mid-group
    (detach must invalidate the stale stacked authority)."""
    from bevy_firework_tpu import Transform

    def trailed(n=4):
        return ballistic_spawner(n=n, lifetime=10.0)

    TS = TrailSettings(length=5, width=0.3)

    # 1. removal: survivor keeps its history through the single-slot path
    sc = Scene(seed=1)
    a = sc.add_spawner(trailed(), capacity=256, trail=TS)
    b = sc.add_spawner(trailed(), capacity=256, trail=TS,
                       transform=Transform(translation=(0.0, 7.0, 0.0)))
    for _ in range(3):
        sc.step(1 / 60)
    sc.remove_spawner(b)
    sc.step(1 / 60)  # was: AttributeError on None trail state
    seg = {it.spawner_id: it.segments for it in sc.trail_items()}[a]
    assert seg.shape[0] == 4 * 3  # 4 records preserved => 3 segments each

    # 2. addition: restack stacks lazy trail states off the OLD authority
    c = sc.add_spawner(trailed(), capacity=256, trail=TS,
                       transform=Transform(translation=(0.0, 14.0, 0.0)))
    sc.step(1 / 60)  # group of 2 re-forms (a + c); was: ValueError in stack
    sc.step(1 / 60)
    seg = {it.spawner_id: it.segments for it in sc.trail_items()}
    assert seg[a].shape[0] == 4 * 4  # a's history uninterrupted (K=5 cap)
    assert seg[c].shape[0] == 4 * 1  # c: 2 records => 1 segment

    # 3. divergence: switching one member's settings mid-run falls back to
    # per-slot updates with materialized histories
    sc._spawners[c].trail_settings = TrailSettings(length=5, width=0.3, taper=False)
    sc.step(1 / 60)  # was: AttributeError on None trail state
    seg = {it.spawner_id: it.segments for it in sc.trail_items()}
    assert seg[a].shape[0] == 4 * 4 and seg[c].shape[0] == 4 * 2

    # 4. set_spawner on a stacked-trail member: the fresh (reset) trail
    # state must not be shadowed by the stale stacked authority
    sc2 = Scene(seed=2)
    d = sc2.add_spawner(trailed(), capacity=256, trail=TS)
    e = sc2.add_spawner(trailed(), capacity=256, trail=TS,
                        transform=Transform(translation=(0.0, 7.0, 0.0)))
    for _ in range(4):
        sc2.step(1 / 60)
    sc2.set_spawner(e, trailed(n=2))
    sc2.step(1 / 60)
    seg = {it.spawner_id: it.segments for it in sc2.trail_items()}
    assert d in seg and seg[d].shape[0] == 4 * 4  # d's history intact
    assert e not in seg or seg[e].shape[0] == 0  # e reset: 1 record, no segs
    sc2.step(1 / 60)
    seg = {it.spawner_id: it.segments for it in sc2.trail_items()}
    assert seg[e].shape[0] == 2 * 1  # 2 records after reset => 1 segment
