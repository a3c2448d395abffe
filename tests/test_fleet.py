"""Fleet: vmapped same-archetype spawner batching (SURVEY.md §2a DP)."""

import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Transform,
)
from bevy_firework_tpu.fleet import Fleet


def burst(n=10, lifetime=0.2):
    return ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(lifetime),
                                            initial_scale=RandF32.constant(0.1),
                                            acceleration=(0, 0, 0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.one_shot(n),
                                            initial_velocity=RandVec3.constant((0, 1, 0)))],
    )


def test_fleet_one_shot_lifecycle():
    fleet = Fleet(burst(), capacity=32, max_spawners=8)
    a = fleet.activate(Transform(translation=(1, 0, 0)))
    b = fleet.activate(Transform(translation=(5, 0, 0)))
    fleet.step(1 / 60)
    assert fleet.alive_count() == 20  # 10 each
    items = fleet.render_items()
    assert len(items) == 2
    xs = sorted(i.instances[:, 0].mean() for i in items)
    assert abs(xs[0] - 1.0) < 0.1 and abs(xs[1] - 5.0) < 0.1
    # run out the lifetimes -> finished events fire, slots recycle
    finished = []
    for _ in range(20):
        fleet.step(1 / 60)
        finished += fleet.drain_finished()
    assert sorted(finished) == [a, b]
    assert fleet.active_slots() == []
    # slot reuse
    c = fleet.activate(Transform(translation=(-3, 0, 0)))
    assert c == 0
    fleet.step(1 / 60)
    assert fleet.alive_count() == 10


def test_inactive_slots_do_nothing():
    fleet = Fleet(burst(), capacity=32, max_spawners=4)
    fleet.step(1 / 60)
    assert fleet.alive_count() == 0
    fleet.activate()
    fleet.step(1 / 60)
    assert fleet.alive_count() == 10  # only the active slot emits


def test_fleet_full_raises():
    fleet = Fleet(burst(lifetime=10.0), capacity=32, max_spawners=2)
    fleet.activate()
    fleet.activate()
    try:
        fleet.activate()
        assert False
    except RuntimeError:
        pass


def test_fleet_slots_draw_distinct_random_streams():
    """Regression: activation must not clone the template PRNG key — sibling
    spawners with randomized settings should differ."""
    from bevy_firework_tpu import RandVec3 as RV, RandF32 as RF

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(5.0))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.one_shot(8),
            initial_velocity=RV(RF(1.0, 5.0), (0, 1, 0), 1.0))],
    )
    fleet = Fleet(sp, capacity=32, max_spawners=4)
    a = fleet.activate()
    b = fleet.activate()
    fleet.step(1 / 60)
    vy = np.asarray(fleet.states.vy)
    alive = np.asarray(fleet.states.alive)
    va = np.sort(vy[a][alive[a]])
    vb = np.sort(vy[b][alive[b]])
    assert not np.allclose(va, vb), "sibling slots emitted identical random draws"
    # re-activation also gets a fresh stream
    fleet.deactivate(a)
    a2 = fleet.activate()
    assert a2 == a
    fleet.step(1 / 60)
    vy2 = np.asarray(fleet.states.vy)
    alive2 = np.asarray(fleet.states.alive)
    va2 = np.sort(vy2[a][alive2[a]][:8])
    assert not np.allclose(va, va2), "re-activated slot replayed its stream"


def test_multi_step_fleet_matches_sequential():
    """multi_step_fleet (scan over vmapped step_auto, invariant hoisting)
    must equal stepping each slot independently."""
    import jax
    import numpy as np

    from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
    from bevy_firework_tpu.ops.fused_step import multi_step_auto, multi_step_fleet
    from bevy_firework_tpu.parallel.sharding import stack_frames, stack_pools

    from bevy_firework_tpu.models import effects

    sp, _tf = effects.sparks(rate=400.0)
    c = compile_spawner(sp)
    # tile-aligned capacity so the fused-fleet path (and its carry hoisting)
    # is what runs on a TPU backend; CPU CI exercises the fallback scan
    S, N, F = 3, 8192, 40
    pools = [init_pool_for(c, N, seed=i) for i in range(S)]
    frames = [make_frame_input(1 / 60, translation=(float(i), 0.0, 0.0)) for i in range(S)]

    fleet_states, fleet_out = multi_step_fleet(
        c.static, c.params, None, stack_pools(pools), stack_frames(frames), F
    )
    for i in range(S):
        si, oi = multi_step_auto(c.static, c.params, None, pools[i], frames[i], F)
        assert int(oi.alive_count) == int(np.asarray(fleet_out.alive_count)[i]) > 0
        np.testing.assert_allclose(
            np.asarray(si.px), np.asarray(fleet_states.px)[i], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(si.alive), np.asarray(fleet_states.alive)[i]
        )
