"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY.md §2a):
sp (particle-axis) sharding must be numerically identical to single-device,
and dp (fleet) sharding must run S independent spawners with no interaction."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_spawner,
    init_pool_for,
    make_frame_input,
    step_jit,
)
from bevy_firework_tpu.parallel.sharding import (
    make_fleet_step,
    make_mesh,
    make_sharded_step,
    shard_pool,
    stack_frames,
    stack_params,
    stack_pools,
)


def spawner():
    return ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.4), initial_scale=RandF32.constant(0.1))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(300.0),
            initial_velocity=RandVec3.constant((0.5, 2.0, 0.0)))],
    )


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sp_sharded_step_matches_single_device():
    sp = spawner()
    compiled = compile_spawner(sp)
    mesh = make_mesh(8)
    n = 8 * 256
    state_a = init_pool_for(compiled, n, seed=7)
    state_b = shard_pool(init_pool_for(compiled, n, seed=7), mesh)
    sharded = make_sharded_step(compiled.static, mesh)
    frame = make_frame_input(1 / 60)
    for _ in range(30):
        state_a, out_a = step_jit(compiled.static, compiled.params, None, state_a, frame)
        state_b, out_b = sharded(compiled.params, None, state_b, frame)
    assert int(out_a.alive_count) == int(out_b.alive_count)
    np.testing.assert_allclose(np.asarray(state_a.px), np.asarray(state_b.px), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_a.age), np.asarray(state_b.age), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state_a.alive), np.asarray(state_b.alive))
    # the sharded state really is distributed
    shards = state_b.px.sharding
    assert not shards.is_fully_replicated


def test_dp_fleet_step_independent_spawners():
    sp = spawner()
    compiled = compile_spawner(sp)
    mesh = make_mesh(8)
    S = 8
    states = stack_pools([init_pool_for(compiled, 512, seed=i) for i in range(S)])
    params = stack_params([compiled.params] * S)
    frames = stack_frames([make_frame_input(1 / 60, translation=(float(i), 0, 0)) for i in range(S)])
    fleet = make_fleet_step(compiled.static, mesh)
    for _ in range(10):
        states, outs = fleet(params, states, frames)
    counts = np.asarray(outs.alive_count)
    assert counts.shape == (S,)
    assert (counts == counts[0]).all()  # same config => same cadence counts
    # spawner i's particles are near its own origin x=i
    alive = np.asarray(states.alive)
    px = np.asarray(states.px)
    for i in range(S):
        xs = px[i][alive[i]]
        assert np.all(np.abs(xs - i) < 2.0)


def test_nested_spawner_shards():
    """Nested emission involves a cross-lane prefix sum + gather; GSPMD must
    still compile and match single-device results."""
    from bevy_firework_tpu import EmissionMode

    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(1.0)),
            ParticleSettings(lifetime=RandF32.constant(0.5)),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.rate(50.0)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(4.0, 1.0, 0.0, 0.5)),
        ],
    )
    compiled = compile_spawner(sp)
    mesh = make_mesh(8)
    n = 8 * 128
    state_a = init_pool_for(compiled, n, seed=3)
    state_b = shard_pool(init_pool_for(compiled, n, seed=3), mesh)
    sharded = make_sharded_step(compiled.static, mesh)
    frame = make_frame_input(1 / 60)
    for _ in range(40):
        state_a, out_a = step_jit(compiled.static, compiled.params, None, state_a, frame)
        state_b, out_b = sharded(compiled.params, None, state_b, frame)
    np.testing.assert_array_equal(np.asarray(out_a.alive_count_per_type), np.asarray(out_b.alive_count_per_type))
    np.testing.assert_array_equal(np.asarray(state_a.alive), np.asarray(state_b.alive))


def test_2d_dcn_fleet_step_matches_unsharded():
    """Hybrid 2D mesh (2 'hosts' x 4 chips): fleet axis over the host (DCN)
    dimension, particle axis over the chip (ICI) dimension. Must match the
    unsharded vmapped step exactly — no communication is ever needed across
    the fleet axis (SURVEY.md §2a: spawners are independent)."""
    from bevy_firework_tpu.parallel.sharding import (
        fleet_pool_shardings,
        make_fleet_step_2d,
        make_mesh_2d,
    )

    sp = spawner()
    compiled = compile_spawner(sp)
    mesh = make_mesh_2d(2, 4)
    S = 2
    n = 4 * 256  # particle axis divisible by chips_per_host
    pools = [init_pool_for(compiled, n, seed=i) for i in range(S)]
    states_ref = stack_pools(pools)
    params = stack_params([compiled.params] * S)
    frames = stack_frames([make_frame_input(1 / 60, translation=(float(i), 0, 0)) for i in range(S)])

    sh = fleet_pool_shardings(mesh)
    states_2d = jax.tree_util.tree_map(jax.device_put, stack_pools(pools), sh)
    fleet2d = make_fleet_step_2d(compiled.static, mesh)

    ref = jax.jit(jax.vmap(lambda p, s, f: step_jit(compiled.static, p, None, s, f), in_axes=(0, 0, 0)))
    for _ in range(25):
        states_ref, out_ref = ref(params, states_ref, frames)
        states_2d, out_2d = fleet2d(params, states_2d, frames)
    np.testing.assert_array_equal(np.asarray(out_ref.alive_count), np.asarray(out_2d.alive_count))
    np.testing.assert_allclose(np.asarray(states_ref.px), np.asarray(states_2d.px), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(states_ref.alive), np.asarray(states_2d.alive))
    # really distributed on both axes
    assert not states_2d.px.sharding.is_fully_replicated
    assert states_2d.px.sharding.spec == ("host", "d")
