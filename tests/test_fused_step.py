"""Fused Pallas kernel vs XLA step parity (interpret mode on CPU; the same
comparison runs compiled on real TPU in bench/verify flows)."""

import pytest
import dataclasses

import jax
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from bevy_firework_tpu import (
    Collider,
    EmissionPacing,
    EmissionSettings,
    FireworkCurve,
    ParticleCollisionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    compile_colliders,
    compile_spawner,
    gradient_uneven_samples,
    init_pool_for,
    make_frame_input,
)
from bevy_firework_tpu.ops.fused_step import can_fuse, fused_step
from bevy_firework_tpu.step import step_jit

N = 8192  # one kernel tile — interpret mode is slow, keep it minimal


def det_spawner(**kw):
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(
                lifetime=RandF32.constant(0.3),
                initial_scale=RandF32.constant(0.1),
                scale_curve=FireworkCurve.uneven_samples([(0.0, 1.0), (1.0, 2.0)]),
                base_color=gradient_uneven_samples([(0.0, (1, 0.5, 0.2, 1)), (1.0, (0, 0, 0, 0))]),
                **kw.get("ps", {}),
            )
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=kw.get("pacing", EmissionPacing.rate(2000.0)),
                initial_velocity=RandVec3.constant((1.0, 3.0, 0.2)),
                initial_angular_velocity=RandVec3.constant((0.0, 2.0, 0.0)),
            )
        ],
    )


def run_both(sp, n_frames=25, colliders=None):
    c = compile_spawner(sp)
    assert can_fuse(c.static)
    table = compile_colliders(colliders) if colliders else None
    sA = init_pool_for(c, N, 0)
    sB = init_pool_for(c, N, 0)
    frame = make_frame_input(1 / 50)
    fused = jax.jit(fused_step, static_argnums=(0,))
    for _ in range(n_frames):
        sA, oA = step_jit(c.static, c.params, table, sA, frame)
        with pltpu.force_tpu_interpret_mode():
            sB, oB = fused(c.static, c.params, table, sB, frame)
    return sA, oA, sB, oB


def assert_state_match(sA, sB, atol=2e-5):
    a_alive = np.asarray(sA.alive)
    b_alive = np.asarray(sB.alive)
    assert a_alive.sum() == b_alive.sum()
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age", "lifetime",
              "initial_scale", "qx", "qy", "qw", "wx", "wy"):
        xa = np.sort(np.asarray(getattr(sA, f))[a_alive])
        xb = np.sort(np.asarray(getattr(sB, f))[b_alive])
        np.testing.assert_allclose(xa, xb, atol=atol, err_msg=f)


def test_fused_matches_xla_rate_emitter():
    sA, oA, sB, oB = run_both(det_spawner())
    assert int(oA.alive_count) == int(oB.alive_count)
    assert_state_match(sA, sB)
    np.testing.assert_allclose(np.asarray(oA.aabb_min), np.asarray(oB.aabb_min), atol=1e-4)


def test_fused_one_shot_lifecycle():
    sA, oA, sB, oB = run_both(det_spawner(pacing=EmissionPacing.one_shot(30)), n_frames=20)
    # one-shot: 30 spawned, all dead by frame 20 (lifetime 0.3 < 20/50)
    assert int(oB.alive_count) == 0
    assert bool(oB.finished_event) == bool(oA.finished_event)
    assert_state_match(sA, sB)


def test_fused_collision_parity():
    sp = det_spawner(
        ps=dict(
            linear_drag=0.0,
            collision_settings=ParticleCollisionSettings(restitution=0.6, friction=0.2),
        ),
        pacing=EmissionPacing.one_shot(40),
    )
    colliders = [Collider.halfspace(position=(0.0, -0.5, 0.0))]
    sA, oA, sB, oB = run_both(sp, n_frames=12, colliders=colliders)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    assert_state_match(sA, sB, atol=1e-4)


@pytest.mark.slow
def test_fused_collision_parity_many_colliders_broadphase():
    """C >= LOOP_MIN_COLLIDERS engages the looped narrow phase: colliders are
    permuted into (kind, identity) groups, each group a fori_loop over SMEM
    rows whose body is gated by a scalar tile-AABB broad-phase test, with an
    exact (dist, original index) tie-break so the permutation cannot change
    winners. The XLA oracle never culls or reorders, so a wrongly skipped
    collider or a tie flipped by the grouping breaks parity; the mix below
    has colliders the burst actually hits plus far-away ones of every kind
    that the broad phase must skip without changing any trajectory."""
    from bevy_firework_tpu.ops.fused_step import LOOP_MIN_COLLIDERS

    sp = det_spawner(
        ps=dict(
            linear_drag=0.0,
            collision_settings=ParticleCollisionSettings(restitution=0.5, friction=0.1),
        ),
        pacing=EmissionPacing.one_shot(60),
    )
    colliders = [
        Collider.halfspace(position=(0.0, -0.5, 0.0)),  # hit: floor under the burst
        Collider.sphere(0.4, position=(0.6, 1.0, 0.1)),  # hit: in the stream
        Collider.cuboid((0.3, 0.3, 0.3), position=(50.0, 0.0, 0.0)),  # culled
        Collider.capsule(0.2, 0.5, position=(0.0, 40.0, 0.0)),  # culled
        Collider.cylinder(0.3, 0.4, position=(-60.0, 2.0, 3.0), rotation=(0.0, 0.0, 0.3826834, 0.9238795)),  # culled, rotated
        Collider.cone(0.5, 0.5, position=(0.0, 0.0, 70.0)),  # culled
    ]
    assert len(colliders) >= LOOP_MIN_COLLIDERS
    sA, oA, sB, oB = run_both(sp, n_frames=12, colliders=colliders)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    assert_state_match(sA, sB, atol=1e-4)


def test_hybrid_matches_xla_nested_random_draws():
    """fused_step_hybrid = step's spawn phase + kernel integrate: with the
    draws happening in the SHARED spawn phase, parity is lane-for-lane (not
    just distributional) even for randomized configs."""
    from bevy_firework_tpu import EmissionMode
    from bevy_firework_tpu.ops.fused_step import fused_step_hybrid

    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32(0.2, 0.5), initial_scale=RandF32(0.05, 0.2)),
            ParticleSettings(lifetime=RandF32(0.1, 0.3), linear_drag=0.5),
        ],
        emission_settings=[
            EmissionSettings(
                particle_index=0,
                emission_pacing=EmissionPacing.rate(900.0),
                initial_velocity=RandVec3(magnitude=RandF32(1.0, 4.0), direction=(0, 1, 0), spread=0.6),
            ),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(6.0, 1.0, 0.0, 1.0),
                initial_velocity=RandVec3(magnitude=RandF32(0.1, 0.8), direction=(0, 1, 0), spread=3.0),
                inherit_parent_velocity=True,
            ),
        ],
    )
    c = compile_spawner(sp)
    assert not can_fuse(c.static)  # nested => hybrid territory
    sA = init_pool_for(c, N, 0)
    sB = init_pool_for(c, N, 0)
    frame = make_frame_input(1 / 50)
    # kernel_global=False: all draws happen in the SHARED XLA spawn phase,
    # making parity lane-exact (the production fast path runs global
    # emitters in-kernel with the hardware PRNG — distribution parity only,
    # covered by test_hybrid_kernel_global_fast_path)
    hybrid = jax.jit(lambda st, p, c, s, f: fused_step_hybrid(st, p, c, s, f, kernel_global=False),
                     static_argnums=(0,))
    for _ in range(20):
        sA, oA = step_jit(c.static, c.params, None, sA, frame)
        with pltpu.force_tpu_interpret_mode():
            sB, oB = hybrid(c.static, c.params, None, sB, frame)
    a_alive = np.asarray(sA.alive)
    b_alive = np.asarray(sB.alive)
    np.testing.assert_array_equal(a_alive, b_alive)
    assert a_alive.sum() > 100
    assert int(np.asarray(oA.alive_count_per_type)[1]) > 50  # children exist
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age", "lifetime",
              "initial_scale", "qx", "qw", "wx"):
        xa = np.asarray(getattr(sA, f))[a_alive]
        xb = np.asarray(getattr(sB, f))[b_alive]
        np.testing.assert_allclose(xa, xb, atol=2e-6, err_msg=f)
    np.testing.assert_allclose(np.asarray(sA.last_emitted), np.asarray(sB.last_emitted))


def test_fused_field_elision_parity():
    """The no-rotation / single-type / const-lifetime archetype (sparks,
    stress_test) elides 8 of 16 f32 arrays + ptype from the kernel
    (active_f32_fields); trajectories must still match the XLA step exactly
    and the pass-through arrays must hold the invariants."""
    from bevy_firework_tpu.ops.fused_step import active_f32_fields

    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(
                lifetime=RandF32.constant(0.25),
                initial_scale=RandF32.constant(0.07),
                scale_curve=FireworkCurve.uneven_samples([(0.0, 1.0), (1.0, 2.0)]),
                linear_drag=0.15,
            )
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.rate(1500.0),
                initial_velocity=RandVec3.constant((0.5, 4.0, -0.3)),
            )
        ],
    )
    c = compile_spawner(sp)
    assert c.static.elide_rotation
    assert c.static.const_lifetime == 0.25
    assert c.static.single_type
    af = active_f32_fields(c.static)
    assert "qx" not in af and "wx" not in af and "lifetime" not in af
    assert len(af) == 8

    sA, oA, sB, oB = run_both(sp, n_frames=18)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    assert_state_match(sA, sB)
    # pass-through invariants: identity quat, zero angular velocity,
    # lifetime array pinned at the constant (init_pool_for fill)
    for f, want in [("qx", 0.0), ("qw", 1.0), ("wx", 0.0), ("lifetime", 0.25)]:
        np.testing.assert_array_equal(np.asarray(getattr(sB, f)), np.float32(want), err_msg=f)


def test_fused_on_demand_queue_drain():
    """On-demand pacing through the IN-KERNEL cadence: the manual queue is
    drained by the first enabled on-demand emitter and returned via the SMEM
    bookkeeping row (`core.rs:401-405` semantics)."""
    import jax.numpy as jnp

    sp = det_spawner(pacing=EmissionPacing.on_demand())
    c = compile_spawner(sp)
    state = init_pool_for(c, N, 0)
    state = dataclasses.replace(state, manual_queued=jnp.int32(17))
    frame = make_frame_input(1 / 50)
    fused = jax.jit(fused_step, static_argnums=(0,))
    with pltpu.force_tpu_interpret_mode():
        state, out = fused(c.static, c.params, None, state, frame)
    assert int(out.alive_count) == 17
    assert int(state.manual_queued) == 0  # drained
    with pltpu.force_tpu_interpret_mode():
        state, out = fused(c.static, c.params, None, state, frame)
    assert int(out.alive_count) == 17  # nothing queued => nothing spawned


@pytest.mark.slow
def test_fused_destroy_on_collision_uses_prefix_claim():
    """Const-lifetime + destroy_on_collision must NOT take the ring claim
    (early destroys punch holes a ring cannot reuse until it wraps); the
    dead-rank prefix path still matches the XLA step exactly."""
    sp = det_spawner(
        ps=dict(
            linear_drag=0.0,
            collision_settings=ParticleCollisionSettings(
                restitution=0.0, friction=0.0, destroy_on_collision=True
            ),
        ),
        pacing=EmissionPacing.rate(1500.0),
    )
    c = compile_spawner(sp)
    assert c.static.const_lifetime is not None
    assert not c.static.ring_claim  # destroy excludes ring
    assert not c.static.derived_alive
    colliders = [Collider.halfspace(position=(0.0, -0.3, 0.0))]
    sA, oA, sB, oB = run_both(sp, n_frames=14, colliders=colliders)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    assert_state_match(sA, sB, atol=1e-4)


@pytest.mark.slow
def test_hybrid_kernel_global_fast_path():
    """Production hybrid (global emitters in-kernel, nested in XLA): spawn
    COUNTS are draw-independent, so alive counts per type must match the
    XLA step exactly even though the global draws use the hardware PRNG."""
    from bevy_firework_tpu import EmissionMode
    from bevy_firework_tpu.ops.fused_step import fused_step_hybrid

    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.5), initial_scale=RandF32(0.05, 0.2)),
            ParticleSettings(lifetime=RandF32.constant(0.5), linear_drag=0.5),
        ],
        emission_settings=[
            EmissionSettings(
                particle_index=0,
                emission_pacing=EmissionPacing.rate(2000.0),
                initial_velocity=RandVec3(magnitude=RandF32(1.0, 4.0), direction=(0, 1, 0), spread=0.6),
            ),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(5.0, 1.0, 0.0, 1.0),
                initial_velocity=RandVec3(magnitude=RandF32(0.1, 0.8), direction=(0, 1, 0), spread=3.0),
                inherit_parent_velocity=True,
            ),
        ],
    )
    c = compile_spawner(sp)
    assert not can_fuse(c.static)
    assert c.static.ring_claim  # ring: slot reuse = cursor wrap
    sA = init_pool_for(c, N, 0)
    sB = init_pool_for(c, N, 0)
    frame = make_frame_input(1 / 50)
    hybrid = jax.jit(fused_step_hybrid, static_argnums=(0,))
    # ~12k spawns/s over an 8192-slot ring wraps the cursor around frame ~34;
    # 60 frames cover post-wrap claims — the regime where in-kernel global
    # claims must not leak a previous occupant's last_emitted anchor into
    # the nested cadence (the lazy dead-lane reset in step._spawn_phase)
    for _ in range(60):
        sA, oA = step_jit(c.static, c.params, None, sA, frame)
        with pltpu.force_tpu_interpret_mode():
            sB, oB = hybrid(c.static, c.params, None, sB, frame)
    a = np.asarray(oA.alive_count_per_type)
    b = np.asarray(oB.alive_count_per_type)
    np.testing.assert_array_equal(a, b)
    assert a[0] > 500 and a[1] > 500
    # distributional check on the globally-spawned type's speed
    va = np.sqrt(np.asarray(sA.vx)**2 + np.asarray(sA.vy)**2 + np.asarray(sA.vz)**2)
    vb = np.sqrt(np.asarray(sB.vx)**2 + np.asarray(sB.vy)**2 + np.asarray(sB.vz)**2)
    ma = np.asarray(sA.alive) & (np.asarray(sA.ptype) == 0)
    mb = np.asarray(sB.alive) & (np.asarray(sB.ptype) == 0)
    assert abs(va[ma].mean() - vb[mb].mean()) < 0.25 * va[ma].mean()


def test_in_kernel_render_pack_matches_xla_pack():
    """pack_render=True: the kernel's 9 render planes (scale + base rgba +
    emissive rgba) must match the XLA pack's derived render fields exactly
    for live lanes, with scale==0 marking dead lanes."""
    from bevy_firework_tpu.render import compute_render_fields

    sp = det_spawner()
    c = compile_spawner(sp)
    s = init_pool_for(c, N, 0)
    frame = make_frame_input(1 / 50)
    fused = jax.jit(fused_step, static_argnums=(0, 5))
    with pltpu.force_tpu_interpret_mode():
        for _ in range(12):
            s, _o, planes = fused(c.static, c.params, None, s, frame, True)
    alive = np.asarray(s.alive)
    assert alive.sum() > 100
    scale_x, base_x, emis_x = compute_render_fields(c.params, s, 0)
    scale_k = np.asarray(planes[0])
    np.testing.assert_array_equal(scale_k[~alive], 0.0)
    np.testing.assert_allclose(scale_k[alive], np.asarray(scale_x)[alive], atol=2e-6)
    for ci in range(4):
        np.testing.assert_allclose(
            np.asarray(planes[1 + ci])[alive], np.asarray(base_x[ci])[alive], atol=2e-6,
            err_msg=f"base channel {ci}")
        np.testing.assert_allclose(
            np.asarray(planes[5 + ci])[alive], np.asarray(emis_x[ci])[alive], atol=2e-6,
            err_msg=f"emis channel {ci}")
    # full assembly path: planes_to_rows == pack_instances rows
    from bevy_firework_tpu.render import pack_instances, planes_to_rows

    rows = planes_to_rows(c.static, s, planes)
    buf, count = pack_instances(c.params, s, 0)
    assert rows.shape[0] == int(count)
    np.testing.assert_allclose(rows, np.asarray(buf[: int(count)]), atol=2e-6)


@pytest.mark.slow
def test_vmapped_non_ring_carry_parity():
    """VERDICT r1 weak #4: the fused kernel's cross-tile dead-rank claim
    carry (SMEM scratch + program_id(0) tile indexing) under vmap. A
    destroy-on-collision archetype with constant lifetime is non-ring (holes
    punched behind the cursor force the prefix claim) and fully
    deterministic (every draw is constant), so the vmapped kernel, the solo
    kernel, and the XLA step must agree lane-exactly per slot. Multi-tile
    pools (grid=3) so the carry actually crosses tiles; two slots at
    different heights die on different frames, so a carry leak between
    slots would corrupt claims."""
    from bevy_firework_tpu import Collider

    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(
                lifetime=RandF32.constant(5.0),
                initial_scale=RandF32.constant(0.1),
                linear_drag=0.0,
                collision_settings=ParticleCollisionSettings(
                    restitution=0.0, friction=0.0, destroy_on_collision=True),
            )
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.rate(3000.0),
                initial_velocity=RandVec3.constant((0.5, 1.0, 0.0)),
            )
        ],
    )
    c = compile_spawner(sp)
    assert can_fuse(c.static) and not c.static.ring_claim
    table = compile_colliders([Collider.halfspace(position=(0, 0, 0))])
    S, NP, F = 2, 3 * 8192, 8
    frames = [make_frame_input(1 / 30, translation=(0.0, 0.2 + 0.25 * i, 0.0)) for i in range(S)]
    solo = jax.jit(fused_step, static_argnums=(0,))
    xla = step_jit

    from bevy_firework_tpu.parallel.sharding import stack_frames, stack_pools

    vstates = stack_pools([init_pool_for(c, NP, seed=i) for i in range(S)])
    vframes = stack_frames(frames)
    vstep = jax.jit(
        jax.vmap(lambda s, f: fused_step(c.static, c.params, table, s, f)),
    )
    solo_states = [init_pool_for(c, NP, seed=i) for i in range(S)]
    xla_states = [init_pool_for(c, NP, seed=i) for i in range(S)]
    with pltpu.force_tpu_interpret_mode():
        for _ in range(F):
            vstates, vout = vstep(vstates, vframes)
            for i in range(S):
                solo_states[i], _ = solo(c.static, c.params, table, solo_states[i], frames[i])
                xla_states[i], _ = xla(c.static, c.params, table, xla_states[i], frames[i])
    died = 0
    for i in range(S):
        va = np.asarray(vstates.alive)[i]
        sa = np.asarray(solo_states[i].alive)
        xa = np.asarray(xla_states[i].alive)
        np.testing.assert_array_equal(va, sa, err_msg=f"slot {i} alive vmap vs solo")
        np.testing.assert_array_equal(va, xa, err_msg=f"slot {i} alive vmap vs xla")
        assert va.sum() > 0
        died += int(np.asarray(vstates.age)[i][~va].size)
        for fname in ("px", "py", "pz", "vx", "vy", "vz", "age"):
            vf = np.asarray(getattr(vstates, fname))[i]
            np.testing.assert_array_equal(
                vf[va], np.asarray(getattr(solo_states[i], fname))[sa],
                err_msg=f"slot {i} {fname} vmap vs solo")
            np.testing.assert_allclose(
                vf[va], np.asarray(getattr(xla_states[i], fname))[xa], atol=2e-6,
                err_msg=f"slot {i} {fname} vmap vs xla")
    # the scenario must actually have punched holes (deaths by collision)
    total_spawned_minus_alive = sum(
        int((np.asarray(vstates.age)[i] > 0).sum() - np.asarray(vstates.alive)[i].sum())
        for i in range(S)
    )
    assert total_spawned_minus_alive > 0, "no collision deaths - carry untested"


def test_hybrid_cadence_kernel_deferral_conserves():
    """The in-kernel nested cadence pass must reproduce the deferral
    semantics exactly: a >4096-children frame defers the overflow via
    truncated anchor advances and the total converges to the oracle count
    (counts are draw-independent, so they match the XLA path even though
    the fast path uses the hardware PRNG)."""
    from bevy_firework_tpu import EmissionMode
    from bevy_firework_tpu.ops.fused_step import fused_step_hybrid
    from bevy_firework_tpu.step import MAX_NESTED_SPAWN_PER_FRAME as M

    n_parents, per_parent = 410, 10
    total = n_parents * per_parent
    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(5.0), linear_drag=0.0, acceleration=(0, 0, 0)),
            ParticleSettings(lifetime=RandF32.constant(100.0), linear_drag=0.0, acceleration=(0, 0, 0)),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(n_parents)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(
                                 float(per_parent), 1.0, 0.0, 0.001)),
        ],
    )
    c = compile_spawner(sp)
    s = init_pool_for(c, N, 0)
    frame = make_frame_input(1 / 60)
    hybrid = jax.jit(fused_step_hybrid, static_argnums=(0,))
    deferred = []
    counts = []
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            s, o = hybrid(c.static, c.params, None, s, frame)
            deferred.append(int(o.nested_deferred))
            counts.append(int(np.asarray(o.alive_count_per_type)[1]))
            assert int(o.nested_dropped) == 0
    assert deferred[1] == total - M
    assert counts[1] == M
    assert counts[-1] == total


def test_in_kernel_render_pack_f16():
    """pack_render='f16': the kernel emits the FULL instance record as f16
    planes (12 with rotation elided); values match the f32 pack rounded to
    f16, scale==+-0 marking dead lanes."""
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.3), initial_scale=RandF32.constant(0.1),
            scale_curve=FireworkCurve.uneven_samples([(0.0, 1.0), (1.0, 2.0)]),
            base_color=gradient_uneven_samples([(0.0, (1, 0.5, 0.2, 1)), (1.0, (0, 0, 0, 0))]),
        )],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(2000.0),
            initial_velocity=RandVec3.constant((1.0, 3.0, 0.2)))],
    )
    c = compile_spawner(sp)
    assert c.static.elide_rotation
    sA = init_pool_for(c, N, 0)
    sB = init_pool_for(c, N, 0)
    frame = make_frame_input(1 / 50)
    fused = jax.jit(fused_step, static_argnums=(0, 5))
    with pltpu.force_tpu_interpret_mode():
        for _ in range(10):
            sA, _o, p32 = fused(c.static, c.params, None, sA, frame, True)
            sB, _o2, p16 = fused(c.static, c.params, None, sB, frame, "f16")
    assert len(p16) == 12
    alive = np.asarray(sA.alive)
    for name, a32, a16 in [
        ("px", np.asarray(sA.px), np.asarray(p16[0])),
        ("py", np.asarray(sA.py), np.asarray(p16[1])),
        ("pz", np.asarray(sA.pz), np.asarray(p16[2])),
        ("scale", np.asarray(p32[0]), np.asarray(p16[3])),
    ]:
        assert a16.dtype == np.float16
        np.testing.assert_array_equal(
            a16[alive], a32[alive].astype(np.float16), err_msg=name)
    for ci in range(8):
        np.testing.assert_array_equal(
            np.asarray(p16[4 + ci])[alive],
            np.asarray(p32[1 + ci])[alive].astype(np.float16), err_msg=f"color {ci}")
    # dead lanes: f16 scale is +-0
    s16 = np.asarray(p16[3]).view(np.uint16)
    assert ((s16[~alive] & 0x7FFF) == 0).all()


@pytest.mark.slow
def test_unrolled_kernel_matches_sequential_exactly():
    """fused_step(unroll=U) advances U frames in ONE kernel invocation
    (can_unroll archetypes: ring claims are per-lane cursor math, deaths
    derive from age). Must be BIT-EQUAL to U sequential calls — same key
    splits, per-sub-frame PRNG reseed, same op order on register-resident
    fields — including across a multi-emitter one-shot+rate mix (the
    one-shot fires in sub-frame 1 and must stay disabled in sub-frame 2)
    and with collision."""
    from bevy_firework_tpu.ops.fused_step import can_unroll

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.25), initial_scale=RandF32.constant(0.1),
            collision_settings=ParticleCollisionSettings(restitution=0.5, friction=0.1))],
        emission_settings=[
            EmissionSettings(emission_pacing=EmissionPacing.rate(1500.0),
                             initial_velocity=RandVec3.constant((1.0, 3.0, 0.2))),
            EmissionSettings(emission_pacing=EmissionPacing.one_shot(40),
                             initial_velocity=RandVec3.constant((-1.0, 2.0, 0.0))),
        ],
    )
    c = compile_spawner(sp)
    assert can_unroll(c.static)
    table = compile_colliders([Collider.halfspace(position=(0.0, -0.05, 0.0))])
    frame = make_frame_input(1 / 50)
    fused = jax.jit(fused_step, static_argnums=(0, 5, 6))
    sA = init_pool_for(c, N, 0)
    sB = init_pool_for(c, N, 0)
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            sA, oA = fused(c.static, c.params, table, sA, frame)
        for _ in range(2):
            sB, oB = fused(c.static, c.params, table, sB, frame, False, 2)
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age", "initial_scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sA, f)), np.asarray(getattr(sB, f)), err_msg=f)
    np.testing.assert_array_equal(np.asarray(sA.rng_key), np.asarray(sB.rng_key))
    np.testing.assert_array_equal(np.asarray(sA.ring_cursor), np.asarray(sB.ring_cursor))
    np.testing.assert_array_equal(np.asarray(sA.enabled), np.asarray(sB.enabled))
    assert not bool(np.asarray(sB.enabled)[1])  # one-shot fired + disabled
    assert int(oA.alive_count) == int(oB.alive_count) > 0


@pytest.mark.slow
def test_hybrid_nested_kernel_merge_bit_exact():
    """The in-kernel nested child merge (round-3 fast path: the fused kernel
    reads this frame's [M] child rows through row-aligned dynamic slices of
    a cursor-pre-shifted VMEM buffer and merges them per tile) is BIT-EXACT
    vs the XLA double-window write-back, over enough frames for the ring
    cursor to wrap repeatedly. Same seed => identical threefry nested draws
    and identical in-kernel global PRNG streams, so any divergence is the
    merge path itself."""
    import bevy_firework_tpu.ops.fused_step as fs
    from bevy_firework_tpu import EmissionMode

    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.5), linear_drag=0.1),
            ParticleSettings(lifetime=RandF32.constant(0.5), linear_drag=0.3),
        ],
        emission_settings=[
            EmissionSettings(
                particle_index=0,
                emission_pacing=EmissionPacing.rate(2000.0),
                initial_velocity=RandVec3(magnitude=RandF32(1.0, 4.0), direction=(0, 1, 0), spread=0.6),
            ),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(12.0, 1.0, 0.0, 1.0),
                initial_velocity=RandVec3(magnitude=RandF32(0.1, 0.8), direction=(0, 1, 0), spread=3.0),
                inherit_parent_velocity=True,
            ),
        ],
    )
    c = compile_spawner(sp, nested_buffer=512)
    assert c.static.ring_claim
    frame = make_frame_input(1 / 50)

    def run(merge_on, n_frames=70):
        fs._FORCE_NESTED_MERGE_CPU = merge_on
        fs._NESTED_KERNEL_MERGE = True
        try:
            # fresh jit identity per flag value (module flag is trace-time)
            hybrid = jax.jit(lambda st, p, col, s, f: fs.fused_step_hybrid(st, p, col, s, f),
                             static_argnums=(0,))
            s = init_pool_for(c, N, 0)
            for _ in range(n_frames):
                with pltpu.force_tpu_interpret_mode():
                    s, _o = hybrid(c.static, c.params, None, s, frame)
            return s
        finally:
            fs._FORCE_NESTED_MERGE_CPU = False

    sM = run(True)
    sX = run(False)
    # last_emitted included deliberately: the merge path performs NO claim-
    # time le reset — each emitter's lazy cadence reset must make both
    # formulations land bit-equal (step._nested_spawn merge branch).
    for f in ("alive", "px", "py", "pz", "vx", "vy", "vz", "age",
              "initial_scale", "ptype", "ring_cursor", "last_emitted"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sM, f)), np.asarray(getattr(sX, f)), err_msg=f)
    assert int(np.asarray(sM.alive).sum()) > 500  # the merge path ran for real


@pytest.mark.slow
def test_fleet_kernel_matches_vmapped_solo():
    """fused_step_fleet (grid = (S, tiles), per-slot smalls whole-array
    resident) is slot-for-slot BIT-EXACT with vmap(fused_step): identical
    key splits, dyn seeds, and within-slot tile seeds (VERDICT r3 next #2 —
    this kernel is what makes 100-spawner scenes cheap). Covers pack_render
    and collision."""
    from bevy_firework_tpu import Collider, compile_colliders
    from bevy_firework_tpu.ops.fused_step import fused_step, fused_step_fleet
    from bevy_firework_tpu.parallel.sharding import (
        stack_frames,
        stack_params,
        stack_pools,
    )

    S = 2
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.4), initial_scale=RandF32.constant(0.1),
            collision_settings=ParticleCollisionSettings(restitution=0.5, friction=0.1),
        )],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(9000.0),
            initial_velocity=RandVec3.constant((1.0, -3.0, 0.2)))],
    )
    c = compile_spawner(sp)
    table = compile_colliders([Collider.halfspace(position=(0.0, -0.5, 0.0))])
    states = stack_pools([init_pool_for(c, N, i) for i in range(S)])
    frames = stack_frames([make_frame_input(1 / 50, translation=(float(i), 0.0, 0.0))
                           for i in range(S)])
    P = stack_params([c.params] * S)

    with pltpu.force_tpu_interpret_mode():
        sA, sB = states, states
        for _ in range(3):
            sA, oA, plA = jax.vmap(
                lambda p, s, f: fused_step(c.static, p, table, s, f, pack_render=True)
            )(P, sA, frames)
            sB, oB, plB = fused_step_fleet(c.static, P, table, sB, frames, pack_render=True)
    for name in ("alive", "px", "py", "pz", "vx", "vy", "vz", "age",
                 "initial_scale", "ring_cursor", "time_in_cycle"):
        a, b = np.asarray(getattr(sA, name)), np.asarray(getattr(sB, name))
        assert np.array_equal(a, b), name
    assert np.array_equal(np.asarray(oA.alive_count), np.asarray(oB.alive_count))
    for pa, pb in zip(plA, plB):
        assert np.array_equal(np.asarray(pa), np.asarray(pb))
    assert int(np.asarray(oB.alive_count).sum()) > 0


@pytest.mark.slow
def test_fleet_kernel_unroll_matches_singles():
    """multi_step_fleet_stacked's in-kernel unroll (fleet kernel, U frames
    per launch) is bit-exact vs per-frame fleet steps."""
    from bevy_firework_tpu.ops.fused_step import (
        fused_step_fleet,
        multi_step_fleet_stacked,
    )
    from bevy_firework_tpu.parallel.sharding import (
        stack_frames,
        stack_params,
        stack_pools,
    )

    S, n_frames = 2, 5
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(0.3), initial_scale=RandF32.constant(0.1))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(8000.0))],
    )
    c = compile_spawner(sp)
    states = stack_pools([init_pool_for(c, N, i) for i in range(S)])
    frames = stack_frames([make_frame_input(1 / 50) for _ in range(S)])
    P = stack_params([c.params] * S)
    with pltpu.force_tpu_interpret_mode():
        sA = states
        for _ in range(n_frames):
            sA, _o = fused_step_fleet(c.static, P, None, sA, frames)
        sB = states
        for _ in range(n_frames // 2):  # unroll=2 explicitly
            sB, _o = fused_step_fleet(c.static, P, None, sB, frames, unroll=2)
        sB, _o = fused_step_fleet(c.static, P, None, sB, frames)
    for name in ("alive", "px", "vx", "age", "ring_cursor"):
        a, b = np.asarray(getattr(sA, name)), np.asarray(getattr(sB, name))
        assert np.array_equal(a, b), name


@pytest.mark.slow
def test_fused_collision_parity_hull():
    """Convex-hull colliders (plane-set rows through the chul small) in the
    fused kernel match the XLA path lane-for-lane — incl. a rotated hull
    (local-space plane transform) and a box-equivalent one."""
    sp = det_spawner(
        ps=dict(
            linear_drag=0.0,
            collision_settings=ParticleCollisionSettings(restitution=0.6, friction=0.2),
        ),
        pacing=EmissionPacing.one_shot(40),
    )
    s8 = float(np.sin(np.pi / 8))
    c8 = float(np.cos(np.pi / 8))
    colliders = [
        Collider.hull([(1, 0, 0, 50.0), (-1, 0, 0, 50.0), (0, 1, 0, 1.0),
                       (0, -1, 0, 1.0), (0, 0, 1, 50.0), (0, 0, -1, 50.0)],
                      position=(0.0, -1.5, 0.0)),
        Collider.hull_from_points(
            [(0, 0, 0), (1.5, 0, 0), (0, 1.5, 0), (0, 0, 1.5)],
            position=(0.6, -0.4, 0.2), rotation=(0.0, 0.0, s8, c8)),
    ]
    sA, oA, sB, oB = run_both(sp, n_frames=12, colliders=colliders)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    assert_state_match(sA, sB, atol=1e-4)


@pytest.mark.slow
def test_fused_collision_parity_hulls_in_looped_phase():
    """Hulls now ride the looped narrow phase (VERDICT r4 next #4): with
    C >= LOOP_MIN_COLLIDERS and hulls present, the hull group is a
    fori_loop over SMEM plane rows padded to the table-max plane count
    (_SmemPlanes; padded rows are exact no-ops in the slab math). Mix of
    hulls the burst hits (a 6-plane floor slab + a tetrahedron in the
    stream), far-away hulls the broad phase must skip (bounding radius =
    params[0]), and primitives — all lane-exact vs the XLA oracle, which
    never culls or loops."""
    from bevy_firework_tpu.ops.fused_step import LOOP_MIN_COLLIDERS

    sp = det_spawner(
        ps=dict(
            linear_drag=0.0,
            collision_settings=ParticleCollisionSettings(restitution=0.5, friction=0.1),
        ),
        pacing=EmissionPacing.one_shot(60),
    )
    slab = [(1, 0, 0, 40.0), (-1, 0, 0, 40.0), (0, 1, 0, 0.5),
            (0, -1, 0, 0.5), (0, 0, 1, 40.0), (0, 0, -1, 40.0)]
    colliders = [
        Collider.hull(slab, position=(0.0, -1.0, 0.0)),  # hit: floor slab
        Collider.hull_from_points(
            [(0, 0, 0), (0.9, 0, 0), (0, 1.2, 0), (0, 0, 0.9)],
            position=(0.3, 0.2, 0.0)),  # hit: tetra in the stream
        Collider.hull_from_points(
            [(0, 0, 0), (2, 0, 0), (0, 2, 0), (0, 0, 2)],
            position=(70.0, 0.0, 0.0)),  # culled by the broad phase
        Collider.sphere(0.4, position=(0.6, 1.0, 0.1)),  # hit: primitive
        Collider.cuboid((0.3, 0.3, 0.3), position=(50.0, 0.0, 0.0)),  # culled
        Collider.hull(slab, position=(0.0, 60.0, 0.0),
                      rotation=(0.0, 0.0, 0.3826834, 0.9238795)),  # culled, rotated
    ]
    assert len(colliders) >= LOOP_MIN_COLLIDERS
    sA, oA, sB, oB = run_both(sp, n_frames=12, colliders=colliders)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    assert_state_match(sA, sB, atol=1e-4)


@pytest.mark.slow
def test_kernel_stats_rows_bit_exact():
    """kernel_stats (interactive-glue lever): the kernel's SMEM stat rows
    (aabb + alive/per-type counts) must make StepOutputs BIT-EXACT with the
    XLA epilogue's pool-wide reductions — global single-type, multi-type
    with collision, and the hybrid nested path."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    import bevy_firework_tpu.ops.fused_step as fs
    from bevy_firework_tpu import (
        Collider,
        EmissionMode,
        EmissionPacing,
        EmissionSettings,
        ParticleCollisionSettings,
        ParticleSettings,
        ParticleSpawner,
        RandF32,
        RandVec3,
        compile_colliders,
        compile_spawner,
        init_pool_for,
        make_frame_input,
    )

    def run_cfg(name, sp, colliders=None, hybrid=False, frames=20, cap=8192):
        c = compile_spawner(sp, nested_buffer=512)
        frame = make_frame_input(1 / 50)
        outs = {}
        fs._FORCE_NESTED_MERGE_CPU = hybrid
        try:
            for ks in (False, True):
                if hybrid:
                    f = jax.jit(lambda p, s, fr, k=ks: fs.fused_step_hybrid(
                        c.static, p, colliders, s, fr, kernel_stats=k))
                else:
                    f = jax.jit(lambda p, s, fr, k=ks: fs.fused_step(
                        c.static, p, colliders, s, fr, kernel_stats=k))
                s = init_pool_for(c, cap, 0)
                with pltpu.force_tpu_interpret_mode():
                    for _ in range(frames):
                        s, o = f(c.params, s, frame)
                outs[ks] = (s, o)
        finally:
            fs._FORCE_NESTED_MERGE_CPU = False
        (s0, o0), (s1, o1) = outs[False], outs[True]
        for fname in ("alive_count", "alive_count_per_type", "finished_event",
                      "aabb_valid", "aabb_min", "aabb_max"):
            np.testing.assert_array_equal(
                np.asarray(getattr(o0, fname)), np.asarray(getattr(o1, fname)),
                err_msg=f"{name}.{fname}")
        np.testing.assert_array_equal(np.asarray(s0.px), np.asarray(s1.px), err_msg=name)
        assert int(np.asarray(o0.alive_count)) > 0, name

    run_cfg("global-single", ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.4))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(3000.0),
            initial_velocity=RandVec3.constant((0.3, 2.0, 0.1)))],
    ))
    run_cfg("global-2type-collision", ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.5),
                             collision_settings=ParticleCollisionSettings(
                                 restitution=0.5, friction=0.2)),
            ParticleSettings(lifetime=RandF32.constant(0.4)),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.rate(1500.0),
                             initial_velocity=RandVec3.constant((0.0, 2.0, 0.0))),
            EmissionSettings(particle_index=1, emission_pacing=EmissionPacing.rate(800.0),
                             initial_velocity=RandVec3.constant((0.4, 1.0, 0.0))),
        ],
    ), colliders=compile_colliders([Collider.halfspace(position=(0, -1, 0))]))
    run_cfg("hybrid-nested", ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.6), linear_drag=0.1),
            ParticleSettings(lifetime=RandF32.constant(0.5), linear_drag=0.2),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.rate(1200.0),
                             initial_velocity=RandVec3.constant((0.5, 3.0, 0.0))),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(6.0, 1.0, 0.1, 1.0),
                             initial_velocity=RandVec3.constant((0.0, 0.5, 0.0)),
                             inherit_parent_velocity=True),
        ],
    ), hybrid=True)


@pytest.mark.slow
def test_kernel_stats_with_render_pack_bit_exact():
    """kernel_stats composed with the in-kernel render pack (the Scene
    packed group path): outputs AND planes bit-exact vs stats off."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    import bevy_firework_tpu.ops.fused_step as fs
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
    )

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(0.4))],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(2500.0),
            initial_velocity=RandVec3.constant((0.3, 2.0, 0.1)))],
    )
    c = compile_spawner(sp)
    frame = make_frame_input(1 / 50)
    outs = {}
    for ks in (False, True):
        f = jax.jit(lambda p, s, fr, k=ks: fs.fused_step(
            c.static, p, None, s, fr, pack_render=True, kernel_stats=k))
        s = init_pool_for(c, 8192, 0)
        with pltpu.force_tpu_interpret_mode():
            for _ in range(12):
                s, o, planes = f(c.params, s, frame)
        outs[ks] = (s, o, planes)
    (s0, o0, p0), (s1, o1, p1) = outs[False], outs[True]
    for name in ("alive_count", "alive_count_per_type", "aabb_min", "aabb_max"):
        np.testing.assert_array_equal(
            np.asarray(getattr(o0, name)), np.asarray(getattr(o1, name)), err_msg=name)
    for i, (a, b) in enumerate(zip(p0, p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"plane {i}")
    np.testing.assert_array_equal(np.asarray(s0.px), np.asarray(s1.px))
    assert int(np.asarray(o0.alive_count)) > 0
