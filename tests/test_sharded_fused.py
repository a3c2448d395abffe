"""Fused Pallas kernel under multi-chip sharding (VERDICT r2 item 2).

`make_sharded_step(prefer_fused=True)` runs `fused_step(shard_axis=...)`
inside `jax.shard_map` over the pool's particle axis: every shard's kernel
claims slots with GLOBAL lane indices (dyn slots 11-13 — lane base, global
capacity, dead-rank offset), so the set of slots claimed per emitter is
identical to the unsharded kernel, and the epilogue's AABB/count reductions
become psum/pmin/pmax collectives.

These tests run the kernel in interpret mode on an 8-virtual-device CPU mesh
(the same interpret-vs-XLA pattern as test_fused_step.py; the compiled
kernel is swept on real TPU by tools/fused_parity_tpu.py, which includes a
sharded-claim manual-split config). Deterministic configs (constant draws)
make trajectories draw-independent, so parity with the XLA `step` oracle is
exact — including SLOT-LEVEL equality of the alive mask, the strongest
possible check that global claim indexing is right.
"""

import pytest
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
    init_pool_for,
    make_frame_input,
)
from bevy_firework_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_step,
    shard_pool,
)
from bevy_firework_tpu.step import step_jit

N_SHARDS = 8
N = 8192 * N_SHARDS  # one kernel tile per shard (interpret mode is slow)


def _det_spawner(ring: bool):
    """Deterministic archetype: ring=True keeps the ring claim (constant
    lifetime, no destroys); ring=False forces the dead-rank prefix claim
    via destroy_on_collision (compiled.SpawnerStatic.ring_claim)."""
    ps = dict(
        lifetime=RandF32.constant(0.4),
        initial_scale=RandF32.constant(0.1),
        scale_curve=FireworkCurve.uneven_samples([(0.0, 1.0), (1.0, 2.0)]),
        linear_drag=0.0,
    )
    if not ring:
        ps["collision_settings"] = ParticleCollisionSettings(
            restitution=0.6, friction=0.2, destroy_on_collision=True
        )
    return ParticleSpawner(
        particle_settings=[ParticleSettings(**ps)],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.rate(10000.0),
                initial_velocity=RandVec3.constant((1.0, -3.0, 0.2)),
            )
        ],
    )


def _run_pair(sp, colliders=None, n_frames=5):
    c = compile_spawner(sp)
    table = compile_colliders(colliders) if colliders else None
    mesh = make_mesh(N_SHARDS)
    sA = init_pool_for(c, N, 0)
    sB = shard_pool(init_pool_for(c, N, 0), mesh)
    frame = make_frame_input(1 / 50)
    fn = make_sharded_step(c.static, mesh, prefer_fused=True)
    with pltpu.force_tpu_interpret_mode():
        for _ in range(n_frames):
            sA, oA = step_jit(c.static, c.params, table, sA, frame)
            sB, oB = fn(c.params, table, sB, frame)
    return c, sA, oA, sB, oB


def _assert_parity(sA, oA, sB, oB):
    a = np.asarray(sA.alive)
    b = np.asarray(sB.alive)
    # slot-level equality: global claim indexing across shards is exact
    np.testing.assert_array_equal(a, b)
    assert int(oA.alive_count) == int(oB.alive_count) > 0
    for f in ("px", "py", "pz", "vx", "vy", "vz", "age"):
        np.testing.assert_allclose(
            np.asarray(getattr(sA, f))[a],
            np.asarray(getattr(sB, f))[b],
            atol=2e-5,
            err_msg=f,
        )
    # epilogue collectives: global AABB/count equal the oracle's
    np.testing.assert_allclose(np.asarray(oA.aabb_min), np.asarray(oB.aabb_min), atol=1e-4)
    np.testing.assert_allclose(np.asarray(oA.aabb_max), np.asarray(oB.aabb_max), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(oA.alive_count_per_type), np.asarray(oB.alive_count_per_type)
    )


def test_sharded_fused_ring_claim_matches_xla():
    """Ring-claim archetype: the cursor window [cursor, cursor+total) mod N
    uses the GLOBAL capacity; shards containing no window lanes skip the
    spawn block entirely."""
    c, sA, oA, sB, oB = _run_pair(_det_spawner(ring=True))
    assert c.static.ring_claim
    _assert_parity(sA, oA, sB, oB)


@pytest.mark.slow
def test_sharded_fused_prefix_claim_dead_rank_offsets():
    """Non-ring archetype (destroy_on_collision): each shard's SMEM dead
    carry starts at the exclusive prefix of prior shards' dead counts
    (all_gather + masked sum in fused_step), so global dead ranks — and
    therefore claimed slots — match the unsharded kernel exactly, even as
    collision destroys punch holes at arbitrary ranks."""
    colliders = [Collider.halfspace(position=(0.0, -0.5, 0.0))]
    c, sA, oA, sB, oB = _run_pair(_det_spawner(ring=False), colliders, n_frames=6)
    assert not c.static.ring_claim
    _assert_parity(sA, oA, sB, oB)


@pytest.mark.slow
def test_sharded_fused_scalar_state_replicated():
    """Cadence/bookkeeping state (cursor, time_in_cycle, rng_key) must come
    back replicated-consistent: stepping twice more keeps parity (a drifted
    replica would desynchronize emission counts)."""
    c, sA, oA, sB, oB = _run_pair(_det_spawner(ring=True), n_frames=3)
    frame = make_frame_input(1 / 50)
    mesh = make_mesh(N_SHARDS)
    fn = make_sharded_step(c.static, mesh, prefer_fused=True)
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            sA, oA = step_jit(c.static, c.params, None, sA, frame)
            sB, oB = fn(c.params, None, sB, frame)
    np.testing.assert_allclose(
        float(np.asarray(sA.time_in_cycle)[0]),
        float(np.asarray(sB.time_in_cycle)[0]),
        atol=1e-6,
    )
    assert int(np.asarray(sA.ring_cursor)) == int(np.asarray(sB.ring_cursor))
    _assert_parity(sA, oA, sB, oB)
