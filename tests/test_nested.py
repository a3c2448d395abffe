"""Nested emission: sub-particles from live parents (`core.rs:471-546`,
SURVEY.md #9), modeled on the textures example (`examples/textures.rs:52-173`):
type 0 parents emit type 1 children during the first 10% of parent life."""

import pytest
import numpy as np

from bevy_firework_tpu import (
    EmissionMode,
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    RandVec3,
    Scene,
    compile_spawner,
    init_pool,
    init_pool_for,
    make_frame_input,
    step_jit,
)
from tests.oracle import oracle_init, oracle_step


def nested_spawner(parent_rate=12.0, children_per_parent=6.0, parent_life=5.0, child_life=2.0, window=0.1):
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(parent_life), initial_scale=RandF32.constant(0.2),
                             acceleration=(0.0, -9.81, 0.0), linear_drag=0.0),
            ParticleSettings(lifetime=RandF32.constant(child_life), initial_scale=RandF32.constant(0.1),
                             acceleration=(0.0, 0.3, 0.0), linear_drag=0.0),
        ],
        emission_settings=[
            EmissionSettings(
                particle_index=0,
                emission_pacing=EmissionPacing.rate(parent_rate),
                initial_velocity=RandVec3.constant((0.5, 3.0, 0.0)),
            ),
            EmissionSettings(
                particle_index=1,
                emission_mode=EmissionMode.nested(0),
                emission_pacing=EmissionPacing.count_over_duration(children_per_parent, 1.0, 0.0, window),
                inherit_parent_velocity=True,
            ),
        ],
    )


def run_engine(sp, n_frames, dt, capacity=4096):
    compiled = compile_spawner(sp)
    state = init_pool_for(compiled, capacity, 0)
    per_type = []
    snaps = []
    for _ in range(n_frames):
        state, out = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
        per_type.append(np.asarray(out.alive_count_per_type))
        alive = np.asarray(state.alive)
        tys = np.asarray(state.ptype)[alive]
        snaps.append({
            "pos": np.stack([np.asarray(state.px)[alive], np.asarray(state.py)[alive], np.asarray(state.pz)[alive]], -1),
            "vel": np.stack([np.asarray(state.vx)[alive], np.asarray(state.vy)[alive], np.asarray(state.vz)[alive]], -1),
            "age": np.asarray(state.age)[alive],
            "ptype": tys,
        })
    return per_type, snaps


def run_oracle(sp, n_frames, dt):
    st = oracle_init(sp)
    per_type = []
    snaps = []
    for _ in range(n_frames):
        oracle_step(sp, st, dt)
        per_type.append(np.array([len(pl) for pl in st.particles]))
        parts = [(p, ti) for ti, pl in enumerate(st.particles) for p in pl]
        snaps.append({
            "pos": np.array([p.position for p, _ in parts]).reshape(-1, 3),
            "vel": np.array([p.velocity for p, _ in parts]).reshape(-1, 3),
            "age": np.array([p.age for p, _ in parts]),
            "ptype": np.array([ti for _, ti in parts], dtype=np.int64),
        })
    return per_type, snaps


def _sorted(a):
    a = np.asarray(a, np.float64)
    if a.ndim == 1:
        return np.sort(a)
    return a[np.lexsort(a.T[::-1])] if a.size else a


def test_nested_counts_and_trajectories_match_oracle():
    sp = nested_spawner()
    dt = 1.0 / 60.0
    n = 180  # 3 s: parents spawning, children spawning + dying
    ec, es = run_engine(sp, n, dt)
    oc, os_ = run_oracle(sp, n, dt)
    for fi in range(n):
        np.testing.assert_array_equal(ec[fi], oc[fi], err_msg=f"frame {fi} per-type counts")
        for key in ("pos", "vel", "age"):
            np.testing.assert_allclose(_sorted(es[fi][key]), _sorted(os_[fi][key]), atol=3e-4, err_msg=f"frame {fi} {key}")


def test_children_only_in_window():
    """Children spawn only during the first `window` of a parent's life: with
    one parent, all children appear within window*parent_life."""
    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(2.0), linear_drag=0.0, acceleration=(0, 0, 0)),
            ParticleSettings(lifetime=RandF32.constant(10.0), linear_drag=0.0, acceleration=(0, 0, 0)),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(1)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(6.0, 1.0, 0.0, 0.1)),
        ],
    )
    dt = 0.01
    counts, _ = run_engine(sp, 100, dt, capacity=64)
    child_counts = [int(c[1]) for c in counts]
    # off-by-one tolerated, like the reference's own conservation test
    # (`core.rs:830-834`): the first interval must fully elapse before the
    # first emission, so a [0, w] window yields count or count-1 children.
    assert child_counts[-1] in (5, 6)
    # all children existed by the time parent age ~ 0.25 (window ends at 0.2)
    frame_02 = int(0.25 / dt)
    assert child_counts[frame_02] == child_counts[-1]
    # no children before parent exists
    assert child_counts[0] == 0


def test_nested_invalid_pacing_skipped():
    """Nested + OneShot is invalid; reference warns and skips (core.rs:481)."""
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(1.0)),
                           ParticleSettings(lifetime=RandF32.constant(1.0))],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(2)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.one_shot(5)),
        ],
    )
    counts, _ = run_engine(sp, 30, 1 / 60, capacity=64)
    assert all(int(c[1]) == 0 for c in counts)  # no children ever
    assert max(int(c[0]) for c in counts) == 2


def _burst_spawner(n_parents, children_per_parent, window=0.001):
    """Every parent demands ALL its children in one frame (the emission
    window is far shorter than a frame), so frame 2 requests
    n_parents * children_per_parent children at once."""
    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(5.0), linear_drag=0.0, acceleration=(0, 0, 0)),
            ParticleSettings(lifetime=RandF32.constant(100.0), linear_drag=0.0, acceleration=(0, 0, 0)),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(n_parents)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(
                                 float(children_per_parent), 1.0, 0.0, window)),
        ],
    )


def test_nested_overflow_defers_not_drops():
    """One frame demanding more children than the 4096 child buffer: the
    overflow is DEFERRED (parents' cadence anchors advance only by what was
    materialized) and the total spawned count still matches the oracle a few
    frames late — the reference's unbounded Vec::push loses nothing
    (`core.rs:502-545`), and neither do we. Also exercises the
    partial-parent case: the parent straddling the 4096 boundary emits some
    children this frame and the rest next frame."""
    from bevy_firework_tpu.step import MAX_NESTED_SPAWN_PER_FRAME as M

    n_parents, per_parent = 410, 10
    total = n_parents * per_parent  # 4100 > 4096
    assert total > M
    sp = _burst_spawner(n_parents, per_parent)
    compiled = compile_spawner(sp)
    state = init_pool_for(compiled, 8192, 0)
    dt = 1.0 / 60.0
    deferred = []
    counts = []
    for _ in range(6):
        state, out = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
        deferred.append(int(out.nested_deferred))
        counts.append(np.asarray(out.alive_count_per_type).copy())
        assert int(out.nested_dropped) == 0
    # frame 0: parents spawn; frame 1: burst — M children + the rest deferred
    assert deferred[1] == total - M
    assert counts[1][1] == M
    # conservation: the deferred children arrive on the following frame(s)
    assert counts[-1][1] == total
    assert sum(deferred[2:]) == 0  # fully drained by frame 2

    # oracle agreement on the final count (oracle emits everything in frame 1)
    oc, _ = run_oracle(sp, 6, dt)
    assert int(oc[-1][1]) == total


def test_nested_capacity_overflow_is_counted():
    """When the POOL runs out of dead slots (explicit capacity knob), nested
    children are dropped — and the drop is surfaced, not silent."""
    sp = _burst_spawner(64, 10)  # 640 children demanded, 64 parents
    compiled = compile_spawner(sp)
    state = init_pool_for(compiled, 256, 0)  # 256 slots < 64 + 640
    dt = 1.0 / 60.0
    dropped = 0
    for _ in range(4):
        state, out = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
        dropped += int(out.nested_dropped)
    alive_children = int(np.sum(np.asarray(state.alive) & (np.asarray(state.ptype) == 1)))
    assert alive_children == 256 - 64
    assert dropped == 640 - (256 - 64)


def test_children_inherit_parent_velocity_and_position():
    sp = ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(5.0), linear_drag=0.0, acceleration=(0, 0, 0)),
            ParticleSettings(lifetime=RandF32.constant(5.0), linear_drag=0.0, acceleration=(0, 0, 0)),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(1),
                             initial_velocity=RandVec3.constant((2.0, 0.0, 0.0))),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(10.0, 1.0, 0.0, 1.0),
                             inherit_parent_velocity=True),
        ],
    )
    compiled = compile_spawner(sp)
    state = init_pool_for(compiled, 128, 0)
    # nested pacing ignores the configured duration and uses parent lifetime
    # (5 s) as the cycle (`core.rs:18-23,494`): 10/cycle => a child every 0.5 s
    dt = 0.05
    for _ in range(30):
        state, _ = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
    alive = np.asarray(state.alive)
    tys = np.asarray(state.ptype)[alive]
    vx = np.asarray(state.vx)[alive]
    child_vx = vx[tys == 1]
    assert len(child_vx) > 0
    np.testing.assert_allclose(child_vx, 2.0, atol=1e-5)  # inherited (drag 0)


def test_small_nested_buffer_conserves():
    """nested_buffer is a perf knob, not a correctness knob: a tiny buffer
    spreads a burst over more frames but loses nothing."""
    sp = _burst_spawner(16, 10)  # 160 children demanded in one frame
    compiled = compile_spawner(sp, nested_buffer=64)
    assert compiled.static.nested_m == 64
    state = init_pool_for(compiled, 1024, 0)
    dt = 1.0 / 60.0
    counts = []
    deferred = []
    for _ in range(6):
        state, out = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
        counts.append(int(np.asarray(out.alive_count_per_type)[1]))
        deferred.append(int(out.nested_deferred))
    assert counts[1] == 64 and deferred[1] == 96
    assert counts[2] == 128 and counts[3] == 160
    assert counts[-1] == 160  # conserved, three frames late


@pytest.mark.slow
def test_fuzz_nested_buffer_conservation():
    """Randomized nested archetypes x random tiny nested_buffer sizes: after
    enough settle frames the engine's child totals equal the unbuffered
    oracle's (deferral conserves counts for any buffer size)."""
    rng = np.random.default_rng(11)
    for trial in range(4):
        n_parents = int(rng.integers(3, 30))
        per_parent = float(rng.integers(2, 12))
        window = float(rng.uniform(0.05, 0.5))
        buf = int(rng.integers(2, 40))
        sp = ParticleSpawner(
            particle_settings=[
                ParticleSettings(lifetime=RandF32.constant(4.0), linear_drag=0.0, acceleration=(0, 0, 0)),
                ParticleSettings(lifetime=RandF32.constant(50.0), linear_drag=0.0, acceleration=(0, 0, 0)),
            ],
            emission_settings=[
                EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.one_shot(n_parents)),
                EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                                 emission_pacing=EmissionPacing.count_over_duration(
                                     per_parent, 1.0, 0.0, window)),
            ],
        )
        compiled = compile_spawner(sp, nested_buffer=buf)
        state = init_pool_for(compiled, 1024, 0)
        dt = 1.0 / 30.0
        frames = int(window * 4.0 / dt) + 8 + (n_parents * int(per_parent)) // buf + 2
        for _ in range(frames):
            state, out = step_jit(compiled.static, compiled.params, None, state, make_frame_input(dt))
            assert int(out.nested_dropped) == 0
        engine_children = int(np.sum(np.asarray(state.alive) & (np.asarray(state.ptype) == 1)))
        oracle_children = int(run_oracle(sp, frames, dt)[0][-1][1])
        # Each truncated f32 re-anchoring can round a parent out of its
        # FINAL child at the window boundary — the same off-by-one the
        # reference's own cadence conservation test tolerates
        # (core.rs:830-834), at most once per parent.
        assert oracle_children - n_parents <= engine_children <= oracle_children, (
            f"trial {trial}: buf={buf} parents={n_parents} per={per_parent} "
            f"window={window}: {engine_children} vs oracle {oracle_children}")


@pytest.mark.slow
def test_chained_nested_merge_bit_exact():
    """CHAINED nesting under the in-kernel merge (VERDICT r3 next #3b):
    e2 targets the type e1 spawns. Deferring e1's children past e2's parent
    scan is provably unobservable — an age-0 parent's cadence count is 0
    and its last_emitted update idempotent (see fused_step_hybrid) — so the
    merge formulation must stay BIT-EXACT with the write-back one."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    import bevy_firework_tpu.ops.fused_step as fs
    from bevy_firework_tpu import (
        EmissionMode,
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
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.6), linear_drag=0.1),
            ParticleSettings(lifetime=RandF32.constant(0.5), linear_drag=0.2),
            ParticleSettings(lifetime=RandF32.constant(0.4), linear_drag=0.3),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.rate(1200.0),
                             initial_velocity=RandVec3(magnitude=RandF32(1.0, 3.0),
                                                       direction=(0, 1, 0), spread=0.5)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(6.0, 1.0, 0.1, 1.0),
                             initial_velocity=RandVec3(magnitude=RandF32(0.1, 0.6),
                                                       direction=(0, 1, 0), spread=2.0),
                             inherit_parent_velocity=True),
            EmissionSettings(particle_index=2, emission_mode=EmissionMode.nested(1),
                             emission_pacing=EmissionPacing.count_over_duration(3.0, 1.0, 0.2, 0.9),
                             initial_velocity=RandVec3(magnitude=RandF32(0.05, 0.3),
                                                       direction=(0, 1, 0), spread=3.0),
                             inherit_parent_velocity=True),
        ],
    )
    c = compile_spawner(sp, nested_buffer=512)
    assert c.static.ring_claim
    frame = make_frame_input(1 / 50)

    def run(merge_on, n_frames=70):
        fs._FORCE_NESTED_MERGE_CPU = merge_on
        fs._NESTED_KERNEL_MERGE = True
        try:
            hybrid = jax.jit(lambda st, p, col, s, f: fs.fused_step_hybrid(st, p, col, s, f),
                             static_argnums=(0,))
            s = init_pool_for(c, 8192, 0)
            for _ in range(n_frames):
                with pltpu.force_tpu_interpret_mode():
                    s, _o = hybrid(c.static, c.params, None, s, frame)
            return s
        finally:
            fs._FORCE_NESTED_MERGE_CPU = False

    sM = run(True)
    sX = run(False)
    for f in ("alive", "px", "py", "pz", "vx", "vy", "vz", "age",
              "initial_scale", "ptype", "ring_cursor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sM, f)), np.asarray(getattr(sX, f)), err_msg=f)
    # last_emitted: compared CANONICALIZED. The write-back path updates a
    # same-frame child's anchor to a value <= off_start*lifetime on its spawn
    # frame; the merge path leaves F32_MIN until the next pass. Both clamp to
    # off_start in every future cadence (compute_emission_count's
    # max(last/dur, off_start)), so anchors below the clamp are one
    # observable equivalence class — canonicalize into it before comparing.
    life = np.asarray(sM.lifetime)
    ptype = np.asarray(sM.ptype)
    alive = np.asarray(sM.alive)
    offs = {1: 0.1, 2: 0.2}  # e -> off_start (the spawner config above)
    targets = {1: 0, 2: 1}
    for e in range(3):
        a = np.asarray(sM.last_emitted)[e].copy()
        b = np.asarray(sX.last_emitted)[e].copy()
        if e in offs:
            m = alive & (ptype == targets[e])
            floor = offs[e] * life
            a[m] = np.maximum(a[m], floor[m])
            b[m] = np.maximum(b[m], floor[m])
        np.testing.assert_array_equal(a, b, err_msg=f"last_emitted[{e}] (canonical)")
    per_type = [int(((ptype == t) & alive).sum()) for t in range(3)]
    assert min(per_type) > 0, per_type  # every chain stage live


@pytest.mark.slow
def test_nested_cadence_fold_chain_bit_exact():
    """The nested-cadence FOLD (VERDICT r4 next #3): a folded chain — each
    frame's cadence + parent fetch computed in the PREVIOUS frame's kernel
    epilogue (ops.fused_step._make_kernel nested_fold) — must be BIT-EXACT,
    last_emitted included, with the frame-by-frame unfolded hybrid. Chained
    config: two nested emitters fold in one epilogue."""
    import dataclasses

    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    import bevy_firework_tpu.ops.fused_step as fs
    from bevy_firework_tpu import (
        EmissionMode,
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
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.6), linear_drag=0.1),
            ParticleSettings(lifetime=RandF32.constant(0.5), linear_drag=0.2),
            ParticleSettings(lifetime=RandF32.constant(0.4), linear_drag=0.3),
        ],
        emission_settings=[
            EmissionSettings(particle_index=0, emission_pacing=EmissionPacing.rate(1200.0),
                             initial_velocity=RandVec3(magnitude=RandF32(1.0, 3.0),
                                                       direction=(0, 1, 0), spread=0.5)),
            EmissionSettings(particle_index=1, emission_mode=EmissionMode.nested(0),
                             emission_pacing=EmissionPacing.count_over_duration(6.0, 1.0, 0.1, 1.0),
                             initial_velocity=RandVec3(magnitude=RandF32(0.1, 0.6),
                                                       direction=(0, 1, 0), spread=2.0),
                             inherit_parent_velocity=True),
            EmissionSettings(particle_index=2, emission_mode=EmissionMode.nested(1),
                             emission_pacing=EmissionPacing.count_over_duration(3.0, 1.0, 0.2, 0.9),
                             initial_velocity=RandVec3(magnitude=RandF32(0.05, 0.3),
                                                       direction=(0, 1, 0), spread=3.0),
                             inherit_parent_velocity=True),
        ],
    )
    c = compile_spawner(sp, nested_buffer=512)
    assert c.static.ring_claim
    assert fs.can_fold_nested(c.static, 8192)
    frame = make_frame_input(1 / 50)
    N_FRAMES = 30

    fs._FORCE_NESTED_MERGE_CPU = True
    fs._FORCE_NESTED_FOLD_CPU = True
    try:
        hybrid = jax.jit(
            lambda st, p, col, s, f: fs.fused_step_hybrid(st, p, col, s, f),
            static_argnums=(0,))
        s = init_pool_for(c, 8192, 0)
        with pltpu.force_tpu_interpret_mode():
            for _ in range(N_FRAMES):
                s, _o = hybrid(c.static, c.params, None, s, frame)
        sU = s

        chain = jax.jit(
            lambda st, p, col, s, f: fs._chain_nested_folded(st, p, col, s, f, N_FRAMES),
            static_argnums=(0,))
        with pltpu.force_tpu_interpret_mode():
            sF, _o = chain(c.static, c.params, None, init_pool_for(c, 8192, 0), frame)
    finally:
        fs._FORCE_NESTED_MERGE_CPU = False
        fs._FORCE_NESTED_FOLD_CPU = False

    assert int(np.asarray(sU.alive).sum()) > 0
    for f in (x.name for x in dataclasses.fields(type(sU))):
        if f == "rng_key":
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(sU, f)), np.asarray(getattr(sF, f)), err_msg=f)
