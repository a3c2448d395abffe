"""Async readback pipeline: overlapped transfers, latest-wins, contract
equality with the synchronous pack path."""

import time

import numpy as np

from bevy_firework_tpu import (
    EmissionPacing,
    EmissionSettings,
    ParticleSettings,
    ParticleSpawner,
    RandF32,
    compile_spawner,
    init_pool_for,
    make_frame_input,
    pack_instances,
)
from bevy_firework_tpu.render_pipeline import AsyncRenderReader
from bevy_firework_tpu.step import step_jit


def test_async_reader_matches_sync_pack():
    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(5.0))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(600.0))],
    )
    c = compile_spawner(sp)
    state = init_pool_for(c, 2048, 0)
    reader = AsyncRenderReader(capacity=2048, num_types=1)
    last_state = None
    for f in range(30):
        state, _ = step_jit(c.static, c.params, None, state, make_frame_input(1 / 60))
        reader.submit(c.params, state, frame_id=f)
        last_state = state
    # wait for the reader thread to drain
    deadline = time.time() + 10
    got = None
    while time.time() < deadline:
        got = reader.acquire(0)
        if got is not None and got[1] == 29:
            break
        if got is not None:
            reader.release(0)
        time.sleep(0.01)
    assert got is not None and got[1] == 29, "final frame never arrived"
    buf, fid = got
    rows_ref, count_ref = pack_instances(c.params, last_state, 0)
    np.testing.assert_allclose(buf, np.asarray(rows_ref)[: int(count_ref)], atol=0)
    reader.release(0)
    reader.close()


def test_submit_packed_roundtrip():
    """submit_packed (in-kernel pack planes + state arrays, no pack
    dispatch) must deliver the same rows as the synchronous extract."""
    import time

    import numpy as np

    from bevy_firework_tpu import (
        EmissionPacing,
        EmissionSettings,
        ParticleSettings,
        ParticleSpawner,
        RandF32,
        compile_spawner,
        init_pool_for,
        make_frame_input,
        pack_instances,
    )
    from bevy_firework_tpu.render import compute_render_fields
    from bevy_firework_tpu.render_pipeline import AsyncRenderReader
    from bevy_firework_tpu.step import step_jit

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(2.0))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(400.0))],
    )
    c = compile_spawner(sp)
    state = init_pool_for(c, 1024, 0)
    frame = make_frame_input(1 / 60)
    for _ in range(20):
        state, _ = step_jit(c.static, c.params, None, state, frame)
    # synthesize the 9 packed planes the kernel would emit (CPU backend has
    # no Pallas path; the XLA derivation is plane-parity-tested elsewhere)
    import jax.numpy as jnp

    scale, base, emis = compute_render_fields(c.params, state, 0)
    alive = state.alive
    packed = (jnp.where(alive, scale, 0.0),) + tuple(base) + tuple(emis)

    reader = AsyncRenderReader(capacity=1024, num_types=1)
    try:
        reader.submit_packed(c.static, state, packed, frame_id=1)
        got = None
        for _ in range(100):
            got = reader.acquire(0)
            if got is not None:
                break
            time.sleep(0.02)
        assert got is not None
        rows, fid = got
        assert fid == 1
        buf, count = pack_instances(c.params, state, 0)
        assert rows.shape[0] == int(count)
        np.testing.assert_allclose(np.asarray(rows), np.asarray(buf[: int(count)]), atol=1e-6)
        reader.release(0)
    finally:
        reader.close()
