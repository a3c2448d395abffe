"""Native (C++) instance ring: build, transpose correctness, producer/consumer
hand-off, frame-drop semantics."""

import numpy as np

from bevy_firework_tpu.native import InstanceRing, get_lib, transpose_planes


def test_native_lib_builds():
    assert get_lib() is not None, "g++ toolchain expected on this image"


def test_transpose_matches_numpy():
    rng = np.random.RandomState(0)
    planes = rng.rand(16, 1000).astype(np.float32)
    out = transpose_planes(planes)
    np.testing.assert_array_equal(out, planes.T)


def test_ring_round_trip():
    ring = InstanceRing(capacity=4096, n_slots=3)
    planes = np.random.RandomState(1).rand(16, 500).astype(np.float32)
    ring.publish(planes, count=500, frame_id=7)
    got = ring.acquire()
    assert got is not None
    buf, fid = got
    assert fid == 7 and buf.shape == (500, 16)
    np.testing.assert_array_equal(buf, planes.T)
    ring.release()
    ring.close()


def test_ring_latest_frame_wins():
    ring = InstanceRing(capacity=64, n_slots=2)
    for fid in range(5):  # consumer never drains: producer steals old slots
        planes = np.full((16, 8), float(fid), np.float32)
        ring.publish(planes, count=8, frame_id=fid)
    buf, fid = ring.acquire()
    assert fid == 4  # newest ready frame
    np.testing.assert_array_equal(buf, 4.0)
    ring.release()
    ring.close()


def test_ring_count_clamped_to_capacity():
    ring = InstanceRing(capacity=16, n_slots=2)
    planes = np.ones((16, 100), np.float32)
    ring.publish(planes, count=100, frame_id=0)
    buf, _ = ring.acquire()
    assert buf.shape[0] == 16
    ring.release()
    ring.close()


def test_end_to_end_with_engine_planes():
    """Device pack -> planar copy -> native interleave == pack_instances."""
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
    from bevy_firework_tpu.render import pack_instances_planar
    from bevy_firework_tpu.step import step_jit

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32.constant(5.0))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.one_shot(37))],
    )
    c = compile_spawner(sp)
    state = init_pool_for(c, 256, 0)
    state, _ = step_jit(c.static, c.params, None, state, make_frame_input(1 / 60))
    planes, count = pack_instances_planar(c.params, state, 0)
    rows_ref, count_ref = pack_instances(c.params, state, 0)
    assert int(count) == int(count_ref) == 37
    ring = InstanceRing(capacity=256)
    ring.publish(np.asarray(planes), int(count), frame_id=1)
    buf, _ = ring.acquire()
    np.testing.assert_allclose(buf, np.asarray(rows_ref)[:37], atol=0)
    ring.release()
    ring.close()


def test_dense_and_f16_paths_match_compacted():
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
    from bevy_firework_tpu.render import pack_instances_dense, pack_instances_dense_f16
    from bevy_firework_tpu.step import step_jit

    sp = ParticleSpawner(
        particle_settings=[ParticleSettings(lifetime=RandF32(0.05, 0.4))],
        emission_settings=[EmissionSettings(emission_pacing=EmissionPacing.rate(300.0))],
    )
    c = compile_spawner(sp)
    state = init_pool_for(c, 512, 0)
    for _ in range(25):  # mix of live and dead lanes
        state, _ = step_jit(c.static, c.params, None, state, make_frame_input(1 / 60))
    rows_ref, cnt = pack_instances(c.params, state, 0)
    rows_ref = np.asarray(rows_ref)[: int(cnt)]
    assert len(rows_ref) > 5

    ring = InstanceRing(512)
    planes, _ = pack_instances_dense(c.params, state, 0)
    ring.publish_dense(np.asarray(planes), 1)
    buf, _ = ring.acquire()
    np.testing.assert_allclose(buf, rows_ref, atol=0)
    ring.release()

    planes16, _ = pack_instances_dense_f16(c.params, state, 0)
    ring.publish_dense_f16(np.asarray(planes16), 2)
    buf16, _ = ring.acquire_f16()
    assert buf16.dtype == np.float16 and buf16.shape == rows_ref.shape
    np.testing.assert_allclose(buf16.astype(np.float32), rows_ref, atol=5e-2, rtol=1e-2)
    ring.release()
    ring.close()


def test_publish_dense_planes_and_f16():
    """Separate-plane publishes (f32 + f16, with None planes -> defaults)
    equal the monolithic dense publish."""
    import numpy as np

    from bevy_firework_tpu.native import InstanceRing

    rng = np.random.default_rng(3)
    n = 500
    planes = rng.normal(size=(16, n)).astype(np.float32)
    planes[3, rng.random(n) < 0.4] = 0.0
    live = planes[3] != 0.0
    expect = planes[:, live].T
    defaults = [0.0] * 16
    defaults[7] = 1.0

    ring = InstanceRing(n, 2)
    try:
        plist = [planes[p].copy() for p in range(16)]
        ring.publish_dense_planes(plist, defaults, frame_id=5)
        rows, fid = ring.acquire()
        assert fid == 5
        np.testing.assert_array_equal(np.asarray(rows), expect)
        ring.release()

        # None planes -> defaults (identity quat)
        plist2 = list(plist)
        for q in (4, 5, 6, 7):
            plist2[q] = None
        ring.publish_dense_planes(plist2, defaults, frame_id=6)
        rows2, _ = ring.acquire()
        np.testing.assert_array_equal(np.asarray(rows2)[:, 4:8],
                                      np.tile([0, 0, 0, 1.0], (len(expect), 1)).astype(np.float32))
        ring.release()
    finally:
        ring.close()

    ring16 = InstanceRing(n, 2)
    try:
        p16 = [planes[p].astype(np.float16) for p in range(16)]
        for q in (4, 5, 6, 7):
            p16[q] = None
        ring16.publish_dense_planes_f16(p16, defaults, frame_id=9)
        got = ring16.acquire_f16()
        assert got is not None
        rows16, fid = got
        assert fid == 9
        live16 = (planes[3].astype(np.float16).view(np.uint16) & 0x7FFF) != 0
        expect16 = planes[:, live16].T.astype(np.float16)
        np.testing.assert_array_equal(np.asarray(rows16)[:, 0:4], expect16[:, 0:4])
        np.testing.assert_array_equal(np.asarray(rows16)[:, 8:], expect16[:, 8:])
        np.testing.assert_array_equal(
            np.asarray(rows16)[:, 4:8],
            np.tile(np.array([0, 0, 0, 1.0], np.float16), (len(expect16), 1)))
        ring16.release()
    finally:
        ring16.close()
