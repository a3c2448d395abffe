"""Capsule pack/unpack: bit-exact round trips for the trees the Scene
dispatch actually ships (stacked PoolState / StepOutputs / FrameInput),
plus host-pack layout equality with the traced pack."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
from bevy_firework_tpu.capsule import pack, pack_host, spec_of, unpack
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.ops.fused_step import step_auto_jit
from bevy_firework_tpu.settings import EmissionPacing


def _tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(x, y)


def _stress_state():
    spawner, _ = effects.stress_test()
    es = dataclasses.replace(
        spawner.emission_settings[0], emission_pacing=EmissionPacing.rate(5000.0))
    spawner = dataclasses.replace(spawner, emission_settings=(es,))
    compiled = compile_spawner(spawner)
    state = init_pool_for(compiled, 4096, seed=3)
    frame = make_frame_input(1 / 60)
    for _ in range(10):
        state, out = step_auto_jit(compiled.static, compiled.params, None, state, frame)
    return compiled, state, out, frame


def test_roundtrip_pool_state_bitexact():
    compiled, state, out, frame = _stress_state()
    spec = spec_of(state)
    bufs = jax.jit(lambda t: pack(t, spec))(state)
    # pool-plane-sized leaves stay native (no relayout copies); the small
    # leaves collapse into one packed buffer
    assert len(bufs) == spec.n_buffers
    assert len(spec.buckets) == 1 and spec.n_native == 19
    back = jax.jit(lambda b: unpack(b, spec))(bufs)
    _tree_equal(state, back)


def test_roundtrip_outputs_and_mixed_tuple():
    compiled, state, out, frame = _stress_state()
    tree = (state, out, frame)
    spec = spec_of(tree)
    back = unpack(pack(tree, spec), spec)
    _tree_equal(tree, back)


def test_host_pack_matches_traced_pack():
    frame = make_frame_input(
        1 / 60, translation=(1.0, -2.0, 3.0), rotation=(0.0, 0.7071, 0.0, 0.7071),
        parent_velocity=(0.5, 0.0, -0.5), modifier_scale=2.0, modifier_speed=0.25)
    frames = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *[frame, frame, frame])
    spec = spec_of(frames)
    host = pack_host(frames, spec)
    dev = jax.jit(lambda t: pack(t, spec))(frames)
    assert len(host) == len(dev) == 1  # all-f32 tree -> one 4-byte buffer
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, np.asarray(d))
    _tree_equal(frames, unpack(tuple(jnp.asarray(h) for h in host), spec))


def test_spec_hashable_and_stable():
    compiled, state, out, frame = _stress_state()
    s1, s2 = spec_of(state), spec_of(state)
    assert s1 == s2 and hash(s1) == hash(s2)
    d = {s1: "a"}
    assert d[s2] == "a"


def test_scalar_and_bool_leaves():
    tree = {
        "s": np.float32(3.25),
        "i": np.int32(-7),
        "b": np.asarray([True, False, True]),
        "k": np.asarray([1, 2], np.uint32),
        "h": np.asarray([1.5, -2.5], np.float16),
    }
    spec = spec_of(tree)
    assert spec.n_buffers == 2  # 4-byte + 2-byte buckets
    back = unpack(pack(tree, spec), spec)
    _tree_equal(tree, back)
    hb = pack_host(tree, spec)
    db = pack(tree, spec)
    for h, d in zip(hb, db):
        np.testing.assert_array_equal(h, np.asarray(d))
