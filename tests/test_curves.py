"""Curve/gradient evaluation parity (reference test: `curve.rs:241-258`)."""

import jax.numpy as jnp
import numpy as np

from bevy_firework_tpu.curve import (
    FireworkCurve,
    compile_curve,
    eval_curve_table,
    gradient_uneven_samples,
)


def _eval(curve, t, channels=0):
    ts, vs, n, kind = compile_curve(curve, channels=channels)
    return np.asarray(
        eval_curve_table(jnp.asarray(ts), jnp.asarray(vs), jnp.int32(n), jnp.int32(kind), jnp.float32(t))
    )


def test_curve_linear_rgba_reference_port():
    """Even 3-color gradient: endpoints and midpoint hit keyframes exactly."""
    g = FireworkCurve.even_samples([(1.0, 0.0, 0.0, 1.0), (0.0, 1.0, 0.0, 1.0), (0.0, 0.0, 1.0, 1.0)])
    np.testing.assert_array_equal(_eval(g, 0.0, 4), [1, 0, 0, 1])
    np.testing.assert_array_equal(_eval(g, 0.5, 4), [0, 1, 0, 1])
    np.testing.assert_array_equal(_eval(g, 1.0, 4), [0, 0, 1, 1])


def test_even_scalar_matches_host_oracle():
    c = FireworkCurve.even_samples([1.0, 2.0, 0.5, 3.0])
    for t in np.linspace(-0.5, 1.5, 41):
        got = float(_eval(c, t))
        want = float(c.sample_clamped(t))
        assert abs(got - want) < 1e-6, (t, got, want)


def test_uneven_scalar_matches_host_oracle():
    c = FireworkCurve.uneven_samples([(0.0, 1.0), (0.7, 3.0), (0.8, -1.0), (1.0, 0.0)])
    for t in np.linspace(-0.5, 1.5, 81):
        got = float(_eval(c, t))
        want = float(c.sample_clamped(t))
        assert abs(got - want) < 1e-6, (t, got, want)


def test_uneven_gradient_sparks():
    """The sparks example's 5-keyframe HDR gradient (`examples/sparks.rs:57-63`)."""
    g = gradient_uneven_samples(
        [
            (0.0, (150.0, 100.0, 15.0, 1.0)),
            (0.7, (3.0, 1.0, 1.0, 1.0)),
            (0.8, (1.0, 0.3, 0.3, 1.0)),
            (0.9, (0.3, 0.3, 0.3, 1.0)),
            (1.0, (0.1, 0.1, 0.1, 0.0)),
        ]
    )
    for t in [0.0, 0.35, 0.7, 0.75, 0.85, 0.95, 1.0]:
        got = _eval(g, t, 4)
        want = g.sample_clamped(t)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_constant():
    c = FireworkCurve.constant(2.5)
    for t in (-1.0, 0.0, 0.5, 2.0):
        assert float(_eval(c, t)) == 2.5


def test_vectorized_eval():
    c = FireworkCurve.uneven_samples([(0.0, 0.0), (1.0, 10.0)])
    ts_q = jnp.linspace(0, 1, 128)
    ts, vs, n, kind = compile_curve(c)
    out = eval_curve_table(jnp.asarray(ts), jnp.asarray(vs), jnp.int32(n), jnp.int32(kind), ts_q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ts_q) * 10.0, atol=1e-5)


def test_single_sample_becomes_constant():
    assert FireworkCurve.even_samples([4.0]).kind == 0
    assert FireworkCurve.uneven_samples([(0.3, 7.0)]).kind == 0
