"""Distribution tests for RandF32/RandVec3 samplers and emission shapes
(SURVEY.md A.3: replicate the reference's center-biased distributions)."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_firework_tpu.emission_shape import EmissionShape, sample_shape
from bevy_firework_tpu.rand import RandF32, RandVec3, sample_randf32, sample_randvec3

N = 20000


def _uniforms(k, n=N):
    return jax.random.uniform(jax.random.PRNGKey(0), (k, n), jnp.float32)


def test_randf32_uniform_range():
    u = _uniforms(1)[0]
    x = np.asarray(sample_randf32(u, 2.0, 5.0))
    assert x.min() >= 2.0 and x.max() < 5.0
    assert abs(x.mean() - 3.5) < 0.05


def test_randf32_constant():
    u = _uniforms(1)[0]
    x = np.asarray(sample_randf32(u, 3.0, 3.0))
    np.testing.assert_array_equal(x, 3.0)


def test_randvec3_cone():
    """sparks config: magnitude U[0,10), direction +Y, spread 30 deg."""
    rv = RandVec3(magnitude=RandF32(0.0, 10.0), direction=(0.0, 1.0, 0.0), spread=np.pi / 6)
    p = jnp.asarray(rv.compile())
    u = _uniforms(3)
    v = np.asarray(sample_randvec3(p, u[0], u[1], u[2]))
    mags = np.linalg.norm(v, axis=-1)
    assert mags.max() < 10.0
    nz = mags > 1e-6
    cos_angle = v[nz, 1] / mags[nz]
    angles = np.arccos(np.clip(cos_angle, -1, 1))
    assert angles.max() <= np.pi / 6 + 1e-5
    # azimuthal symmetry around the axis
    assert abs(v[:, 0].mean()) < 0.1 and abs(v[:, 2].mean()) < 0.1


def test_randvec3_arbitrary_direction():
    d = np.array([1.0, 2.0, -0.5])
    d = d / np.linalg.norm(d)
    rv = RandVec3(magnitude=RandF32(3.0, 3.0), direction=tuple(d), spread=0.2)
    p = jnp.asarray(rv.compile())
    u = _uniforms(3)
    v = np.asarray(sample_randvec3(p, u[0], u[1], u[2]))
    mags = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(mags, 3.0, atol=1e-4)
    cosang = (v @ d) / mags
    assert np.arccos(np.clip(cosang, -1, 1)).max() <= 0.2 + 1e-4


def test_shape_point():
    p = jnp.asarray(EmissionShape.point().compile())
    u = _uniforms(3)
    v = np.asarray(sample_shape(p, u[0], u[1], u[2]))
    np.testing.assert_array_equal(v, 0.0)


def test_shape_sphere_center_biased():
    R = 2.0
    p = jnp.asarray(EmissionShape.sphere(R).compile())
    u = _uniforms(3)
    v = np.asarray(sample_shape(p, u[0], u[1], u[2]))
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= R + 1e-5
    # linear-in-r draw => mean radius R/2 (volume-uniform would be 3R/4)
    assert abs(r.mean() - R / 2) < 0.05


def test_shape_circle_in_plane():
    normal = np.array([0.0, 0.0, 1.0])
    R = 0.4
    p = jnp.asarray(EmissionShape.circle(tuple(normal), R).compile())
    u = _uniforms(3)
    v = np.asarray(sample_shape(p, u[0], u[1], u[2]))
    # all samples lie in the plane perpendicular to the normal
    np.testing.assert_allclose(v @ normal, 0.0, atol=1e-5)
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= R + 1e-5
    assert abs(r.mean() - R / 2) < 0.02  # center-biased disk


def test_shape_circle_y_normal_unrotated():
    p = jnp.asarray(EmissionShape.circle((0, 1, 0), 1.0).compile())
    u = _uniforms(3)
    v = np.asarray(sample_shape(p, u[0], u[1], u[2]))
    np.testing.assert_allclose(v[:, 1], 0.0, atol=1e-6)


def _ks_uniform(x):
    """KS statistic vs U[0,1] (no scipy: CI installs jax+numpy+pytest only,
    same helper as test_fuzz_parity)."""
    x = np.sort(np.asarray(x))
    n = len(x)
    cdf = np.arange(1, n + 1) / n
    return max(np.abs(cdf - x).max(), np.abs(x - (np.arange(n) / n)).max())


def test_shape_box_uniform_oriented():
    """Box (beyond reference): uniform per axis in the oriented volume."""
    from bevy_firework_tpu.emission_shape import EmissionShape, sample_shape

    rng = np.random.default_rng(3)
    u = rng.random((3, 20000), dtype=np.float32)
    pts = np.asarray(sample_shape(EmissionShape.box((1.0, 2.0, 3.0)).compile(), *u))
    for axis, h in zip(range(3), (1.0, 2.0, 3.0)):
        x = pts[:, axis]
        assert np.abs(x).max() <= h + 1e-5
        assert _ks_uniform((x / h + 1.0) / 2.0) < 0.03, axis
    # orientation: +Y of the local frame maps to the normal
    pts2 = np.asarray(sample_shape(
        EmissionShape.box((1.0, 2.0, 3.0), normal=(1.0, 0.0, 0.0)).compile(), *u))
    assert np.abs(pts2[:, 0]).max() <= 2.0 + 1e-5  # local y (h=2) now on x


def test_shape_ring_edge_uniform_angle():
    """Ring (beyond reference): every sample ON the edge, angle uniform —
    unlike the reference circle's deliberate center bias."""
    from bevy_firework_tpu.emission_shape import EmissionShape, sample_shape

    rng = np.random.default_rng(4)
    u = rng.random((3, 20000), dtype=np.float32)
    pts = np.asarray(sample_shape(EmissionShape.ring((0.0, 1.0, 0.0), 2.0).compile(), *u))
    r = np.sqrt(pts[:, 0] ** 2 + pts[:, 2] ** 2)
    np.testing.assert_allclose(r, 2.0, atol=1e-5)
    np.testing.assert_allclose(pts[:, 1], 0.0, atol=1e-5)
    ang = (np.arctan2(pts[:, 2], pts[:, 0]) / (2 * np.pi)) % 1.0
    assert _ks_uniform(ang) < 0.03


def test_new_shapes_serde_and_kernel_parity():
    """Serde round-trip for box/ring, and the fused kernel's _shape_row
    matches the XLA sampler on identical uniforms."""
    from bevy_firework_tpu.emission_shape import EmissionShape, sample_shape_comp
    from bevy_firework_tpu.ops.fused_step import _shape_row

    for sh in (EmissionShape.box((0.5, 1.5, 2.5), normal=(0.3, 0.8, 0.1)),
               EmissionShape.ring((0.2, 0.9, 0.4), 1.7)):
        rt = EmissionShape.from_dict(sh.to_dict())
        assert rt == sh
        row = sh.compile()
        rng = np.random.default_rng(5)
        u = [jnp.asarray(rng.random(512, dtype=np.float32)) for _ in range(3)]
        a = sample_shape_comp(row, *u)
        b = _shape_row(jnp.asarray(row), *u)
        for xa, xb in zip(a, b):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-6)
