"""Parity tests: core math + noise stack vs the NumPy oracle
(reference: include/math_utils.h)."""

import numpy as np
import pytest

import jax.numpy as jnp

from relativisticraytracer_tpu.core import noise, vecmath
from tests.oracle import numpy_ref as oracle


def _vec_samples(rng, n=512, scale=50.0):
    a = (rng.random((n, 3), dtype=np.float32) - 0.5) * scale
    return a.astype(np.float32)


def _as_vec3(a):
    return vecmath.Vec3(jnp.asarray(a[..., 0]), jnp.asarray(a[..., 1]), jnp.asarray(a[..., 2]))


def test_hash31_matches_oracle(rng):
    pts = _vec_samples(rng)
    got = np.asarray(noise.hash31(_as_vec3(pts)))
    want = oracle.hash31(pts)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_hash33_matches_oracle(rng):
    pts = _vec_samples(rng)
    got = noise.hash33(_as_vec3(pts))
    want = oracle.hash33(pts)
    for i, plane in enumerate([got.x, got.y, got.z]):
        np.testing.assert_allclose(np.asarray(plane), want[..., i], rtol=0, atol=2e-5)


def test_hash_range(rng):
    pts = _vec_samples(rng, n=2048, scale=200.0)
    h = np.asarray(noise.hash31(_as_vec3(pts)))
    assert np.all(np.abs(h) <= 1.0)


def test_noise3d_matches_oracle(rng):
    pts = _vec_samples(rng, scale=20.0)
    got = np.asarray(noise.noise3D(_as_vec3(pts)))
    want = oracle.noise3D(pts)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


@pytest.mark.parametrize("octaves", [1, 2, 5])
def test_fbm_matches_oracle(rng, octaves):
    pts = _vec_samples(rng, scale=12.0)
    got = np.asarray(noise.fbm(_as_vec3(pts), octaves))
    want = oracle.fbm(pts, octaves)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_fbm_billow_matches_oracle(rng):
    pts = _vec_samples(rng, scale=12.0)
    got = np.asarray(noise.fbm_billow(_as_vec3(pts), 3))
    want = oracle.fbm_billow(pts, 3)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_worley_matches_oracle(rng):
    pts = _vec_samples(rng, n=128, scale=8.0)
    got = np.asarray(noise.worley3D(_as_vec3(pts)))
    want = oracle.worley3D(pts)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_vecmath_normalize_guard():
    tiny = vecmath.vec3(1e-8, 0.0, 0.0)
    out = vecmath.normalize(tiny)
    assert float(out.x) == 0.0 and float(out.y) == 0.0 and float(out.z) == 0.0


def test_vecmath_ops_match_oracle(rng):
    a = _vec_samples(rng, n=64)
    b = _vec_samples(rng, n=64)
    va, vb = _as_vec3(a), _as_vec3(b)
    np.testing.assert_allclose(np.asarray(vecmath.dot(va, vb)), oracle.dot(a, b), rtol=1e-6)
    got_cross = vecmath.to_array(vecmath.cross(va, vb))
    np.testing.assert_allclose(np.asarray(got_cross), oracle.cross(a, b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vecmath.length(va)), oracle.length(a), rtol=1e-6)
    got_n = vecmath.to_array(vecmath.normalize(va))
    np.testing.assert_allclose(np.asarray(got_n), oracle.normalize(a), rtol=0, atol=2e-7)


def test_rotate_3d_matches_oracle(rng):
    p = _vec_samples(rng, n=32)
    axis = oracle.normalize(_vec_samples(rng, n=32))
    for ang in (0.3, -1.7):
        got = vecmath.to_array(
            vecmath.rotate_3d(_as_vec3(p), _as_vec3(axis.astype(np.float32)), ang)
        )
        want = oracle.rotate_3d(p, axis, ang)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-5)


def test_smoothstep_reversed_edges():
    # The reference calls smoothstep with edge0 > edge1 (vignette, cloud edge).
    x = jnp.asarray(np.linspace(0.0, 1.0, 11, dtype=np.float32))
    got = np.asarray(vecmath.smoothstep(0.8, 0.2, x))
    want = oracle.smoothstep(np.float32(0.8), np.float32(0.2), np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
