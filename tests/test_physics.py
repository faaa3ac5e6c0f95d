"""Parity + invariant tests: geodesics and integrators
(reference: include/geodesics.h, include/integrators.h)."""

import numpy as np

import jax.numpy as jnp

from relativisticraytracer_tpu.config import SceneConfig
from relativisticraytracer_tpu.core.vecmath import Vec3, to_array
from relativisticraytracer_tpu.physics.geodesics import geodesic_acc, redshift_factor
from relativisticraytracer_tpu.physics.integrators import euler_step, rk4_step
from tests.oracle import numpy_ref as oracle

SCENE = SceneConfig()
KERR = SceneConfig(spin_a=0.9)


def _as_vec3(a):
    return Vec3(jnp.asarray(a[..., 0]), jnp.asarray(a[..., 1]), jnp.asarray(a[..., 2]))


def _rand_states(rng, n=256, rmin=1.5, rmax=120.0):
    d = rng.random((n, 3), dtype=np.float32) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = rng.uniform(rmin, rmax, size=(n, 1)).astype(np.float32)
    p = (d * r).astype(np.float32)
    v = (rng.random((n, 3), dtype=np.float32) - 0.5)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return p, v.astype(np.float32)


def test_geodesic_acc_matches_oracle(rng):
    p, v = _rand_states(rng)
    got = np.asarray(to_array(geodesic_acc(SCENE, _as_vec3(p), _as_vec3(v))))
    want = oracle.get_geodesic_acc(p, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_geodesic_acc_kerr_matches_oracle(rng):
    p, v = _rand_states(rng)
    got = np.asarray(to_array(geodesic_acc(KERR, _as_vec3(p), _as_vec3(v))))
    want = oracle.get_geodesic_acc(p, v, spin_a=np.float32(0.9))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_geodesic_acc_zero_inside_half_horizon():
    p = np.array([[0.5, 0.3, 0.2]], dtype=np.float32)  # r < Rs/2 = 1
    v = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    got = np.asarray(to_array(geodesic_acc(SCENE, _as_vec3(p), _as_vec3(v))))
    assert np.all(got == 0.0)


def test_geodesic_acc_is_central_when_nonspinning(rng):
    # With a=0 the force is radial: acc x p == 0.
    p, v = _rand_states(rng, n=64, rmin=3.0)
    acc = np.asarray(to_array(geodesic_acc(SCENE, _as_vec3(p), _as_vec3(v))))
    crossed = np.cross(acc, p)
    assert np.max(np.abs(crossed)) < 1e-4


def test_acc_vanishes_at_large_r():
    p = np.array([[1e4, 0.0, 0.0]], dtype=np.float32)
    v = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    acc = np.asarray(to_array(geodesic_acc(SCENE, _as_vec3(p), _as_vec3(v))))
    # |a| = 1.5*Rs*L^2/r^5 * |p| = 3e-8 at r=1e4 with |L|=r
    assert np.max(np.abs(acc)) < 1e-7


def test_redshift_matches_oracle(rng):
    p, v = _rand_states(rng, rmin=1.8, rmax=40.0)
    got = np.asarray(redshift_factor(SCENE, _as_vec3(p), _as_vec3(v)))
    want = oracle.calculate_redshift_factor(p, v)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_redshift_zero_near_horizon():
    p = np.array([[2.0, 0.0, 0.0]], dtype=np.float32)  # r = 2.0 < 1.01*Rs
    v = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    assert float(redshift_factor(SCENE, _as_vec3(p), _as_vec3(v))[0]) == 0.0


def test_redshift_blue_approaching_red_receding():
    # Gas at +x moves along -z (dir = (-z,0,x) normalized = (0,0,1) at (r,0,0)).
    p = np.array([[12.0, 0.0, 0.0]], dtype=np.float32)
    toward = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    away = -toward
    g_to = float(redshift_factor(SCENE, _as_vec3(p), _as_vec3(toward))[0])
    g_aw = float(redshift_factor(SCENE, _as_vec3(p), _as_vec3(away))[0])
    assert g_to > g_aw


def test_rk4_matches_oracle_scalar_h(rng):
    p, v = _rand_states(rng, rmin=2.5)
    pn, vn = rk4_step(SCENE, _as_vec3(p), _as_vec3(v), jnp.float32(0.3))
    wp, wv = oracle.integrate_rk4(p, v, 0.3)
    np.testing.assert_allclose(np.asarray(to_array(pn)), wp, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(to_array(vn)), wv, rtol=2e-5, atol=1e-6)


def test_rk4_matches_oracle_per_ray_h(rng):
    p, v = _rand_states(rng, n=64, rmin=2.5)
    h = rng.uniform(0.03, 0.3, size=(64,)).astype(np.float32)
    pn, vn = rk4_step(SCENE, _as_vec3(p), _as_vec3(v), jnp.asarray(h))
    wp, wv = oracle.integrate_rk4(p, v, h)
    np.testing.assert_allclose(np.asarray(to_array(pn)), wp, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(to_array(vn)), wv, rtol=2e-5, atol=1e-6)


def test_euler_matches_oracle(rng):
    p, v = _rand_states(rng, n=64, rmin=2.5)
    pn, vn = euler_step(SCENE, _as_vec3(p), _as_vec3(v), jnp.float32(0.1))
    wp, wv = oracle.integrate_euler(p, v, 0.1)
    np.testing.assert_allclose(np.asarray(to_array(pn)), wp, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(to_array(vn)), wv, rtol=2e-5, atol=1e-6)


def test_straight_line_far_from_hole():
    # At r ~ 1e3 M the deflection over one step is negligible.
    p = np.array([[1000.0, 0.0, 0.0]], dtype=np.float32)
    v = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    pn, vn = rk4_step(SCENE, _as_vec3(p), _as_vec3(v), jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(to_array(vn)), v, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(to_array(pn)), p + 0.3 * v, rtol=1e-6, atol=1e-5
    )


def test_angular_momentum_conserved_schwarzschild():
    # Central force => L = p x v conserved along an integrated orbit.
    p = np.array([10.0, 0.0, -30.0], dtype=np.float32)
    v = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    vp = Vec3(*[jnp.asarray(np.full((1,), c)) for c in p])
    vv = Vec3(*[jnp.asarray(np.full((1,), c)) for c in v])
    l0 = np.cross(p, v)
    for _ in range(200):
        vp, vv = rk4_step(SCENE, vp, vv, jnp.float32(0.3))
    p1 = np.asarray(to_array(vp))[0]
    v1 = np.asarray(to_array(vv))[0]
    l1 = np.cross(p1, v1)
    np.testing.assert_allclose(l1, l0, rtol=5e-3)
