"""Polynomial atan2/asin (core/fastmath.py): used inside Pallas kernels
where Mosaic lacks the primitives; must track libm within a few ulp."""

import numpy as np

import jax.numpy as jnp

from relativisticraytracer_tpu.core.fastmath import arcsin, atan2


def test_atan2_accuracy(rng):
    y = ((rng.random(100000, dtype=np.float32) - 0.5) * 200).astype(np.float32)
    x = ((rng.random(100000, dtype=np.float32) - 0.5) * 200).astype(np.float32)
    got = np.asarray(atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.max(np.abs(got - want)) < 5e-7


def test_atan2_edge_cases():
    cases = [(0.0, 0.0), (0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0),
             (1e-30, 1.0), (1.0, 1e-30)]
    for y, x in cases:
        got = float(atan2(jnp.float32(y), jnp.float32(x)))
        want = float(np.arctan2(np.float32(y), np.float32(x)))
        assert abs(got - want) < 1e-6, (y, x, got, want)


def test_atan2_quadrants(rng):
    for sy in (1, -1):
        for sx in (1, -1):
            y = np.float32(sy * 0.7)
            x = np.float32(sx * 0.3)
            got = float(atan2(jnp.asarray(y), jnp.asarray(x)))
            want = float(np.arctan2(y, x))
            assert abs(got - want) < 1e-6


def test_arcsin_accuracy(rng):
    v = ((rng.random(50000, dtype=np.float32) * 2) - 1).astype(np.float32)
    got = np.asarray(arcsin(jnp.asarray(v)))
    want = np.arcsin(v)
    assert np.max(np.abs(got - want)) < 2e-6
    # clamps out-of-range inputs instead of NaN
    assert abs(float(arcsin(jnp.float32(1.5))) - np.pi / 2) < 1e-6
