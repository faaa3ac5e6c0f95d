"""Windowed sky gather (ops/pallas_sky.py) vs the q4 row-gather path.

The windowed path must reproduce gather_sky_coords bitwise on every lane
whose background can reach the frame (masked lanes — transmittance 0 —
may read 0 instead; the composite erases them)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relativisticraytracer_tpu.config import CameraEffects, effects_off
from relativisticraytracer_tpu.core.vecmath import Vec3, normalize
from relativisticraytracer_tpu.ops.pallas_sky import (
    sky_background_windowed,
    sky_window_gather,
    _window_bounds,
)
from relativisticraytracer_tpu.render.skybox import (
    gather_sky_coords,
    procedural_starfield,
    sky_coords,
    skybox_from_array,
)

N_ROWS = 32  # 4 sub-tiles of 8 rows


def _sky(h=64, w=128):
    return skybox_from_array(procedural_starfield(h, w))


def _coords_from_dirs(sky, d: Vec3, ca=0.0):
    h, w = sky.shape
    return sky_coords(d, jnp.float32(ca), h, w)


def _smooth_dirs(rng):
    """Camera-like smooth direction field over the plane grid."""
    yy, xx = np.meshgrid(
        np.linspace(-0.4, 0.4, N_ROWS), np.linspace(-0.7, 0.7, 128),
        indexing="ij",
    )
    d = Vec3(
        jnp.asarray(xx, jnp.float32),
        jnp.asarray(yy, jnp.float32),
        jnp.ones((N_ROWS, 128), jnp.float32),
    )
    return normalize(d)


def _random_dirs(rng):
    v = rng.standard_normal((3, N_ROWS, 128)).astype(np.float32)
    v /= np.linalg.norm(v, axis=0, keepdims=True)
    return Vec3(*(jnp.asarray(p) for p in v))


def _check(sky, coords, masked, effects, **kw):
    want = gather_sky_coords(sky, coords, effects)
    got = sky_background_windowed(
        sky, coords, effects, masked, interpret=True, **kw
    )
    ok = np.asarray(jnp.logical_not(masked))
    for g, w_ in ((got.x, want.x), (got.y, want.y), (got.z, want.z)):
        g, w_ = np.asarray(g), np.asarray(w_)
        np.testing.assert_array_equal(g[ok], w_[ok])
        # masked lanes: either the real value or exactly 0
        bad = ~ok & (g != w_) & (g != 0.0)
        assert not bad.any()
    return got


@pytest.mark.parametrize("dirs", ["smooth", "random"])
def test_windowed_matches_row_gather(rng, dirs):
    sky = _sky()
    d = _smooth_dirs(rng) if dirs == "smooth" else _random_dirs(rng)
    coords = _coords_from_dirs(sky, d)
    masked = jnp.zeros((N_ROWS, 128), bool)
    _check(sky, coords, masked, effects_off())


def test_windowed_with_masked_lanes(rng):
    sky = _sky()
    coords = _coords_from_dirs(sky, _smooth_dirs(rng))
    masked = jnp.asarray(rng.random((N_ROWS, 128)) < 0.3)
    _check(sky, coords, masked, effects_off())


def test_windowed_all_masked_subtile(rng):
    sky = _sky()
    coords = _coords_from_dirs(sky, _smooth_dirs(rng))
    masked = jnp.zeros((N_ROWS, 128), bool).at[:8].set(True)
    _check(sky, coords, masked, effects_off())


def test_windowed_overflow_falls_back_exactly(rng):
    """fallback_rows smaller than the incoherent row count -> the whole
    frame drops to the plain row-gather (bitwise everywhere)."""
    sky = _sky()
    coords = _coords_from_dirs(sky, _random_dirs(rng))
    masked = jnp.zeros((N_ROWS, 128), bool)
    got = sky_background_windowed(
        sky, coords, effects_off(), masked, fallback_rows=8, interpret=True
    )
    want = gather_sky_coords(sky, coords, effects_off())
    for g, w_ in ((got.x, want.x), (got.y, want.y), (got.z, want.z)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_windowed_ca_on_uses_gather_path(rng):
    """Chromatic aberration needs per-channel coordinates; the windowed
    entry point must return exactly the per-channel gather result."""
    sky = _sky()
    effects = CameraEffects(use_chromatic_aberration=1.0, ca_amount=0.01)
    d = _smooth_dirs(rng)
    h, w = sky.shape
    coords = sky_coords(d, effects.ca_amount, h, w)
    got = sky_background_windowed(
        sky, coords, effects, jnp.zeros((N_ROWS, 128), bool),
        interpret=True,
    )
    want = gather_sky_coords(sky, coords, effects)
    for g, w_ in ((got.x, want.x), (got.y, want.y), (got.z, want.z)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_window_bounds_coherence():
    """Degenerate and spread index fields classify as expected."""
    w, hq = 128, 65
    idx = jnp.full((16, 128), 1000, jnp.int32)
    masked = jnp.zeros((16, 128), bool)
    origins, coh = _window_bounds(idx, masked, w, hq, 8, 16, 128)
    assert bool(coh.all())
    # rows spread past br=4 -> incoherent
    idx2 = (jnp.arange(16)[:, None] * w * 2
            + jnp.zeros((1, 128), jnp.int32)).astype(jnp.int32)
    _, coh2 = _window_bounds(idx2, masked, w, hq, 8, 4, 128)
    assert not bool(coh2.any())


def test_window_gather_kernel_direct(rng):
    """The raw kernel's quads against take() on in-window lanes."""
    sky = _sky()
    coords = _coords_from_dirs(sky, _smooth_dirs(rng))
    idx, fx, fy = coords[1]
    origins, coh = _window_bounds(
        idx, jnp.zeros((N_ROWS, 128), bool), 128, 65, 8, 16, 128)
    assert bool(coh.all())  # smooth field on a tiny sky must be coherent
    tr, tg, tb = sky_window_gather(
        sky, idx, origins, sub_rows=8, br=16, bc=128, interpret=True,
    )
    for plane, out in ((sky.qr, tr), (sky.qg, tg), (sky.qb, tb)):
        want = jnp.take(plane.reshape(-1), idx)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_window_gather_unaligned_origins(rng):
    """Origins off the (8, 128) tile grid are floored INTERNALLY; the
    local coordinates must follow the floored window (results correct for
    any in-window lane, not silently wrong)."""
    sky = _sky()
    coords = _coords_from_dirs(sky, _smooth_dirs(rng))
    idx, fx, fy = coords[1]
    origins, coh = _window_bounds(
        idx, jnp.zeros((N_ROWS, 128), bool), 128, 65, 8, 16, 128)
    assert bool(coh.all())
    # perturb origins OFF the tile grid; flooring restores the same window
    bumped = origins + jnp.asarray([[3, 17]], jnp.int32)
    tr, tg, tb = sky_window_gather(
        sky, idx, bumped, sub_rows=8, br=16, bc=128, interpret=True,
    )
    for plane, out in ((sky.qr, tr), (sky.qg, tg), (sky.qb, tb)):
        want = jnp.take(plane.reshape(-1), idx)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_windowed_clamps_to_small_sky(rng):
    """A window larger than the sky is clamped to the sky's aligned
    extent — module defaults (32x256) on a 64x128 sky must not raise and
    must still match the row-gather (the round-4 red-tree regression)."""
    sky = _sky()  # 64x128: narrower than the default bc=256
    coords = _coords_from_dirs(sky, _smooth_dirs(rng))
    masked = jnp.zeros((N_ROWS, 128), bool)
    _check(sky, coords, masked, effects_off(), br=32, bc=256)


@pytest.mark.slow
def test_full_frame_windowed_equals_rows():
    """End-to-end compact frame with sky_gather='windowed' must be BITWISE
    the production 'rows' frame (the windowed path is wired at
    ops/pallas_compact._compact_tile_rgba)."""
    from relativisticraytracer_tpu.config import RenderSettings, SceneConfig
    from relativisticraytracer_tpu.ops.pallas_compact import (
        render_frame_pallas_compact,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose

    scene = SceneConfig(max_steps=48)
    cam = camera_state_from_pose((0.0, 5.0, -38.0), 0.0, -6.0)
    sky = _sky()
    eff = CameraEffects()
    frames = {}
    for mode in ("rows", "windowed"):
        settings = RenderSettings(width=128, height=64, max_steps=48,
                                  loop="pallas", sky_gather=mode)
        frames[mode] = np.asarray(render_frame_pallas_compact(
            scene, settings, cam, eff, 1.0, sky, interpret=True))
    np.testing.assert_array_equal(frames["windowed"], frames["rows"])
