"""Property fuzz: march invariants that must hold for ANY camera/scene.

These are the physical sanity rails (SURVEY.md §4 'physics invariants'):
transmittance stays in [0,1], intensity is non-negative and finite, the
outcome masks partition the rays, and captured rays are black."""

import numpy as np
import pytest

from relativisticraytracer_tpu.config import SceneConfig, effects_off
from relativisticraytracer_tpu.render.camera import camera_state_from_pose, generate_rays
from relativisticraytracer_tpu.render.march import march


def _random_pose(rng):
    # Anywhere in the scene, including inside the disk annulus and close to
    # the hole (but outside the horizon).
    while True:
        pos = (rng.random(3) - 0.5) * 120.0
        if np.linalg.norm(pos) > 3.0:
            break
    yaw = float(rng.uniform(-360, 360))
    pitch = float(rng.uniform(-89, 89))
    return tuple(pos), yaw, pitch


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_march_invariants_random_cameras(seed):
    rng = np.random.default_rng(seed)
    scene = SceneConfig(max_steps=300)
    pose = _random_pose(rng)
    cam = camera_state_from_pose(*pose)
    origin, direction, _, _ = generate_rays(48, 32, cam, effects_off())
    st = march(scene, origin, direction, float(rng.uniform(0, 30)), max_steps=300)

    trans = np.asarray(st.transmittance)
    assert np.all(np.isfinite(trans)) and np.all((trans >= 0) & (trans <= 1)), pose
    for c in (st.intensity.x, st.intensity.y, st.intensity.z):
        c = np.asarray(c)
        assert np.all(np.isfinite(c)) and np.all(c >= 0), pose
    for c in (st.p.x, st.p.y, st.p.z, st.v.x, st.v.y, st.v.z):
        assert np.all(np.isfinite(np.asarray(c))), pose

    hit = np.asarray(st.hit_horizon)
    active = np.asarray(st.active)
    # captured rays are done and fully opaque-black background
    assert not np.any(hit & active)
    assert np.all(trans[hit] == 0.0)


@pytest.mark.slow
def test_transmittance_monotone_in_steps():
    """More steps can only absorb more: T(600 steps) <= T(200 steps)
    elementwise (media only absorbs; vacuum leaves T untouched)."""
    scene = SceneConfig(max_steps=600)
    cam = camera_state_from_pose((0.0, 3.0, -30.0), 0.0, -5.0)
    origin, direction, _, _ = generate_rays(32, 24, cam, effects_off())
    t200 = np.asarray(
        march(scene, origin, direction, 1.0, max_steps=200).transmittance
    )
    t600 = np.asarray(
        march(scene, origin, direction, 1.0, max_steps=600).transmittance
    )
    assert np.all(t600 <= t200 + 1e-7)
