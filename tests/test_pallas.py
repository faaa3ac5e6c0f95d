"""Pallas fused march kernel vs the XLA march path.

The kernel body IS render/march.march_step, so equality is structural; this
verifies the Pallas plumbing (lane-tile remap, padding, mask carriage,
tile-level conds) byte-for-byte. Runs the kernel in interpreter mode on the
CPU test backend; on a real TPU the same test runs compiled (tolerance 1 LSB
for XLA FMA-contraction differences)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relativisticraytracer_tpu.config import (
    CameraEffects,
    RenderSettings,
    SceneConfig,
)
from relativisticraytracer_tpu.ops.pallas_march import march_pallas
from relativisticraytracer_tpu.render.camera import camera_state_from_pose, generate_rays
from relativisticraytracer_tpu.render.march import march

ON_TPU = jax.devices()[0].platform == "tpu"
INTERPRET = not ON_TPU


def _rays(w=192, h=64, pose=((0.0, 5.0, -38.0), 0.0, -6.0)):
    cam = camera_state_from_pose(*pose)
    origin, direction, _, _ = generate_rays(w, h, cam, CameraEffects())
    return origin, direction


@pytest.mark.parametrize("scene_kw", [
    dict(enable_disk=False, enable_clouds=False),
    dict(),
    dict(spin_a=0.9),
])
def test_pallas_march_matches_xla(scene_kw):
    scene = SceneConfig(max_steps=96, **scene_kw)
    origin, direction = _rays()
    intensity, trans, hit, vel = march_pallas(
        scene, origin, direction, jnp.float32(1.5), 96,
        block_h=32, block_w=64, unroll=4, interpret=INTERPRET,
    )
    ref = march(scene, origin, direction, 1.5, max_steps=96, loop="while")
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref.hit_horizon))
    # FMA-contraction/fusion-boundary rounding differences: ~1e-9 even in
    # interpret mode (CPU), up to ~1e-6 compiled on TPU.
    atol = 2e-6 if ON_TPU else 1e-8
    for got, want in [
        (intensity.x, ref.intensity.x), (intensity.y, ref.intensity.y),
        (intensity.z, ref.intensity.z), (trans, ref.transmittance),
        (vel.x, ref.v.x), (vel.y, ref.v.y), (vel.z, ref.v.z),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=atol
        )


def test_pallas_handles_nondivisible_image():
    # 70x100 image padded up to block multiples then cropped.
    scene = SceneConfig(max_steps=32, enable_clouds=False)
    origin, direction = _rays(w=100, h=70)
    intensity, trans, hit, vel = march_pallas(
        scene, origin, direction, jnp.float32(0.5), 32,
        block_h=32, block_w=64, unroll=4, interpret=INTERPRET,
    )
    assert trans.shape == (70, 100)
    ref = march(scene, origin, direction, 0.5, max_steps=32, loop="scan")
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(ref.transmittance), rtol=2e-6
    )


def test_lane_tile_roundtrip():
    from relativisticraytracer_tpu.ops.pallas_march import (
        _from_lane_tiles,
        _to_lane_tiles,
    )

    a = jnp.arange(64 * 256, dtype=jnp.float32).reshape(64, 256)
    t = _to_lane_tiles(a, 32, 64)
    assert t.shape == (64 * 256 // 128, 128)
    back = _from_lane_tiles(t, 64, 256, 32, 64)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_camera_kernel_matches_plane_kernel():
    """In-kernel ray generation == generate_rays + plane kernel."""
    from relativisticraytracer_tpu.ops.pallas_march import march_pallas_camera

    scene = SceneConfig(max_steps=48)
    cam = camera_state_from_pose((0.0, 5.0, -38.0), 0.0, -6.0)
    eff = CameraEffects()  # lens distortion on
    origin, direction, _, _ = generate_rays(100, 70, cam, eff)
    a = march_pallas_camera(
        scene, cam, eff, jnp.float32(1.5), 100, 70, 48,
        block_h=32, block_w=64, unroll=4, interpret=INTERPRET,
    )
    b = march_pallas(
        scene, origin, direction, jnp.float32(1.5), 48,
        block_h=32, block_w=64, unroll=4, interpret=INTERPRET,
    )
    for got, want in zip(
        [a[0].x, a[0].y, a[0].z, a[1], a[3].x, a[3].y, a[3].z],
        [b[0].x, b[0].y, b[0].z, b[1], b[3].x, b[3].y, b[3].z],
    ):
        # ulp-level raygen rounding (iota-int vs arange path) accumulates
        # over the march; directions/intensities agree to ~1e-6.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=5e-7
        )
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
