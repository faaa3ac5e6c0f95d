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
@pytest.mark.slow
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


@pytest.mark.slow
def test_group_rows_media_conds_are_exact():
    # media_group_rows refines the media-skip lax.cond to row slices; a
    # slice skips only when every lane's probe is False, so the result must
    # be IDENTICAL to whole-tile conds (and to the uncond XLA path).
    scene = SceneConfig(max_steps=96)
    origin, direction = _rays()
    whole = march_pallas(
        scene, origin, direction, jnp.float32(1.5), 96,
        block_h=32, block_w=64, unroll=4, group_rows=0, interpret=INTERPRET,
    )
    grouped = march_pallas(
        scene, origin, direction, jnp.float32(1.5), 96,
        block_h=32, block_w=64, unroll=4, group_rows=4, interpret=INTERPRET,
    )
    for got, want in zip(grouped, whole):
        if hasattr(got, "x"):
            for a, b in zip((got.x, got.y, got.z), (want.x, want.y, want.z)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Fused sky path: in-kernel gather addressing + single-pass epilogue
# ---------------------------------------------------------------------------

def _fused_setup(w=96, h=64, steps=48, **scene_kw):
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    scene = SceneConfig(max_steps=steps, **scene_kw)
    settings = RenderSettings(width=w, height=h, max_steps=steps, loop="while")
    sky = skybox_from_array(procedural_starfield(32, 64))
    cam = camera_state_from_pose((0.0, 5.0, -38.0), 0.0, -6.0)
    return scene, settings, sky, cam


@pytest.mark.slow
@pytest.mark.parametrize("ca_on", [False, True])
def test_fused_sky_frame_matches_xla(ca_on):
    """render_frame_pallas (fused sky addressing in-kernel, q4 row-gather /
    CA per-channel gathers, word pack) == the XLA reference path, to 1 LSB."""
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
    from relativisticraytracer_tpu.render.pipeline import render_frame

    scene, settings, sky, cam = _fused_setup()
    eff = CameraEffects(use_chromatic_aberration=1.0 if ca_on else 0.0)
    got = np.asarray(render_frame_pallas(
        scene, settings, cam, eff, 1.5, sky, interpret=INTERPRET))
    want = np.asarray(render_frame(scene, settings, cam, eff, 1.5, sky))
    assert got.shape == want.shape == (64, 96, 4)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.02


@pytest.mark.slow
def test_fused_sky_frame_nondivisible_and_kerr():
    """Block-padded odd frame + spin term through the fused path."""
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
    from relativisticraytracer_tpu.render.pipeline import render_frame

    scene, _, sky, cam = _fused_setup(steps=32, spin_a=0.9)
    settings = RenderSettings(width=100, height=70, max_steps=32, loop="while")
    eff = CameraEffects()
    got = np.asarray(render_frame_pallas(
        scene, settings, cam, eff, 0.5, sky, interpret=INTERPRET))
    want = np.asarray(render_frame(scene, settings, cam, eff, 0.5, sky))
    assert got.shape == (70, 100, 4)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1


@pytest.mark.slow
def test_fused_supersample_matches_xla():
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
    from relativisticraytracer_tpu.render.pipeline import render_frame

    scene, _, sky, cam = _fused_setup(steps=32)
    settings = RenderSettings(width=48, height=32, max_steps=32,
                              loop="while", supersample=2)
    eff = CameraEffects()
    got = np.asarray(render_frame_pallas(
        scene, settings, cam, eff, 1.0, sky, interpret=INTERPRET))
    want = np.asarray(render_frame(scene, settings, cam, eff, 1.0, sky))
    assert got.shape == (32, 48, 4)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1


@pytest.mark.slow
def test_fused_nosky_matches_xla():
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
    from relativisticraytracer_tpu.render.pipeline import render_frame

    scene, settings, _, cam = _fused_setup(steps=32)
    eff = CameraEffects()
    got = np.asarray(render_frame_pallas(
        scene, settings, cam, eff, 1.0, None, interpret=INTERPRET))
    want = np.asarray(render_frame(scene, settings, cam, eff, 1.0, None))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1


def test_pack_word_matches_pack_rgba8():
    """uint32 word pack + bitcast must reproduce pack_rgba8's RGBA byte
    order exactly (guards the little-endian bitcast assumption)."""
    from relativisticraytracer_tpu.core.vecmath import Vec3
    from relativisticraytracer_tpu.render.postfx import (
        pack_rgba8,
        pack_rgba8_word,
        word_to_rgba8,
    )

    rng = np.random.default_rng(7)
    ldr = Vec3(*[jnp.asarray(rng.uniform(-0.1, 1.2, (13, 17)),
                             dtype=jnp.float32) for _ in range(3)])
    a = np.asarray(pack_rgba8(ldr))
    b = np.asarray(word_to_rgba8(pack_rgba8_word(ldr)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_path_traces_under_outer_jit():
    """The CLI/Renderer path wraps render_frame_pallas in an OUTER jit —
    everything inside (incl. pad widths derived from block-padded dims)
    must stay static under tracing. Lowering alone exercises this
    (regression: jitted march_pallas_camera_sky once returned hp/wp ints,
    which became tracers feeding jnp.pad)."""
    import functools

    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas

    scene, settings, sky, cam = _fused_setup(w=64, h=32, steps=8)
    fn = functools.partial(
        render_frame_pallas, scene, settings, interpret=INTERPRET)
    out = jax.eval_shape(fn, cam, CameraEffects(), jnp.float32(1.0), sky)
    assert out.shape == (32, 64, 4) and out.dtype == jnp.uint8


@pytest.mark.slow
def test_fused_sky_without_fast_table():
    """q4=None (fast_table=False) must fall back to per-channel gathers and
    still match the XLA path."""
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
    from relativisticraytracer_tpu.render.pipeline import render_frame
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    scene = SceneConfig(max_steps=32, enable_clouds=False)
    settings = RenderSettings(width=64, height=32, max_steps=32, loop="while")
    sky = skybox_from_array(procedural_starfield(16, 32), fast_table=False)
    assert sky.q4 is None
    cam = camera_state_from_pose((0.0, 5.0, -38.0), 0.0, -6.0)
    eff = CameraEffects()
    got = np.asarray(render_frame_pallas(
        scene, settings, cam, eff, 1.0, sky, interpret=INTERPRET))
    want = np.asarray(render_frame(scene, settings, cam, eff, 1.0, sky))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
