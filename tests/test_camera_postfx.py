"""Camera basis / ray-gen / post-FX parity (reference: src/main.cpp:141-167,
src/raymarcher.cu:20-34,152-173, include/camera_effects/post_processing.h)."""

import numpy as np

import jax.numpy as jnp

from relativisticraytracer_tpu.config import CameraEffects, effects_off
from relativisticraytracer_tpu.core.vecmath import Vec3
from relativisticraytracer_tpu.render.camera import (
    camera_state_from_pose,
    default_camera,
    generate_rays,
)
from relativisticraytracer_tpu.render.postfx import (
    apply_effects_and_tonemap,
    apply_lens_distortion,
    apply_vignette,
    bloom_contribution,
    pack_rgba8,
    tonemap,
)
from tests.oracle import numpy_ref as oracle


def test_camera_basis_matches_oracle():
    for pos, yaw, pitch in [
        ((0.0, 10.0, -60.0), 0.0, -10.0),
        ((15.0, 3.0, -30.0), -26.6, -5.1),
        ((4.2, 0.6, 4.2), -90.0, -5.7),
        ((-20.0, 8.0, -20.0), 20.0, -10.0),
    ]:
        cs = camera_state_from_pose(pos, yaw, pitch)
        wpos, wfwd, wright, wup = oracle.camera_basis(pos, yaw, pitch)
        np.testing.assert_allclose(np.asarray(cs.pos), wpos, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cs.forward), wfwd, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cs.right), wright, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cs.up), wup, atol=1e-6)
        # Orthonormality
        f, r, u = np.asarray(cs.forward), np.asarray(cs.right), np.asarray(cs.up)
        for a, b in [(f, r), (f, u), (r, u)]:
            assert abs(np.dot(a, b)) < 1e-5


def test_ray_gen_matches_oracle_no_distortion():
    w, h = 20, 14
    cam = default_camera()
    eff = effects_off()
    origin, rd, uvx, uvy = generate_rays(w, h, cam, eff)
    pos, fwd, right, up = oracle.camera_basis((0.0, 10.0, -60.0), 0.0, -10.0)
    for (x, y) in [(0, 0), (19, 0), (0, 13), (10, 7), (3, 11)]:
        _, want_rd, want_uv = oracle.gen_ray(x, y, w, h, pos, fwd, right, up)
        got = np.array(
            [float(rd.x[y, x]), float(rd.y[y, x]), float(rd.z[y, x])], dtype=np.float32
        )
        np.testing.assert_allclose(got, want_rd, atol=1e-6)
        np.testing.assert_allclose(
            [float(uvx[y, x]), float(uvy[y, x])], want_uv, atol=1e-7
        )


def test_ray_gen_matches_oracle_with_distortion():
    w, h = 16, 12
    cam = default_camera()
    eff = CameraEffects()  # lens distortion ON by default, amount 0.15
    origin, rd, uvx, uvy = generate_rays(w, h, cam, eff)
    pos, fwd, right, up = oracle.camera_basis((0.0, 10.0, -60.0), 0.0, -10.0)
    for (x, y) in [(0, 0), (15, 11), (8, 6)]:
        _, want_rd, want_uv = oracle.gen_ray(
            x, y, w, h, pos, fwd, right, up,
            use_lens_distortion=True, distortion_amount=0.15,
        )
        got = np.array(
            [float(rd.x[y, x]), float(rd.y[y, x]), float(rd.z[y, x])], dtype=np.float32
        )
        np.testing.assert_allclose(got, want_rd, atol=1e-6)
        np.testing.assert_allclose(
            [float(uvx[y, x]), float(uvy[y, x])], want_uv, atol=1e-6
        )


def test_lens_distortion_matches_oracle(rng):
    uv = rng.random((64, 2), dtype=np.float32)
    gx, gy = apply_lens_distortion(jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]), 0.15)
    want = oracle.apply_lens_distortion(uv, 0.15)
    np.testing.assert_allclose(np.asarray(gx), want[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), want[:, 1], atol=1e-6)


def test_vignette_matches_oracle(rng):
    uv = rng.random((32, 2), dtype=np.float32)
    col = rng.random((32, 3), dtype=np.float32) * 3.0
    got = apply_vignette(
        Vec3(jnp.asarray(col[:, 0]), jnp.asarray(col[:, 1]), jnp.asarray(col[:, 2])),
        jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]), 0.4,
    )
    want = oracle.apply_vignette(col, uv, 0.4)
    for i, g in enumerate([got.x, got.y, got.z]):
        np.testing.assert_allclose(np.asarray(g), want[:, i], atol=1e-6)


def test_bloom_matches_oracle(rng):
    col = rng.random((64, 3), dtype=np.float32) * 2.0
    got = bloom_contribution(
        Vec3(jnp.asarray(col[:, 0]), jnp.asarray(col[:, 1]), jnp.asarray(col[:, 2])), 0.8
    )
    want = oracle.get_bloom_contribution(col, 0.8)
    for i, g in enumerate([got.x, got.y, got.z]):
        np.testing.assert_allclose(np.asarray(g), want[:, i], atol=0)


def test_tonemap_matches_oracle(rng):
    col = rng.random((64, 3), dtype=np.float32) * 5.0
    got = tonemap(
        Vec3(jnp.asarray(col[:, 0]), jnp.asarray(col[:, 1]), jnp.asarray(col[:, 2])), 0.8
    )
    want = oracle.tonemap(col)
    for i, g in enumerate([got.x, got.y, got.z]):
        np.testing.assert_allclose(np.asarray(g), want[:, i], atol=1e-5)


def test_full_epilogue_matches_oracle(rng):
    """apply_effects_and_tonemap == reference epilogue (raymarcher.cu:152-166)."""
    n = 128
    hdr = (rng.random((n, 3), dtype=np.float32) * 4.0).astype(np.float32)
    uv = rng.random((n, 2), dtype=np.float32)
    eff = CameraEffects()  # bloom + vignette on
    got = apply_effects_and_tonemap(
        Vec3(jnp.asarray(hdr[:, 0]), jnp.asarray(hdr[:, 1]), jnp.asarray(hdr[:, 2])),
        jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]), eff, 0.8,
    )
    bloom = oracle.get_bloom_contribution(hdr, 0.8)
    want_hdr = (hdr + bloom * np.float32(0.5)).astype(np.float32)
    want_hdr = oracle.apply_vignette(want_hdr, uv, 0.4)
    want = oracle.tonemap(want_hdr)
    for i, g in enumerate([got.x, got.y, got.z]):
        np.testing.assert_allclose(np.asarray(g), want[:, i], atol=1e-5)


def test_pack_rgba8_truncates_like_c_cast():
    vals = jnp.asarray(np.array([0.0, 0.24999, 0.5, 0.999999], dtype=np.float32))
    packed = pack_rgba8(Vec3(vals, vals, vals))
    got = np.asarray(packed)[..., 0]
    want = (np.asarray(vals) * 255).astype(np.uint8)  # trunc toward zero
    np.testing.assert_array_equal(got, want)
    assert np.all(np.asarray(packed)[..., 3] == 255)
