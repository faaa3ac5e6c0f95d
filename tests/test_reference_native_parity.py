"""Parity vs the reference's OWN COMPILED CODE.

Every other parity test in this suite compares against hand-transcribed
oracles (tests/oracle/numpy_ref.py). These tests remove that layer: the
reference's device headers and render kernel are compiled as C++ straight
from /root/reference (tests/oracle/ref_native) and the JAX framework is
checked against them — a shared transcription misreading cannot pass here.

Tolerances: the compiled oracle runs IEEE float32 with glibc libm;
JAX/XLA-CPU transcendentals (and the framework's deliberate hot-path
rewrites: rsqrt for 1/r^5, x*sqrt(x) for x^1.5, squaring for x^4,
polynomial atan2/asin) differ by ulps, which chaos-amplify through long
marches. Unit functions get tight gates; full frames get the BASELINE.json
north-star gate (RMSE < 1e-3) — measured parity is in fact bitwise-equal
uint8 output on these scenes.

Skipped cleanly when /root/reference or g++ is unavailable.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from relativisticraytracer_tpu.config import (  # noqa: E402
    CameraEffects,
    RenderSettings,
    SceneConfig,
    effects_off,
)
from relativisticraytracer_tpu.core import noise as jnoise  # noqa: E402
from relativisticraytracer_tpu.core.vecmath import Vec3, rotate_3d  # noqa: E402
from relativisticraytracer_tpu.media import densities as jdens  # noqa: E402
from relativisticraytracer_tpu.physics import geodesics as jgeo  # noqa: E402
from relativisticraytracer_tpu.physics import integrators as jint  # noqa: E402
from relativisticraytracer_tpu.render import postfx as jfx  # noqa: E402
from relativisticraytracer_tpu.render.camera import (  # noqa: E402
    camera_state_from_pose,
    generate_rays,
)
from relativisticraytracer_tpu.render.march import march  # noqa: E402
from relativisticraytracer_tpu.render.pipeline import Renderer  # noqa: E402
from relativisticraytracer_tpu.render.skybox import (  # noqa: E402
    procedural_starfield,
)
from tests.oracle import ref_native  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ref_native.available(),
    reason="reference tree or C++ compiler unavailable",
)

FRAME_STEPS = 500  # compiled into the oracle's kernel (config.h MAX_STEPS)

# The reference's CameraEffects defaults (camera_settings.h:4-17) as the
# oracle's fx9 vector: bloom on (0.8, 0.5), vignette on (0.4), CA off
# (0.005), lens distortion on (0.15).
FX_DEFAULT = [1, 0.8, 0.5, 1, 0.4, 0, 0.005, 1, 0.15]
FX_OFF = [0, 0.8, 0.5, 0, 0.4, 0, 0.005, 0, 0.15]


@pytest.fixture(scope="module")
def ref():
    return ref_native.load(max_steps=FRAME_STEPS)


@pytest.fixture(scope="module")
def ref_kerr():
    return ref_native.load(spin_a=0.9, max_steps=FRAME_STEPS)


def _vec(a: np.ndarray) -> Vec3:
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def _np3(v: Vec3) -> np.ndarray:
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], axis=-1)


def _points(rng, n=256, lo=-40.0, hi=40.0) -> np.ndarray:
    return rng.uniform(lo, hi, (n, 3)).astype(np.float32)


# ---------------------------------------------------------------- noise ---


def test_noise_stack_matches_compiled_reference(ref, rng):
    p = _points(rng)
    v = _vec(p)
    np.testing.assert_allclose(
        np.asarray(jnoise.hash31(v)), ref.hash31(p), rtol=0, atol=2e-5)
    np.testing.assert_allclose(
        _np3(jnoise.hash33(v)), ref.hash33(p), rtol=0, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jnoise.noise3D(v)), ref.noise3d(p), rtol=0, atol=2e-5)
    for octaves in (2, 5):
        np.testing.assert_allclose(
            np.asarray(jnoise.fbm(v, octaves)), ref.fbm(p, octaves),
            rtol=0, atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(jnoise.fbm_billow(v, octaves)),
            ref.fbm_billow(p, octaves), rtol=0, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(jnoise.worley3D(v)), ref.worley3d(p), rtol=0, atol=2e-5)


def test_rotate3d_matches_compiled_reference(ref, rng):
    p = _points(rng, n=64)
    axis = np.tile(
        np.asarray([0.26726124, 0.53452247, 0.80178368], np.float32), (64, 1))
    angle = rng.uniform(-6.0, 6.0, 64).astype(np.float32)
    got = _np3(rotate_3d(
        _vec(p),
        Vec3(jnp.asarray(axis[:, 0]), jnp.asarray(axis[:, 1]),
             jnp.asarray(axis[:, 2])),
        jnp.asarray(angle),
    ))
    np.testing.assert_allclose(got, ref.rotate3d(p, axis, angle),
                               rtol=0, atol=5e-5)


# -------------------------------------------------------------- physics ---


def _phys_points(rng, n=256):
    """Positions spanning inside-horizon to far field, unit-ish velocities."""
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(0.5, 80.0, (n, 1))
    p = (d * r).astype(np.float32)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return p, v.astype(np.float32)


@pytest.mark.parametrize("spin", [0.0, 0.9])
def test_geodesic_acc_matches_compiled_reference(ref, ref_kerr, rng, spin):
    oracle = ref if spin == 0.0 else ref_kerr
    scene = SceneConfig(spin_a=spin)
    p, v = _phys_points(rng)
    got = _np3(jgeo.geodesic_acc(scene, _vec(p), _vec(v)))
    want = oracle.geodesic_acc(p, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("spin", [0.0, 0.9])
def test_redshift_matches_compiled_reference(ref, ref_kerr, rng, spin):
    oracle = ref if spin == 0.0 else ref_kerr
    scene = SceneConfig(spin_a=spin)
    p, v = _phys_points(rng)
    got = np.asarray(jgeo.redshift_factor(scene, _vec(p), _vec(v)))
    want = oracle.redshift(p, v)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)


@pytest.mark.parametrize("spin", [0.0, 0.9])
def test_rk4_step_matches_compiled_reference(ref, ref_kerr, rng, spin):
    oracle = ref if spin == 0.0 else ref_kerr
    scene = SceneConfig(spin_a=spin)
    p, v = _phys_points(rng)
    # the four adaptive step sizes the march actually uses (raymarcher.cu:54-62)
    h = rng.choice(np.asarray([0.03, 0.09, 0.15, 0.3], np.float32), p.shape[0])
    got_p, got_v = jint.rk4_step(scene, _vec(p), _vec(v), jnp.asarray(h))
    want_p, want_v = oracle.rk4(p, v, h)
    np.testing.assert_allclose(_np3(Vec3(*got_p)), want_p, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(_np3(Vec3(*got_v)), want_v, rtol=2e-5, atol=1e-5)


def test_euler_step_matches_compiled_reference(ref, rng):
    scene = SceneConfig()
    p, v = _phys_points(rng)
    h = np.full(p.shape[0], 0.3, np.float32)
    got_p, got_v = jint.euler_step(scene, _vec(p), _vec(v), jnp.asarray(h))
    want_p, want_v = ref.euler(p, v, h)
    np.testing.assert_allclose(_np3(Vec3(*got_p)), want_p, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(_np3(Vec3(*got_v)), want_v, rtol=2e-5, atol=1e-5)


# ---------------------------------------------------------------- media ---


def _media_points(rng, n=512):
    """Points concentrated in the disk/cloud annulus where density is live."""
    phi = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(8.0, 28.0, n)
    y = rng.uniform(-2.0, 2.0, n)
    return np.stack(
        [r * np.cos(phi), y, r * np.sin(phi)], axis=-1).astype(np.float32)


def test_disk_temperature_matches_compiled_reference(ref, rng):
    scene = SceneConfig()
    r = rng.uniform(0.0, 40.0, 256).astype(np.float32)
    got = np.asarray(jdens.disk_temperature(scene, jnp.asarray(r)))
    np.testing.assert_allclose(got, ref.disk_temperature(r), rtol=2e-5)


@pytest.mark.parametrize("t", [0.0, 1.5, 7.25])
def test_accretion_density_matches_compiled_reference(ref, rng, t):
    scene = SceneConfig()
    p = _media_points(rng)
    got = np.asarray(jdens.accretion_density(scene, _vec(p), jnp.float32(t)))
    want = ref.accretion_density(p, t)
    # noise-coordinate ulp shifts pass through the streak contrast power;
    # gate absolute + relative with a small floor
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("t", [0.0, 1.5, 7.25])
def test_dust_density_matches_compiled_reference(ref, rng, t):
    scene = SceneConfig()
    p = _media_points(rng)
    got = np.asarray(jdens.dust_cloud_density(scene, _vec(p), jnp.float32(t)))
    want = ref.dust_density(p, t)
    # two-stage domain warp amplifies argument ulps harder than the disk
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


# -------------------------------------------------------------- post FX ---


def test_postfx_matches_compiled_reference(ref, rng):
    n = 256
    rgb = rng.uniform(0.0, 4.0, (n, 3)).astype(np.float32)
    uv = rng.uniform(-0.2, 1.2, (n, 2)).astype(np.float32)
    v_rgb = _vec(rgb)

    got = _np3(jfx.apply_vignette(
        v_rgb, jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]), 0.4))
    np.testing.assert_allclose(got, ref.vignette(rgb, uv, 0.4),
                               rtol=1e-5, atol=1e-6)

    gx, gy = jfx.apply_lens_distortion(
        jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]), 0.15)
    want_uv = ref.lens_distortion(uv, 0.15)
    np.testing.assert_allclose(
        np.stack([np.asarray(gx), np.asarray(gy)], -1), want_uv,
        rtol=1e-6, atol=1e-7)

    got = _np3(jfx.bloom_contribution(v_rgb, 0.8))
    np.testing.assert_allclose(got, ref.bloom(rgb, 0.8), rtol=0, atol=0)


# ------------------------------------------------------------ ray march ---


@pytest.mark.parametrize("spin", [0.0, 0.9])
def test_march_matches_compiled_reference(ref, ref_kerr, spin):
    """Full-budget march state parity on a fan of rays crossing the scene.

    Rays that terminate identically must agree on hit flags and
    transmittance; positions drift by chaos-amplified ulps (gate: 2e-3,
    matching test_march's oracle tolerance)."""
    oracle = ref if spin == 0.0 else ref_kerr
    scene = SceneConfig(spin_a=spin)
    cam = camera_state_from_pose((0.0, 6.0, -45.0), 0.0, -6.0)
    w, h = 8, 6
    origin, direction, _, _ = generate_rays(w, h, cam, effects_off())
    state = march(scene, origin, direction, jnp.float32(1.5), max_steps=600)

    pos = _np3(origin).reshape(-1, 3)
    dirs = _np3(direction).reshape(-1, 3)
    got_p = _np3(state.p).reshape(-1, 3)
    got_i = _np3(state.intensity).reshape(-1, 3)
    got_t = np.asarray(state.transmittance).reshape(-1)
    got_hit = np.asarray(state.hit_horizon).reshape(-1)

    mismatched = 0
    for i in range(pos.shape[0]):
        rp, rv, ri, rt, rhit, _ = oracle.march_ray(pos[i], dirs[i], 1.5, 600)
        if rhit != bool(got_hit[i]):
            mismatched += 1  # knife-edge photon-ring rays may differ
            continue
        np.testing.assert_allclose(got_p[i], rp, rtol=0, atol=2e-3,
                                   err_msg=f"ray {i} position")
        np.testing.assert_allclose(got_t[i], rt, rtol=1e-3, atol=1e-4,
                                   err_msg=f"ray {i} transmittance")
        np.testing.assert_allclose(got_i[i], ri, rtol=2e-3, atol=2e-4,
                                   err_msg=f"ray {i} intensity")
    assert mismatched <= 1, f"{mismatched} rays disagree on capture"


# ----------------------------------------------------------- full frame ---


def _frame_pair(oracle, scene, time, pose, sky, effects_on=True,
                size=(96, 64)):
    w, h = size
    cam = camera_state_from_pose(*pose)
    cam12 = np.concatenate([np.asarray(cam.pos), np.asarray(cam.forward),
                            np.asarray(cam.right), np.asarray(cam.up)])
    want = oracle.render_frame(
        w, h, time, cam12, FX_DEFAULT if effects_on else FX_OFF, sky
    )[::-1]  # the kernel writes bottom-up for OpenGL (raymarcher.cu:168-173)

    settings = RenderSettings(width=w, height=h, max_steps=FRAME_STEPS,
                              loop="while")
    r = Renderer(scene, settings, skybox_rgba=sky)
    got = r.render_np(cam, CameraEffects() if effects_on else effects_off(),
                      time)
    return got, want


def _gate(got, want, rmse_budget=1e-3, max_u8=2):
    d = got[..., :3].astype(np.float32) / 255 - want[..., :3].astype(np.float32) / 255
    rmse = float(np.sqrt(np.mean(d * d)))
    assert rmse < rmse_budget, f"RMSE {rmse} vs compiled reference"
    assert np.abs(d).max() * 255 <= max_u8, "outlier pixel vs compiled reference"
    np.testing.assert_array_equal(got[..., 3], 255)


@pytest.fixture(scope="module")
def sky():
    return procedural_starfield(64, 128)


def test_full_frame_schwarzschild_matches_compiled_reference(ref, sky):
    """Full scene (disk + clouds + skybox + default FX) through the
    reference's unmodified raymarch_kernel — the north-star parity gate."""
    got, want = _frame_pair(
        ref, SceneConfig(max_steps=FRAME_STEPS), 1.5,
        ((0.0, 6.0, -45.0), 0.0, -6.0), sky)
    _gate(got, want)


def test_full_frame_kerr_matches_compiled_reference(ref_kerr, sky):
    got, want = _frame_pair(
        ref_kerr, SceneConfig(spin_a=0.9, max_steps=FRAME_STEPS), 4.0,
        ((10.0, 4.0, -40.0), -12.0, -4.0), sky)
    _gate(got, want)


def test_full_frame_no_effects_black_bg_matches_compiled_reference(ref):
    """Effects off, no skybox: isolates march + media + tone map."""
    got, want = _frame_pair(
        ref, SceneConfig(max_steps=FRAME_STEPS), 2.5,
        ((0.0, 10.0, -60.0), 0.0, -10.0), None, effects_on=False)
    _gate(got, want)


@pytest.mark.slow
def test_full_frame_larger_offaxis_matches_compiled_reference(ref, sky):
    """A 192x108 frame (3.4x the pixel count of the other cases) from an
    off-axis pose below the disk plane — scale-up insurance that the
    96x64 gates aren't hiding resolution-dependent divergence (ray-gen
    UV math, aspect handling, FX uv terms all depend on w/h)."""
    got, want = _frame_pair(
        ref, SceneConfig(max_steps=FRAME_STEPS), 7.0,
        ((-18.0, -5.0, -38.0), 18.0, 4.0), sky, size=(192, 108))
    _gate(got, want)
