"""Procedural volumetric media (reference: include/densities.h).

Two fields sampled during the march:
  * accretion disk (densities.h:20-62): cylindrical envelope, differential
    Keplerian rotation, 5-octave fbm, high-contrast streak shaping;
  * dust clouds (densities.h:69-132): smoothstep envelopes, differential
    shear, nested two-stage domain warping, 5-octave inline ridge noise,
    time-drifted detail fbm.

Branch-free transcriptions: every early `return 0` becomes a `jnp.where`
on the SAME predicate, evaluated after computing the full expression with
division-safe radii (masked lanes never make Inf/NaN).
"""

from __future__ import annotations

import jax.numpy as jnp

from relativisticraytracer_tpu.config import SceneConfig
from relativisticraytracer_tpu.core.fastmath import atan2
from relativisticraytracer_tpu.core.noise import fbm, noise3D
from relativisticraytracer_tpu.core.vecmath import Vec3, smoothstep

_R_EPS = 1e-6


def disk_temperature(scene: SceneConfig, r: jnp.ndarray) -> jnp.ndarray:
    """Shakura-Sunyaev T(r) = T_ref * (r/ISCO)^-0.75, zero inside the ISCO
    (reference: densities.h:12-15)."""
    safe_r = jnp.maximum(r, _R_EPS)
    t = scene.disk_temp_ref * (safe_r / scene.isco_radius) ** -0.75
    return jnp.where(r < scene.isco_radius, jnp.zeros_like(r), t)


# Upper bound of the disk streak factor (0.02 + 5*cloud, cloud clamped to 6,
# densities.h:59-61): density <= envelope * 30.02. Used to prove whole tiles
# can skip the 5-octave fbm without changing any pixel.
DISK_STREAK_MAX = 30.02


# smoothstep(a, b, x) >= 0.001 requires |x - a| >= t1*|b - a| with t1 the
# root of 3t^2 - 2t^3 = 0.001 (solved once, rounded UP so the excluded band
# is never overestimated after the 0.999 safety factors below).
_SMOOTHSTEP_T1 = 0.018377


def disk_probe_bounds(scene: SceneConfig):
    """Cheap per-step skip probe for the disk (static Python floats).

    Returns (k2, r_lo2, r_hi2): the disk can pass its 0.001 emission gate
    only where  y^4 * r_cyl^2 < k2  and  r_lo2 <= r_cyl^2 <= r_hi2.

    Derivation: d_disk <= envelope * DISK_STREAK_MAX, and in the annulus
    envelope <= exp(-y^2 / (2 h(r)^2 + 1e-7)) with the FLARING height
    h(r)^2 = disk_h^2 * isco / r (densities.h:32-33) — so the vertical band
    shrinks with radius: requiring emission > 0.001 forces
        y^2 * r < 2 * disk_h^2 * isco * L + 1e-7 * L * r     (L = ln 30020)
    which squares to the division-free probe y^4 * r_cyl^2 < k2 (both sides
    non-negative). At r = isco this equals the old constant band (~3.63 for
    the reference scene); at the outer edge it tightens to ~2.30. r_hi also
    folds the quadratic edge falloff (densities.h:25-30). Skipping on this
    probe is exact: False => the step contributes nothing."""
    import math

    big_l = math.log(DISK_STREAK_MAX / 0.001)
    # edge falloff: ef = (out - r)/(out - 0.85 out), need ef^2 * 30.02 > 0.001
    t0 = math.sqrt(0.001 / DISK_STREAK_MAX)
    r_hi = scene.disk_out_m * (1.0 - 0.15 * t0 * 0.999)
    k = (2.0 * scene.disk_h_m ** 2 * scene.isco_radius * big_l
         + 1e-7 * big_l * r_hi) * 1.0001
    k2 = k * k
    r_lo2 = (scene.isco_radius * 0.99999) ** 2
    r_hi2 = (r_hi * 1.00001) ** 2
    return k2, r_lo2, r_hi2


def cloud_probe_bounds(scene: SceneConfig):
    """Same idea for the clouds. Returns (k2, r_lo2, r_hi2): the cloud base
    can pass the reference's own 0.001 early-out (densities.h:85) only where
    y^10 * r_cyl^2 < k2  and  r_lo2 <= r_cyl^2 <= r_hi2.

    Vertical profile h(r) = 0.5 * cloud_h * (isco/r)^0.2 (densities.h:80-81)
    gives  y^2 * r^0.4 < C = 0.5 * cloud_h^2 * isco^0.4 * ln(1000) (+eps),
    which raised to the 5th power is the pow-free probe
    y^10 * r_cyl^2 < C^5. r_lo folds the inner smoothstep taper
    (isco -> isco+5, densities.h:77) and r_hi the outer smoothstep edge
    (0.8*disk_out -> disk_out, densities.h:74)."""
    import math

    big_l = math.log(1000.0)
    r_hi = scene.disk_out_m * (1.0 - 0.2 * _SMOOTHSTEP_T1 * 0.999)
    c = (0.5 * scene.cloud_h_m ** 2 * scene.isco_radius ** 0.4 * big_l
         + 1e-7 * big_l * r_hi ** 0.4) * 1.0001
    k2 = c ** 5
    r_lo = scene.isco_radius + 5.0 * _SMOOTHSTEP_T1 * 0.999
    r_lo2 = (r_lo * 0.99999) ** 2
    r_hi2 = (r_hi * 1.00001) ** 2
    return k2, r_lo2, r_hi2


def accretion_envelope(scene: SceneConfig, p: Vec3):
    """Stage 1 of the disk density: cheap analytic envelope
    (densities.h:25-35). Returns (envelope, in_annulus, r_cyl, safe_r)."""
    isco = scene.isco_radius
    disk_out = scene.disk_out_m

    r = jnp.sqrt(p.x * p.x + p.z * p.z)
    in_annulus = jnp.logical_and(r >= isco, r <= disk_out)
    safe_r = jnp.maximum(r, _R_EPS)

    edge_start = disk_out * 0.85
    ef = 1.0 - (r - edge_start) / (disk_out - edge_start)
    edge_falloff = jnp.where(r > edge_start, ef * ef, jnp.ones_like(r))

    local_h = scene.disk_h_m * jnp.sqrt(isco / safe_r)
    vertical_density = jnp.exp(-(p.y * p.y) / (2.0 * local_h * local_h + 1e-7))
    radial_density = (isco / safe_r) ** 0.4
    return vertical_density * radial_density * edge_falloff, in_annulus, r, safe_r


def accretion_streaks(scene: SceneConfig, p: Vec3, r, safe_r, time) -> jnp.ndarray:
    """Stage 2: the expensive rotating 5-octave fbm streak factor
    (densities.h:38-59). In (0.02, 30.02]."""
    isco = scene.isco_radius
    phi = atan2(p.z, p.x)
    t_r = isco / safe_r
    omega = 3.5 * (t_r * jnp.sqrt(t_r))  # x^1.5 = x*sqrt(x), no exp/log pow
    angle_rotated = phi - time * omega

    rot = Vec3(r * jnp.cos(angle_rotated), p.y * 4.0, r * jnp.sin(angle_rotated))
    evolution = time * 0.35
    noise_coords = Vec3(rot.x * 0.45, rot.y * 0.45 + evolution, rot.z * 0.45)
    n = fbm(noise_coords, scene.octaves(5))

    cloud = jnp.maximum(0.0, n - 0.32)
    cloud = (cloud * 2.8) ** 1.6
    cloud = jnp.minimum(6.0, cloud)
    return 0.02 + 5.0 * cloud


def accretion_density(scene: SceneConfig, p: Vec3, time) -> jnp.ndarray:
    """Accretion-disk gas density at BH-relative position p
    (reference: densities.h:20-62)."""
    envelope, in_annulus, r, safe_r = accretion_envelope(scene, p)
    out = envelope * accretion_streaks(scene, p, r, safe_r, time)
    return jnp.where(in_annulus, out, jnp.zeros_like(r))


def dust_base(scene: SceneConfig, p: Vec3):
    """Stage 1 of the cloud density: cheap analytic base envelope
    (densities.h:74-85). Returns (base, in_annulus, alive, r, safe_r) —
    `alive` is the reference's exact early-out (base < 0.001 -> density 0)."""
    isco = scene.isco_radius
    disk_out = scene.disk_out_m  # NB: the reference gates clouds on DISK_OUT_M too

    r = jnp.sqrt(p.x * p.x + p.z * p.z)
    in_annulus = jnp.logical_and(r >= isco, r <= disk_out)
    safe_r = jnp.maximum(r, _R_EPS)

    edge_falloff = smoothstep(disk_out, disk_out * 0.8, r)
    inner_taper = smoothstep(isco, isco + 5.0, r)
    local_h = scene.cloud_h_m * 0.5 * (isco / safe_r) ** 0.2
    vertical_profile = jnp.exp(-(p.y * p.y) / (2.0 * local_h * local_h + 1e-7))
    base = vertical_profile * edge_falloff * inner_taper
    alive = base >= 0.001
    return base, in_annulus, alive, r, safe_r


def dust_strands(scene: SceneConfig, p: Vec3, r, safe_r, time) -> jnp.ndarray:
    """Stage 2: the expensive warped multi-octave wisp factor
    (densities.h:88-128), including the final x12 gain."""
    isco = scene.isco_radius

    # 2. differential shearing (densities.h:88-90)
    phi = atan2(p.z, p.x)
    t_r = isco / safe_r
    omega = t_r * jnp.sqrt(t_r)
    angle_rot = phi - time * omega

    # 3. fluid domain warping (densities.h:93-108)
    coords = Vec3(r * 0.8, p.y * 15.0, angle_rot * 10.0)
    c15 = Vec3(coords.x * 0.15, coords.y * 0.15, coords.z * 0.15)
    w_oct = scene.octaves(2)
    w1 = Vec3(
        fbm(c15, w_oct),
        fbm(Vec3(c15.x + 1.0, c15.y + 2.0, c15.z + 3.0), w_oct),
        fbm(Vec3(c15.x + 4.0, c15.y + 5.0, c15.z + 6.0), w_oct),
    )
    w2c = Vec3(coords.x + w1.x * 3.0, coords.y + w1.y * 3.0, coords.z + w1.z * 3.0)
    w2c4 = Vec3(w2c.x * 0.4, w2c.y * 0.4, w2c.z * 0.4)
    w2 = Vec3(
        fbm(w2c4, w_oct),
        fbm(Vec3(w2c4.x + 2.0, w2c4.y + 1.0, w2c4.z + 0.0), w_oct),
        fbm(Vec3(w2c4.x + 0.0, w2c4.y + 3.0, w2c4.z + 1.0), w_oct),
    )
    fc = Vec3(coords.x + w2.x * 1.5, coords.y + w2.y * 1.5, coords.z + w2.z * 1.5)

    # 4. multi-octave wisps: inline ridge noise, lacunarity 2.1
    # (densities.h:111-120)
    n = jnp.zeros_like(r)
    amp = 1.0
    freq = 1.0
    for _ in range(scene.octaves(5)):
        noise_val = noise3D(Vec3(fc.x * freq, fc.y * freq, fc.z * freq))
        wisp = 1.0 - jnp.abs(noise_val * 2.0 - 1.0)
        n = n + wisp * amp
        amp *= 0.5
        freq *= 2.1

    # 5. contrast & transparency (densities.h:124-128)
    strands = smoothstep(0.4, 0.8, n * 0.55)
    s2 = strands * strands
    strands = s2 * s2  # x^4
    detail = fbm(Vec3(fc.x * 4.0, fc.y * 4.0 + time * 0.5, fc.z * 4.0), scene.octaves(2))
    strands = strands * (0.6 + 0.4 * detail)
    return strands * 12.0


def dust_cloud_density(scene: SceneConfig, p: Vec3, time) -> jnp.ndarray:
    """Large-scale dust-cloud density at BH-relative position p
    (reference: densities.h:69-132)."""
    base, in_annulus, alive, r, safe_r = dust_base(scene, p)
    out = base * dust_strands(scene, p, r, safe_r, time)
    zero = jnp.zeros_like(r)
    return jnp.where(jnp.logical_and(in_annulus, alive), out, zero)
