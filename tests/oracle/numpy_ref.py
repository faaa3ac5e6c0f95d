"""Independent NumPy float32 oracle, transcribed line-by-line from the
CUDA reference (/root/reference). Used ONLY by tests, as the ground truth
the JAX implementation must match.

Written deliberately in a different style from the JAX code (array-of-struct
(..., 3) vectors, imperative march loop over a handful of scalar rays) so a
transcription mistake in one implementation is unlikely to be mirrored in
the other.

NumPy >= 2 weak-scalar promotion keeps float32 when mixing with Python
floats, which matches CUDA float arithmetic for our purposes.
"""

from __future__ import annotations

import numpy as np

F = np.float32

# --- config.h constants ---
EVENT_HORIZON = F(2.0)
MASS_POS = np.zeros(3, dtype=np.float32)
SPIN_A = F(0.0)
SPIN_AXIS = np.array([0.0, 1.0, 0.0], dtype=np.float32)
ISCO_RADIUS = F(10.0)
DISK_OUT_M = F(25.0)
DISK_H_M = F(0.8)
DISK_LUMINOSITY = F(6.0)
DISK_OPACITY = F(0.4)
EXPOSURE = F(0.8)
CLOUD_H_M = F(0.5)
CLOUD_OUT_M = F(25.0)
CLOUD_OPACITY = F(0.3)
CLOUD_LUMINOSITY = F(0.4)
STEP_SIZE_M = F(0.3)
DISK_TEMP_REF = F(1.5e7)
PI = F(3.1415926535)


# --- math_utils.h ---

def dot(a, b):
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def cross(a, b):
    return np.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    ).astype(np.float32)


def length(v):
    return np.sqrt(dot(v, v)).astype(np.float32)


def normalize(v):
    mag = length(v)[..., None]
    out = np.where(mag < 1e-6, np.float32(0.0), v / np.where(mag == 0, F(1), mag))
    return out.astype(np.float32)


def lerp(a, b, t):
    return (a + t * (b - a)).astype(np.float32)


def smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0).astype(np.float32)
    return (t * t * (3.0 - 2.0 * t)).astype(np.float32)


def rotate_3d(p, axis, angle):
    s = np.sin(F(angle))
    c = np.cos(F(angle))
    oc = F(1.0) - c
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    x = (oc * ax * ax + c) * p[..., 0] + (oc * ax * ay - az * s) * p[..., 1] + (oc * az * ax + ay * s) * p[..., 2]
    y = (oc * ax * ay + az * s) * p[..., 0] + (oc * ay * ay + c) * p[..., 1] + (oc * ay * az - ax * s) * p[..., 2]
    z = (oc * az * ax - ay * s) * p[..., 0] + (oc * ay * az + ax * s) * p[..., 1] + (oc * az * az + c) * p[..., 2]
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def hash33(p):
    # math_utils.h:65-71 (sequential component updates)
    x = np.fmod(p[..., 0] * F(0.1031), F(1.0))
    y = np.fmod(p[..., 1] * F(0.1031), F(1.0))
    z = np.fmod(p[..., 2] * F(0.1031), F(1.0))
    x = x + (x * (y + F(33.33)) + y * (z + F(33.33)) + z * (x + F(33.33)))
    y = y + (x * (x + F(33.33)) + y * (z + F(33.33)) + z * (y + F(33.33)))
    z = z + (x * (x + F(33.33)) + y * (y + F(33.33)) + z * (z + F(33.33)))
    return np.stack(
        [
            np.fmod((x + y) * z, F(1.0)),
            np.fmod((x + z) * y, F(1.0)),
            np.fmod((y + z) * x, F(1.0)),
        ],
        axis=-1,
    ).astype(np.float32)


def hash31(p):
    # math_utils.h:91-96
    x = np.fmod(p[..., 0] * F(0.1031), F(1.0))
    y = np.fmod(p[..., 1] * F(0.1031), F(1.0))
    z = np.fmod(p[..., 2] * F(0.1031), F(1.0))
    d = x * (y + F(33.33)) + y * (z + F(33.33)) + z * (x + F(33.33))
    x = x + d
    y = y + d
    z = z + d
    return np.fmod((x + y) * z, F(1.0)).astype(np.float32)


def noise3D(p):
    # math_utils.h:98-110
    i = np.floor(p).astype(np.float32)
    f = (p - i).astype(np.float32)
    u = (f * f * (F(3.0) - F(2.0) * f)).astype(np.float32)

    def h(cx, cy, cz):
        c = np.zeros_like(i)
        c[..., 0] = cx
        c[..., 1] = cy
        c[..., 2] = cz
        return hash31((i + c).astype(np.float32))

    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    return lerp(
        lerp(lerp(h(0, 0, 0), h(1, 0, 0), ux), lerp(h(0, 1, 0), h(1, 1, 0), ux), uy),
        lerp(lerp(h(0, 0, 1), h(1, 0, 1), ux), lerp(h(0, 1, 1), h(1, 1, 1), ux), uy),
        uz,
    )


def fbm(p, octaves):
    # math_utils.h:112-121
    v = np.zeros(p.shape[:-1], dtype=np.float32)
    a = F(0.5)
    p = p.astype(np.float32)
    for _ in range(octaves):
        v = (v + a * noise3D(p)).astype(np.float32)
        p = (p * F(2.05) + F(10.0)).astype(np.float32)
        a = F(a * F(0.5))
    return v


def fbm_billow(p, octaves):
    # math_utils.h:123-133
    v = np.zeros(p.shape[:-1], dtype=np.float32)
    a = F(0.5)
    p = p.astype(np.float32)
    for _ in range(octaves):
        n = noise3D(p)
        v = (v + a * (F(1.0) - np.abs(n * F(2.0) - F(1.0)))).astype(np.float32)
        p = (p * F(2.05) + F(10.0)).astype(np.float32)
        a = F(a * F(0.5))
    return v


def worley3D(p):
    # math_utils.h:73-89
    i = np.floor(p).astype(np.float32)
    f = (p - i).astype(np.float32)
    min_dist = np.full(p.shape[:-1], F(1.0), dtype=np.float32)
    for z in (-1, 0, 1):
        for y in (-1, 0, 1):
            for x in (-1, 0, 1):
                nb = np.array([x, y, z], dtype=np.float32)
                point = hash33((i + nb).astype(np.float32))
                diff = ((nb + point) - f).astype(np.float32)
                min_dist = np.minimum(min_dist, length(diff))
    return min_dist


# --- geodesics.h ---

def get_geodesic_acc(p_rel, v, spin_a=SPIN_A, spin_axis=SPIN_AXIS):
    # geodesics.h:30-45
    r2 = dot(p_rel, p_rel)
    r = np.sqrt(r2).astype(np.float32)
    l_vec = cross(p_rel, v)
    l2 = dot(l_vec, l_vec)
    with np.errstate(divide="ignore", invalid="ignore"):
        radial_mag = (F(-1.5) * EVENT_HORIZON * l2 / (r2 * r2 * r)).astype(np.float32)
        radial_acc = p_rel * radial_mag[..., None]
        drag_dir = cross(np.broadcast_to(spin_axis, p_rel.shape).astype(np.float32), p_rel)
        drag_strength = ((F(2.0) * F(spin_a) * EVENT_HORIZON) / (r2 * r)).astype(np.float32)
        acc = radial_acc + drag_dir * drag_strength[..., None]
    inside = (r < EVENT_HORIZON * F(0.5))[..., None]
    return np.where(inside, np.float32(0.0), acc).astype(np.float32)


def calculate_redshift_factor(p_rel, ray_vel, spin_a=SPIN_A):
    # geodesics.h:11-25
    r = length(p_rel)
    with np.errstate(divide="ignore", invalid="ignore"):
        g_gravity = np.sqrt(np.maximum(F(1.0) - EVENT_HORIZON / r, F(0.0))).astype(np.float32)
        v_mag = (F(1.0) / (np.power(r, F(1.5)) + F(spin_a))).astype(np.float32)
        gas_dir = normalize(
            np.stack([-p_rel[..., 2], np.zeros_like(r), p_rel[..., 0]], axis=-1).astype(np.float32)
        )
        cos_theta = dot(ray_vel, gas_dir)
        gamma = (F(1.0) / np.sqrt(F(1.0) - v_mag * v_mag)).astype(np.float32)
        g_doppler = (F(1.0) / (gamma * (F(1.0) - v_mag * cos_theta))).astype(np.float32)
        g = (g_gravity * g_doppler).astype(np.float32)
    return np.where(r < EVENT_HORIZON * F(1.01), np.float32(0.0), g).astype(np.float32)


# --- integrators.h ---

def integrate_euler(p, v, h, spin_a=SPIN_A):
    rel_p = (p - MASS_POS).astype(np.float32)
    acc = get_geodesic_acc(rel_p, v, spin_a)
    return (p + v * h).astype(np.float32), (v + acc * h).astype(np.float32)


def integrate_rk4(p, v, h, spin_a=SPIN_A):
    # integrators.h:23-59
    h = F(h) if np.isscalar(h) else np.asarray(h, dtype=np.float32)
    hh = np.asarray(h, dtype=np.float32)[..., None] if np.ndim(h) else F(h)
    p0, v0 = p.astype(np.float32), v.astype(np.float32)

    kv1 = get_geodesic_acc((p0 - MASS_POS).astype(np.float32), v0, spin_a)
    kp1 = v0

    v2 = (v0 + kv1 * (hh * F(0.5))).astype(np.float32)
    kv2 = get_geodesic_acc((p0 + kp1 * (hh * F(0.5)) - MASS_POS).astype(np.float32), v2, spin_a)
    kp2 = v2

    v3 = (v0 + kv2 * (hh * F(0.5))).astype(np.float32)
    kv3 = get_geodesic_acc((p0 + kp2 * (hh * F(0.5)) - MASS_POS).astype(np.float32), v3, spin_a)
    kp3 = v3

    v4 = (v0 + kv3 * hh).astype(np.float32)
    kv4 = get_geodesic_acc((p0 + kp3 * hh - MASS_POS).astype(np.float32), v4, spin_a)
    kp4 = v4

    kv_sum = (kv1 + (kv2 * F(2.0) + (kv3 * F(2.0) + kv4))).astype(np.float32)
    kp_sum = (kp1 + (kp2 * F(2.0) + (kp3 * F(2.0) + kp4))).astype(np.float32)
    return (p + kp_sum * (hh / F(6.0))).astype(np.float32), (
        v + kv_sum * (hh / F(6.0))
    ).astype(np.float32)


# --- densities.h ---

def get_disk_temperature(r):
    # densities.h:12-15
    r = np.asarray(r, dtype=np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (DISK_TEMP_REF * np.power(r / ISCO_RADIUS, F(-0.75))).astype(np.float32)
    return np.where(r < ISCO_RADIUS, np.float32(0.0), t).astype(np.float32)


def get_accretion_density(p, time):
    # densities.h:20-62
    p = np.asarray(p, dtype=np.float32)
    time = F(time)
    r = np.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2).astype(np.float32)
    gate = np.logical_and(r >= ISCO_RADIUS, r <= DISK_OUT_M)
    rs = np.maximum(r, F(1e-6))

    edge_start = F(DISK_OUT_M * F(0.85))
    ef = (F(1.0) - (r - edge_start) / (DISK_OUT_M - edge_start)).astype(np.float32)
    edge_falloff = np.where(r > edge_start, ef * ef, F(1.0)).astype(np.float32)

    local_h = (DISK_H_M * np.power(ISCO_RADIUS / rs, F(0.5))).astype(np.float32)
    vertical = np.exp(-(p[..., 1] ** 2) / (F(2.0) * local_h * local_h + F(1e-7))).astype(np.float32)
    radial = np.power(ISCO_RADIUS / rs, F(0.4)).astype(np.float32)
    base_envelope = (vertical * radial * edge_falloff).astype(np.float32)

    phi = np.arctan2(p[..., 2], p[..., 0]).astype(np.float32)
    omega = (F(3.5) * np.power(ISCO_RADIUS / rs, F(1.5))).astype(np.float32)
    ang = (phi - time * omega).astype(np.float32)
    rot = np.stack([r * np.cos(ang), p[..., 1] * F(4.0), r * np.sin(ang)], axis=-1).astype(np.float32)
    nc = (rot * F(0.45)).astype(np.float32)
    nc[..., 1] = nc[..., 1] + time * F(0.35)
    n = fbm(nc, 5)

    cloud = np.maximum(F(0.0), n - F(0.32)).astype(np.float32)
    cloud = np.power(cloud * F(2.8), F(1.6)).astype(np.float32)
    cloud = np.minimum(F(6.0), cloud).astype(np.float32)

    out = (base_envelope * (F(0.02) + F(5.0) * cloud)).astype(np.float32)
    return np.where(gate, out, np.float32(0.0)).astype(np.float32)


def get_dust_cloud_density(p, time):
    # densities.h:69-132
    p = np.asarray(p, dtype=np.float32)
    time = F(time)
    r = np.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2).astype(np.float32)
    gate = np.logical_and(r >= ISCO_RADIUS, r <= DISK_OUT_M)
    rs = np.maximum(r, F(1e-6))

    edge_falloff = smoothstep(DISK_OUT_M, F(DISK_OUT_M * F(0.8)), r)
    inner_taper = smoothstep(ISCO_RADIUS, F(ISCO_RADIUS + F(5.0)), r)
    local_h = (CLOUD_H_M * F(0.5) * np.power(ISCO_RADIUS / rs, F(0.2))).astype(np.float32)
    vertical = np.exp(-(p[..., 1] ** 2) / (F(2.0) * local_h * local_h + F(1e-7))).astype(np.float32)
    base = (vertical * edge_falloff * inner_taper).astype(np.float32)
    alive = base >= F(0.001)

    phi = np.arctan2(p[..., 2], p[..., 0]).astype(np.float32)
    omega = (F(1.0) * np.power(ISCO_RADIUS / rs, F(1.5))).astype(np.float32)
    ang = (phi - time * omega).astype(np.float32)

    coords = np.stack([r * F(0.8), p[..., 1] * F(15.0), ang * F(10.0)], axis=-1).astype(np.float32)
    c = (coords * F(0.15)).astype(np.float32)
    w1 = np.stack(
        [
            fbm(c, 2),
            fbm((c + np.array([1, 2, 3], dtype=np.float32)).astype(np.float32), 2),
            fbm((c + np.array([4, 5, 6], dtype=np.float32)).astype(np.float32), 2),
        ],
        axis=-1,
    ).astype(np.float32)
    w2c = ((coords + w1 * F(3.0)) * F(0.4)).astype(np.float32)
    w2 = np.stack(
        [
            fbm(w2c, 2),
            fbm((w2c + np.array([2, 1, 0], dtype=np.float32)).astype(np.float32), 2),
            fbm((w2c + np.array([0, 3, 1], dtype=np.float32)).astype(np.float32), 2),
        ],
        axis=-1,
    ).astype(np.float32)
    fc = (coords + w2 * F(1.5)).astype(np.float32)

    n = np.zeros(p.shape[:-1], dtype=np.float32)
    amp = F(1.0)
    freq = F(1.0)
    for _ in range(5):
        nv = noise3D((fc * freq).astype(np.float32))
        wisp = (F(1.0) - np.abs(nv * F(2.0) - F(1.0))).astype(np.float32)
        n = (n + wisp * amp).astype(np.float32)
        amp = F(amp * F(0.5))
        freq = F(freq * F(2.1))

    strands = smoothstep(F(0.4), F(0.8), (n * F(0.55)).astype(np.float32))
    strands = np.power(strands, F(4.0)).astype(np.float32)
    detail_c = (fc * F(4.0)).astype(np.float32)
    detail_c[..., 1] = detail_c[..., 1] + time * F(0.5)
    detail = fbm(detail_c, 2)
    strands = (strands * (F(0.6) + F(0.4) * detail)).astype(np.float32)

    out = (base * strands * F(12.0)).astype(np.float32)
    return np.where(np.logical_and(gate, alive), out, np.float32(0.0)).astype(np.float32)


# --- post_processing.h ---

def apply_lens_distortion(uv, k):
    t = (uv - F(0.5)).astype(np.float32)
    r2 = (t[..., 0] ** 2 + t[..., 1] ** 2).astype(np.float32)
    f = (F(1.0) + r2 * F(k)).astype(np.float32)
    return (t * f[..., None] + F(0.5)).astype(np.float32)


def apply_vignette(color, uv, intensity):
    d = np.sqrt((uv[..., 0] - F(0.5)) ** 2 + (uv[..., 1] - F(0.5)) ** 2).astype(np.float32)
    v = smoothstep(F(0.8), F(0.2), (d * F(intensity)).astype(np.float32))
    return (color * v[..., None]).astype(np.float32)


def get_bloom_contribution(color, threshold):
    brightness = (
        color[..., 0] * F(0.2126) + color[..., 1] * F(0.7152) + color[..., 2] * F(0.0722)
    ).astype(np.float32)
    return np.where((brightness > F(threshold))[..., None], color, np.float32(0.0)).astype(np.float32)


def tonemap(c):
    return (F(1.0) - np.exp(-c * EXPOSURE)).astype(np.float32)


# --- camera_paths.cpp ---

def catmull_rom(p0, p1, p2, p3, t):
    p0, p1, p2, p3 = (np.asarray(x, dtype=np.float32) for x in (p0, p1, p2, p3))
    t = F(t)
    t2 = F(t * t)
    t3 = F(t2 * t)
    return (
        F(0.5)
        * (
            (F(2.0) * p1)
            + (-p0 + p2) * t
            + (F(2.0) * p0 - F(5.0) * p1 + F(4.0) * p2 - p3) * t2
            + (-p0 + F(3.0) * p1 - F(3.0) * p2 + p3) * t3
        )
    ).astype(np.float32)


def lerp_angle(a, b, t):
    diff = np.fmod(F(b) - F(a) + F(180.0), F(360.0)) - F(180.0)
    if diff < F(-180.0):
        diff = diff + F(360.0)
    return F(F(a) + diff * F(t))


# --- scalar march (raymarcher.cu:15-173), a handful of rays at a time ---

def march_ray(
    p, v, time, max_steps,
    enable_disk=True, enable_clouds=True, spin_a=SPIN_A,
):
    """Scalar transcription of the march loop for ONE ray. Returns
    (p, v, intensity[3], transmittance, hit_horizon, steps_taken)."""
    p = np.asarray(p, dtype=np.float32).copy()
    v = np.asarray(v, dtype=np.float32).copy()
    time = F(time)
    intensity = np.zeros(3, dtype=np.float32)
    transmittance = F(1.0)
    hit_horizon = False

    for i in range(max_steps):
        rel_p = (p - MASS_POS).astype(np.float32)
        r2 = dot(rel_p, rel_p)
        r = F(np.sqrt(r2))

        if r < EVENT_HORIZON * F(1.01):
            hit_horizon = True
            transmittance = F(0.0)
            return p, v, intensity, transmittance, hit_horizon, i

        current_h = STEP_SIZE_M
        near_bh = r < F(18.0)
        in_disk_zone = abs(rel_p[1]) < DISK_H_M * F(5.0) and r < DISK_OUT_M + F(5.0)
        in_cloud_zone = abs(rel_p[1]) < CLOUD_H_M * F(1.5) and r < CLOUD_OUT_M
        if near_bh:
            current_h = F(current_h * F(0.1))
        elif in_disk_zone:
            current_h = F(current_h * F(0.3))
        elif in_cloud_zone:
            current_h = F(current_h * F(0.5))

        p, v = integrate_rk4(p, v, current_h, spin_a)

        if in_disk_zone or in_cloud_zone:
            d_disk = F(get_accretion_density(rel_p, time)) if (in_disk_zone and enable_disk) else F(0.0)
            d_cloud = F(get_dust_cloud_density(rel_p, time)) if (in_cloud_zone and enable_clouds) else F(0.0)

            if d_disk > F(0.001) or d_cloud > F(0.001):
                step_emit = np.zeros(3, dtype=np.float32)
                step_opacity = F(0.0)

                if d_disk > F(0.001):
                    g = F(calculate_redshift_factor(rel_p, v, spin_a))
                    t_temp = F(get_disk_temperature(r))
                    t_norm = F(np.power(t_temp / DISK_TEMP_REF, F(0.5)))
                    bol_i = F(np.power(g, F(4.0)) * t_norm * d_disk * DISK_LUMINOSITY)
                    color_t = F(g * np.power(t_temp / DISK_TEMP_REF, F(0.4)) * F(2.5))
                    step_emit[0] += F(1.0) * bol_i
                    step_emit[1] += min(F(0.25), F(F(0.12) * color_t)) * bol_i
                    step_emit[2] += max(F(0.0), F(F(0.01) * (color_t - F(2.0)))) * bol_i
                    step_opacity = F(step_opacity + d_disk * DISK_OPACITY)

                if d_cloud > F(0.001):
                    g = F(calculate_redshift_factor(rel_p, v, spin_a))
                    lighting = F(F(0.5) + F(3.0) * np.power(ISCO_RADIUS / max(r, ISCO_RADIUS), F(1.2)))
                    cloud_i = F(d_cloud * CLOUD_LUMINOSITY * lighting)
                    shift = F(smoothstep(F(0.7), F(1.3), g))
                    base_color = np.array([0.60, 0.65, 0.80], dtype=np.float32)
                    step_emit[0] += F(base_color[0] * cloud_i * lerp(F(1.2), F(0.8), shift))
                    step_emit[1] += F(base_color[1] * cloud_i * lerp(F(0.8), F(1.1), shift))
                    step_emit[2] += F(base_color[2] * cloud_i * lerp(F(0.6), F(1.4), shift))
                    step_opacity = F(step_opacity + d_cloud * CLOUD_OPACITY)

                d_tau = F(step_opacity * current_h)
                step_trans = F(np.exp(-d_tau))
                factor = F((F(1.0) - step_trans) * transmittance)
                intensity = (intensity + step_emit * factor).astype(np.float32)
                transmittance = F(transmittance * step_trans)

        if r > F(250.0) and dot(rel_p, v) > F(0.0):
            return p, v, intensity, transmittance, hit_horizon, i

    return p, v, intensity, transmittance, hit_horizon, max_steps


def camera_basis(pos, yaw, pitch):
    # main.cpp:141-167
    deg = F(3.14159) / F(180.0)
    ry = F(F(yaw) * deg)
    rp = F(F(pitch) * deg)
    fwd = np.array(
        [np.sin(ry) * np.cos(rp), np.sin(rp), np.cos(ry) * np.cos(rp)],
        dtype=np.float32,
    )
    fwd = (fwd / F(np.sqrt(np.sum(fwd * fwd)))).astype(np.float32)
    world_up = np.array([0, 1, 0], dtype=np.float32)
    right = cross(world_up, fwd)
    right = (right / F(np.sqrt(np.sum(right * right)))).astype(np.float32)
    up = cross(fwd, right)
    return np.asarray(pos, dtype=np.float32), fwd, right, up


def gen_ray(x, y, width, height, cam_pos, fwd, right, up,
            use_lens_distortion=False, distortion_amount=0.15):
    # raymarcher.cu:20-34
    uv = np.array([F(x) / F(width), F(y) / F(height)], dtype=np.float32)
    if use_lens_distortion:
        uv = apply_lens_distortion(uv, distortion_amount)
    u = F((uv[0] * F(2.0) - F(1.0)) * (F(width) / F(height)))
    v = F(uv[1] * F(2.0) - F(1.0))
    rd = normalize((fwd + right * u + up * v).astype(np.float32))
    return cam_pos.copy(), rd, uv
