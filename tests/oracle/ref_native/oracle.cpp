/* Parity oracle compiled FROM THE REFERENCE'S OWN SOURCE.
 *
 * This translation unit #includes the reference's device headers
 * (math_utils.h, geodesics.h, integrators.h, densities.h,
 * camera_effects/post_processing.h) and its render kernel
 * (src/raymarcher.cu, truncated at build time just before the CUDA
 * launcher `launch_raymarch`, which uses <<<>>> syntax) straight from
 * /root/reference, via the CUDA shim in shim/cuda_runtime.h. Nothing of
 * the reference is copied into this repository — the build script reads
 * the reference tree at test time and compiles it in a temp dir.
 *
 * Purpose: ground-truth parity testing that does NOT flow through a
 * hand-transcribed oracle. The exported C functions below are thin batch
 * wrappers; all math inside them is the reference's. The only authored
 * device-side pieces are the tex2D shim (CUDA texture addressing,
 * documented in shim/cuda_runtime.h) and `ref_march_ray`, which replays
 * the kernel's march-loop control flow (raymarcher.cu:41-121) calling the
 * reference's integrate_rk4 / density / redshift functions so per-ray
 * march state can be inspected mid-pipeline.
 *
 * Numerical caveat: compiled with g++ for x86 (glibc libm), so
 * transcendentals may differ from CUDA device intrinsics by a few ulp;
 * float arithmetic is IEEE with contraction disabled (-ffp-contract=off).
 * Tolerances in tests/test_reference_native_parity.py account for this.
 *
 * Build-time configuration macros (see __init__.py):
 *   ORACLE_SPIN_A     — overrides config.h SPIN_A (default 0.0f)
 *   ORACLE_MAX_STEPS  — overrides config.h MAX_STEPS (default 2000)
 */

#include <cuda_runtime.h>  /* the shim (resolved via -I shim/) */

#include "config.h"        /* the reference's constants */

#ifdef ORACLE_SPIN_A
#undef SPIN_A
#define SPIN_A ORACLE_SPIN_A
#endif
#ifdef ORACLE_MAX_STEPS
#undef MAX_STEPS
#define MAX_STEPS ORACLE_MAX_STEPS
#endif

/* CUDA builtin thread coordinates (declared extern in the shim). */
thread_local uint3 blockIdx = {0, 0, 0};
thread_local uint3 threadIdx = {0, 0, 0};
thread_local dim3 blockDim;
thread_local dim3 gridDim;

/* The reference's render kernel, headers and all. The build script copies
 * src/raymarcher.cu into the build dir truncated at `void launch_raymarch`
 * (host-side CUDA launch syntax); the kernel body itself compiles
 * unmodified. Its #includes pull in the reference device headers with the
 * overrides above already in force. */
#include "raymarcher_device.inc"

namespace {

inline float3 v3(const float* p) { return make_float3(p[0], p[1], p[2]); }

inline void store3(float* out, float3 v) {
    out[0] = v.x; out[1] = v.y; out[2] = v.z;
}

}  // namespace

extern "C" {

/* ---- math / noise (reference include/math_utils.h) ---- */

void ref_hash31(const float* p, int n, float* out) {
    for (int i = 0; i < n; ++i) out[i] = hash31(v3(p + 3 * i));
}

void ref_hash33(const float* p, int n, float* out3) {
    for (int i = 0; i < n; ++i) store3(out3 + 3 * i, hash33(v3(p + 3 * i)));
}

void ref_noise3d(const float* p, int n, float* out) {
    for (int i = 0; i < n; ++i) out[i] = noise3D(v3(p + 3 * i));
}

void ref_fbm(const float* p, int n, int octaves, float* out) {
    for (int i = 0; i < n; ++i) out[i] = fbm(v3(p + 3 * i), octaves);
}

void ref_fbm_billow(const float* p, int n, int octaves, float* out) {
    for (int i = 0; i < n; ++i) out[i] = fbm_billow(v3(p + 3 * i), octaves);
}

void ref_worley3d(const float* p, int n, float* out) {
    for (int i = 0; i < n; ++i) out[i] = worley3D(v3(p + 3 * i));
}

void ref_rotate3d(const float* p, const float* axis, const float* angle,
                  int n, float* out3) {
    for (int i = 0; i < n; ++i)
        store3(out3 + 3 * i,
               rotate_3d(v3(p + 3 * i), v3(axis + 3 * i), angle[i]));
}

/* ---- physics (reference include/geodesics.h, integrators.h) ---- */

void ref_geodesic_acc(const float* p, const float* v, int n, float* out3) {
    for (int i = 0; i < n; ++i)
        store3(out3 + 3 * i, getGeodesicAcc(v3(p + 3 * i), v3(v + 3 * i)));
}

void ref_redshift(const float* p, const float* v, int n, float* out) {
    for (int i = 0; i < n; ++i)
        out[i] = calculateRedshiftFactor(v3(p + 3 * i), v3(v + 3 * i));
}

void ref_rk4(const float* p, const float* v, const float* h, int n,
             float* out_p, float* out_v) {
    for (int i = 0; i < n; ++i) {
        float3 pp = v3(p + 3 * i), vv = v3(v + 3 * i);
        integrate_rk4(pp, vv, h[i]);
        store3(out_p + 3 * i, pp);
        store3(out_v + 3 * i, vv);
    }
}

void ref_euler(const float* p, const float* v, const float* h, int n,
               float* out_p, float* out_v) {
    for (int i = 0; i < n; ++i) {
        float3 pp = v3(p + 3 * i), vv = v3(v + 3 * i);
        integrate_euler(pp, vv, h[i]);
        store3(out_p + 3 * i, pp);
        store3(out_v + 3 * i, vv);
    }
}

/* ---- media (reference include/densities.h) ---- */

void ref_disk_temperature(const float* r, int n, float* out) {
    for (int i = 0; i < n; ++i) out[i] = getDiskTemperature(r[i]);
}

void ref_accretion_density(const float* p, float time, int n, float* out) {
    for (int i = 0; i < n; ++i)
        out[i] = getAccretionDensity(v3(p + 3 * i), time);
}

void ref_dust_density(const float* p, float time, int n, float* out) {
    for (int i = 0; i < n; ++i)
        out[i] = getDustCloudDensity(v3(p + 3 * i), time);
}

/* ---- post FX (reference include/camera_effects/post_processing.h) ---- */

void ref_vignette(const float* rgb, const float* uv, float intensity, int n,
                  float* out3) {
    for (int i = 0; i < n; ++i)
        store3(out3 + 3 * i,
               apply_vignette(v3(rgb + 3 * i),
                              make_float2(uv[2 * i], uv[2 * i + 1]),
                              intensity));
}

void ref_lens_distortion(const float* uv, float k, int n, float* out2) {
    for (int i = 0; i < n; ++i) {
        float2 r = apply_lens_distortion(
            make_float2(uv[2 * i], uv[2 * i + 1]), k);
        out2[2 * i] = r.x;
        out2[2 * i + 1] = r.y;
    }
}

void ref_bloom(const float* rgb, float threshold, int n, float* out3) {
    for (int i = 0; i < n; ++i)
        store3(out3 + 3 * i,
               get_bloom_contribution(v3(rgb + 3 * i), threshold));
}

/* ---- per-ray march state ----
 *
 * Replays the kernel march loop's control flow (raymarcher.cu:41-121) with
 * every arithmetic step performed by the reference functions included
 * above, so tests can compare march STATE (position/velocity/intensity/
 * transmittance), which the full kernel does not expose. Structure:
 * horizon test on the pre-step radius (cu:47-51), adaptive h from pre-step
 * zone flags (cu:54-62), integrate_rk4 (cu:64), media at the pre-step
 * position with the post-step velocity (cu:67-117), escape test (cu:120).
 *
 * Returns the number of steps taken. out_state = [px,py,pz, vx,vy,vz,
 * ir,ig,ib, transmittance, hit_horizon]. */
int ref_march_ray(const float* p0, const float* v0, float time,
                  int max_steps, float* out_state) {
    float3 p = v3(p0);
    float3 vel = v3(v0);
    float intensity_r = 0, intensity_g = 0, intensity_b = 0;
    float transmittance = 1.0f;
    bool hit_horizon = false;
    int steps = 0;

    for (int i = 0; i < max_steps; ++i) {
        ++steps;
        float3 rel_p = sub(p, MASS_POS);
        float r2 = dot(rel_p, rel_p);
        float r = sqrtf(r2);

        if (r < EVENT_HORIZON * 1.01f) {              /* cu:47-51 */
            hit_horizon = true;
            transmittance = 0.0f;
            break;
        }

        float current_h = STEP_SIZE_M;                 /* cu:54-62 */
        bool near_bh = (r < 18.0f);
        bool in_disk_zone =
            (fabsf(rel_p.y) < DISK_H_M * 5.0f && r < DISK_OUT_M + 5.0f);
        bool in_cloud_zone =
            (fabsf(rel_p.y) < CLOUD_H_M * 1.5f && r < CLOUD_OUT_M);
        if (near_bh) current_h *= 0.1f;
        else if (in_disk_zone) current_h *= 0.3f;
        else if (in_cloud_zone) current_h *= 0.5f;

        integrate_rk4(p, vel, current_h);              /* cu:64 */

        if (in_disk_zone || in_cloud_zone) {           /* cu:67-117 */
            float d_disk =
                in_disk_zone ? getAccretionDensity(rel_p, time) : 0.0f;
            float d_cloud =
                in_cloud_zone ? getDustCloudDensity(rel_p, time) : 0.0f;

            if (d_disk > 0.001f || d_cloud > 0.001f) {
                float3 step_emit = make_float3(0, 0, 0);
                float step_opacity = 0;

                if (d_disk > 0.001f) {                 /* cu:76-88 */
                    float g = calculateRedshiftFactor(rel_p, vel);
                    float T = getDiskTemperature(r);
                    float T_norm = powf(T / DISK_TEMP_REF, 0.5f);
                    float bol_I = powf(g, 4.0f) * T_norm * d_disk
                                  * DISK_LUMINOSITY;
                    float color_t = g * powf(T / DISK_TEMP_REF, 0.4f) * 2.5f;
                    step_emit.x += 1.0f * bol_I;
                    step_emit.y += fminf(0.25f, 0.12f * color_t) * bol_I;
                    step_emit.z += fmaxf(0.0f, 0.01f * (color_t - 2.0f))
                                   * bol_I;
                    step_opacity += d_disk * DISK_OPACITY;
                }

                if (d_cloud > 0.001f) {                /* cu:91-105 */
                    float g = calculateRedshiftFactor(rel_p, vel);
                    float lighting =
                        0.5f + 3.0f * powf(ISCO_RADIUS / fmaxf(r, ISCO_RADIUS),
                                           1.2f);
                    float cloud_I = d_cloud * CLOUD_LUMINOSITY * lighting;
                    float shift = smoothstep(0.7f, 1.3f, g);
                    float3 base_color = make_float3(0.60f, 0.65f, 0.80f);
                    step_emit.x += base_color.x * cloud_I * lerp(1.2f, 0.8f, shift);
                    step_emit.y += base_color.y * cloud_I * lerp(0.8f, 1.1f, shift);
                    step_emit.z += base_color.z * cloud_I * lerp(0.6f, 1.4f, shift);
                    step_opacity += d_cloud * CLOUD_OPACITY;
                }

                float d_tau = step_opacity * current_h;  /* cu:107-115 */
                float step_trans = expf(-d_tau);
                float factor = (1.0f - step_trans) * transmittance;
                intensity_r += step_emit.x * factor;
                intensity_g += step_emit.y * factor;
                intensity_b += step_emit.z * factor;
                transmittance *= step_trans;
            }
        }

        if (r > 250.0f && dot(rel_p, vel) > 0) break;  /* cu:120 */
    }

    out_state[0] = p.x;  out_state[1] = p.y;  out_state[2] = p.z;
    out_state[3] = vel.x; out_state[4] = vel.y; out_state[5] = vel.z;
    out_state[6] = intensity_r;
    out_state[7] = intensity_g;
    out_state[8] = intensity_b;
    out_state[9] = transmittance;
    out_state[10] = hit_horizon ? 1.0f : 0.0f;
    return steps;
}

/* ---- full-frame render through the UNMODIFIED reference kernel ----
 *
 * Drives raymarch_kernel exactly as launch_raymarch does
 * (raymarcher.cu:176-180): 16x16 thread blocks over a ceil-div grid, one
 * "thread" per pixel, emulated by nested loops with the builtin
 * coordinates set per iteration (thread_local => OpenMP-safe).
 *
 * cam12 = pos, forward, right, up (3 floats each, raymarcher.h:11-16).
 * fx9 = useBloom, bloomThreshold, bloomIntensity, useVignette,
 *       vignetteIntensity, useCA, caAmount, useLensDistortion,
 *       distortionAmount (camera_settings.h:4-17).
 * sky_rgba: uint8 [sky_h, sky_w, 4] top-down equirect, may be null for a
 * black background (tex2D then never dereferences: sampling only happens
 * for escaped rays, and with a null texture we pass a 1x1 black texel).
 * out_rgba: uint8 [height, width, 4] — the kernel itself writes with the
 * vertical flip (raymarcher.cu:168-173). */
void ref_render_frame(int width, int height, float time, const float* cam12,
                      const float* fx9, const unsigned char* sky_rgba,
                      int sky_w, int sky_h, unsigned char* out_rgba) {
    CameraState cam;
    cam.pos = v3(cam12 + 0);
    cam.forward = v3(cam12 + 3);
    cam.right = v3(cam12 + 6);
    cam.up = v3(cam12 + 9);

    CameraEffects fx;
    fx.useBloom = fx9[0] > 0.5f;
    fx.bloomThreshold = fx9[1];
    fx.bloomIntensity = fx9[2];
    fx.useVignette = fx9[3] > 0.5f;
    fx.vignetteIntensity = fx9[4];
    fx.useChromaticAberration = fx9[5] > 0.5f;
    fx.caAmount = fx9[6];
    fx.useLensDistortion = fx9[7] > 0.5f;
    fx.distortionAmount = fx9[8];

    static const unsigned char black[4] = {0, 0, 0, 255};
    RrtShimTexture tex;
    tex.rgba = sky_rgba ? sky_rgba : black;
    tex.width = sky_rgba ? sky_w : 1;
    tex.height = sky_rgba ? sky_h : 1;
    cudaTextureObject_t handle = static_cast<cudaTextureObject_t>(
        reinterpret_cast<unsigned long long>(&tex));

    const unsigned int gx = (unsigned int)((width + 15) / 16);
    const unsigned int gy = (unsigned int)((height + 15) / 16);

#pragma omp parallel for collapse(2) schedule(dynamic)
    for (unsigned int by = 0; by < gy; ++by) {
        for (unsigned int bx = 0; bx < gx; ++bx) {
            blockDim = dim3(16, 16, 1);
            gridDim = dim3(gx, gy, 1);
            blockIdx.x = bx; blockIdx.y = by; blockIdx.z = 0;
            for (unsigned int ty = 0; ty < 16; ++ty) {
                for (unsigned int tx = 0; tx < 16; ++tx) {
                    threadIdx.x = tx; threadIdx.y = ty; threadIdx.z = 0;
                    raymarch_kernel(reinterpret_cast<uchar4*>(out_rgba),
                                    width, height, time, cam, handle, fx);
                }
            }
        }
    }
}

/* Introspection helpers so tests can confirm which configuration this
 * library was built with. */
float ref_config_spin_a(void) { return SPIN_A; }
int ref_config_max_steps(void) { return MAX_STEPS; }

}  /* extern "C" */
