/* Minimal CUDA shim so the REFERENCE's own device headers and kernel
 * (/root/reference/include/*.h, src/raymarcher.cu) compile as plain host
 * C++ and serve as a parity oracle compiled FROM THE REFERENCE SOURCE —
 * not from a transcription. Test harness only; never part of the
 * framework's compute path.
 *
 * Provides exactly what the reference translation units use:
 *   - __device__/__global__/__host__/__forceinline__ qualifiers (erased)
 *   - float2/float3/float4/uchar4 + make_* constructors
 *   - dim3/uint3 and the thread-coordinate builtins (thread_local, set by
 *     the driver loop in oracle.cpp)
 *   - cudaTextureObject_t + tex2D<float4> with the addressing the
 *     reference configures at src/main.cpp:250-263: normalized coords,
 *     bilinear filter, wrap-U / clamp-V, normalized-float reads. The
 *     filtering math mirrors relativisticraytracer_tpu/render/skybox.py
 *     (sky_coords_from_uv + quad_bilinear) operation-for-operation so the
 *     sky term cancels out of full-frame parity comparisons.
 */
#ifndef RRT_SHIM_CUDA_RUNTIME_H
#define RRT_SHIM_CUDA_RUNTIME_H

#include <math.h>

#define __device__
#define __global__
#define __host__
#define __constant__
#define __forceinline__ inline

struct float2 { float x, y; };
struct float3 { float x, y, z; };
struct float4 { float x, y, z, w; };
struct uchar4 { unsigned char x, y, z, w; };

static inline float2 make_float2(float x, float y) {
    float2 r; r.x = x; r.y = y; return r;
}
static inline float3 make_float3(float x, float y, float z) {
    float3 r; r.x = x; r.y = y; r.z = z; return r;
}
static inline float4 make_float4(float x, float y, float z, float w) {
    float4 r; r.x = x; r.y = y; r.z = z; r.w = w; return r;
}
static inline uchar4 make_uchar4(unsigned char x, unsigned char y,
                                 unsigned char z, unsigned char w) {
    uchar4 r; r.x = x; r.y = y; r.z = z; r.w = w; return r;
}

struct uint3 { unsigned int x, y, z; };
struct dim3 {
    unsigned int x, y, z;
    dim3(unsigned int a = 1, unsigned int b = 1, unsigned int c = 1)
        : x(a), y(b), z(c) {}
};

/* CUDA builtin coordinates: thread_local so an OpenMP pixel loop can drive
 * the unmodified kernel from multiple host threads. */
extern thread_local uint3 blockIdx;
extern thread_local uint3 threadIdx;
extern thread_local dim3 blockDim;
extern thread_local dim3 gridDim;

/* Texture object: an opaque handle (as in CUDA); here it carries a pointer
 * to the host-side image. */
typedef unsigned long long cudaTextureObject_t;

struct RrtShimTexture {
    const unsigned char* rgba;  /* H*W*4, row-major, top-down */
    int width;
    int height;
};

/* tex2D with the reference's texture configuration (main.cpp:250-263):
 * cudaAddressModeWrap on U, cudaAddressModeClamp on V, linear filtering,
 * normalized coordinates, cudaReadModeNormalizedFloat. The arithmetic
 * mirrors render/skybox.py exactly: fractional-position math in float32,
 * bilinear lerp in 0..255 space, single 1/255 scale at the end. */
template <typename T>
inline T tex2D(cudaTextureObject_t tex, float x, float y);

template <>
inline float4 tex2D<float4>(cudaTextureObject_t tex, float x, float y) {
    const RrtShimTexture* t = reinterpret_cast<const RrtShimTexture*>(
        static_cast<unsigned long long>(tex));
    const int w = t->width, h = t->height;

    float ux = (x - floorf(x)) * (float)w;              /* wrap-U */
    float vy = fminf(fmaxf(y, 0.0f), 1.0f) * (float)h;  /* clamp-V */
    float xb = ux - 0.5f;
    float yb = vy - 0.5f;
    float x0f = floorf(xb);
    float y0f = floorf(yb);
    float fx = xb - x0f;
    float fy = yb - y0f;

    int x0 = (int)x0f;              /* ux in [0, w] => x0 in [-1, w-1] */
    if (x0 < 0) x0 += w;
    int x1 = x0 + 1;
    if (x1 >= w) x1 -= w;
    int y0 = (int)y0f;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0; else if (y0 > h - 1) y0 = h - 1;
    if (y1 < 0) y1 = 0; else if (y1 > h - 1) y1 = h - 1;

    float out[4];
    for (int c = 0; c < 4; ++c) {
        float c00 = (float)t->rgba[(y0 * w + x0) * 4 + c];
        float c10 = (float)t->rgba[(y0 * w + x1) * 4 + c];
        float c01 = (float)t->rgba[(y1 * w + x0) * 4 + c];
        float c11 = (float)t->rgba[(y1 * w + x1) * 4 + c];
        float top = c00 + fx * (c10 - c00);
        float bot = c01 + fx * (c11 - c01);
        out[c] = (top + fy * (bot - top)) * (1.0f / 255.0f);
    }
    return make_float4(out[0], out[1], out[2], out[3]);
}

#endif /* RRT_SHIM_CUDA_RUNTIME_H */
