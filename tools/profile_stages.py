#!/usr/bin/env python
"""Measured per-stage breakdown of the 1080p frame on the real chip.

Times each stage of the frame program in isolation (throughput mode:
K pipelined dispatches, one block at the end, so the ~25 ms/call host RPC
latency of this environment is amortized out — see PERF.md):

  march_full    the fused Pallas march kernel, full scene (media on)
  march_vacuum  the same kernel with disk+clouds compiled out -> the
                pure-RK4 vacuum floor (step counts are identical: the
                adaptive-h zones do not depend on the media flags)
  post_total    everything after the march: normalize + equirect uv +
                skybox gather + composite + post FX + tone map + pack
  gather_only   just the 3 quad-plane gathers (one per channel) with the
                actual escape-direction index distribution of the frame
  full_frame    the end-to-end frame program (render_frame_pallas)

Writes docs/profile_stages.json and prints a markdown table for PERF.md.

Usage: python tools/profile_stages.py [--width W --height H] [--reps K]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time as _time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps: int) -> float:
    """Median-of-3 throughput timing: `reps` pipelined dispatches, block
    once. Returns ms per call. NB: results were cross-validated against the
    hard-synced (on-device scalar fetch) timers in tools/bench_fused.py —
    prefer those for new measurements (see PERF.md on block_until_ready)."""
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    best = []
    for _ in range(3):
        t0 = _time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        best.append((_time.perf_counter() - t0) * 1000.0 / reps)
    return float(np.median(best))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="docs/profile_stages.json")
    args = ap.parse_args()

    import dataclasses

    from relativisticraytracer_tpu.config import (
        CameraEffects,
        SceneConfig,
    )
    from relativisticraytracer_tpu.core.vecmath import Vec3, normalize
    from relativisticraytracer_tpu.ops.pallas_march import (
        _uv_planes,
        march_pallas_camera,
        render_frame_pallas,
    )
    from relativisticraytracer_tpu.config import RenderSettings
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.postfx import (
        apply_effects_and_tonemap,
        pack_rgba8,
    )
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        sample_bilinear,
        sample_sky,
        skybox_from_array,
    )

    W, H = args.width, args.height
    scene = SceneConfig()
    vacuum = dataclasses.replace(scene, enable_disk=False, enable_clouds=False)
    settings = RenderSettings(width=W, height=H, max_steps=scene.max_steps,
                              loop="pallas")
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    camera = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    effects = CameraEffects()
    t = jnp.float32(1.0)

    results = {}
    platform = jax.devices()[0].platform
    print(f"# platform={platform} {W}x{H} reps={args.reps}")

    # --- march kernel alone (full scene / vacuum) ---
    march = jax.jit(lambda tt: march_pallas_camera(
        scene, camera, effects, tt, W, H, scene.max_steps))
    results["march_full"] = timeit(lambda: march(t), args.reps)
    print(f"march_full    {results['march_full']:8.1f} ms")

    march_v = jax.jit(lambda tt: march_pallas_camera(
        vacuum, camera, effects, tt, W, H, scene.max_steps))
    results["march_vacuum"] = timeit(lambda: march_v(t), args.reps)
    print(f"march_vacuum  {results['march_vacuum']:8.1f} ms")

    # --- march outputs, fetched once, re-used as device-resident inputs ---
    intensity, trans, hit, vel = jax.block_until_ready(march(t))

    def post(intensity, trans, hit, vel):
        uv_x, uv_y = _uv_planes(W, H, effects)
        d = normalize(vel)
        bg = sample_sky(sky, d, effects)
        zero = jnp.zeros_like(trans)
        bg = Vec3(jnp.where(hit, zero, bg.x), jnp.where(hit, zero, bg.y),
                  jnp.where(hit, zero, bg.z))
        hdr = Vec3(intensity.x + bg.x * trans, intensity.y + bg.y * trans,
                   intensity.z + bg.z * trans)
        ldr = apply_effects_and_tonemap(hdr, uv_x, uv_y, effects,
                                        scene.exposure)
        return pack_rgba8(ldr)

    post_j = jax.jit(post)
    results["post_total"] = timeit(
        lambda: post_j(intensity, trans, hit, vel), args.reps)
    print(f"post_total    {results['post_total']:8.1f} ms")

    # --- the gathers alone, with the frame's real index distribution ---
    hq, wq = sky.qr.shape

    def sky_indices(vel):
        # the PRODUCTION index derivation (one source of truth; a local
        # copy here would silently drift from what the kernel gathers)
        from relativisticraytracer_tpu.render.skybox import sky_coords
        sh, sw = sky.shape
        idx, _, _ = sky_coords(normalize(vel), jnp.float32(0.0), sh, sw)[1]
        return idx

    idx = jax.block_until_ready(jax.jit(sky_indices)(vel))

    def gathers(idx):
        out = []
        for plane in (sky.qr, sky.qg, sky.qb):
            out.append(jnp.take(plane.reshape(-1), idx))
        return out

    g_j = jax.jit(gathers)
    results["gather_only"] = timeit(lambda: g_j(idx), args.reps)
    print(f"gather_only   {results['gather_only']:8.1f} ms")

    # one gather, for the per-gather unit cost
    g1_j = jax.jit(lambda idx: jnp.take(sky.qr.reshape(-1), idx))
    results["gather_one"] = timeit(lambda: g1_j(idx), args.reps)
    print(f"gather_one    {results['gather_one']:8.1f} ms")

    # --- end-to-end ---
    full = jax.jit(lambda tt: render_frame_pallas(
        scene, settings, camera, effects, tt, sky))
    results["full_frame"] = timeit(lambda: full(t), args.reps)
    print(f"full_frame    {results['full_frame']:8.1f} ms")

    results["derived_media_cost"] = results["march_full"] - results["march_vacuum"]
    results["derived_post_minus_gather"] = (
        results["post_total"] - results["gather_only"])
    results["meta"] = {
        "platform": platform, "width": W, "height": H, "reps": args.reps,
        "skybox": "2048x4096 procedural starfield (quad-packed uint32)",
        "method": "throughput: reps pipelined dispatches, block once, "
                  "median of 3 runs",
    }

    import os
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"# wrote {args.out}")

    print("\n| Stage | ms | note |")
    print("|---|---|---|")
    for k in ("march_full", "march_vacuum", "post_total", "gather_only",
              "gather_one", "full_frame"):
        print(f"| {k} | {results[k]:.1f} | |")
    print(f"| media cost (march_full - march_vacuum) | "
          f"{results['derived_media_cost']:.1f} | derived |")
    print(f"| post minus gathers | "
          f"{results['derived_post_minus_gather']:.1f} | derived |")


if __name__ == "__main__":
    main()
