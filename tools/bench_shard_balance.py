#!/usr/bin/env python
"""Spatial-shard load balance, measured on ONE real chip (VERDICT r3 #2).

"8 chips ~= 23 ms" assumed balanced shards, but a spatial frame's time is
the MAX over shards and the march's lane-steps concentrate in the
photon-ring/media tiles at the image center (docs/media_fire.json; the
near-BH zone runs the full 2000-step cap at h*0.1, raymarcher.cu:54-62).
This tool times each shard's program SEQUENTIALLY at its true origin on
the single available chip — exactly the per-device program shard_map would
run (parallel/sharding.py builds the same _compact_tile_rgba with the same
(x0, y0) SMEM origins) — and reports min/mean/max shard ms per mesh shape.

max/mean >> 1 at contiguous assignment motivates the strip-interleaved
assignment (`interleave` in parallel/sharding.py); this tool measures that
variant with the same discipline so the PERF.md multi-chip claim is a
measurement, not arithmetic.

Usage: python tools/bench_shard_balance.py [--quick]
"""

import argparse
import json
import pathlib
import sys
import time as _time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tools.benchlib import timeit_hard

W, H = 1920, 1080
POSE = ((0.0, 10.0, -60.0), 0.0, -10.0)
TIME = 10.0


def shard_fn(scene, settings, sky, w, h, img_w, img_h, strips=None,
             cstrips=None):
    """jitted (camera, effects, time, x0, y0) -> shard RGBA, the same
    program parallel/sharding.py runs per device (origins traced)."""
    from relativisticraytracer_tpu.ops.pallas_compact import (
        _compact_tile_rgba,
    )

    @jax.jit
    def fn(camera, effects, t, x0, y0):
        return _compact_tile_rgba(
            scene, settings, camera, effects, t, sky, w, h,
            False, origin=(x0, y0), img_w=img_w, img_h=img_h,
            strips=strips, cstrips=cstrips,
        )

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer reps (2 instead of 5)")
    ap.add_argument("--meshes", default="4x2,2x4,1x8,8x1")
    args = ap.parse_args()
    reps = 2 if args.quick else 5

    from relativisticraytracer_tpu.config import (
        CameraEffects,
        RenderSettings,
        SceneConfig,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    scene = SceneConfig()
    settings = RenderSettings(width=W, height=H)
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    cam = camera_state_from_pose(*POSE)
    eff = CameraEffects()
    t = jnp.float32(TIME)

    out = {"pose": "headline", "w": W, "h": H, "meshes": {}}
    for mesh_s in args.meshes.split(","):
        ny, nx = (int(v) for v in mesh_s.split("x"))
        if H % ny or W % nx:
            print(f"skip {mesh_s}: {H}x{W} not divisible")
            continue
        th, tw = H // ny, W // nx
        rows = {}
        for mode in ("contiguous", "interleaved"):
            strips = cstrips = None
            sh = sw = 0
            if mode == "interleaved":
                # the SAME strip policy production uses
                # (sharding._interleave_strips_ss: rows for ny>1, columns
                # only for nx>2)
                from relativisticraytracer_tpu.parallel.sharding import (
                    _interleave_strips_ss,
                )

                sh, sw = _interleave_strips_ss(H, W, ny, nx, 1)
                if not sh and not sw:
                    continue  # nothing to interleave
                if sh:
                    strips = (sh, ny * sh)
                if sw:
                    cstrips = (sw, nx * sw)
            # measure what parallel/sharding.py actually ships per shard —
            # including the per-shard media_capacity scaling
            from relativisticraytracer_tpu.parallel.sharding import (
                shard_settings,
            )

            ssh = shard_settings(settings, ny, nx, mode == "interleaved")
            fn = shard_fn(scene, ssh, sky, tw, th, W, H,
                          strips=strips, cstrips=cstrips)
            times = []
            failed = False
            for iy in range(ny):
                for ix in range(nx):
                    y0 = jnp.float32(iy * (sh if strips else th))
                    x0 = jnp.float32(ix * (sw if cstrips else tw))
                    # the remote-compile tunnel drops connections under
                    # load; retry a few times before abandoning the mode
                    for attempt in range(4):
                        try:
                            ms = timeit_hard(
                                lambda fn=fn, x0=x0, y0=y0: fn(
                                    cam, eff, t, x0, y0),
                                reps=reps,
                            )
                            break
                        except Exception as e:
                            print(f"{mesh_s} {mode} ({iy},{ix}) attempt "
                                  f"{attempt}: {e!r}")
                            _time.sleep(20)
                    else:
                        failed = True
                        break
                    times.append(round(ms, 2))
                    print(f"{mesh_s} {mode} shard ({iy},{ix}): {ms:.1f} ms")
                if failed:
                    break
            if failed or not times:
                print(f"{mesh_s} {mode}: ABANDONED (tunnel)")
                continue
            mx, mn = max(times), min(times)
            mean = sum(times) / len(times)
            rows[mode] = {
                "shard_ms": times,
                "min": mn, "mean": round(mean, 2), "max": mx,
                "max_over_mean": round(mx / mean, 3),
                # sum/single-chip-frame = 1/parallel-efficiency: how much
                # per-shard fixed cost the mesh pays (VERDICT r4 weak #2)
                "sum": round(sum(times), 2),
                "media_capacity": ssh.media_capacity,
            }
            print(f"{mesh_s} {mode}: min {mn} mean {mean:.1f} max {mx} "
                  f"(max/mean {mx / mean:.2f})")
        out["meshes"][mesh_s] = rows
        path = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
            "shard_balance.json"
        path.write_text(json.dumps(out, indent=2))

    path = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "shard_balance.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
