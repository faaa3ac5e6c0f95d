#!/usr/bin/env python
"""Chip timing + exactness gate for the sorted-compact replay
(ops/pallas_compact.media_replay_sorted) vs the image-layout replay.

Measures, hard-synced:
  * image-layout replay (the round-3 shipped pass),
  * sorted replay end-to-end (bookkeeping + kernel + scatter-back),
  * bookkeeping alone (cumsum/searchsorted/sort/gather, replay kernel
    replaced by a pass-through) to attribute the cost,
  * the full 1080p compact frame with both layouts,
and asserts the sorted pass's (intensity, transmittance) planes are
BITWISE equal to the image-layout pass before reporting.

Usage:  python tools/bench_replay_sorted.py [--width 1920 --height 1080]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.benchlib import timeit_hard


import jax
import jax.numpy as jnp
import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--slots", type=int, default=3)
    ap.add_argument("--b-rows", type=int, nargs="*", default=[8, 16])
    ap.add_argument("--capacity", type=int, nargs="*",
                    default=[1 << 17, 1 << 18])
    args = ap.parse_args()

    from relativisticraytracer_tpu.config import (
        CameraEffects,
        RenderSettings,
        SceneConfig,
    )
    from relativisticraytracer_tpu.ops.pallas_compact import (
        march_pallas_camera_sky_record,
        media_replay,
        media_replay_sorted,
        render_frame_pallas_compact,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    W, H = args.width, args.height
    scene = SceneConfig()
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    eff = CameraEffects()
    t = jnp.float32(1.0)
    sky_h, sky_w = sky.shape
    results = {"width": W, "height": H, "slots": args.slots}

    rec = jax.jit(lambda tt: march_pallas_camera_sky_record(
        scene, cam, eff, tt, W, H, scene.max_steps, sky_h, sky_w,
        slots=args.slots))
    records = jax.block_until_ready(rec(t))[4]

    rep_img = jax.jit(lambda recs: media_replay(
        scene, recs, t, scene.max_steps, slots=args.slots, b_rows=16))
    ms = timeit_hard(lambda: rep_img(records)[1])
    results["replay_image_b16_ms"] = ms
    print(f"image-layout replay (b_rows=16)        {ms:8.1f} ms")
    ref_i, ref_t = jax.block_until_ready(rep_img(records))
    ref = [np.asarray(ref_i.x), np.asarray(ref_i.y), np.asarray(ref_i.z),
           np.asarray(ref_t)]

    for cap in args.capacity:
        for br in args.b_rows:
            rep_s = jax.jit(lambda recs: media_replay_sorted(
                scene, recs, t, scene.max_steps, slots=args.slots,
                b_rows=br, capacity=cap))
            out_i, out_t = jax.block_until_ready(rep_s(records))
            got = [np.asarray(out_i.x), np.asarray(out_i.y),
                   np.asarray(out_i.z), np.asarray(out_t)]
            for a, b in zip(ref, got):
                if not np.array_equal(a, b):
                    nbad = int((a != b).sum())
                    raise SystemExit(
                        f"sorted replay NOT bitwise equal (cap={cap}, "
                        f"b_rows={br}): {nbad} mismatched lanes")
            ms = timeit_hard(lambda: rep_s(records)[1])
            results[f"replay_sorted_c{cap}_b{br}_ms"] = ms
            print(f"sorted replay (cap={cap:6d}, b_rows={br:2d})  "
                  f"{ms:8.1f} ms   [bitwise OK]")

    # bookkeeping alone: count the compact-side gathers/sort/scatter with a
    # zero-length replay (lengths forced to 0 so the kernel exits at once)
    def book(recs):
        zeroed = tuple(
            tuple(list(slot[:6]) + [jnp.zeros_like(slot[6])])
            for slot in recs
        )
        return media_replay_sorted(
            scene, zeroed, t, scene.max_steps, slots=args.slots,
            b_rows=args.b_rows[0], capacity=args.capacity[0])[1]

    bk = jax.jit(book)
    ms = timeit_hard(lambda: bk(records))
    results["bookkeeping_ms"] = ms
    print(f"bookkeeping alone (zero-length replay) {ms:8.1f} ms")

    for name, sort in [("image", False), ("sorted", True)]:
        settings = RenderSettings(width=W, height=H, loop="pallas",
                                  media_pass="compact",
                                  media_slots=args.slots, media_sort=sort)
        full = jax.jit(lambda tt: render_frame_pallas_compact(
            scene, settings, cam, eff, tt, sky))
        ms = timeit_hard(lambda: full(t))
        results[f"full_frame_{name}_ms"] = ms
        print(f"full compact frame ({name:6s})          {ms:8.1f} ms")

    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "bench_replay_sorted.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
