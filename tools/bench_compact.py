#!/usr/bin/env python
"""Chip timing for the segment-replay compaction (ops/pallas_compact.py).

Times, hard-synced (on-device scalar fetch per batch):
  * the round-2 inline fused frame (baseline),
  * the A record pass alone,
  * the B replay pass alone at several tile heights,
  * the full compact frame end-to-end.

Usage:  python tools/bench_compact.py [--width 1920 --height 1080]
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
    ap.add_argument("--b-rows", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument("--skip-inline", action="store_true")
    args = ap.parse_args()

    from relativisticraytracer_tpu.config import (
        CameraEffects,
        RenderSettings,
        SceneConfig,
    )
    from relativisticraytracer_tpu.ops.pallas_compact import (
        march_pallas_camera_sky_record,
        media_replay,
        render_frame_pallas_compact,
    )
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
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

    if not args.skip_inline:
        settings_i = RenderSettings(width=W, height=H, loop="pallas",
                                    media_pass="inline")
        inline = jax.jit(lambda tt: render_frame_pallas(
            scene, settings_i, cam, eff, tt, sky))
        results["inline_full_ms"] = timeit_hard(lambda: inline(t))
        print(f"inline full frame      {results['inline_full_ms']:8.1f} ms")

    rec = jax.jit(lambda tt: march_pallas_camera_sky_record(
        scene, cam, eff, tt, W, H, scene.max_steps, sky_h, sky_w,
        slots=args.slots))

    def rec_sync():
        return rec(t)[0]  # hit plane

    results["record_ms"] = timeit_hard(rec_sync)
    print(f"A record pass          {results['record_ms']:8.1f} ms")

    records = jax.block_until_ready(rec(t))[4]
    for br in args.b_rows:
        rep = jax.jit(lambda recs: media_replay(
            scene, recs, t, scene.max_steps, slots=args.slots, b_rows=br))
        ms = timeit_hard(lambda: rep(records)[1])
        results[f"replay_ms_b{br}"] = ms
        print(f"B replay (b_rows={br:2d})   {ms:8.1f} ms")

    settings_c = RenderSettings(width=W, height=H, loop="pallas",
                                media_pass="compact",
                                media_slots=args.slots)
    comp = jax.jit(lambda tt: render_frame_pallas_compact(
        scene, settings_c, cam, eff, tt, sky))
    results["compact_full_ms"] = timeit_hard(lambda: comp(t))
    print(f"compact full frame     {results['compact_full_ms']:8.1f} ms")

    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / "bench_compact.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
