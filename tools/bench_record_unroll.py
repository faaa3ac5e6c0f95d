#!/usr/bin/env python
"""Chip sweep: record-pass commit granularity (`unroll`) vs total frame
cost. Segments commit under ONE cond per unroll block, so larger unroll
halves the A-pass cond tax but rounds every media segment up to coarser
blocks — more gap steps for B to replay. This measures both sides:
A-pass time per unroll, B-replay time on THAT unroll's records (sorted
layout), and their sum, at the 1080p headline pose.

Usage: python tools/bench_record_unroll.py [--unrolls 4 8 16]
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
    ap.add_argument("--unrolls", type=int, nargs="*", default=[4, 8, 16])
    args = ap.parse_args()

    from relativisticraytracer_tpu.config import CameraEffects, SceneConfig
    from relativisticraytracer_tpu.ops.pallas_compact import (
        march_pallas_camera_sky_record,
        media_replay_sorted,
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
    results = {"width": W, "height": H}

    for u in args.unrolls:
        rec = jax.jit(lambda tt, u=u: march_pallas_camera_sky_record(
            scene, cam, eff, tt, W, H, scene.max_steps, sky_h, sky_w,
            slots=3, unroll=u))
        a_ms = timeit_hard(lambda: rec(t)[0])
        records = jax.block_until_ready(rec(t))[4]
        # replay lane-steps mandated by this unroll's records
        total = sum(np.asarray(records[s][6]) for s in range(3))
        rep = jax.jit(lambda recs: media_replay_sorted(
            scene, recs, t, scene.max_steps, slots=3, b_rows=16))
        b_ms = timeit_hard(lambda: rep(records)[1])
        results[f"unroll{u}"] = {
            "a_ms": a_ms, "b_ms": b_ms, "sum_ms": a_ms + b_ms,
            "recorded_steps_M": float(total.sum() / 1e6),
        }
        print(f"unroll={u:2d}  A {a_ms:7.1f}  B {b_ms:6.1f}  "
              f"sum {a_ms + b_ms:7.1f} ms   recorded "
              f"{total.sum() / 1e6:6.1f}M steps")

    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "bench_record_unroll.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
