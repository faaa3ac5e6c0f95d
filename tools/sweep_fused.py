#!/usr/bin/env python
"""Tile-shape / unroll / media-group sweep for the fused sky kernel on the
real chip (hard-synced). Usage:

    python tools/sweep_fused.py "32,128,8,0" "16,128,8,0" ...
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.benchlib import timeit_hard

import sys

import jax
import jax.numpy as jnp
import numpy as np



def main():
    from relativisticraytracer_tpu.config import CameraEffects, SceneConfig
    from relativisticraytracer_tpu.ops.pallas_march import (
        march_pallas_camera_sky,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    W, H = 1920, 1080
    scene = SceneConfig()
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    eff = CameraEffects()
    t = jnp.float32(1.0)
    sky_h, sky_w = sky.shape

    configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    if not configs:
        configs = [(32, 128, 8, 0)]

    for bh, bw, unroll, groups in configs:
        try:
            fn = jax.jit(lambda tt, bh=bh, bw=bw, u=unroll, g=groups:
                         march_pallas_camera_sky(
                             scene, cam, eff, tt, W, H, scene.max_steps,
                             sky_h, sky_w, block_h=bh, block_w=bw,
                             unroll=u, group_rows=g)[1])
            ms = timeit_hard(lambda: fn(t))
            print(f"bh={bh:3d} bw={bw:3d} unroll={unroll:2d} "
                  f"groups={groups:2d}: {ms:8.1f} ms", flush=True)
        except Exception as e:
            print(f"bh={bh:3d} bw={bw:3d} unroll={unroll:2d} "
                  f"groups={groups:2d}: FAILED {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
