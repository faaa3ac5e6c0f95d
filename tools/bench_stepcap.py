#!/usr/bin/env python
"""March cost vs step cap — sizes the late-stage (sparse-lane) cost that a
ray-repacking pass could reclaim."""

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
    from relativisticraytracer_tpu.ops.pallas_march import march_pallas_camera_sky
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

    for cap in [int(x) for x in sys.argv[1:]] or [512, 1024, 2000]:
        fn = jax.jit(lambda tt, cap=cap: march_pallas_camera_sky(
            scene, cam, eff, tt, W, H, cap, sky_h, sky_w)[1])
        print(f"cap={cap:5d}: {timeit_hard(lambda: fn(t)):8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
