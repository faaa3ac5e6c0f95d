#!/usr/bin/env python
"""Tile one frame across every local TPU chip (zero collectives; each chip
early-exits its own tile). On a CPU host, set
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to try the same code on 8 virtual devices."""

import numpy as np

import jax

from relativisticraytracer_tpu import CameraEffects, RenderSettings, SceneConfig
from relativisticraytracer_tpu.io.image import load_skybox, save_png
from relativisticraytracer_tpu.parallel.sharding import make_mesh, make_sharded_renderer
from relativisticraytracer_tpu.render.camera import camera_state_from_pose
from relativisticraytracer_tpu.render.skybox import skybox_from_array

mesh = make_mesh()  # all devices, most-square ('ty','tx') factorization
print(f"mesh: {mesh.devices.shape} over {mesh.devices.size} device(s)")

scene = SceneConfig()
settings = RenderSettings(width=1920, height=1080)
render = make_sharded_renderer(scene, settings, mesh)

camera = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
sky = skybox_from_array(load_skybox(None))
frame = render(camera, CameraEffects(), 1.0, sky)
print(f"sharding: {frame.sharding}")
save_png("sharded.png", np.asarray(frame))
