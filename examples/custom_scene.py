#!/usr/bin/env python
"""Customize the scene: a rapidly spinning hole with a fatter, brighter
disk, no dust clouds, chromatic aberration on, and a custom camera path.

Every SceneConfig field mirrors the reference's include/config.h knob of
the same name; changing one retraces the frame program (the reference
requires a recompile — same contract).

RRT_EXAMPLE_SMOKE=1 shrinks the render so CI can execute this script."""

import os

# Smoke tier (CI) must run on the CPU backend: a preinstalled TPU plugin
# can override the JAX_PLATFORMS env var (tests/conftest.py documents
# this), so the config flag is set here before any JAX use.
if os.environ.get("RRT_EXAMPLE_SMOKE") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from relativisticraytracer_tpu import (
    CameraEffects,
    CameraPath,
    Keyframe,
    Renderer,
    RenderSettings,
    SceneConfig,
)
from relativisticraytracer_tpu.io.image import load_skybox, save_png
from relativisticraytracer_tpu.paths import interpolate_path
from relativisticraytracer_tpu.render.camera import camera_state_from_pose

SMOKE = os.environ.get("RRT_EXAMPLE_SMOKE") == "1"

scene = SceneConfig(
    spin_a=0.95,            # near-extremal frame dragging
    disk_h_m=1.2,           # thicker disk
    disk_luminosity=9.0,
    enable_clouds=False,
    **({"max_steps": 16} if SMOKE else {}),
)
effects = CameraEffects(use_chromatic_aberration=1.0, ca_amount=0.004)

my_path = CameraPath("dive", [
    Keyframe(0.0, (0.0, 20.0, -70.0), 0.0, -14.0),
    Keyframe(5.0, (10.0, 4.0, -25.0), -20.0, -6.0),
    Keyframe(10.0, (18.0, 1.0, 8.0), -95.0, -2.0),
])

renderer = Renderer(
    scene,
    RenderSettings(width=1280, height=720)
    if not SMOKE
    else RenderSettings(width=64, height=48, max_steps=16),
    skybox_rgba=load_skybox(
        None, fallback_shape=(1024, 2048) if not SMOKE else (32, 64)
    ),
)
for t in (0.0, 5.0, 10.0):
    pos, yaw, pitch = interpolate_path(my_path, t)
    frame = renderer.render_np(camera_state_from_pose(pos, yaw, pitch), effects, t)
    save_png(f"custom_t{int(t)}.png", frame)
    print(f"wrote custom_t{int(t)}.png")
