#!/usr/bin/env python
"""Render a single frame: the reference's default view, full quality.

    python examples/render_still.py [out.png]

RRT_EXAMPLE_SMOKE=1 shrinks everything (64x48, 16 steps, tiny sky) so CI
can execute this script in seconds on a CPU backend.
"""

import os

# Smoke tier (CI) must run on the CPU backend: a preinstalled TPU plugin
# can override the JAX_PLATFORMS env var (tests/conftest.py documents
# this), so the config flag is set here before any JAX use.
if os.environ.get("RRT_EXAMPLE_SMOKE") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
import sys

from relativisticraytracer_tpu import Renderer, RenderSettings, SceneConfig
from relativisticraytracer_tpu.io.image import load_skybox, save_png
from relativisticraytracer_tpu.render.camera import camera_state_from_pose

SMOKE = os.environ.get("RRT_EXAMPLE_SMOKE") == "1"
out = sys.argv[1] if len(sys.argv) > 1 else "still.png"

renderer = Renderer(
    SceneConfig(),                               # Sgr A* scene, config.h defaults
    RenderSettings(width=1920, height=1080)      # loop="auto": Pallas on TPU
    if not SMOKE
    else RenderSettings(width=64, height=48, max_steps=16),
    skybox_rgba=load_skybox(                     # or load_skybox("my_equirect.jpg")
        None, fallback_shape=(1024, 2048) if not SMOKE else (32, 64)
    ),
)
camera = camera_state_from_pose(pos=(0.0, 10.0, -60.0), yaw=0.0, pitch=-10.0)
save_png(out, renderer.render_np(camera, time=1.0))
print(f"wrote {out}")
