#!/usr/bin/env python
"""Render the "Gargantua Fly-By" cinematic path to video (resumable: rerun
after an interruption and it continues from the last flushed frame).

    python examples/render_animation.py [seconds]

RRT_EXAMPLE_SMOKE=1 shrinks the job (64x48, 16 steps, 3 frames) so CI can
execute it on a CPU backend.
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
from relativisticraytracer_tpu.io.image import load_skybox
from relativisticraytracer_tpu.paths import default_paths
from relativisticraytracer_tpu.runtime.app import AnimationJob

SMOKE = os.environ.get("RRT_EXAMPLE_SMOKE") == "1"
duration = float(sys.argv[1]) if len(sys.argv) > 1 else (5.0 if not SMOKE else 0.125)

renderer = Renderer(
    SceneConfig(),
    RenderSettings(width=1280, height=720)
    if not SMOKE
    else RenderSettings(width=64, height=48, max_steps=16),
    skybox_rgba=load_skybox(
        None, fallback_shape=(1024, 2048) if not SMOKE else (32, 64)
    ),
)
job = AnimationJob(
    path=default_paths()[0],     # or build your own CameraPath from Keyframes
    renderer=renderer,
    fps=24,
    duration=duration,
    out_path="flyby.mp4",        # raw .rgba + encode sidecar if ffmpeg is absent
)
stats = job.run(progress=lambda k, n, ms: print(
    f"\r frame {k}/{n} ({ms:.0f} ms)", end="", flush=True))
print(f"\n{stats}")
