#!/usr/bin/env python
"""Render an animation with whole frames round-robined across every local
chip — the throughput-scaling mode (zero communication, linear in chips).
On a CPU host try:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
"""

import jax

from relativisticraytracer_tpu import RenderSettings, SceneConfig
from relativisticraytracer_tpu.io.image import load_skybox
from relativisticraytracer_tpu.paths import default_paths
from relativisticraytracer_tpu.render.pipeline import Renderer
from relativisticraytracer_tpu.runtime.app import AnimationJob

renderer = Renderer(SceneConfig(), RenderSettings(width=1280, height=720),
                    skybox_rgba=load_skybox(None))
job = AnimationJob(
    path=default_paths()[0],           # "Gargantua Fly-By"
    renderer=renderer,
    fps=24,
    duration=5.0,
    out_path="flyby_720p.mp4",         # segments + concat when ffmpeg exists
)
stats = job.run(devices=jax.devices())  # frame k -> chip k % N
print(stats)
