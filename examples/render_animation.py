#!/usr/bin/env python
"""Render the "Gargantua Fly-By" cinematic path to video (resumable: rerun
after an interruption and it continues from the last flushed frame).

    python examples/render_animation.py [seconds]
"""

import sys

from relativisticraytracer_tpu import Renderer, RenderSettings, SceneConfig
from relativisticraytracer_tpu.io.image import load_skybox
from relativisticraytracer_tpu.paths import default_paths
from relativisticraytracer_tpu.runtime.app import AnimationJob

duration = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0

renderer = Renderer(
    SceneConfig(),
    RenderSettings(width=1280, height=720),
    skybox_rgba=load_skybox(None),
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
