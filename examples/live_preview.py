#!/usr/bin/env python
"""Serve a live fly-camera preview at http://localhost:8000 (MJPEG over
HTTP). Equivalent CLI: python -m relativisticraytracer_tpu interactive."""

from relativisticraytracer_tpu import RenderSettings, SceneConfig
from relativisticraytracer_tpu.io.image import load_skybox
from relativisticraytracer_tpu.render.pipeline import Renderer
from relativisticraytracer_tpu.runtime.app import Session
from relativisticraytracer_tpu.runtime.preview import PreviewServer

session = Session(renderer=Renderer(
    SceneConfig(), RenderSettings(width=960, height=540),
    skybox_rgba=load_skybox(None),
))
server = PreviewServer(session, port=8000, fps_cap=30.0)
print(f"open http://localhost:{server.port} — click to capture the mouse; "
      "WASD/Space/Shift fly, R records, P plays a path, B/V/L/C effects")
server.serve_until_interrupt()
