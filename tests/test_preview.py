"""Live preview surfaces (VERDICT r1 #7): MJPEG-over-HTTP server and the
terminal renderer, driven end-to-end over a real socket with the hotkeys
verified live (reference: window + fly camera, src/main.cpp:482-539)."""

import http.client
import io
import time

import numpy as np
import pytest

from relativisticraytracer_tpu.config import RenderSettings, SceneConfig
from relativisticraytracer_tpu.render.pipeline import Renderer
from relativisticraytracer_tpu.render.skybox import procedural_starfield
from relativisticraytracer_tpu.runtime.app import Session
from relativisticraytracer_tpu.runtime.preview import (
    PreviewServer,
    run_terminal_preview,
)


def _tiny_session():
    scene = SceneConfig(max_steps=16, enable_clouds=False)
    settings = RenderSettings(width=32, height=16, max_steps=16, chunk=8)
    return Session(
        renderer=Renderer(scene, settings,
                          skybox_rgba=procedural_starfield(16, 32))
    )


@pytest.fixture
def server(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    monkeypatch.chdir(tmp_path)
    srv = PreviewServer(_tiny_session(), host="127.0.0.1", port=0,
                        fps_cap=60.0)
    srv.start()
    yield srv
    srv.stop()


def _req(srv, method, path):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    try:
        conn.request(method, path)
        resp = conn.getresponse()
        return resp.status, dict(resp.getheaders()), resp.read()
    finally:
        conn.close()


def test_page_and_status(server):
    status, _, body = _req(server, "GET", "/")
    assert status == 200 and b"/stream" in body
    status, _, body = _req(server, "GET", "/status")
    assert status == 200 and b"FPS" in body


def test_frame_jpg_is_jpeg(server):
    status, headers, body = _req(server, "GET", "/frame.jpg")
    assert status == 200
    assert headers["Content-Type"] == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI
    from PIL import Image

    img = Image.open(io.BytesIO(body))
    assert img.size == (32, 16)


def test_mjpeg_stream_delivers_frames(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        conn.request("GET", "/stream")
        resp = conn.getresponse()
        assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
        data = b""
        deadline = time.time() + 30
        while data.count(b"--frame") < 2 and time.time() < deadline:
            data += resp.read1(65536)
        assert data.count(b"--frame") >= 2
        assert b"\xff\xd8" in data
    finally:
        conn.close()


def test_live_hotkeys(server):
    """R/P/N/B/V/L/C + movement + mouse, posted over HTTP, mutate the
    session exactly like the reference's key_callback."""
    s = server.session
    assert float(s.effects.use_bloom) == 1.0
    _req(server, "POST", "/key?k=b")
    assert float(s.effects.use_bloom) == 0.0
    _req(server, "POST", "/key?k=v")
    assert float(s.effects.use_vignette) == 0.0
    _req(server, "POST", "/key?k=l")
    assert float(s.effects.use_lens_distortion) == 0.0
    _req(server, "POST", "/key?k=c")
    assert float(s.effects.use_chromatic_aberration) == 1.0

    _req(server, "POST", "/key?k=p")
    assert s.paths.active
    _req(server, "POST", "/key?k=n")
    assert s.paths.current_path_index == 1
    _req(server, "POST", "/key?k=p")
    assert not s.paths.active

    yaw0 = s.camera.yaw
    _req(server, "POST", "/mouse?dx=50&dy=0")
    assert s.camera.yaw != yaw0
    x0 = s.camera.pos[0]
    _req(server, "POST", "/key?k=d")
    assert s.camera.pos[0] != x0

    _req(server, "POST", "/key?k=r")
    assert s.recorder.is_recording
    # let the render loop capture at least one recorded frame
    deadline = time.time() + 30
    while time.time() < deadline:
        if s.recorder._sink is not None and s.recorder._sink.frames_written():
            break
        time.sleep(0.05)
    _req(server, "POST", "/key?k=r")
    assert not s.recorder.is_recording


def test_terminal_preview():
    out = io.StringIO()
    session = _tiny_session()
    run_terminal_preview(session, frames=2, width=16, fps_cap=1000.0, out=out)
    session.close()
    text = out.getvalue()
    assert "▀" in text
    assert "FPS" in text  # status line


def test_render_loop_error_surfaces():
    """A dying render loop must not freeze the viewer silently: /status
    turns 500 with the error and the stream wakes up."""

    class ExplodingSession:
        def tick(self, dt):
            raise RuntimeError("chip fell over")

        def status(self):
            return "FPS: 0"

        def close(self):
            pass

    srv = PreviewServer(ExplodingSession(), host="127.0.0.1", port=0)
    srv.start()
    try:
        deadline = time.time() + 10
        status = None
        while time.time() < deadline:
            status, _, body = _req(srv, "GET", "/status")
            if status == 500:
                break
            time.sleep(0.05)
        assert status == 500 and b"chip fell over" in body
    finally:
        srv.stop()
