"""IO + host runtime: native frame sink, video recorder, animation job,
headless session (reference: ScreenRecorder main.cpp:29-124, main loop
main.cpp:482-539)."""

import json
import os
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from relativisticraytracer_tpu.config import RenderSettings, SceneConfig
from relativisticraytracer_tpu.io.image import load_skybox, save_png
from relativisticraytracer_tpu.io.video import (
    VideoRecorder,
    ffmpeg_command,
    timestamped_filename,
)
from relativisticraytracer_tpu.paths import default_paths
from relativisticraytracer_tpu.render.pipeline import Renderer
from relativisticraytracer_tpu.render.skybox import procedural_starfield
from relativisticraytracer_tpu.runtime.app import AnimationJob, Session
from relativisticraytracer_tpu.runtime.framesink import FrameSink, _load_library


def test_native_library_builds_and_loads():
    lib = _load_library()
    assert lib is not None, "native framesink failed to build/load"


@pytest.mark.parametrize("force_python", [False, True])
def test_framesink_file_roundtrip(tmp_path, force_python):
    out = tmp_path / "frames.rgba"
    frame_bytes = 16 * 8 * 4
    sink = FrameSink(str(out), frame_bytes, mode="file",
                     queue_frames=4, force_python=force_python)
    assert sink.native == (not force_python)
    frames = [bytes([i] * frame_bytes) for i in range(10)]
    for f in frames:
        sink.submit(f)
    n = sink.close()
    assert n == 10
    data = out.read_bytes()
    assert data == b"".join(frames)  # order preserved, nothing dropped


def test_framesink_pipe_roundtrip(tmp_path):
    out = tmp_path / "piped.bin"
    sink = FrameSink(f"cat > {out}", 64, mode="pipe", queue_frames=2)
    for i in range(5):
        sink.submit(bytes([i]) * 64)
    assert sink.close() == 5
    assert len(out.read_bytes()) == 5 * 64


def test_framesink_rejects_wrong_size(tmp_path):
    sink = FrameSink(str(tmp_path / "x.bin"), 64, mode="file")
    with pytest.raises(ValueError):
        sink.submit(b"short")
    sink.close()


def test_ffmpeg_command_matches_reference_settings():
    cmd = ffmpeg_command(1000, 700, 24, "out.mp4")
    # reference: main.cpp:61-72, minus vflip (our rows are already top-down)
    for part in ["-f rawvideo", "-pix_fmt rgba", "-s 1000x700", "-r 24",
                 "-c:v libx264", "-preset fast", "-crf 18",
                 "-pix_fmt yuv420p"]:
        assert part in cmd
    # shlex.quote: plain paths stay bare, shell metacharacters get quoted
    assert cmd.endswith(" out.mp4")
    assert ffmpeg_command(64, 64, 24, "a b$.mp4").endswith(" 'a b$.mp4'")
    assert "vflip" not in cmd


def test_timestamped_filename_shape():
    name = timestamped_filename()
    assert name.startswith("recording_") and name.endswith(".mp4")
    assert len(name) == len("recording_20260101_120000.mp4")


def test_video_recorder_raw_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    rec = VideoRecorder(8, 4, out_path=str(tmp_path / "clip.mp4"))
    path = rec.start()
    assert path.endswith(".rgba")
    frame = np.arange(8 * 4 * 4, dtype=np.uint8).reshape(4, 8, 4)
    rec.capture(frame)
    rec.capture(frame)
    assert rec.stop() == 2
    raw = pathlib.Path(path).read_bytes()
    assert raw == frame.tobytes() * 2
    sidecar = json.loads(pathlib.Path(path).with_suffix(".json").read_text())
    assert "libx264" in sidecar["encode_with"]


def test_sidecar_encode_command_quotes_hostile_paths(tmp_path, monkeypatch):
    """The sidecar's encode_with is published for users to paste into a
    shell: BOTH the spliced input path and the output path must be
    shlex-quoted, or a path with $/quotes/spaces splits the command or
    expands (review finding: the input splice used naked double quotes)."""
    import shlex

    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    hostile = tmp_path / 'rec $1 "x".mp4'
    rec = VideoRecorder(8, 4, out_path=str(hostile))
    path = rec.start()
    rec.capture(np.zeros((4, 8, 4), dtype=np.uint8))
    rec.stop()
    cmd = json.loads(
        pathlib.Path(path).with_suffix(".json").read_text())["encode_with"]
    words = shlex.split(cmd)
    # the raw input path round-trips through shell tokenization intact
    assert words[words.index("-i") + 1] == path
    assert words[-1] == str(hostile)
    assert '"' + path + '"' not in cmd  # no naked double-quoting


def _tiny_renderer(width=16, height=12):
    scene = SceneConfig(max_steps=24)
    settings = RenderSettings(width=width, height=height, max_steps=24,
                              chunk=8)
    return Renderer(scene, settings, skybox_rgba=procedural_starfield(16, 32))


def test_animation_job_runs_and_resumes(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    r = _tiny_renderer()
    path = default_paths()[0]
    out = str(tmp_path / "anim.rgba")
    job = AnimationJob(path=path, renderer=r, fps=2, duration=3.0,
                       out_path=out, checkpoint_every=2)
    stats = job.run()
    assert stats["frames"] == 6 and stats["frames_written"] == 6
    assert stats["resumed_at"] == 0
    size_full = pathlib.Path(stats["out_path"]).stat().st_size
    assert size_full == 6 * 16 * 12 * 4

    # simulate an interrupted job: checkpoint says 4 frames done, and the
    # crash left a partial 5th frame on disk
    ck = pathlib.Path(stats["out_path"] + ".ckpt.json")
    ck.write_text(json.dumps({"next_frame": 4, "out_path": stats["out_path"]}))
    raw = pathlib.Path(stats["out_path"])
    frame_bytes = 16 * 12 * 4
    raw.write_bytes(raw.read_bytes()[: 4 * frame_bytes + 100])
    stats2 = job.run(resume=True)
    assert stats2["resumed_at"] == 4
    assert stats2["frames"] == 2
    assert not ck.exists()  # cleared on completion
    # frames 0-3 survived the resume; partial frame dropped; 4-5 re-rendered
    assert raw.stat().st_size == size_full


def test_session_controls(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    monkeypatch.chdir(tmp_path)
    s = Session(renderer=_tiny_renderer())
    frame = s.tick(0.016)
    assert frame.shape == (12, 16, 4)
    # effect toggles flip the pytree flags (no retrace; see pipeline test)
    assert float(s.effects.use_bloom) == 1.0
    s.handle_key("b")
    assert float(s.effects.use_bloom) == 0.0
    # path toggle + next
    s.handle_key("p")
    assert s.paths.active
    s.handle_key("n")
    assert s.paths.current_path_index == 1
    # fixed-step clock while recording
    s.handle_key("r")
    assert s.recorder.is_recording
    t0 = s.sim_time
    s.tick(12345.0)  # wall dt ignored while recording
    assert abs(s.sim_time - (t0 + 1.0 / 24)) < 1e-9
    s.handle_key("r")
    assert not s.recorder.is_recording
    # movement quirk: space moves down
    y0 = float(s.camera.pos[1])
    s.handle_key("space")
    assert float(s.camera.pos[1]) < y0
    assert "Relativistic Ray Tracer" in s.status()
    s.close()


def test_load_skybox_fallback_and_png(tmp_path):
    sky = load_skybox(None, fallback_shape=(16, 32))
    assert sky.shape == (16, 32, 4)
    # write + read back through PIL
    p = tmp_path / "sub" / "img.png"
    save_png(str(p), sky)
    from relativisticraytracer_tpu.io.image import load_image_rgba

    back = load_image_rgba(str(p))
    np.testing.assert_array_equal(back, sky)
    # a real image file loads
    sky2 = load_skybox(str(p))
    np.testing.assert_array_equal(sky2, sky)


def test_second_recording_gets_fresh_filename(tmp_path, monkeypatch):
    """Auto-named recordings must not overwrite the previous one
    (reference generates a new timestamped name per start, main.cpp:36-50)."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    monkeypatch.chdir(tmp_path)
    import time as _t

    rec = VideoRecorder(4, 2)
    first = rec.start()
    rec.capture(np.zeros((2, 4, 4), dtype=np.uint8))
    rec.stop()
    _t.sleep(1.1)  # timestamped filename has 1s resolution
    second = rec.start()
    rec.stop()
    assert first != second
    assert pathlib.Path(first).exists() and pathlib.Path(second).exists()


def test_python_sink_survives_dead_consumer(tmp_path):
    """A dying pipe consumer must raise, not deadlock the render loop."""
    import time as _t

    sink = FrameSink("head -c 64 > /dev/null", 64, mode="pipe",
                     queue_frames=2, force_python=True)
    _t.sleep(0.3)  # let head read one frame's worth and exit

    with pytest.raises(IOError):
        # After head exits the OS pipe buffer (64KB) absorbs a bit more,
        # then writes raise BrokenPipeError in the drain thread; submit must
        # surface that instead of blocking forever on the full queue.
        for _ in range(5000):
            sink.submit(b"x" * 64)
        sink.close()


def test_resume_clamps_to_frames_on_disk(tmp_path, monkeypatch):
    """Checkpoint ahead of the flushed file (async sink + crash) must resume
    from the on-disk frame count, not the checkpoint's."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    r = _tiny_renderer()
    out = str(tmp_path / "anim.rgba")
    job = AnimationJob(path=default_paths()[0], renderer=r, fps=2,
                       duration=3.0, out_path=out, checkpoint_every=2)
    stats = job.run()
    raw = pathlib.Path(stats["out_path"])
    frame_bytes = 16 * 12 * 4
    full = raw.read_bytes()
    # crash lost 2 queued frames: disk has 2, checkpoint claims 4
    raw.write_bytes(full[: 2 * frame_bytes])
    pathlib.Path(stats["out_path"] + ".ckpt.json").write_text(
        json.dumps({"next_frame": 4, "out_path": stats["out_path"]})
    )
    stats2 = job.run(resume=True)
    assert stats2["resumed_at"] == 2  # clamped to disk, not 4
    assert raw.stat().st_size == 6 * frame_bytes
    assert raw.read_bytes() == full  # no zero-filled garbage frames


# ---------------------------------------------------------------------------
# Segmented MP4 resume (VideoRecorder pipe mode driven by a fake ffmpeg) and
# frame-parallel multi-device animation
# ---------------------------------------------------------------------------

FAKE_FFMPEG = r'''#!/usr/bin/env python3
"""Fake ffmpeg for tests: rawvideo mode copies stdin to the output file;
concat mode concatenates the listed files. Output = last argument."""
import sys

args = sys.argv[1:]
out = args[-1]
if "concat" in args:
    lst = args[args.index("-i") + 1]
    data = b""
    for line in open(lst):
        line = line.strip()
        if line.startswith("file "):
            path = line[5:].strip().strip("'\"")
            data += open(path, "rb").read()
else:
    data = sys.stdin.buffer.read()
open(out, "wb").write(data)
'''


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    """Install an `ffmpeg` shim on PATH that writes raw bytes, so MP4-mode
    plumbing (pipe sink, segments, concat) is testable hermetically."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "ffmpeg"
    exe.write_text(FAKE_FFMPEG)
    exe.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    import shutil

    assert shutil.which("ffmpeg") == str(exe)
    return exe


@pytest.mark.slow
def test_animation_mp4_segments_and_resume(tmp_path, monkeypatch, fake_ffmpeg):
    """MP4 jobs checkpoint via finalized segments and RESUME mid-stream
    (VERDICT r1 #6: no more re-render-from-0 when ffmpeg exists)."""
    monkeypatch.chdir(tmp_path)
    r = _tiny_renderer()
    path = default_paths()[0]
    frame_bytes = 16 * 12 * 4

    # ground truth: uninterrupted run
    full = AnimationJob(path=path, renderer=r, fps=2, duration=3.0,
                        out_path=str(tmp_path / "full.mp4"),
                        checkpoint_every=2).run()
    assert full["frames"] == 6 and full["frames_written"] == 6
    want = (tmp_path / "full.mp4").read_bytes()
    assert len(want) == 6 * frame_bytes
    assert not (tmp_path / "full.mp4.ckpt.json").exists()
    assert not (tmp_path / "full.mp4.segs").exists()

    # interrupted run: die after 3 captured frames
    out2 = str(tmp_path / "resumed.mp4")
    job = AnimationJob(path=path, renderer=r, fps=2, duration=3.0,
                       out_path=out2, checkpoint_every=2)

    class Boom(RuntimeError):
        pass

    def bomb(k, n, ms):
        if k >= 3:
            raise Boom()

    with pytest.raises(Boom):
        job.run(progress=bomb)
    ck = json.loads((tmp_path / "resumed.mp4.ckpt.json").read_text())
    assert ck["next_frame"] >= 2  # at least one finalized segment survived
    assert ck["next_frame"] < 6

    stats = job.run(resume=True)
    assert stats["resumed_at"] == ck["next_frame"]
    assert stats["frames"] == 6 - ck["next_frame"]
    got = (tmp_path / "resumed.mp4").read_bytes()
    assert got == want  # byte-identical to the uninterrupted run
    assert not (tmp_path / "resumed.mp4.ckpt.json").exists()


def test_animation_mp4_resume_geometry_mismatch(tmp_path, monkeypatch,
                                                fake_ffmpeg):
    monkeypatch.chdir(tmp_path)
    from relativisticraytracer_tpu.io.video import SegmentedRecorder

    out = str(tmp_path / "a.mp4")
    seg = SegmentedRecorder(16, 12, 2, out_path=out, segment_frames=2)
    seg.capture(np.zeros((12, 16, 4), np.uint8))
    seg.capture(np.zeros((12, 16, 4), np.uint8))
    seg.abort()
    other = SegmentedRecorder(32, 24, 2, out_path=out, segment_frames=2)
    with pytest.raises(ValueError, match="geometry"):
        other.resume()


@pytest.mark.slow
def test_animation_frame_parallel_devices(tmp_path, monkeypatch):
    """Round-robin frame-parallel rendering across (virtual) devices must
    produce the identical video byte stream (VERDICT r1 #3)."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    r = _tiny_renderer()
    path = default_paths()[0]

    single = AnimationJob(path=path, renderer=r, fps=2, duration=2.0,
                          out_path=str(tmp_path / "one.rgba")).run()
    multi = AnimationJob(path=path, renderer=r, fps=2, duration=2.0,
                         out_path=str(tmp_path / "many.rgba")).run(
        devices=jax.devices()[:4]
    )
    assert multi["devices"] == 4
    assert single["frames_written"] == multi["frames_written"] == 4
    a = pathlib.Path(single["out_path"]).read_bytes()
    b = pathlib.Path(multi["out_path"]).read_bytes()
    assert a == b


def test_session_state_roundtrip(tmp_path, monkeypatch):
    """Session pose/clock/effects/path persist across instances."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    s1 = Session(renderer=_tiny_renderer())
    s1.handle_key("b")          # bloom off
    s1.handle_key("d")          # move right
    s1.mouse(30.0, -5.0)
    s1.handle_key("p")          # start path playback
    s1.handle_key("n")
    s1.tick(1.0 / 24.0)
    state_file = tmp_path / "session.json"
    s1.save_state(str(state_file))
    s1.close()

    s2 = Session(renderer=_tiny_renderer())
    s2.load_state(str(state_file))
    assert float(s2.effects.use_bloom) == 0.0
    np.testing.assert_allclose(s2.camera.pos, s1.camera.pos)
    assert s2.camera.yaw == s1.camera.yaw
    assert s2.camera.pitch == s1.camera.pitch
    assert s2.sim_time == s1.sim_time
    assert s2.paths.active and s2.paths.current_path_index == 1
    assert s2.paths.path_time == s1.paths.path_time
    # and it renders from the restored state
    frame = s2.tick(1.0 / 24.0)
    assert frame.shape == (12, 16, 4)
    s2.close()


def test_load_state_tolerates_corrupt_file(tmp_path, monkeypatch):
    """A truncated/incompatible state file must not make launches crash:
    load_state returns False and leaves the session at defaults."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    bad = tmp_path / "session.json"
    bad.write_text('{"pos": [0.0, 10.')  # killed mid-write
    s = Session(renderer=_tiny_renderer())
    default_pos = s.camera.pos.copy()
    assert s.load_state(str(bad)) is False
    np.testing.assert_array_equal(s.camera.pos, default_pos)
    # wrong schema (e.g. an effects field renamed between versions)
    bad.write_text('{"pos": [0, 1, 2], "yaw": 0, "pitch": 0, "sim_time": 0,'
                   ' "path_index": 0, "path_active": false, "path_time": 0,'
                   ' "effects": {"no_such_field": 1}}')
    assert s.load_state(str(bad)) is False
    # and a good save still round-trips (atomic write leaves no .tmp)
    good = tmp_path / "ok.json"
    s.save_state(str(good))
    assert not list(tmp_path.glob("*.tmp"))
    assert s.load_state(str(good)) is True
    s.close()


def test_animation_png_sequence_and_resume(tmp_path):
    """Directory out_path -> PNG frame sequence: resumable from the files
    alone (no sidecar), fresh runs wipe stale frames."""
    r = _tiny_renderer()
    out_dir = tmp_path / "frames"
    job = AnimationJob(path=default_paths()[0], renderer=r, fps=2,
                       duration=3.0, out_path=str(out_dir) + "/")
    stats = job.run()
    assert stats["frames_written"] == 6
    files = sorted(out_dir.glob("frame_*.png"))
    assert [f.name for f in files] == [f"frame_{k:05d}.png" for k in range(6)]
    orig = [f.read_bytes() for f in files]
    # interrupted run: the tail is missing; resume renders ONLY the gap and
    # reproduces identical frames (each frame is a pure function of k)
    for f in files[3:]:
        f.unlink()
    stats2 = job.run(resume=True)
    assert stats2["resumed_at"] == 3
    now = sorted(out_dir.glob("frame_*.png"))
    assert [f.read_bytes() for f in now] == orig
    # resume=False starts over from frame 0
    stats3 = job.run(resume=False)
    assert stats3["resumed_at"] == 0
    assert [f.read_bytes() for f in sorted(out_dir.glob("frame_*.png"))] == orig


def test_motion_adaptive_preview_quality(monkeypatch):
    """With a motion renderer set, frames right after user input use it;
    idle frames and ALL recorded frames use the full-quality renderer."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    quality, motion = _tiny_renderer(), _tiny_renderer()
    used = []
    for tag, r in (("quality", quality), ("motion", motion)):
        real = r.render_np
        r.render_np = (lambda real, tag: lambda *a, **k: (
            used.append(tag), real(*a, **k))[1])(real, tag)
    s = Session(renderer=quality, motion_renderer=motion, motion_hold_s=0.2)
    s.tick(0.01)                      # no input yet -> quality
    s.handle_key("w")
    s.tick(0.01)                      # just moved -> motion
    s.mouse(5.0, 0.0)
    s.tick(0.01)                      # just looked -> motion
    import time as _t

    _t.sleep(0.25)
    s.tick(0.01)                      # hold expired -> quality
    s.handle_key("w")
    s.handle_key("r")                 # recording: always quality
    s.tick(0.01)
    s.handle_key("r")
    s.close()
    assert used == ["quality", "motion", "motion", "quality", "quality"]


def test_raw_resume_refuses_missing_sidecar(tmp_path, monkeypatch):
    """Appending to a raw file of unknown geometry would corrupt it; a
    missing sidecar must refuse the resume instead."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    out = tmp_path / "rec.rgba"
    rec = VideoRecorder(16, 12, fps=2, out_path=str(out))
    rec.start()
    rec.capture(np.zeros((12, 16, 4), dtype=np.uint8))
    rec.stop()
    out.with_suffix(".json").unlink()
    rec2 = VideoRecorder(16, 12, fps=2, out_path=str(out))
    with pytest.raises(ValueError, match="sidecar"):
        rec2.start(append_frames=1)


def test_record_toggle_race_with_render_loop(monkeypatch):
    """Toggling recording from another thread (the preview server's HTTP
    handlers) while tick() runs must never crash the render loop."""
    import threading as _th

    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    s = Session(renderer=_tiny_renderer())
    stop = _th.Event()

    def toggler():
        while not stop.is_set():
            s.handle_key("r")

    t = _th.Thread(target=toggler, daemon=True)
    t.start()
    try:
        for _ in range(60):
            s.tick(0.01)
    finally:
        stop.set()
        t.join(5.0)
    s.close()


def test_sink_surfaces_nonzero_pipe_exit(tmp_path):
    """A pipe target that consumes every byte but exits nonzero (FFmpeg
    failing at MP4 finalize) must fail close(), not report success."""
    sink = FrameSink("cat > /dev/null; exit 3", 64, mode="pipe",
                     queue_frames=2)
    sink.submit(b"x" * 64)
    with pytest.raises(IOError):
        sink.close()


def test_motion_race_defers_capture_to_next_tick(monkeypatch):
    """If recording toggles ON (HTTP thread) after tick() snapshotted the
    recording flag, THAT tick must not capture at all: its frame may be
    motion-quality and its sim step was wall-clock sized. Recording starts
    on the next tick — full quality AND the pinned 1/RECORDING_FPS step
    (advisor round 2; clock half round 3)."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    quality, motion = _tiny_renderer(), _tiny_renderer()
    used = []
    s = Session(renderer=quality, motion_renderer=motion, motion_hold_s=5.0)

    def tag(r, name, race=False):
        real = r.render_np

        def wrapped(*a, **k):
            used.append(name)
            if race and not s.recorder.is_recording:
                s.handle_key("r")  # recording toggles on MID-render
            return real(*a, **k)

        r.render_np = wrapped

    tag(quality, "quality")
    tag(motion, "motion", race=True)
    captured = []
    real_capture = s.recorder.capture
    s.recorder.capture = lambda f: (captured.append(list(used)),
                                    real_capture(f))[1]
    s.handle_key("w")                  # recent input -> motion renderer
    t0 = s.sim_time
    s.tick(0.01)
    # racing tick: motion frame rendered, NOT captured, wall-clock step
    assert used == ["motion"]
    assert captured == []
    assert abs(s.sim_time - (t0 + 0.01)) < 1e-9
    t1 = s.sim_time
    s.tick(0.01)
    s.close()
    # next tick: recording is on -> full quality, pinned recording step
    assert used == ["motion", "quality"]
    assert len(captured) == 1
    from relativisticraytracer_tpu.runtime.app import RECORDING_FPS
    assert abs(s.sim_time - (t1 + 1.0 / RECORDING_FPS)) < 1e-9


def test_png_resume_geometry_mismatch(tmp_path):
    """Resuming a PNG sequence at a different resolution must refuse, like
    VideoRecorder's geometry-checked sidecar (advisor round 2)."""
    from relativisticraytracer_tpu.io.image import FrameSequenceWriter

    a = FrameSequenceWriter(str(tmp_path), 16, 12)
    a.resume()
    a.capture(np.zeros((12, 16, 4), dtype=np.uint8))
    b = FrameSequenceWriter(str(tmp_path), 8, 6)
    with pytest.raises(ValueError, match="16x12"):
        b.resume()


def test_png_resume_drops_stale_tail(tmp_path):
    """Resuming with a SHORTER duration must not leave stale high-index
    frames from the longer previous run in the directory (advisor round 2)."""
    r = _tiny_renderer()
    out_dir = tmp_path / "frames"
    job = AnimationJob(path=default_paths()[0], renderer=r, fps=2,
                       duration=3.0, out_path=str(out_dir) + "/")
    job.run()
    assert len(list(out_dir.glob("frame_*.png"))) == 6
    short = AnimationJob(path=default_paths()[0], renderer=r, fps=2,
                         duration=2.0, out_path=str(out_dir) + "/")
    stats = short.run(resume=True)
    files = sorted(f.name for f in out_dir.glob("frame_*.png"))
    assert files == [f"frame_{k:05d}.png" for k in range(4)]
    assert stats["frames_written"] == 4


def test_yuv420_converter_matches_oracle():
    """On-device RGBA->YUV420 (BT.601 limited, 2x2 box chroma) against an
    independent NumPy transcription."""
    from relativisticraytracer_tpu.render.postfx import yuv420_from_rgba8

    rng = np.random.RandomState(7)
    h, w = 12, 16
    frame = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
    got = np.asarray(yuv420_from_rgba8(jnp.asarray(frame)))
    assert got.shape == (h * w * 3 // 2,) and got.dtype == np.uint8

    rgb = frame[..., :3].astype(np.float64) / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    yp = 0.299 * r + 0.587 * g + 0.114 * b
    y8 = np.clip(16.0 + 219.0 * yp + 0.5, 0, 255).astype(np.uint8)
    u = 128.0 + 112.0 * (b - yp) / 0.886
    v = 128.0 + 112.0 * (r - yp) / 0.701

    def sub(c):
        c = c.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        return np.clip(c + 0.5, 0, 255).astype(np.uint8)

    want = np.concatenate([y8.reshape(-1), sub(u).reshape(-1),
                           sub(v).reshape(-1)])
    # f32-vs-f64 rounding can flip a value sitting exactly on a .5 boundary
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    # odd dims refuse
    with pytest.raises(ValueError, match="even"):
        yuv420_from_rgba8(jnp.zeros((11, 16, 4), jnp.uint8))


def test_animation_yuv_transfer_raw_sink(tmp_path, monkeypatch):
    """transfer='yuv420p': frames are converted ON DEVICE and the raw sink
    stores 1.5 B/px planar frames with a correct FFmpeg sidecar; resume
    appends at the right offset."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    r = _tiny_renderer()
    out = str(tmp_path / "anim.mp4")
    job = AnimationJob(path=default_paths()[0], renderer=r, fps=2,
                       duration=3.0, out_path=out, checkpoint_every=2,
                       transfer="yuv420p")
    stats = job.run()
    raw = pathlib.Path(stats["out_path"])
    assert raw.suffix == ".yuv"
    fb = 16 * 12 * 3 // 2
    assert raw.stat().st_size == 6 * fb
    side = json.loads(raw.with_suffix(".json").read_text())
    assert side["pix_fmt"] == "yuv420p"
    assert "-pix_fmt yuv420p" in side["encode_with"].split("-c:v")[0]

    # interrupted: checkpoint at 4, partial 5th frame on disk
    ck = pathlib.Path(stats["out_path"] + ".ckpt.json")
    ck.write_text(json.dumps({"next_frame": 4, "out_path": stats["out_path"]}))
    raw.write_bytes(raw.read_bytes()[: 4 * fb + 7])
    stats2 = job.run(resume=True)
    assert stats2["resumed_at"] == 4
    assert raw.stat().st_size == 6 * fb

    # PNG-sequence target cannot take planar yuv
    job_png = AnimationJob(path=default_paths()[0], renderer=r, fps=2,
                           duration=1.0, out_path=str(tmp_path / "seq") + "/",
                           transfer="yuv420p")
    with pytest.raises(ValueError, match="rgba"):
        job_png.run()


def test_png_fresh_run_overwrites_different_resolution(tmp_path):
    """run(resume=False) into a directory of frames from a DIFFERENT
    resolution must clear and re-render, not trip the resume-geometry
    guard (review round 3: the guard ran before the fresh-run cleanup)."""
    out_dir = tmp_path / "frames"
    job = AnimationJob(path=default_paths()[0], renderer=_tiny_renderer(),
                       fps=2, duration=1.0, out_path=str(out_dir) + "/")
    job.run()
    assert len(list(out_dir.glob("frame_*.png"))) == 2
    r2 = _tiny_renderer(width=8, height=6)
    job2 = AnimationJob(path=default_paths()[0], renderer=r2, fps=2,
                        duration=1.0, out_path=str(out_dir) + "/")
    stats = job2.run(resume=False)
    assert stats["frames_written"] == 2
    from PIL import Image

    with Image.open(out_dir / "frame_00000.png") as im:
        assert im.size == (8, 6)


def test_mp4_resume_shorter_duration_drops_tail_segments(
        tmp_path, monkeypatch, fake_ffmpeg):
    """Resuming an MP4 job with a SHORTER --duration must not concatenate
    the longer prior run's tail segments into the final video (review
    round 3); the byte result equals an uninterrupted short run."""
    monkeypatch.chdir(tmp_path)
    r = _tiny_renderer()
    path = default_paths()[0]
    frame_bytes = 16 * 12 * 4

    want = None
    short_ref = AnimationJob(path=path, renderer=r, fps=2, duration=2.0,
                             out_path=str(tmp_path / "ref.mp4"),
                             checkpoint_every=2).run()
    assert short_ref["frames_written"] == 4
    want = (tmp_path / "ref.mp4").read_bytes()

    out = str(tmp_path / "clip.mp4")
    long_job = AnimationJob(path=path, renderer=r, fps=2, duration=3.0,
                            out_path=out, checkpoint_every=2)

    class Boom(RuntimeError):
        pass

    def bomb(k, n, ms):
        if k >= 5:
            raise Boom()

    with pytest.raises(Boom):
        long_job.run(progress=bomb)  # leaves segments covering >= 4 frames

    short_job = AnimationJob(path=path, renderer=r, fps=2, duration=2.0,
                             out_path=out, checkpoint_every=2)
    stats = short_job.run(resume=True)
    assert stats["frames"] >= 0  # never negative (was -? pre-fix)
    assert stats["frames_written"] == 4
    assert (tmp_path / "clip.mp4").read_bytes() == want
    assert len(want) == 4 * frame_bytes


def test_raw_resume_shorter_duration_truncates(tmp_path, monkeypatch):
    """Raw-file resume with a shorter duration clamps to the new frame
    count and truncates the stale tail (review round 3)."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    r = _tiny_renderer()
    path = default_paths()[0]
    out = str(tmp_path / "clip.rgba")
    frame_bytes = 16 * 12 * 4

    AnimationJob(path=path, renderer=r, fps=2, duration=3.0,
                 out_path=out, checkpoint_every=2).run()
    assert (tmp_path / "clip.rgba").stat().st_size == 6 * frame_bytes
    # the finished run removed its checkpoint; fabricate a crashed state
    import json as _json

    job2 = AnimationJob(path=path, renderer=r, fps=2, duration=2.0,
                        out_path=out, checkpoint_every=2)
    ckpt_path = job2._checkpoint_path(out)
    ckpt_path.write_text(_json.dumps({"next_frame": 6, "out_path": out}))
    stats = job2.run(resume=True)
    assert stats["frames"] == 0        # all 4 requested frames already done
    assert stats["frames_written"] == 0  # written THIS run (raw-sink count)
    assert (tmp_path / "clip.rgba").stat().st_size == 4 * frame_bytes


def test_png_resume_fps_mismatch(tmp_path):
    """PNG frames carry their recording fps (rrt_fps text chunk); resuming
    at a different --fps refuses — the frames sit on different sim clocks
    (review round 3)."""
    from relativisticraytracer_tpu.io.image import FrameSequenceWriter

    a = FrameSequenceWriter(str(tmp_path), 16, 12, fps=24)
    a.resume()
    a.capture(np.zeros((12, 16, 4), dtype=np.uint8))
    b = FrameSequenceWriter(str(tmp_path), 16, 12, fps=48)
    with pytest.raises(ValueError, match="24 fps"):
        b.resume()
    # same fps resumes fine; unknown old fps (no chunk) is accepted
    c = FrameSequenceWriter(str(tmp_path), 16, 12, fps=24)
    assert c.resume() == 1


def test_ffmpeg_command_shell_quotes_out_path():
    """out_path is interpolated into a shell=True command; quoting must be
    shlex-safe (review round 3)."""
    from relativisticraytracer_tpu.io.video import ffmpeg_command

    cmd = ffmpeg_command(4, 2, 24, "a $(hostname) \"b\".mp4")
    assert "$(hostname)" in cmd
    assert "'a $(hostname) \"b\".mp4'" in cmd
