"""Video recording: frames -> FFmpeg H.264 MP4 (reference: ScreenRecorder,
src/main.cpp:29-124).

The FFmpeg command replicates the reference encode settings exactly
(main.cpp:60-72): rawvideo rgba input at RECORDING_FPS, libx264, preset
fast, CRF 18, yuv420p — EXCEPT `-vf vflip`, which the reference needs only
because glReadPixels returns bottom-up rows; our frames are already
top-down (see render/camera.py orientation note).

When no `ffmpeg` binary exists (e.g. this TPU image), frames are written to
a raw `.rgba` file next to a `.json` sidecar containing the exact FFmpeg
command that finishes the job elsewhere.
"""

from __future__ import annotations

import datetime
import json
import pathlib
import shutil
from typing import Optional

import numpy as np

from relativisticraytracer_tpu.config import RECORDING_FPS
from relativisticraytracer_tpu.runtime.framesink import FrameSink


def ffmpeg_command(width: int, height: int, fps: int, out_path: str) -> str:
    """The reference encoder line (main.cpp:61-72), minus the vflip."""
    return (
        "ffmpeg -y "
        "-f rawvideo "
        "-pix_fmt rgba "
        f"-s {width}x{height} "
        f"-r {fps} "
        "-i - "
        "-c:v libx264 "
        "-preset fast "
        "-crf 18 "
        "-pix_fmt yuv420p "
        f'"{out_path}"'
    )


def timestamped_filename(prefix: str = "recording", ext: str = "mp4") -> str:
    """recording_YYYYmmdd_HHMMSS.mp4 (reference: main.cpp:36-50)."""
    now = datetime.datetime.now()
    return f"{prefix}_{now.strftime('%Y%m%d_%H%M%S')}.{ext}"


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


class VideoRecorder:
    """Streaming recorder with the reference's start/capture/stop lifecycle
    (main.cpp:52-124), backed by the async native frame sink."""

    def __init__(self, width: int, height: int, fps: int = RECORDING_FPS,
                 out_path: Optional[str] = None, queue_frames: int = 8):
        self.width = width
        self.height = height
        self.fps = fps
        self.frame_bytes = width * height * 4
        self._sink: Optional[FrameSink] = None
        self._user_out_path = out_path
        self.out_path = out_path
        self.raw_fallback = not ffmpeg_available()

    @property
    def is_recording(self) -> bool:
        return self._sink is not None

    def start(self, append_frames: int = 0) -> str:
        """Open the sink. append_frames > 0 (raw mode only) resumes an
        interrupted recording: the existing file is truncated to exactly
        that many whole frames and subsequent captures append."""
        if self._sink is not None:
            return self.out_path
        # Auto-named recordings get a FRESH timestamped file per start, like
        # the reference (main.cpp:36-57); an explicit out_path is reused.
        if self.raw_fallback:
            self.out_path = self._user_out_path or timestamped_filename(ext="rgba")
            if not self.out_path.endswith(".rgba"):
                self.out_path = str(
                    pathlib.Path(self.out_path).with_suffix(".rgba")
                )
            append = append_frames > 0 and pathlib.Path(self.out_path).exists()
            if append:
                # The raw file is only resumable if it was written at this
                # exact geometry — check the sidecar before truncating.
                side = pathlib.Path(self.out_path).with_suffix(".json")
                if side.exists():
                    prev = json.loads(side.read_text())
                    if (prev.get("width"), prev.get("height")) != (
                        self.width, self.height
                    ):
                        raise ValueError(
                            f"cannot resume {self.out_path}: it holds "
                            f"{prev.get('width')}x{prev.get('height')} frames, "
                            f"recorder is {self.width}x{self.height}"
                        )
                # Drop any partial frame a crash may have left behind.
                import os

                os.truncate(self.out_path, append_frames * self.frame_bytes)
            sidecar = {
                "format": "rawvideo rgba, top-down rows",
                "width": self.width,
                "height": self.height,
                "fps": self.fps,
                "encode_with": ffmpeg_command(
                    self.width, self.height, self.fps,
                    str(pathlib.Path(self.out_path).with_suffix(".mp4")),
                ).replace("-i -", f'-i "{self.out_path}"'),
            }
            pathlib.Path(self.out_path).with_suffix(".json").write_text(
                json.dumps(sidecar, indent=2)
            )
            self._sink = FrameSink(
                self.out_path, self.frame_bytes, mode="file", append=append
            )
        else:
            self.out_path = self._user_out_path or timestamped_filename()
            cmd = ffmpeg_command(self.width, self.height, self.fps, self.out_path)
            self._sink = FrameSink(cmd, self.frame_bytes, mode="pipe")
        return self.out_path

    def capture(self, frame: np.ndarray) -> None:
        """frame: uint8 [height, width, 4], top-down rows."""
        if self._sink is None:
            raise RuntimeError("recorder not started")
        if frame.shape != (self.height, self.width, 4) or frame.dtype != np.uint8:
            raise ValueError(f"bad frame {frame.shape} {frame.dtype}")
        self._sink.submit(np.ascontiguousarray(frame).tobytes())

    def stop(self) -> int:
        """Finalize; returns the number of frames written. The recorder is
        always reusable afterwards, even if the sink reports a write error
        (close() raising must not wedge is_recording)."""
        if self._sink is None:
            return 0
        try:
            return self._sink.close()
        finally:
            self._sink = None

    def toggle(self) -> bool:
        """R-key semantics (main.cpp:113-119). Returns new recording state."""
        if self.is_recording:
            self.stop()
            return False
        self.start()
        return True

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
