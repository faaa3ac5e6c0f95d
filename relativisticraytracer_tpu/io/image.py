"""Image IO: skybox loading and PNG stills.

Replaces the reference's vendored stb_image decode + cudaArray upload
(src/main.cpp:237-266) with PIL decode + `jax.device_put` (inside
`skybox_from_array`). The decoded image is RGBA8, matching the reference's
forced 4-channel load (main.cpp:240)."""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np


def load_image_rgba(path: str) -> np.ndarray:
    """Decode any PIL-supported image to uint8 [H, W, 4]."""
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGBA"), dtype=np.uint8)


def load_skybox(path: Optional[str] = None,
                fallback_shape=(1024, 2048)) -> np.ndarray:
    """Load an equirect skybox image; if `path` is None or unreadable,
    return the deterministic procedural starfield (the reference ships a
    JPEG asset we do not copy; any 2:1 equirect image drops in). Mirrors the
    reference's continue-on-failure behavior (main.cpp:241-244)."""
    if path is not None:
        try:
            return load_image_rgba(path)
        except Exception:
            pass
    from relativisticraytracer_tpu.render.skybox import procedural_starfield

    return procedural_starfield(*fallback_shape)


def save_png(path: str, frame: np.ndarray) -> None:
    """Write a uint8 [H, W, 3or4] frame as PNG."""
    from PIL import Image

    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.asarray(frame)).save(path)


class FrameSequenceWriter:
    """PNG frame-sequence sink: `out_dir/frame_00000.png`, `..._00001.png`…

    The encoder-free animation target (compositing workflows, or hosts
    without ffmpeg where a video container is unwanted). Each frame is
    written atomically (tmp + rename), so the finished files ARE the
    checkpoint: `resume()` returns the first missing index and a killed
    job continues exactly there — no sidecar state at all.
    """

    FMT = "frame_{:05d}.png"

    def __init__(self, out_dir: str, width: int, height: int,
                 fps: Optional[int] = None):
        self.dir = pathlib.Path(out_dir)
        self.width = width
        self.height = height
        self.fps = fps
        self._next = 0

    def resume(self) -> int:
        """First missing frame index (files must be consecutive from 0).

        Refuses to resume into a directory whose existing frames were
        written at a different resolution OR recording fps (each frame
        carries an `rrt_fps` PNG text chunk; frames at another fps sit on
        a different simulation clock) — the PNG-sequence analog of
        VideoRecorder's geometry-checked sidecar."""
        self.dir.mkdir(parents=True, exist_ok=True)
        first = self.dir / self.FMT.format(0)
        if first.exists():
            from PIL import Image

            with Image.open(first) as im:
                if im.size != (self.width, self.height):
                    raise ValueError(
                        f"cannot resume into {self.dir}: existing frames are "
                        f"{im.size[0]}x{im.size[1]}, this run renders "
                        f"{self.width}x{self.height}"
                    )
                prev_fps = im.text.get("rrt_fps") if hasattr(im, "text") else None
            if (self.fps is not None and prev_fps is not None
                    and int(prev_fps) != int(self.fps)):
                raise ValueError(
                    f"cannot resume into {self.dir}: existing frames were "
                    f"recorded at {prev_fps} fps, this run is {self.fps} — "
                    "their sim clocks differ"
                )
        k = 0
        while (self.dir / self.FMT.format(k)).exists():
            k += 1
        self._next = k
        return k

    def capture(self, frame: np.ndarray) -> None:
        import os

        from PIL import Image

        if frame.shape != (self.height, self.width, 4) or frame.dtype != np.uint8:
            raise ValueError(f"bad frame {frame.shape} {frame.dtype}")
        target = self.dir / self.FMT.format(self._next)
        tmp = target.with_name(target.name + ".tmp")
        kw = {}
        if self.fps is not None:
            from PIL.PngImagePlugin import PngInfo

            info = PngInfo()
            info.add_text("rrt_fps", str(int(self.fps)))
            kw["pnginfo"] = info
        Image.fromarray(frame).save(tmp, format="PNG", **kw)
        os.replace(tmp, target)
        self._next += 1

    def truncate_to(self, n: int) -> int:
        """Drop frames with index >= n and clamp the next-write index.

        The PNG-sequence analog of SegmentedRecorder.truncate_to: a prior
        run with a longer duration / higher fps may have left frames
        beyond this run's count — after this, the directory holds exactly
        frames [0, min(next, n)). Returns the clamped resume index."""
        for f in self.dir.glob("frame_*.png"):
            try:
                idx = int(f.stem.split("_")[1])
            except (IndexError, ValueError):
                continue
            if idx >= n:
                f.unlink()
        self._next = min(self._next, n)
        return self._next

    def stop(self) -> int:
        return self._next

    def abort(self) -> None:
        """Nothing buffered — every captured frame is already durable."""
