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
