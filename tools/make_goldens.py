#!/usr/bin/env python
"""Regenerate the golden regression images under tests/goldens/.

Run on the CPU backend so goldens are hardware-independent:
    JAX_PLATFORMS=cpu python tools/make_goldens.py
Only regenerate after an INTENTIONAL rendering change, and eyeball the PNGs.
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from relativisticraytracer_tpu.config import (  # noqa: E402
    CameraEffects,
    RenderSettings,
    SceneConfig,
    effects_off,
)
from relativisticraytracer_tpu.render.camera import camera_state_from_pose  # noqa: E402
from relativisticraytracer_tpu.render.pipeline import Renderer  # noqa: E402
from relativisticraytracer_tpu.render.skybox import procedural_starfield  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "goldens"

CASES = [
    ("schwarzschild_vacuum", dict(enable_disk=False, enable_clouds=False), False),
    ("kerr09_vacuum", dict(enable_disk=False, enable_clouds=False, spin_a=0.9), False),
    ("disk_only", dict(enable_clouds=False), False),
    ("full_scene_fx", dict(), True),
]


def main():
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    sky = procedural_starfield(64, 128)
    w, h, steps = 64, 48, 400
    cam = camera_state_from_pose((0.0, 5.0, -38.0), 0.0, -6.0)
    for name, scene_kw, effects_on in CASES:
        scene = SceneConfig(max_steps=steps, **scene_kw)
        settings = RenderSettings(width=w, height=h, max_steps=steps, loop="while")
        r = Renderer(scene, settings, skybox_rgba=sky)
        effects = CameraEffects() if effects_on else effects_off()
        img = r.render_np(cam, effects, time=2.0)
        np.save(GOLDEN_DIR / f"{name}.npy", img)
        try:
            from PIL import Image

            Image.fromarray(img).resize((w * 4, h * 4), Image.NEAREST).save(
                GOLDEN_DIR / f"{name}.png"
            )
        except Exception:
            pass
        print(f"golden {name}: mean rgb {img[..., :3].mean():.2f}")


if __name__ == "__main__":
    main()
