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

import jax  # noqa: E402

# A preinstalled TPU plugin in some environments overrides the
# JAX_PLATFORMS env var (tests/conftest.py documents this); the config
# flag after import is authoritative. Goldens MUST come from the CPU
# backend to stay hardware-independent.
jax.config.update("jax_platforms", "cpu")

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

# (name, scene_kw, effects_on, (w, h), pose, time, max_steps). The two big
# cases are the chip-gate insurance VERDICT r2 #5 asked for: nothing at
# >=192x108 or >=512^2 had ever been pixel-checked ON the TPU —
# resolution-dependent Mosaic issues (tile padding, lane index math at
# production extents) would pass every 64x48 gate. The off-axis pose
# matches the compiled-reference frame gate
# (tests/test_reference_native_parity.py, larger_offaxis case).
# full_budget_192x108 is the VERDICT r3 #5 gate: the production 2000-step
# cap exercises the unroll-40 record while-loop 50 blocks deep — every
# other case stops at 400 steps (10 blocks), so a step-cap-dependent
# Mosaic issue would pass them all.
DEFAULT_POSE = ((0.0, 5.0, -38.0), 0.0, -6.0)
CASES = [
    ("schwarzschild_vacuum", dict(enable_disk=False, enable_clouds=False),
     False, (64, 48), DEFAULT_POSE, 2.0, 400),
    ("kerr09_vacuum", dict(enable_disk=False, enable_clouds=False, spin_a=0.9),
     False, (64, 48), DEFAULT_POSE, 2.0, 400),
    ("disk_only", dict(enable_clouds=False), False, (64, 48),
     DEFAULT_POSE, 2.0, 400),
    ("full_scene_fx", dict(), True, (64, 48), DEFAULT_POSE, 2.0, 400),
    ("offaxis_full_192x108", dict(), True, (192, 108),
     ((-18.0, -5.0, -38.0), 18.0, 4.0), 7.0, 400),
    ("full_scene_512", dict(), True, (512, 512), DEFAULT_POSE, 2.0, 400),
    ("full_budget_192x108", dict(), True, (192, 108),
     ((0.0, 10.0, -60.0), 0.0, -10.0), 10.0, 2000),
]


def main(only=None):
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    sky = procedural_starfield(64, 128)
    for name, scene_kw, effects_on, (w, h), pose, t, steps in CASES:
        if only and name not in only:
            continue
        cam = camera_state_from_pose(*pose)
        scene = SceneConfig(max_steps=steps, **scene_kw)
        settings = RenderSettings(width=w, height=h, max_steps=steps, loop="while")
        r = Renderer(scene, settings, skybox_rgba=sky)
        effects = CameraEffects() if effects_on else effects_off()
        img = r.render_np(cam, effects, time=t)
        np.save(GOLDEN_DIR / f"{name}.npy", img)
        try:
            from PIL import Image

            scale = max(1, 256 // max(w, h) + 1) if max(w, h) < 256 else 1
            Image.fromarray(img).resize((w * scale, h * scale),
                                        Image.NEAREST).save(
                GOLDEN_DIR / f"{name}.png"
            )
        except Exception:
            pass
        print(f"golden {name} ({w}x{h}): mean rgb {img[..., :3].mean():.2f}")


if __name__ == "__main__":
    main(only=set(sys.argv[1:]) or None)
