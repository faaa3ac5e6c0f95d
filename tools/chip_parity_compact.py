#!/usr/bin/env python
"""Fast compiled parity check: compact vs inline pipelines ON THE CHIP.

The CPU interpret-mode equality tests (tests/test_compact.py) are the
bitwise ground truth but take tens of minutes on this 1-core host; this
runs the same comparisons compiled on the TPU in ~a minute (gate: max
abs uint8 diff <= 1, the separately-compiled-programs fusion allowance).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from relativisticraytracer_tpu.config import (
    CameraEffects,
    RenderSettings,
    SceneConfig,
)
from relativisticraytracer_tpu.ops.pallas_compact import (
    render_frame_pallas_compact,
)
from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
from relativisticraytracer_tpu.render.camera import camera_state_from_pose
from relativisticraytracer_tpu.render.skybox import (
    procedural_starfield,
    skybox_from_array,
)

CASES = [
    ("high", dict(), ((0.0, 10.0, -60.0), 0.0, -10.0), 3),
    ("edge", dict(), ((0.0, 0.8, -40.0), 0.0, 0.0), 3),
    ("edge_slots1", dict(), ((0.0, 0.8, -40.0), 0.0, 0.0), 1),
    ("kerr", dict(spin_a=0.9), ((0.0, 10.0, -60.0), 0.0, -10.0), 3),
]


def main():
    sky = skybox_from_array(procedural_starfield(64, 128), fast_table=True)
    eff = CameraEffects()
    bad = 0
    for name, scene_kw, pose, slots in CASES:
        scene = SceneConfig(max_steps=400, **scene_kw)
        cam = camera_state_from_pose(*pose)
        si = RenderSettings(width=256, height=160, max_steps=400,
                            loop="pallas", media_pass="inline")
        sc = RenderSettings(width=256, height=160, max_steps=400,
                            loop="pallas", media_pass="compact",
                            media_slots=slots)
        a = np.asarray(render_frame_pallas(scene, si, cam, eff, 1.5, sky))
        b = np.asarray(render_frame_pallas_compact(
            scene, sc, cam, eff, 1.5, sky))
        diff = int(np.abs(a.astype(np.int16) - b.astype(np.int16)).max())
        ndiff = int((a != b).sum())
        status = "OK" if diff <= 1 else "FAIL"
        if diff > 1:
            bad += 1
        print(f"{name:12s} slots={slots} max|d|={diff} npx_diff={ndiff} "
              f"{status}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
