#!/usr/bin/env python
"""On-chip randomized parity fuzz: compiled Pallas kernel vs the XLA
while-loop path on the SAME device, across random poses x times x spins.

The CPU suite proves pallas==XLA in interpreter mode, and bench.py gates
two fixed golden configs on the chip; this tool closes the remaining gap —
the COMPILED Mosaic kernel across a spread of camera geometry. Poses and
times vary without retracing; spins are static (one compile per spin per
path). Run on the chip:

    python tools/tpu_fuzz_parity.py [--cases 24] [--seed 7]

Writes docs/tpu_fuzz.json and exits nonzero on any mismatch beyond the
1-LSB budget (XLA FMA-contraction differs between the fused kernel and the
XLA pipeline epilogue, so uint8 outputs may differ by 1).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse  # noqa: E402
import json  # noqa: E402

import numpy as np  # noqa: E402

from relativisticraytracer_tpu.config import (  # noqa: E402
    CameraEffects,
    RenderSettings,
    SceneConfig,
)
from relativisticraytracer_tpu.render.camera import (  # noqa: E402
    camera_state_from_pose,
)
from relativisticraytracer_tpu.render.pipeline import Renderer  # noqa: E402
from relativisticraytracer_tpu.render.skybox import (  # noqa: E402
    procedural_starfield,
)

OUT = pathlib.Path(__file__).resolve().parents[1] / "docs"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=24)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--max-steps", type=int, default=400)
    ap.add_argument("--max-lsb", type=int, default=1)
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(args.seed)
    sky = procedural_starfield(128, 256)

    renderers = {}
    for spin in (0.0, 0.9):
        scene = SceneConfig(spin_a=spin, max_steps=args.max_steps)
        for loop in ("pallas", "while"):
            settings = RenderSettings(width=args.width, height=args.height,
                                      loop=loop)
            renderers[(spin, loop)] = Renderer(scene, settings,
                                               skybox_rgba=sky)

    report = {"platform": platform, "cases": [], "max_lsb_budget": args.max_lsb}
    worst = 0
    for k in range(args.cases):
        spin = float(rng.choice([0.0, 0.9]))
        # poses spread around the hole: radius 25..70, any azimuth, heights
        # crossing the disk plane, look jitter around the center
        r = float(rng.uniform(25.0, 70.0))
        az = float(rng.uniform(0.0, 2 * np.pi))
        y = float(rng.uniform(-15.0, 15.0))
        pos = (r * np.sin(az), y, -r * np.cos(az))
        yaw = float(np.degrees(az) + rng.uniform(-25.0, 25.0))
        pitch = float(np.degrees(np.arctan2(-y, r)) + rng.uniform(-8.0, 8.0))
        t = float(rng.uniform(0.0, 30.0))
        cam = camera_state_from_pose(pos, yaw, pitch)
        effects = CameraEffects()

        got = renderers[(spin, "pallas")].render_np(cam, effects, t)
        want = renderers[(spin, "while")].render_np(cam, effects, t)
        lsb = int(np.abs(got.astype(int) - want.astype(int)).max())
        frac = float(np.mean(got != want))
        worst = max(worst, lsb)
        report["cases"].append({
            "spin": spin, "pos": [round(p, 2) for p in pos],
            "yaw": round(yaw, 1), "pitch": round(pitch, 1),
            "time": round(t, 2), "max_lsb": lsb,
            "mismatch_frac": round(frac, 5),
        })
        print(f"case {k:2d}: spin={spin} max_lsb={lsb} "
              f"mismatch_frac={frac:.5f}", flush=True)

    report["worst_lsb"] = worst
    report["pass"] = worst <= args.max_lsb
    OUT.mkdir(exist_ok=True)
    (OUT / "tpu_fuzz.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({"worst_lsb": worst, "pass": report["pass"],
                      "cases": args.cases, "platform": platform}))
    if not report["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
