#!/usr/bin/env python
"""Measure how much march work the per-tile scheduling actually mandates.

The fused Pallas kernel (ops/pallas_march.py) makes two scheduling
decisions per (32, 128) pixel tile:

  * EXIT: the tile's while loop runs until its slowest ray terminates —
    every lane pays for the tile's max step count;
  * MEDIA: the radiative-transfer block runs under a lax.cond on "any ray
    in the tile probes a medium this step" — every lane pays whenever any
    lane probes.

This tool replays the march at full resolution with the XLA scan path,
records per-step/per-ray termination and probe masks, reduces them to
candidate tile shapes, and reports the mandated work under each shape —
i.e. the upper bound on what finer tiles / finer media conds could save,
BEFORE paying their per-tile overheads. Run it on the chip:

    python tools/analyze_media_fire.py [--width 1920 --height 1080]

Writes docs/media_fire.json.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from relativisticraytracer_tpu.config import (  # noqa: E402
    CameraEffects,
    SceneConfig,
)
from relativisticraytracer_tpu.render.camera import (  # noqa: E402
    camera_state_from_pose,
    generate_rays,
)
from relativisticraytracer_tpu.render.march import (  # noqa: E402
    init_state,
    march_step,
    media_probes,
)

OUT = pathlib.Path(__file__).resolve().parents[1] / "docs"

# candidate (block_h, block_w) shapes; all must divide the padded frame
SHAPES = [(32, 128), (16, 128), (8, 128), (32, 256), (64, 128)]


def _pad_to(a, h, w):
    ph, pw = h - a.shape[0], w - a.shape[1]
    return jnp.pad(a, ((0, ph), (0, pw)), mode="edge")


def run(width, height, time_s, max_steps):
    scene = SceneConfig()
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    origin, direction, _, _ = generate_rays(width, height, cam, CameraEffects())

    # march at the lcm padding of all candidate shapes, but count each
    # shape's work over ITS OWN padded extent — the kernel at (bh, bw)
    # pads only to ceil(H/bh)*bh x ceil(W/bw)*bw, so counting the full lcm
    # frame would charge phantom clone columns the real kernel never runs
    hp = (height + 63) // 64 * 64
    wp = (width + 255) // 256 * 256
    from relativisticraytracer_tpu.core.vecmath import Vec3
    origin = Vec3(*(_pad_to(c, hp, wp) for c in origin))
    direction = Vec3(*(_pad_to(c, hp, wp) for c in direction))

    def shape_extent(bh, bw):
        return ((height + bh - 1) // bh * bh, (width + bw - 1) // bw * bw)

    def reduce_shape(plane, bh, bw):
        hs, ws = shape_extent(bh, bw)
        b = plane[:hs, :ws].reshape(hs // bh, bh, ws // bw, bw)
        return jnp.any(b, axis=(1, 3))

    @jax.jit
    def trace():
        state = init_state(origin, direction)

        def body(st, _):
            rel = st.p  # mass at origin (config.h:30)
            r2 = rel.x * rel.x + rel.y * rel.y + rel.z * rel.z
            abs_y = jnp.abs(rel.y)
            in_disk_zone = jnp.logical_and(
                abs_y < scene.disk_h_m * 5.0,
                r2 < (scene.disk_out_m + 5.0) ** 2,
            )
            in_cloud_zone = jnp.logical_and(
                abs_y < scene.cloud_h_m * 1.5, r2 < scene.cloud_out_m ** 2
            )
            pd, pc = media_probes(
                scene, rel, in_disk_zone, in_cloud_zone, st.active
            )
            probe = jnp.logical_or(pd, pc)
            new_st = march_step(scene, st, jnp.float32(time_s))
            outs = {}
            for bh, bw in SHAPES:
                key = f"{bh}x{bw}"
                hs, ws = shape_extent(bh, bw)
                # per-shape ideals over the SAME extent the kernel marches
                outs[f"probe_rays_{key}"] = jnp.sum(
                    probe[:hs, :ws], dtype=jnp.int32
                )
                outs[f"active_rays_{key}"] = jnp.sum(
                    st.active[:hs, :ws], dtype=jnp.int32
                )
                outs[f"fire_{key}"] = jnp.sum(
                    reduce_shape(probe, bh, bw), dtype=jnp.int32
                )
                outs[f"alive_{key}"] = jnp.sum(
                    reduce_shape(st.active, bh, bw), dtype=jnp.int32
                )
            return new_st, outs

        _, ys = jax.lax.scan(body, state, None, length=max_steps)
        return ys

    ys = jax.device_get(trace())

    lanes = {f"{bh}x{bw}": bh * bw for bh, bw in SHAPES}
    report = {
        "meta": {
            "width": width, "height": height, "padded": [hp, wp],
            "time": time_s, "max_steps": max_steps,
            "platform": jax.devices()[0].platform,
        },
        # lane-step counts actually EXECUTED under each tile shape
        # (alive tiles x lanes per tile, summed over steps), vs the ideal
        # per-ray count — the divergence overhead of lock-step tiles.
        "march_lane_steps": {},
        # lane-steps of media shading under each cond granularity vs the
        # ideal per-ray probe count — the media-cond overhead. Ideals are
        # per-shape: each counted over that shape's own padded extent.
        "media_lane_steps": {},
        "ideal": {},
    }
    for key, lpt in lanes.items():
        report["march_lane_steps"][key] = int(ys[f"alive_{key}"].sum()) * lpt
        report["media_lane_steps"][key] = int(ys[f"fire_{key}"].sum()) * lpt
        report["ideal"][key] = {
            "ray_steps": int(ys[f"active_rays_{key}"].sum()),
            "probe_ray_steps": int(ys[f"probe_rays_{key}"].sum()),
        }

    report["overhead_vs_ideal"] = {
        key: {
            "march": round(
                report["march_lane_steps"][key]
                / max(1, report["ideal"][key]["ray_steps"]), 3),
            "media": round(
                report["media_lane_steps"][key]
                / max(1, report["ideal"][key]["probe_ray_steps"]), 3),
        }
        for key in lanes
    }
    report["note"] = (
        "march/media values are lane-step counts: lanes that execute a "
        "step (whole tile while any ray is alive) / lanes that execute the "
        "media block (whole tile/cond-group when any lane probes). "
        "Each shape is counted over ITS OWN padded extent "
        "(ceil(H/bh)*bh x ceil(W/bw)*bw), matching what the kernel "
        "actually marches; ideals are per-shape for the same reason. "
        "overhead_vs_ideal ~1.0 means the tile scheduling is already "
        "near-perfect."
    )
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--time", type=float, default=1.0)
    ap.add_argument("--max-steps", type=int, default=2000)
    args = ap.parse_args()

    report = run(args.width, args.height, args.time, args.max_steps)
    OUT.mkdir(exist_ok=True)
    out = OUT / "media_fire.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
