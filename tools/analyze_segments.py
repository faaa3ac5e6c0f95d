#!/usr/bin/env python
"""Size the segment-replay media-compaction design before building it.

The round-2 study (analyze_media_fire.py, docs/media_fire.json) showed the
fused kernel's whole-tile media conds execute 3.3x the per-ray-ideal media
lane-steps — ~80 ms of skippable shading at 1080p. The round-3 design
under consideration splits the march:

  A) a geometry pass that marches every ray at vacuum cost and RECORDS, per
     ray, up to K media segments (entry position/velocity + length in
     steps) where the conservative media probes fire — segments K.. merge
     into slot K-1 (B then marches the probe-false gap steps harmlessly:
     densities are exactly 0 there, so merging costs work, never parity);
  B) a replay pass where each lane re-integrates ONLY its recorded
     segments back-to-back — every loop iteration shades, so the tile pays
     max-over-lanes of per-lane media steps instead of "any lane probes".

This tool replays the march with the XLA scan path and derives, per ray:
segment count, total probe-true steps, per-segment (entry, length) for the
first 4 segments, and the last probe-true step — enough to compute the
exact B-pass step count under any K and the mandated lane-steps for
candidate B tile shapes, in image layout and in sorted-compact layout.

Run on the chip:  python tools/analyze_segments.py
Writes docs/segment_stats.json.
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
from relativisticraytracer_tpu.core.vecmath import Vec3  # noqa: E402
from relativisticraytracer_tpu.render.camera import (  # noqa: E402
    camera_state_from_pose,
    generate_rays,
)
from relativisticraytracer_tpu.render.march import (  # noqa: E402
    init_state,
    march_step,
    media_probes,
    media_zones,
)

OUT = pathlib.Path(__file__).resolve().parents[1] / "docs"
KMAX = 4  # slots tracked exactly; segments beyond merge into the last slot
B_SHAPES = [(8, 128), (16, 128), (32, 128)]


def _pad_to(a, h, w):
    return jnp.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])), mode="edge")


def run(width, height, time_s, max_steps):
    scene = SceneConfig()
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    origin, direction, _, _ = generate_rays(width, height, cam,
                                            CameraEffects())
    hp = (height + 31) // 32 * 32
    wp = (width + 127) // 128 * 128
    origin = Vec3(*(_pad_to(c, hp, wp) for c in origin))
    direction = Vec3(*(_pad_to(c, hp, wp) for c in direction))

    @jax.jit
    def trace():
        state = init_state(origin, direction)
        z = jnp.zeros((hp, wp), jnp.float32)
        seg = {
            "in_seg": z, "k": z, "m": z, "last_probe": z - 1.0,
            "entry": [z - 1.0 for _ in range(KMAX)],
            "length": [z for _ in range(KMAX)],
        }

        def body(carry, i):
            st, seg = carry
            rel = st.p  # mass at origin (config.h:30)
            r2 = rel.x * rel.x + rel.y * rel.y + rel.z * rel.z
            in_disk_zone, in_cloud_zone = media_zones(scene, rel, r2)
            pd, pc = media_probes(
                scene, rel, in_disk_zone, in_cloud_zone, st.active
            )
            probe = jnp.logical_or(pd, pc)
            fi = i.astype(jnp.float32)

            entry_event = jnp.logical_and(probe, seg["in_seg"] < 0.5)
            k = seg["k"]
            new_slot = jnp.logical_and(entry_event, k < KMAX)
            entry = [
                jnp.where(jnp.logical_and(new_slot, k == j), fi, e)
                for j, e in enumerate(seg["entry"])
            ]
            k = k + entry_event.astype(jnp.float32)
            # active slot index for length updates: min(k, KMAX) - 1
            slot = jnp.minimum(k, float(KMAX)) - 1.0
            length = [
                jnp.where(
                    jnp.logical_and(probe, slot == j), fi - entry[j] + 1.0, ln
                )
                for j, (e, ln) in enumerate(zip(entry, seg["length"]))
            ]
            seg = {
                "in_seg": probe.astype(jnp.float32),
                "k": k,
                "m": seg["m"] + probe.astype(jnp.float32),
                "last_probe": jnp.where(probe, fi, seg["last_probe"]),
                "entry": entry,
                "length": length,
            }
            return (march_step(scene, st, jnp.float32(time_s)), seg), None

        (_, seg), _ = jax.lax.scan(
            body, (state, seg), jnp.arange(max_steps, dtype=jnp.int32)
        )
        return seg

    seg = jax.device_get(trace())
    k = seg["k"]
    m = seg["m"]
    lengths = np.stack(seg["length"])        # [KMAX, H, W]
    entries = np.stack(seg["entry"])
    last = seg["last_probe"]

    ks = k.astype(np.int64)
    hist = {str(v): int((ks == v).sum()) for v in range(0, int(ks.max()) + 1)}

    def b_steps(K):
        """Exact replay steps per ray with K slots (merge-at-last)."""
        if K >= 2:
            head = lengths[: K - 1].sum(axis=0)
        else:
            head = np.zeros_like(m)
        merged = head + np.where(
            entries[K - 1] >= 0, last - entries[K - 1] + 1.0, 0.0
        )
        return np.where(ks <= K, m, merged)

    report = {
        "meta": {
            "width": width, "height": height, "padded": [hp, wp],
            "time": time_s, "max_steps": max_steps, "kmax": KMAX,
            "platform": jax.devices()[0].platform,
        },
        "segments_per_ray_hist": hist,
        "rays_with_media": int((ks > 0).sum()),
        "total_rays": int(ks.size),
        "ideal_media_ray_steps": int(m.sum()),
    }

    for K in range(1, KMAX + 1):
        bs = b_steps(K)
        entry = {
            "replay_ray_steps": int(bs.sum()),
            "merge_overhead_steps": int(bs.sum() - m.sum()),
            "overflow_rays": int((ks > K).sum()),
            "tile_lane_steps": {},
            "sorted_lane_steps": {},
        }
        for bh, bw in B_SHAPES:
            hs = (height + bh - 1) // bh * bh
            ws = (width + bw - 1) // bw * bw
            t = bs[:hs, :ws].reshape(hs // bh, bh, ws // bw, bw)
            tile_max = t.max(axis=(1, 3))
            entry["tile_lane_steps"][f"{bh}x{bw}"] = int(
                tile_max.sum() * bh * bw
            )
            srt = np.sort(bs[:hs, :ws].ravel())[::-1]
            lanes = bh * bw
            pad = (-len(srt)) % lanes
            srt = np.pad(srt, (0, pad))
            chunk_max = srt.reshape(-1, lanes)[:, 0]
            entry["sorted_lane_steps"][f"{bh}x{bw}"] = int(
                chunk_max.sum() * lanes
            )
        # Row-compaction: keep (1, 128) lane rows intact (cheap row-gather,
        # trivial index math), drop all-zero rows, pack survivors in image
        # order, tile the packed rows b at a time. Exact replay cost =
        # sum over packed tiles of 128*b*max(lane len in tile).
        hs = (height + 31) // 32 * 32
        ws = (width + 127) // 128 * 128
        rows = bs[:hs, :ws].reshape(-1, 128)          # lane rows
        row_max = rows.max(axis=1)
        keep = rows[row_max > 0]
        entry["media_rows"] = int(keep.shape[0])
        entry["total_rows"] = int(rows.shape[0])
        entry["row_compact_lane_steps"] = {}
        for b in (1, 2, 4, 8, 16):
            pad = (-keep.shape[0]) % b
            kp = np.pad(keep, ((0, pad), (0, 0)))
            tmax = kp.reshape(-1, b, 128).max(axis=(1, 2))
            entry["row_compact_lane_steps"][str(b)] = int(
                tmax.sum() * b * 128
            )
        # Row-SORTED compaction (round-5 candidate): same row-granular
        # compaction but with the kept rows sorted by their max lane
        # length before tiling — the per-lane argsort/permute bookkeeping
        # (the 10.4 ms chain, docs/bench_replay_sorted.json) collapses to
        # a row argsort + the row-gather we already pay, at the cost of
        # tiles paying max over 128 adjacent lanes instead of 128
        # length-sorted lanes. Compare against sorted_lane_steps.
        entry["row_sorted_lane_steps"] = {}
        order = np.argsort(-row_max[row_max > 0], kind="stable")
        kept_sorted = keep[order]
        for b in (8, 16, 32):
            pad = (-kept_sorted.shape[0]) % b
            kp = np.pad(kept_sorted, ((0, pad), (0, 0)))
            tmax = kp.reshape(-1, b, 128).max(axis=(1, 2))
            entry["row_sorted_lane_steps"][str(b)] = int(
                tmax.sum() * b * 128
            )
        report[f"K{K}"] = entry

    report["note"] = (
        "replay_ray_steps: exact steps pass B must integrate (probe-true "
        "steps + merged-gap steps for rays with > K segments). "
        "tile_lane_steps: lane-steps a lock-step B tile pays in IMAGE "
        "layout (tiles run to their slowest lane); sorted_lane_steps: same "
        "after sorting rays by replay length (what a compacted layout "
        "could reach, before gather/scatter costs). Compare against "
        "docs/media_fire.json media_lane_steps (the round-2 inline cost)."
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
    out = OUT / "segment_stats.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
