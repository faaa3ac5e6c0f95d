#!/usr/bin/env python
"""Sky-gather coherence census + windowed-gather A/B (rounds 4-5).

The q4 row-gather costs ~25 ms/frame at 1080p — an XLA per-gathered-slice
property, two orders below HBM bandwidth for the 33 MB actually fetched
(PERF.md). Escape directions are spatially smooth except near the photon
ring, so a per-tile sky WINDOW (sub-rectangle DMA'd to VMEM) + an MXU
one-hot gather can replace the row-gather for coherent tiles.

This tool measures, on the real chip at the headline pose (plus stress
poses):
  1. per-tile (and per-sub-tile) sky-index bounding boxes — what window
     caps (BR, BC) cover what fraction of tiles, both RAW (bbox fits) and
     ALIGNED (bbox fits after the production (8,128) origin alignment of
     ops/pallas_sky._window_bounds — the rate the fallback actually sees);
  2. the current q4 row-gather stage time (the number to beat);
  3. a synthetic Pallas one-hot window-gather kernel A/B at candidate
     (sub-tile, BR, BC) shapes INCLUDING the shipped defaults;
  4. the PRODUCTION sky_background_windowed stage vs gather_sky_coords at
     every census pose (what the frame actually pays, fallback included);
  5. a full-frame A/B: render_frame_pallas_compact with
     sky_gather='windowed' vs 'rows' — bitwise check + ms at every pose.

Usage: python tools/bench_sky_window.py [--census-only]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tools.benchlib import timeit_hard, timeit_hard_scalar


def census(idx, hit, sky_w, tile_rows, out):
    """Per-tile bbox stats for tiles of `tile_rows` lane rows x 128."""
    n_rows = idx.shape[0]
    t = n_rows // tile_rows
    idxt = np.asarray(idx).reshape(t, tile_rows * 128)
    hitt = np.asarray(hit).reshape(t, tile_rows * 128) > 0.5
    y = idxt // sky_w
    x = idxt % sky_w
    # captured lanes don't contribute (their background is masked by T=0)
    big = 1 << 30
    ymin = np.where(hitt, big, y).min(1)
    ymax = np.where(hitt, -big, y).max(1)
    xmin = np.where(hitt, big, x).min(1)
    xmax = np.where(hitt, -big, x).max(1)
    all_cap = hitt.all(1)
    dy = np.where(all_cap, 0, ymax - ymin + 1)
    dx = np.where(all_cap, 0, xmax - xmin + 1)
    stats = {
        "tiles": int(t),
        "tile_rows": tile_rows,
        "all_captured": int(all_cap.sum()),
        "dy_p50": float(np.percentile(dy, 50)),
        "dy_p90": float(np.percentile(dy, 90)),
        "dy_p99": float(np.percentile(dy, 99)),
        "dx_p50": float(np.percentile(dx, 50)),
        "dx_p90": float(np.percentile(dx, 90)),
        "dx_p99": float(np.percentile(dx, 99)),
    }
    for br, bc in ((8, 128), (16, 128), (24, 128), (16, 256), (32, 256),
                   (48, 256), (64, 256)):
        fit = (dy <= br) & (dx <= bc)
        stats[f"fit_{br}x{bc}"] = round(float(fit.mean()), 4)
        # the rate the production path actually sees: origins align DOWN
        # to the (8, 128) HBM tile grid (ops/pallas_sky._window_bounds),
        # so up to 7 rows / 127 cols of the window are alignment slop
        oy = np.minimum((np.where(all_cap, 0, ymin) // 8) * 8,
                        ((2049 - br) // 8) * 8)
        ox = np.minimum((np.where(all_cap, 0, xmin) // 128) * 128,
                        ((4096 - bc) // 128) * 128)
        afit = all_cap | ((ymax < oy + br) & (xmax < ox + bc))
        stats[f"afit_{br}x{bc}"] = round(float(afit.mean()), 4)
    out.update(stats)
    return stats


def frame_planes(pose, t):
    """Record-pass planes at 1080p for `pose`."""
    from relativisticraytracer_tpu.config import CameraEffects, SceneConfig
    from relativisticraytracer_tpu.ops.pallas_compact import (
        march_pallas_camera_sky_record,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose

    scene = SceneConfig()
    cam = camera_state_from_pose(*pose)
    hit, idx3, fx3, fy3, records = jax.block_until_ready(
        march_pallas_camera_sky_record(
            scene, cam, CameraEffects(), jnp.float32(t),
            1920, 1080, scene.max_steps, 2048, 4096,
        )
    )
    return hit, idx3, fx3, fy3


def bench_row_gather(sky, idx, fx, fy):
    """Current production stage: q4 row-gather + quad_bilinear."""
    from relativisticraytracer_tpu.render.skybox import quad_bilinear

    @jax.jit
    def f(idx, fx, fy):
        t4 = jnp.take(sky.q4, idx, axis=0)
        s = 0.0
        for c in range(3):
            s = s + jnp.sum(quad_bilinear(t4[..., c], fx, fy))
        return s

    return timeit_hard_scalar(lambda: f(idx, fx, fy))


def bench_onehot_kernel(sky, idx, fx, fy, sub_rows, br, bc):
    """Synthetic windowed one-hot gather over all tiles (origins
    precomputed on host for the A/B; production computes them in XLA)."""
    from relativisticraytracer_tpu.ops.pallas_sky import sky_window_gather

    n_rows = idx.shape[0]
    t = n_rows // sub_rows
    idxn = np.asarray(idx).reshape(t, sub_rows * 128)
    y = idxn // 4096
    x = idxn % 4096
    # origins align down to the (8, 128) HBM tile grid (Mosaic DMA slice
    # constraint — see ops/pallas_sky._window_bounds)
    oy = np.minimum((y.min(1) // 8) * 8, ((2049 - br) // 8) * 8)
    ox = np.minimum((x.min(1) // 128) * 128, ((4096 - bc) // 128) * 128)
    origins = jnp.asarray(
        np.stack([oy, ox], axis=1).astype(np.int32))

    @jax.jit
    def f(idx, origins):
        tr, tg, tb = sky_window_gather(
            sky, idx, origins, sub_rows=sub_rows, br=br, bc=bc)
        return jnp.sum(tr >> 24) + jnp.sum(tg >> 24) + jnp.sum(tb >> 24)

    return timeit_hard_scalar(lambda: f(idx, origins))


def bench_production_stage(sky, pose, t, br, bc):
    """The PRODUCTION windowed stage (bounds + kernel + compacted fallback
    + cond) vs the row-gather, on this pose's real planes. Returns
    (windowed_ms, rows_ms, max_composited_diff)."""
    from relativisticraytracer_tpu.config import CameraEffects
    from relativisticraytracer_tpu.ops.pallas_sky import (
        sky_background_windowed,
    )
    from relativisticraytracer_tpu.render.skybox import gather_sky_coords

    effects = CameraEffects()
    hit, idx3, fx3, fy3 = frame_planes(pose, t)
    coords = tuple(zip(idx3, fx3, fy3))

    # coords/hit must be jit ARGUMENTS: captured device arrays are traced
    # as constants and XLA constant-folds the whole gather at compile time
    # (first version of this bench read 5 ms for the 31 ms stage).
    @jax.jit
    def f_win(coords, hit):
        bg = sky_background_windowed(sky, coords, effects, masked=hit > 0.5,
                                     br=br, bc=bc)
        # composite against a pseudo-transmittance that zeroes captured
        # lanes, exactly as the frame does — the only lanes where the
        # windowed path may differ (it produces 0 there)
        tr = jnp.where(hit > 0.5, 0.0, 1.0)
        return jnp.sum(bg.x * tr) + jnp.sum(bg.y * tr) + jnp.sum(bg.z * tr)

    @jax.jit
    def f_rows(coords, hit):
        bg = gather_sky_coords(sky, coords, effects)
        tr = jnp.where(hit > 0.5, 0.0, 1.0)
        return jnp.sum(bg.x * tr) + jnp.sum(bg.y * tr) + jnp.sum(bg.z * tr)

    win_ms = timeit_hard_scalar(lambda: f_win(coords, hit))
    rows_ms = timeit_hard_scalar(lambda: f_rows(coords, hit))
    diff = abs(float(np.asarray(f_win(coords, hit))
                     - np.asarray(f_rows(coords, hit))))
    return win_ms, rows_ms, diff


def bench_full_frame(sky_rgba, pose, t, gather):
    """Full compact 1080p frame with sky_gather=`gather`. Returns
    (ms, uint8 frame)."""
    from relativisticraytracer_tpu.config import (
        CameraEffects, RenderSettings, SceneConfig,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.pipeline import Renderer

    scene = SceneConfig()
    settings = RenderSettings(width=1920, height=1080,
                              max_steps=scene.max_steps, loop="pallas",
                              sky_gather=gather)
    r = Renderer(scene, settings, skybox_rgba=sky_rgba)
    cam = camera_state_from_pose(*pose)
    effects = CameraEffects()
    frame = np.asarray(r.render(cam, effects, t))
    ms = timeit_hard(lambda: r.render(cam, effects, t))
    return ms, frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--census-only", action="store_true")
    ap.add_argument("--sections", default="census,kernels,production,fullframe",
                    help="comma list of sections to (re)run; results merge "
                         "into the existing docs/sky_window.json")
    ap.add_argument("--windows", default="32x256,48x256,64x256",
                    help="(br)x(bc) windows for the production-stage A/B")
    args = ap.parse_args()
    sections = set(args.sections.split(","))
    if args.census_only:
        sections = {"census"}

    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    path = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "sky_window.json"
    # merge-into semantics + incremental writes: a tunnel crash mid-run
    # loses one case, not the evening
    out = json.loads(path.read_text()) if path.exists() else {}

    def flush():
        path.write_text(json.dumps(out, indent=2))

    poses = {
        "headline": (((0.0, 10.0, -60.0), 0.0, -10.0), 10.0),
        "edge_on": (((0.0, 0.6, -40.0), 0.0, 0.0), 3.0),
        "close_ring": (((0.0, 4.0, -24.0), 0.0, -8.0), 5.0),
    }
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    planes = {}
    if "census" in sections or "kernels" in sections:
        out.setdefault("poses", {})
        names = list(poses) if "census" in sections else ["headline"]
        for name in names:
            pose, t = poses[name]
            hit, idx3, fx3, fy3 = frame_planes(pose, t)
            planes[name] = (hit, idx3[1], fx3[1], fy3[1])
            if "census" not in sections:
                continue
            p = {}
            for tile_rows in (8, 16):
                p[f"sub{tile_rows}"] = census(idx3[1], hit, 4096,
                                              tile_rows, {})
            out["poses"][name] = p
            print(name, json.dumps(p, indent=1))
            flush()

    if "kernels" in sections:
        hit, idx, fx, fy = planes["headline"]
        ms = bench_row_gather(sky, idx, fx, fy)
        out["row_gather_ms"] = round(ms, 2)
        flush()
        print(f"q4 row-gather stage: {ms:.2f} ms")
        # sweep includes the SHIPPED (8, 32, 256) default (ADVICE r4) and
        # taller candidates the census motivates (dy_p90 ~ 41 at sub8)
        for sub_rows, br, bc in ((8, 8, 128), (8, 16, 128), (16, 16, 128),
                                 (16, 24, 128), (8, 16, 256), (8, 32, 256),
                                 (8, 48, 256), (8, 64, 256), (16, 32, 256)):
            try:
                ms = bench_onehot_kernel(sky, idx, fx, fy, sub_rows, br, bc)
                key = f"onehot_sub{sub_rows}_{br}x{bc}_ms"
                out[key] = round(ms, 2)
                flush()
                print(f"one-hot window sub={sub_rows} {br}x{bc}: {ms:.2f} ms")
            except Exception as e:
                print(f"one-hot sub={sub_rows} {br}x{bc} FAILED: {e!r}")

    if "production" in sections:
        # the production stage (bounds + kernel + compacted fallback +
        # cond) at every pose, at the candidate windows
        out.setdefault("production_stage", {})
        windows = [tuple(int(v) for v in w.split("x"))
                   for w in args.windows.split(",")]
        for name, (pose, t) in poses.items():
            for br, bc in windows:
                try:
                    win, rows, diff = bench_production_stage(
                        sky, pose, t, br, bc)
                    rec = {"windowed_ms": round(win, 2),
                           "rows_ms": round(rows, 2),
                           "composited_absdiff": diff}
                    out["production_stage"][f"{name}_{br}x{bc}"] = rec
                    flush()
                    print(f"production {name} {br}x{bc}: windowed "
                          f"{win:.2f} ms vs rows {rows:.2f} ms "
                          f"(diff {diff:g})")
                except Exception as e:
                    print(f"production {name} {br}x{bc} FAILED: {e!r}")

    if "fullframe" in sections:
        # the decisive number: the full 1080p compact frame, A/B
        sky_rgba = procedural_starfield(2048, 4096)
        out.setdefault("full_frame", {})
        for name, (pose, t) in poses.items():
            try:
                ms_r, f_r = bench_full_frame(sky_rgba, pose, t, "rows")
                ms_w, f_w = bench_full_frame(sky_rgba, pose, t, "windowed")
            except Exception as e:
                print(f"full frame {name} FAILED: {e!r}")
                continue
            bitwise = bool(np.array_equal(f_r, f_w))
            out["full_frame"][name] = {
                "rows_ms": round(ms_r, 2), "windowed_ms": round(ms_w, 2),
                "bitwise_equal": bitwise,
            }
            flush()
            print(f"FULL FRAME {name}: rows {ms_r:.2f} ms vs windowed "
                  f"{ms_w:.2f} ms, bitwise={bitwise}")

    flush()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
