#!/usr/bin/env python
"""Per-lane-row sky-span census: sizes the two-level windowed gather
(per-sub-tile DMA window + per-lane-row one-hot slice)."""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tools.bench_sky_window import frame_planes

SKY_W = 4096


def two_level(idx, hit, sub_rows, rh, br, bc):
    """Fraction of lane rows servable by: sub-tile window (br, bc) at
    (min ymin, min xmin), row slice rh rows tall at its own row base."""
    n_rows = idx.shape[0]
    idxr = np.asarray(idx).reshape(n_rows, 128)
    hitr = np.asarray(hit).reshape(n_rows, 128) > 0.5
    y = idxr // SKY_W
    x = idxr % SKY_W
    big = 1 << 30
    ymin_r = np.where(hitr, big, y).min(1)
    ymax_r = np.where(hitr, -big, y).max(1)
    xmin_r = np.where(hitr, big, x).min(1)
    xmax_r = np.where(hitr, -big, x).max(1)
    t = n_rows // sub_rows
    ymin_t = ymin_r.reshape(t, sub_rows).min(1)
    ymax_t = ymax_r.reshape(t, sub_rows).max(1)
    xmin_t = xmin_r.reshape(t, sub_rows).min(1)
    xmax_t = xmax_r.reshape(t, sub_rows).max(1)
    all_cap_r = ymin_r > ymax_r
    row_ok = ((ymax_r - ymin_r < rh) & all_cap_r.__invert__()
              | all_cap_r)
    dy_t = ymax_t - ymin_t + 1
    dx_t = xmax_t - xmin_t + 1
    tile_ok = (dy_t <= br) & (dx_t <= bc) | (ymin_t > ymax_t)
    ok = row_ok & np.repeat(tile_ok, sub_rows)
    dy_r = np.where(all_cap_r, 0, ymax_r - ymin_r + 1)
    return {
        "rows_ok_frac": round(float(ok.mean()), 4),
        "row_dy_p50": float(np.percentile(dy_r, 50)),
        "row_dy_p90": float(np.percentile(dy_r, 90)),
        "row_dy_p99": float(np.percentile(dy_r, 99)),
        "tile_ok_frac": round(float(tile_ok.mean()), 4),
    }


def main():
    poses = {
        "headline": (((0.0, 10.0, -60.0), 0.0, -10.0), 10.0),
        "edge_on": (((0.0, 0.6, -40.0), 0.0, 0.0), 3.0),
        "close_ring": (((0.0, 4.0, -24.0), 0.0, -8.0), 5.0),
    }
    out = {}
    for name, (pose, t) in poses.items():
        hit, idx3, _, _ = frame_planes(pose, t)
        idx = idx3[1]
        p = {}
        for sub_rows, rh, br, bc in (
            (8, 4, 32, 128), (8, 4, 32, 192), (8, 4, 48, 192),
            (8, 8, 48, 192), (8, 4, 48, 256), (8, 8, 64, 256),
            (16, 4, 48, 192), (4, 4, 32, 192),
        ):
            p[f"sub{sub_rows}_rh{rh}_{br}x{bc}"] = two_level(
                idx, hit, sub_rows, rh, br, bc)
        out[name] = p
        print(name, json.dumps(p, indent=1))
    path = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "sky_window_rows.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
