#!/usr/bin/env python
"""Capture a jax.profiler trace of the 1080p fused frame and extract a
per-op duration table from the perfetto JSON (no tensorflow needed)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import collections
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from relativisticraytracer_tpu.config import (
        CameraEffects,
        RenderSettings,
        SceneConfig,
    )
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    W, H = 1920, 1080
    scene = SceneConfig()
    settings = RenderSettings(width=W, height=H, max_steps=scene.max_steps,
                              loop="pallas")
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    eff = CameraEffects()
    fn = jax.jit(lambda t: render_frame_pallas(scene, settings, cam, eff, t, sky))
    np.asarray(jnp.sum(fn(jnp.float32(0.5)).ravel()[:8].astype(jnp.int32)))  # warm

    logdir = "/tmp/rrt_trace"
    # clear stale traces: a previous run's perfetto file would otherwise be
    # picked up and silently analyzed instead of this build's
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        out = None
        for i in range(3):
            out = fn(jnp.float32(1.0 + i / 24.0))
        np.asarray(jnp.sum(out.ravel()[:8].astype(jnp.int32)))

    files = sorted(glob.glob(f"{logdir}/**/*perfetto*", recursive=True),
                   key=lambda f: pathlib.Path(f).stat().st_mtime,
                   reverse=True)  # newest first
    print("perfetto files:", files)
    if not files:
        print("NO PERFETTO TRACE; files present:",
              glob.glob(f"{logdir}/**/*", recursive=True))
        return
    opener = gzip.open if files[0].endswith(".gz") else open
    with opener(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    durs = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            durs[e.get("name", "?")[:90]] += e["dur"]
    print("\ntop ops by total duration (us, 3 frames):")
    for name, us in durs.most_common(25):
        print(f"{us/1000.0:10.2f} ms  {name}")


if __name__ == "__main__":
    main()
