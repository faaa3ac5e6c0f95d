#!/usr/bin/env python
"""Quick fused-frame timing on the chip: full 1080p frame, march-only, and
the q4 row-gather, all HARD-synced (on-device scalar fetched per batch)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.benchlib import timeit_hard


import jax
import jax.numpy as jnp
import numpy as np



def main():
    from relativisticraytracer_tpu.config import (
        CameraEffects,
        RenderSettings,
        SceneConfig,
    )
    from relativisticraytracer_tpu.ops.pallas_march import (
        march_pallas_camera_sky,
        render_frame_pallas,
    )
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
    t = jnp.float32(1.0)
    sky_h, sky_w = sky.shape

    full = jax.jit(lambda tt: render_frame_pallas(
        scene, settings, cam, eff, tt, sky))
    print(f"fused full_frame   {timeit_hard(lambda: full(t)):8.1f} ms")

    march = jax.jit(lambda tt: march_pallas_camera_sky(
        scene, cam, eff, tt, W, H, scene.max_steps, sky_h, sky_w)[1])
    print(f"fused march-only   {timeit_hard(lambda: march(t)):8.1f} ms")

    # q4 row-gather alone with this frame's indices
    idx = jax.block_until_ready(jax.jit(lambda tt: march_pallas_camera_sky(
        scene, cam, eff, tt, W, H, scene.max_steps, sky_h, sky_w)[2][1])(t))
    g = jax.jit(lambda idx, q4: jnp.take(q4, idx, axis=0))
    q4 = sky.q4
    print(f"q4 row-gather      {timeit_hard(lambda: g(idx, q4)):8.1f} ms")


def extra():
    """Extra micro-measurements: gather variants + probe/cond overhead."""
    from relativisticraytracer_tpu.config import (
        CameraEffects,
        SceneConfig,
    )
    from relativisticraytracer_tpu.ops.pallas_march import (
        march_pallas_camera_sky,
    )
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    W, H = 1920, 1080
    scene = SceneConfig()
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    eff = CameraEffects()
    t = jnp.float32(1.0)
    sky_h, sky_w = sky.shape

    # probe/cond overhead: media ENABLED but camera high above the plane
    # looking away — probes never fire, so this is vacuum + probe + cond.
    cam_away = camera_state_from_pose((0.0, 300.0, 0.0), 0.0, 89.0)
    m_away = jax.jit(lambda tt: march_pallas_camera_sky(
        scene, cam_away, eff, tt, W, H, scene.max_steps, sky_h, sky_w)[1])
    print(f"march away+media   {timeit_hard(lambda: m_away(t)):8.1f} ms")
    import dataclasses
    vac = dataclasses.replace(scene, enable_disk=False, enable_clouds=False)
    m_away_v = jax.jit(lambda tt: march_pallas_camera_sky(
        vac, cam_away, eff, tt, W, H, scene.max_steps, sky_h, sky_w)[1])
    print(f"march away vacuum  {timeit_hard(lambda: m_away_v(t)):8.1f} ms")

    # gather variants on the real frame's indices
    idx = jax.block_until_ready(jax.jit(lambda tt: march_pallas_camera_sky(
        scene, cam, eff, tt, W, H, scene.max_steps, sky_h, sky_w)[2][1])(t))
    q4 = sky.q4
    g1 = jax.jit(lambda idx, q4: jnp.take(q4, idx, axis=0))
    print(f"q4 take (clip)     {timeit_hard(lambda: g1(idx, q4)):8.1f} ms")
    g2 = jax.jit(lambda idx, q4: jnp.take(
        q4, idx, axis=0, mode="promise_in_bounds", unique_indices=False))
    print(f"q4 take (promise)  {timeit_hard(lambda: g2(idx, q4)):8.1f} ms")
    q3 = jax.block_until_ready(jax.jit(lambda a: a[:, :3])(q4))
    g3 = jax.jit(lambda idx, q3: jnp.take(q3, idx, axis=0))
    print(f"q3 take (3-wide)   {timeit_hard(lambda: g3(idx, q3)):8.1f} ms")


if __name__ == "__main__":
    import sys
    if "--extra" in sys.argv:
        extra()
    else:
        main()
