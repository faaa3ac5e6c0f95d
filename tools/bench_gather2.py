#!/usr/bin/env python
"""Gather A/B with HARD sync (fetch an on-device scalar reduction per call,
so async dispatch cannot hide execution — `block_until_ready` alone let a
physically-impossible 0.03 ms "gather" through in an earlier microbench;
every timing tool here now fetches a scalar).

Variables tested: table passed as jit argument vs captured closure
constant; realistic (render-derived) vs uniform-random indices; flat
element take vs K=4 row take.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.benchlib import timeit_hard_scalar as timeit_hard


import jax
import jax.numpy as jnp
import numpy as np



def main():
    HT, WT = 2049, 4096
    N = HT * WT
    key = jax.random.PRNGKey(0)
    idx_rand = jax.block_until_ready(
        jax.random.randint(key, (1080, 1920), 0, N, dtype=jnp.int32))

    # realistic indices: from the actual frame's escape directions
    from relativisticraytracer_tpu.config import CameraEffects, SceneConfig
    from relativisticraytracer_tpu.ops.pallas_march import march_pallas_camera
    from relativisticraytracer_tpu.render.camera import camera_state_from_pose
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )
    from relativisticraytracer_tpu.core.vecmath import normalize

    scene = SceneConfig()
    sky = skybox_from_array(procedural_starfield(2048, 4096))
    cam = camera_state_from_pose((0.0, 10.0, -60.0), 0.0, -10.0)
    _, _, _, vel = jax.block_until_ready(jax.jit(
        lambda t: march_pallas_camera(
            scene, cam, CameraEffects(), t, 1920, 1080, scene.max_steps)
    )(jnp.float32(1.0)))

    def mkidx(vel):
        # the PRODUCTION index derivation (skybox.sky_coords), G channel
        from relativisticraytracer_tpu.render.skybox import sky_coords
        sh, sw = sky.shape
        idx, _, _ = sky_coords(normalize(vel), jnp.float32(0.0), sh, sw)[1]
        return idx

    idx_real = jax.block_until_ready(jax.jit(mkidx)(vel))
    tab = jax.block_until_ready(sky.qr.reshape(-1))

    r = {}

    # 1) argument table, realistic idx
    f = jax.jit(lambda idx, t: jnp.sum(jnp.take(t, idx) >> 24))
    r["arg tab, real idx"] = timeit_hard(lambda: f(idx_real, tab))
    # 2) argument table, random idx
    r["arg tab, rand idx"] = timeit_hard(lambda: f(idx_rand, tab))

    # 3) closure-const table (exactly like profile_stages), realistic idx
    g = jax.jit(lambda idx: jnp.sum(jnp.take(sky.qr.reshape(-1), idx) >> 24))
    r["const tab, real idx"] = timeit_hard(lambda: g(idx_real))
    r["const tab, rand idx"] = timeit_hard(lambda: g(idx_rand))

    # 4) 3x arg takes
    f3 = jax.jit(lambda idx, a, b, c: jnp.sum(
        (jnp.take(a, idx) >> 24)
        + (jnp.take(b, idx) >> 24)
        + (jnp.take(c, idx) >> 24)))
    qr, qg, qb = (sky.qr.reshape(-1), sky.qg.reshape(-1), sky.qb.reshape(-1))
    r["3x arg tab, real idx"] = timeit_hard(
        lambda: f3(idx_real, qr, qg, qb))

    # 5) row take K=4 (packed 3-channel rows), arg table
    pack4 = jax.jit(lambda a, b, c: jnp.stack(
        [a, b, c, jnp.zeros_like(a)], axis=-1))
    tab4 = jax.block_until_ready(pack4(qr, qg, qb))
    f4 = jax.jit(lambda idx, t4: jnp.sum(
        jnp.take(t4, idx, axis=0) >> 24))
    r["K=4 row arg tab, real idx"] = timeit_hard(lambda: f4(idx_real, tab4))
    r["K=4 row arg tab, rand idx"] = timeit_hard(lambda: f4(idx_rand, tab4))

    for k, v in r.items():
        print(f"{k:30s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
