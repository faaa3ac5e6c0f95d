"""The frame program: one pure jitted function per (scene, resolution).

Everything the reference spreads over main.cpp/GL/CUDA plumbing collapses
into `render_frame`: ray gen -> masked geodesic march -> radiative transfer
-> skybox composite -> post FX -> tone map -> uint8 pack. The host driver
(runtime/app.py) only feeds (camera, effects, time) pytrees and streams
uint8 frames out — the TPU analog of the reference's per-frame kernel
launch + PBO interop (src/main.cpp:460-480).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from relativisticraytracer_tpu.config import (
    CameraEffects,
    RenderSettings,
    SceneConfig,
)
from relativisticraytracer_tpu.core.vecmath import Vec3
from relativisticraytracer_tpu.render.camera import CameraState, generate_rays
from relativisticraytracer_tpu.render.march import render_hdr
from relativisticraytracer_tpu.render.postfx import (
    apply_effects_and_tonemap,
    downsample_box,
    pack_rgba8,
)
from relativisticraytracer_tpu.render.skybox import Skybox, sample_sky


def render_frame(
    scene: SceneConfig,
    settings: RenderSettings,
    camera: CameraState,
    effects: CameraEffects,
    time,
    sky: Optional[Skybox],
) -> jnp.ndarray:
    """Render one frame -> uint8[height, width, 4], top-down row order.

    `scene`/`settings` are static (hashable); `camera`, `effects`, `time`,
    and `sky` are traced, so camera motion, effect toggles, the sim clock,
    and even skybox swaps reuse the compiled program.
    """
    ss = settings.supersample
    origin, direction, uv_x, uv_y = generate_rays(
        settings.width * ss, settings.height * ss, camera, effects
    )

    if sky is not None:
        def sky_fn(d: Vec3) -> Vec3:
            return sample_sky(sky, d, effects)
    else:
        def sky_fn(d: Vec3) -> Vec3:
            zero = jnp.zeros_like(d.x)
            return Vec3(zero, zero, zero)

    loop = settings.resolved_loop()
    hdr, _ = render_hdr(
        scene,
        origin,
        direction,
        time,
        sky_fn,
        max_steps=settings.resolved_max_steps(scene),
        loop="while" if loop == "pallas" else loop,
        chunk=settings.chunk,
    )
    ldr = apply_effects_and_tonemap(hdr, uv_x, uv_y, effects, scene.exposure)
    return pack_rgba8(downsample_box(ldr, ss))


@functools.lru_cache(maxsize=32)
def _compiled_render(scene: SceneConfig, settings: RenderSettings):
    if settings.resolved_loop() == "pallas":
        if settings.media_pass == "compact":
            from relativisticraytracer_tpu.ops.pallas_compact import (
                render_frame_pallas_compact as render_frame_pallas,
            )
        else:
            from relativisticraytracer_tpu.ops.pallas_march import (
                render_frame_pallas,
            )

        # Off-TPU an explicit loop="pallas" runs the kernel in interpreter
        # mode instead of failing at Mosaic lowering (same rule as the
        # sharded path, parallel/sharding.py).
        fn = functools.partial(render_frame_pallas, scene, settings,
                               interpret=jax.default_backend() != "tpu")
    else:
        fn = functools.partial(render_frame, scene, settings)
    return jax.jit(fn)


class Renderer:
    """Convenience host-side driver around the jitted frame program.

    Caches one executable per (scene, settings); keeps the skybox resident
    on device (the one-time upload, analog of main.cpp:247-248).
    """

    def __init__(
        self,
        scene: SceneConfig = SceneConfig(),
        settings: RenderSettings = RenderSettings(),
        skybox_rgba: Optional[np.ndarray] = None,
        skybox: Optional[Skybox] = None,
    ):
        self.scene = scene
        self.settings = settings
        # `skybox` shares an already-built device texture (e.g. between a
        # quality and a motion renderer — one HBM copy); `skybox_rgba`
        # uploads a host array.
        self.sky: Optional[Skybox] = skybox
        if skybox is None and skybox_rgba is not None:
            from relativisticraytracer_tpu.render.skybox import skybox_from_array

            # the interleaved fast-gather table only pays for itself on the
            # fused kernel path; skip its ~2.3x HBM cost elsewhere
            self.sky = skybox_from_array(
                skybox_rgba,
                fast_table=settings.resolved_loop() == "pallas",
            )
        self._fn = _compiled_render(scene, settings)
        self._sky_cache: dict = {}

    def render(
        self,
        camera: CameraState,
        effects: Optional[CameraEffects] = None,
        time: float = 0.0,
    ) -> jnp.ndarray:
        """Returns the device uint8[H, W, 4] frame (no host copy)."""
        if effects is None:
            effects = CameraEffects()
        return self._fn(camera, effects, jnp.float32(time), self.sky)

    def render_np(self, camera, effects=None, time: float = 0.0) -> np.ndarray:
        """Render and fetch to host (the analog of the PBO readback)."""
        return np.asarray(self.render(camera, effects, time))

    def _sky_on(self, device):
        """Per-device replica of the skybox (one-time upload per chip)."""
        if self.sky is None or device is None:
            return self.sky
        if device not in self._sky_cache:
            self._sky_cache[device] = jax.device_put(self.sky, device)
        return self._sky_cache[device]

    def render_on(self, device, camera, effects=None,
                  time: float = 0.0) -> jnp.ndarray:
        """Dispatch one frame on a SPECIFIC jax.Device (returns the device
        array without blocking). Frames are mutually independent, so an
        animation round-robins them across chips with zero communication —
        the frame-parallel complement to parallel/sharding's spatial tiling
        (reference recording loop: src/main.cpp:505-529, at N-chip
        throughput)."""
        if effects is None:
            effects = CameraEffects()
        if device is None:
            return self._fn(camera, effects, jnp.float32(time), self.sky)
        camera, effects, t = jax.device_put(
            (camera, effects, jnp.float32(time)), device
        )
        return self._fn(camera, effects, t, self._sky_on(device))
