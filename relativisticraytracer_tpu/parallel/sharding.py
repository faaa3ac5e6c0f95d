"""Multi-chip image-tile rendering over a `jax.sharding.Mesh`.

The reference's only parallelism is the per-pixel CUDA thread grid
(reference: src/raymarcher.cu:176-180). The TPU-native scaling story
(SURVEY.md §2) is pure output-partitioned spatial tiling: the frame is
sharded over a 2-D device mesh ('ty' rows x 'tx' cols) with `shard_map`;
every ray is independent, so the frame program runs with ZERO collectives —
the only cross-device traffic is the host gather of finished tiles (the
analog of the reference's glReadPixels, main.cpp:89).

A free win of this design: the march's all-rays-done `lax.while_loop` runs
per device, so each chip exits as soon as ITS tile is finished — cross-chip
divergence costs nothing until the host gathers.

On the fast path (loop="pallas", media_pass="compact", sky + media on) each
shard runs the FULL single-chip compact renderer — in-kernel ray gen from
the camera scalars plus the shard's global pixel offset, segment
record/replay media compaction, sorted replay, per-shard sky gather and
epilogue — so N chips pay 1/N of the measured single-chip headline frame
time. The shard output is bitwise the corresponding crop of the
single-chip frame (tests/test_sharding.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from relativisticraytracer_tpu.config import CameraEffects, RenderSettings, SceneConfig
from relativisticraytracer_tpu.core.vecmath import Vec3, normalize
from relativisticraytracer_tpu.render.camera import CameraState, generate_rays
from relativisticraytracer_tpu.render.march import render_hdr
from relativisticraytracer_tpu.render.postfx import (
    apply_effects_and_tonemap,
    downsample_box,
    pack_rgba8,
)
from relativisticraytracer_tpu.render.skybox import Skybox, sample_sky, sample_sky_fast

AXIS_ROWS = "ty"
AXIS_COLS = "tx"


def _factor2(n: int) -> Tuple[int, int]:
    """Most-square (rows, cols) factorization of n."""
    best = (n, 1)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (n // a, a)
    return best


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """Build a ('ty', 'tx') tile mesh over the given devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = _factor2(len(devices))
    ny, nx = shape
    if ny * nx != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(ny, nx), (AXIS_ROWS, AXIS_COLS))


def render_frame_sharded(
    scene: SceneConfig,
    settings: RenderSettings,
    mesh: Mesh,
    camera: CameraState,
    effects: CameraEffects,
    time,
    sky: Optional[Skybox],
) -> jnp.ndarray:
    """Render one frame with the image tiled over `mesh`.

    Ray generation is trivially cheap and runs replicated-then-sharded; the
    heavy march + shading runs inside shard_map on each device's tile.
    Height/width must divide by the mesh rows/cols. Returns the sharded
    uint8[H, W, 4] frame; tiled == untiled bit-for-bit (tested).
    """
    ny, nx = mesh.devices.shape
    if settings.height % ny or settings.width % nx:
        raise ValueError(
            f"image {settings.height}x{settings.width} not divisible by mesh {ny}x{nx}"
        )
    ss = settings.supersample

    loop = settings.resolved_loop()

    if (
        loop == "pallas"
        and settings.media_pass == "compact"
        and sky is not None
        and (scene.enable_disk or scene.enable_clouds)
    ):
        # The fast single-chip path, per shard: segment-record/replay media
        # compaction + sorted replay (ops/pallas_compact). Each device
        # generates ITS tile's rays in-kernel from the camera scalars plus
        # its global pixel offset — no ray planes cross HBM, and the shard
        # output is bitwise the corresponding crop of the single-chip
        # frame (tested on the CPU mesh).
        from relativisticraytracer_tpu.ops.pallas_compact import (
            _compact_tile_rgba,
        )

        W, H = settings.width * ss, settings.height * ss
        tw, th = W // nx, H // ny
        interpret = jax.default_backend() != "tpu"

        def compact_tile_fn(camera, effects, time, sky):
            x0 = (jax.lax.axis_index(AXIS_COLS) * tw).astype(jnp.float32)
            y0 = (jax.lax.axis_index(AXIS_ROWS) * th).astype(jnp.float32)
            return _compact_tile_rgba(
                scene, settings, camera, effects, time, sky, tw, th,
                interpret, origin=(x0, y0), img_w=W, img_h=H,
            )

        sharded = jax.shard_map(
            compact_tile_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(AXIS_ROWS, AXIS_COLS, None),
            check_vma=False,
        )
        return sharded(camera, effects, time, sky)

    origin, direction, uv_x, uv_y = generate_rays(
        settings.width * ss, settings.height * ss, camera, effects
    )

    tile_spec = P(AXIS_ROWS, AXIS_COLS)

    def tile_fn(origin, direction, uv_x, uv_y, effects, time, sky):
        if loop == "pallas":
            # Per-device fused march kernel — each chip runs the fast path
            # on its own tile (interpreted off-TPU so the bitwise
            # tiled==untiled contract is testable on the CPU mesh).
            from relativisticraytracer_tpu.ops.pallas_march import march_pallas

            intensity, trans, hit, vel = march_pallas(
                scene, origin, direction,
                jnp.asarray(time, jnp.float32),
                settings.resolved_max_steps(scene),
                interpret=jax.default_backend() != "tpu",
            )
            d = normalize(vel)
            if sky is not None:
                # q4 row-gather (see skybox.sample_sky_fast): the multi-chip
                # fast path uses the same gather economics as the fused
                # single-chip kernel.
                bg = sample_sky_fast(sky, d, effects)
            else:
                zero = jnp.zeros_like(d.x)
                bg = Vec3(zero, zero, zero)
            zero = jnp.zeros_like(trans)
            hdr = Vec3(
                intensity.x + jnp.where(hit, zero, bg.x) * trans,
                intensity.y + jnp.where(hit, zero, bg.y) * trans,
                intensity.z + jnp.where(hit, zero, bg.z) * trans,
            )
        else:
            if sky is not None:
                def sky_fn(d: Vec3) -> Vec3:
                    return sample_sky(sky, d, effects)
            else:
                def sky_fn(d: Vec3) -> Vec3:
                    zero = jnp.zeros_like(d.x)
                    return Vec3(zero, zero, zero)

            hdr, _ = render_hdr(
                scene, origin, direction, time, sky_fn,
                max_steps=settings.resolved_max_steps(scene),
                loop=loop if loop in ("scan", "while") else "while",
                chunk=settings.chunk,
            )
        ldr = apply_effects_and_tonemap(hdr, uv_x, uv_y, effects, scene.exposure)
        return pack_rgba8(downsample_box(ldr, ss))

    sharded = jax.shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(tile_spec, tile_spec, tile_spec, tile_spec, P(), P(), P()),
        out_specs=P(AXIS_ROWS, AXIS_COLS, None),
        # pallas_call outputs don't carry varying-mesh-axis metadata; the
        # kernel is purely tile-local so the check adds nothing here.
        check_vma=False,
    )
    return sharded(origin, direction, uv_x, uv_y, effects, time, sky)


def make_sharded_renderer(
    scene: SceneConfig,
    settings: RenderSettings,
    mesh: Mesh,
):
    """jit-compiled sharded frame function (camera, effects, time, sky) ->
    uint8[H, W, 4]."""
    def fn(camera, effects, time, sky):
        return render_frame_sharded(scene, settings, mesh, camera, effects, time, sky)

    return jax.jit(fn)
