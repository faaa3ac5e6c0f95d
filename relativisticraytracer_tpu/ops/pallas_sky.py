"""Windowed sky sampling: an MXU one-hot gather over per-tile sky windows.

The background stage fetches one bilinear footprint per escaped ray from
the equirect texture (reference: tex2D at src/raymarcher.cu:139, texture
setup src/main.cpp:250-263). The TPU has no texture units; the q4
row-gather (render/skybox.py) costs ~16 ns per gathered SLICE — ~33 ms at
1080p, two orders of magnitude below HBM bandwidth for the 33 MB actually
fetched (PERF.md round 2/3). That cost is an XLA-gather property, not
silicon: the data the frame needs per TILE is a small contiguous
sub-rectangle of the sky, because escape directions are spatially smooth
everywhere except near the photon ring.

This module exploits that coherence (VERDICT r3 #1):

  * For each sub-tile of `sub_rows` lane rows (sub_rows x 128 pixels), XLA
    computes the bounding box of its quad indices (captured rays excluded —
    their background is masked by T=0). A sub-tile whose box fits a
    (br, bc) window is COHERENT — the round-5 on-chip census measured,
    AFTER the (8, 128) origin alignment the DMA requires, 90.0% of sub8
    tiles fitting the shipped 64x256 window at the headline pose (90.5%
    edge-on, 79.2% close-ring; docs/sky_window.json — the raw-bbox fit is
    a few points higher, e.g. 93.7% headline). The compacted fallback
    carries the rest.
  * A Pallas kernel DMAs each sub-tile's window from the three HBM quad
    planes into VMEM and gathers every lane's quad with an MXU one-hot
    matmul: onehot(P, K) @ window(K, 12) where K = br*bc and the 12
    columns are the three channels' four unpacked corner bytes. u8 texels
    and 0/1 indicators are exact in bfloat16 and each output element is
    one addend summed with zeros in f32 — the matmul is EXACT, and the
    corner filter is the shared `corner_bilinear`, so the result is
    bitwise the q4 row-gather's.
  * Incoherent sub-tiles (photon-ring neighborhoods, the equirect x-wrap
    seam) fall back to the exact q4 row-gather, COMPACTED to just their
    lane rows (same row-compaction trick as ops/pallas_compact's sorted
    replay) so the per-slice gather cost scales with the incoherent few
    percent, not the frame. Overflow beyond the static fallback capacity
    drops the whole frame to the plain row-gather under one lax.cond —
    exact at every pose.

Chromatic aberration samples R/B at phi offsets (raymarcher.cu:131-145);
that path keeps the per-channel element gathers (CA is off in the
reference's defaults, camera_settings.h:10)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relativisticraytracer_tpu.render.skybox import Skybox, quad_bilinear

# Sub-tile height (lane rows of 128 px) sharing one sky window, and the
# window size in texels. Window ORIGINS are aligned to the (8, 128) i32
# HBM tile grid (Mosaic DMA slices must start on tile boundaries), so a
# sub-tile fits when its bbox fits the window MINUS the alignment slop
# (up to 7 rows / 127 cols) — hence the window is a full lane-tile wide.
# Defaults from the round-5 on-chip sweep (tools/bench_sky_window.py,
# docs/sky_window.json): at 64x256 the kernel measures 11.6 ms (vs 9.9 at
# 32x256) but the ALIGNED fit rate at 1080p rises to 90.0% / 90.5% / 79.2%
# (headline / edge-on / close-ring poses) from 69.3% / 78.6% / 70.3% —
# every census pose's incoherent rows then fit FALLBACK_ROWS, and the
# whole stage beats the row-gather at all three. Windows larger than the
# sky are clamped down to the sky's aligned extent (small skies always
# work).
SUB_ROWS = 8
WIN_BR = 64
WIN_BC = 256
# Lane rows the compacted fallback gather can carry before the whole frame
# drops to the plain row-gather. The gather cost is STATIC (the compacted
# buffer has this many rows no matter how few are incoherent): 4096 rows =
# 25% of a 1080p frame ~= 7.9 ms of the 31.7 ms row-gather. The census
# poses need ~1,640 / ~1,552 / ~3,391 incoherent rows at the aligned
# 64x256 fit (docs/sky_window.json), so all three stay on the compact
# branch with headroom.
FALLBACK_ROWS = 4096


def _clamp_window(hq: int, w: int, br: int, bc: int):
    """Clamp a requested (br, bc) window to the sky's (8, 128)-aligned
    extent. Returns None if the sky is too small to window at all (narrower
    than one 128-lane tile or shorter than one 8-row tile) — callers then
    use the plain row-gather."""
    br = min(br, (hq // 8) * 8)
    bc = min(bc, (w // 128) * 128)
    if br < 8 or bc < 128:
        return None
    return br, bc


def _window_kernel(sub_rows: int, br: int, bc: int,
                   origins_ref, yl_ref, xl_ref,
                   qr_hbm, qg_hbm, qb_hbm,
                   r_ref, g_ref, b_ref,
                   wr, wg, wb, sems):
    """One grid step = one sub-tile: DMA its (br, bc) window of each quad
    plane, one-hot-gather every lane's quad on the MXU, re-pack the four
    corner bytes into the channel's uint32 quad. The bilinear filter stays
    OUTSIDE the kernel (the caller runs the very same XLA quad_bilinear as
    the row-gather path) so FMA-contraction differences between Mosaic and
    XLA cannot introduce ulp drift — every op in here is exact integer
    movement. `origins_ref` is the scalar-prefetch (t, 2) window-corner
    table (small SMEM blocks don't lower as regular inputs on TPU).

    The gather is SEPARABLE: quad[l] = sum_{y,x} payload[y,x] *
    rowOH[y,l] * colOH[x,l]. Per lane row, one (12*br, bc) x (bc, 128)
    matmul contracts the window columns at full MXU K=bc, then a
    (br, 128) one-hot multiply-reduce picks the window row. This avoids
    the flattened (P, br*bc) one-hot entirely — Mosaic cannot relayout
    an (sub_rows, 128) -> (P, 1) shape cast, and the flat form's K=2048
    one-hot was 16x more VPU work to build anyway. All values stay exact:
    u8 texels are exact in bf16, every f32 accumulation has at most one
    nonzero addend."""
    i = pl.program_id(0)
    # origins arrive in (8, 128)-tile units and are scaled here so Mosaic
    # can PROVE the DMA slice starts on the HBM tile grid (a raw SMEM
    # scalar has no divisibility info and fails to lower).
    oy = origins_ref[i, 0] * 8
    ox = origins_ref[i, 1] * 128
    copies = []
    for j, (src, dst) in enumerate(((qr_hbm, wr), (qg_hbm, wg),
                                    (qb_hbm, wb))):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(oy, br), pl.ds(ox, bc)], dst, sems.at[j]
        )
        cp.start()
        copies.append(cp)

    # Local window coordinates were computed by the XLA wrapper; anything
    # outside the window (captured lanes, incoherent sub-tiles awaiting
    # fallback) gets an all-zero one-hot row -> background 0.
    yl = yl_ref[...]
    xl = xl_ref[...]
    valid = jnp.logical_and(
        jnp.logical_and(yl >= 0, yl < br),
        jnp.logical_and(xl >= 0, xl < bc),
    )
    wy = jnp.where(valid, yl, -1)
    wx = jnp.where(valid, xl, -1)

    for cp in copies:
        cp.wait()

    # (12*br, bc) bf16 payload: channel-major corner-byte planes stacked
    # along sublanes. Mosaic has no u32->bf16 convert: reinterpret as i32
    # (bit-preserving same-width convert) and mask AFTER the shifts.
    parts = []
    for w in (wr, wg, wb):
        q = w[...].astype(jnp.int32)
        parts.append((q & 0xFF).astype(jnp.bfloat16))
        parts.append(((q >> 8) & 0xFF).astype(jnp.bfloat16))
        parts.append(((q >> 16) & 0xFF).astype(jnp.bfloat16))
        parts.append(((q >> 24) & 0xFF).astype(jnp.bfloat16))
    payload = jnp.concatenate(parts, axis=0)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bc, 128), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)
    for r in range(sub_rows):
        col_oh = (iota_c == wx[r:r + 1, :]).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(
            payload, col_oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (12*br, 128), exact u8 integers in f32
        row_oh = (iota_r == wy[r:r + 1, :]).astype(jnp.float32)
        vals = [
            jnp.sum(t1[p * br:(p + 1) * br, :] * row_oh,
                    axis=0, keepdims=True)
            for p in range(12)
        ]
        for ch, ref in enumerate((r_ref, g_ref, b_ref)):
            # repack the quad in i32 (f32->u32 doesn't lower in Mosaic);
            # the top byte lands in the sign bits, which the i32->u32
            # same-width convert keeps.
            c00 = vals[4 * ch + 0].astype(jnp.int32)
            c10 = vals[4 * ch + 1].astype(jnp.int32)
            c01 = vals[4 * ch + 2].astype(jnp.int32)
            c11 = vals[4 * ch + 3].astype(jnp.int32)
            ref[r:r + 1, :] = (
                c00 | (c10 << 8) | (c01 << 16) | (c11 << 24)
            ).astype(jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=("sub_rows", "br", "bc", "interpret"),
)
def sky_window_gather(
    sky: Skybox,
    idx: jnp.ndarray,
    origins: jnp.ndarray,
    sub_rows: int = SUB_ROWS,
    br: int = WIN_BR,
    bc: int = WIN_BC,
    interpret: bool = False,
):
    """Windowed quad fetch for every lane.

    idx: (n_rows, 128) flat-quad-index plane (one channel's coordinates
    from render.skybox.sky_coords). origins: (n_rows // sub_rows, 2) i32
    (oy, ox) window corners, clipped to [0, H+1-br] x [0, W-bc]; they are
    floored to the (8, 128) HBM tile grid INTERNALLY (Mosaic DMA slices
    must start on tile boundaries) — unaligned origins are valid and the
    local coordinates follow the floored window, so results stay correct.
    A window larger than the sky is clamped to the sky's aligned extent.
    Lanes whose quad falls outside their sub-tile's window produce 0
    (callers overwrite them via the fallback path). Returns (tr, tg, tb)
    uint32 quad planes, bitwise equal to take(plane, idx) wherever the
    window covers — feed them to the same quad_bilinear as the gather
    path."""
    n_rows = idx.shape[0]
    if n_rows % sub_rows:
        raise ValueError(f"{n_rows} lane rows not divisible by {sub_rows}")
    t = n_rows // sub_rows
    hq, w = sky.qr.shape
    clamped = _clamp_window(hq, w, br, bc)
    if clamped is None:
        raise ValueError(f"sky {hq}x{w} too small to window (needs >=8x128)")
    br, bc = clamped

    # kernel-side origins travel in (8, 128)-tile units (Mosaic must prove
    # DMA-slice alignment); the floor is applied HERE so the local window
    # coordinates below agree with the DMA'd window even for unaligned
    # caller origins.
    origins_t = jnp.stack(
        [origins[:, 0] // 8, origins[:, 1] // 128], axis=1
    ).astype(jnp.int32)

    # Local window coordinates (kernel-side div/mod avoided: the division
    # is done here where XLA strength-reduces it).
    y = idx // w
    x = idx - y * w
    oy = jnp.repeat(origins_t[:, 0] * 8, sub_rows)[:, None]
    ox = jnp.repeat(origins_t[:, 1] * 128, sub_rows)[:, None]
    yl = y - oy
    xl = x - ox

    # with scalar prefetch, index maps receive (grid idx, scalar ref)
    tile = lambda i, s: (i, 0)  # noqa: E731
    plane_spec = pl.BlockSpec((sub_rows, 128), tile, memory_space=pltpu.VMEM)
    ushape = jax.ShapeDtypeStruct((n_rows, 128), jnp.uint32)
    kernel = functools.partial(_window_kernel, sub_rows, br, bc)
    # dominated by the (P, K) one-hot dot, K = br*bc, N = 12
    cost = pl.CostEstimate(
        flops=int(t) * sub_rows * 128 * br * bc * 12 * 2,
        bytes_accessed=int(t) * (br * bc * 12 + sub_rows * 128 * 28),
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            plane_spec,  # yl
            plane_spec,  # xl
            pl.BlockSpec(memory_space=pl.ANY),  # qr (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # qg
            pl.BlockSpec(memory_space=pl.ANY),  # qb
        ],
        out_specs=[plane_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((br, bc), jnp.uint32),
            pltpu.VMEM((br, bc), jnp.uint32),
            pltpu.VMEM((br, bc), jnp.uint32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[ushape] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    return fn(origins_t, yl, xl, sky.qr, sky.qg, sky.qb)


def _window_bounds(idx, masked, w, hq, sub_rows, br, bc):
    """Per-sub-tile quad bounding boxes -> (origins (T,2) i32, coherent
    (T,) bool). `masked` lanes are excluded (their background is
    irrelevant — transmittance exactly 0, i.e. captured rays); an
    all-masked sub-tile is 'coherent' with a degenerate window that every
    lane misses (valid=False -> bg 0, and 0 * T=0 matches any value the
    row-gather would have produced)."""
    n_rows = idx.shape[0]
    t = n_rows // sub_rows
    s = sub_rows * 128
    idxt = idx.reshape(t, s)
    y = idxt // w
    x = idxt - y * w
    cap = masked.reshape(t, s)
    big = jnp.int32(1 << 30)
    ymin = jnp.min(jnp.where(cap, big, y), axis=1)
    ymax = jnp.max(jnp.where(cap, -big, y), axis=1)
    xmin = jnp.min(jnp.where(cap, big, x), axis=1)
    xmax = jnp.max(jnp.where(cap, -big, x), axis=1)
    all_cap = ymin > ymax
    # Window origins align DOWN to the (8, 128) i32 HBM tile grid — Mosaic
    # DMA slices must start on tile boundaries — and the max origin is the
    # aligned clip, so the bottom/right poles cost a few fallback rows.
    oy = jnp.minimum((jnp.where(all_cap, 0, ymin) // 8) * 8,
                     ((hq - br) // 8) * 8)
    ox = jnp.minimum((jnp.where(all_cap, 0, xmin) // 128) * 128,
                     ((w - bc) // 128) * 128)
    oy = jnp.maximum(oy, 0)
    ox = jnp.maximum(ox, 0)
    coh = jnp.logical_or(
        all_cap,
        jnp.logical_and(ymax < oy + br, xmax < ox + bc),
    )
    return jnp.stack([oy, ox], axis=1).astype(jnp.int32), coh


def sky_background_windowed(
    sky: Skybox,
    coords,
    effects,
    masked: jnp.ndarray,
    sub_rows: int = SUB_ROWS,
    br: int = WIN_BR,
    bc: int = WIN_BC,
    fallback_rows: int = FALLBACK_ROWS,
    interpret: bool = False,
):
    """Drop-in replacement for render.skybox.gather_sky_coords on the
    Pallas frame path: windowed MXU gather for coherent sub-tiles, the
    exact q4 row-gather compacted onto the incoherent lane rows, the plain
    full-frame gather as the static-capacity overflow branch and for
    chromatic aberration (whose R/B offsets need per-channel coordinates).
    The composited frame (intensity + bg * transmittance) is bitwise the
    row-gather path's at every pose: unmasked lanes get bitwise-equal
    background values, and `masked` lanes (transmittance exactly 0 —
    captured rays, raymarcher.cu:49) may produce 0 instead, which the
    T=0 weight erases either way.

    `coords` is the 3-tuple of per-channel (flat quad index, fx, fy) from
    render.skybox.sky_coords; `masked` a bool plane of lanes whose
    background cannot reach the frame. All in the (n_rows, 128) lane
    layout of the record/march kernels."""
    from relativisticraytracer_tpu.core.vecmath import Vec3
    from relativisticraytracer_tpu.render.skybox import gather_sky_coords

    idx, fx, fy = coords[1]
    n_rows = idx.shape[0]
    hq, w = sky.qr.shape
    clamped = _clamp_window(hq, w, br, bc)
    if clamped is None or sky.q4 is None:
        # sky too small to window, or no interleaved table (the fallback
        # economics change) — keep the existing row-gather path
        return gather_sky_coords(sky, coords, effects)
    br, bc = clamped
    cap_rows = min(fallback_rows, n_rows)

    def full_gather(_):
        bg = gather_sky_coords(sky, coords, effects)
        return bg.x, bg.y, bg.z

    def windowed(_):
        origins, coh = _window_bounds(idx, masked, w, hq, sub_rows, br, bc)
        tr, tg, tb = sky_window_gather(
            sky, idx, origins,
            sub_rows=sub_rows, br=br, bc=bc, interpret=interpret,
        )

        # Compacted exact fallback for the incoherent lane rows: fetch
        # their quads with the q4 row-gather (cost scales with the
        # incoherent count) and scatter them over the kernel's planes.
        bad_row = jnp.repeat(jnp.logical_not(coh), sub_rows)
        rcm = jnp.cumsum(bad_row.astype(jnp.int32))
        rcount = rcm[-1]

        def compact_fallback(quads):
            rsrc = jnp.searchsorted(
                rcm, jnp.arange(1, cap_rows + 1, dtype=jnp.int32))
            rvalid = jnp.arange(cap_rows, dtype=jnp.int32) < rcount
            rsrc = jnp.where(rvalid, rsrc, 0)
            t4 = jnp.take(sky.q4, idx[rsrc], axis=0)  # (cap, 128, 4)
            stacked = jnp.stack(quads, axis=-1)
            rdst = jnp.where(
                rvalid, rsrc,
                n_rows + jnp.arange(cap_rows, dtype=jnp.int32))
            stacked = stacked.at[rdst].set(
                t4[..., :3], mode="drop", unique_indices=True)
            qs = (stacked[..., 0], stacked[..., 1], stacked[..., 2])
            # the SAME XLA filter expression as the row-gather path
            return tuple(quad_bilinear(q, fx, fy) for q in qs)

        def full_fallback(quads):
            t4 = jnp.take(sky.q4, idx, axis=0)
            return tuple(
                quad_bilinear(t4[..., c], fx, fy) for c in range(3))

        if cap_rows >= n_rows:
            return compact_fallback((tr, tg, tb))
        return jax.lax.cond(
            rcount <= cap_rows, compact_fallback, full_fallback,
            (tr, tg, tb),
        )

    r, g, b = jax.lax.cond(
        effects.use_chromatic_aberration > 0.5, full_gather, windowed, None
    )
    return Vec3(r, g, b)
