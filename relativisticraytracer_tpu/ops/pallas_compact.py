"""Segment-replay media compaction: two Pallas passes instead of one.

The round-2 fused kernel shades media under whole-tile conds, which
executes ~3.3x the per-ray-ideal media lane-steps at 1080p (~80 ms of
provably skippable 5-octave-fbm work, docs/media_fire.json). The reference
GPU pays media cost only on the threads that are actually inside a medium
(divergent branch, src/raymarcher.cu:67-117); this module is the TPU
equivalent of that scheduling.

Key physics fact making it exact: the TRAJECTORY is independent of the
media (media only accumulate color along it), and the conservative probes
(media/densities.py:disk_probe_bounds/cloud_probe_bounds) guarantee zero
emission AND zero opacity wherever they are False — so skipping probe-False
steps changes nothing (tests/test_densities.py). The march therefore splits:

  A) the RECORD pass (`march_pallas_camera_sky_record`): the round-2 fused
     kernel with the shading block swapped for a ~40-op recorder. Per ray
     it stores up to SLOTS media segments — PRE-step position + velocity at
     segment entry, plus the segment length in steps — into output refs
     (mutated in place inside the while body under a "any lane probes"
     cond, so the loop carry stays the same size as the vacuum kernel).
     Segments beyond the last slot MERGE into it: the recorded span then
     covers the probe-false gap steps too, which the replay marches
     harmlessly (densities are exactly 0 there) — merging costs work,
     never correctness.

  B) the REPLAY pass (`media_replay`): each lane re-integrates ONLY its
     recorded segments, back-to-back. RK4 from the recorded entry state
     reproduces A's positions bitwise (same function, same inputs, h is a
     pure function of position), so the shading is bit-identical to the
     inline path — verified by tests/test_compact.py's exact-equality
     gates. Every loop iteration shades for every lane that still has
     steps left: the tile pays max-over-lanes of per-lane media steps
     (~1.0-1.5x ideal) instead of "any lane probes" (3.3x).

Compositing splits exactly: transmittance only changes inside media, so
B's running (intensity, transmittance) across its segments IS the
reference's accumulation restricted to media steps; the final frame is
  hdr = I_B + bg * (0 if captured else T_B)
with A providing the capture mask and the in-kernel sky addressing
(raymarcher.cu:123-150 semantics, as in ops/pallas_march.py).

Reference correspondence: raymarcher.cu:41-121 (march), 67-117 (media),
107-115 (compositing), 123-150 (background).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relativisticraytracer_tpu.config import (
    CameraEffects,
    RenderSettings,
    SceneConfig,
)
from relativisticraytracer_tpu.core.utils import largest_divisor_at_most
from relativisticraytracer_tpu.core.vecmath import Vec3, normalize
from relativisticraytracer_tpu.ops.pallas_march import (
    BLOCK_H,
    BLOCK_W,
    _round_up,
    pack_camera_scalars,
)
from relativisticraytracer_tpu.render.march import (
    MarchState,
    _media_contribution,
    adaptive_h,
    compose_step,
    march_step,
    media_probes,
    media_zones,
)
from relativisticraytracer_tpu.render.postfx import (
    apply_effects_and_tonemap,
    downsample_box,
    pack_rgba8,
    pack_rgba8_word,
    word_to_rgba8,
)
from relativisticraytracer_tpu.render.skybox import (
    Skybox,
    gather_sky_coords,
    sky_coords,
)

# Default number of exactly-tracked segments per ray; the 4th, 5th, ...
# crossings merge into the last slot (gap steps are replayed harmlessly).
SLOTS = 3
B_UNROLL = 4
# Record-pass steps per while-loop iteration (commit-cond granularity).
# The record body is lean (vacuum march + ~40-op recorder, no media
# shading), so unlike the inline kernel (VMEM-spill cliff past 8) it keeps
# winning to ~40-50: the per-block commit cond and loop check amortize
# 5x while recorded replay steps stay EXACTLY flat (21.3M at the 1080p
# headline pose for unroll 4..100 — lengths record actual media steps, not
# blocks). Measured A-pass: 144.3 ms @8 -> 128.9 @40; past 80 the
# all-done overshoot (< unroll wasted steps/tile) wins out
# (docs/bench_record_unroll.json). Exactness is unroll-independent:
# finished rays are masked no-ops and gap steps shade provable zeros.
A_UNROLL = 40
# Record-pass pixel-block height (x128 wide). The inline kernel's sweep
# picked 32; the record kernel prefers 16 — half the max-over-lanes exit
# divergence per tile and half the VMEM for its 31 record planes:
# 129.0 (32) -> 126.4 (16) ms at the 1080p headline pose; 8 collapses to
# 182 (per-block grid overhead), 64 to 165. Layout-only: per-ray values
# are tile-independent, and the whole compact pipeline (padding, replay,
# epilogue re-tile) keys off this constant.
A_BLOCK_H = 16
# Sorted-replay tile height: 36.0/34.6/41.1 ms at 16/32/64 lane-rows
# (the sort makes tiles length-uniform, so taller tiles amortize grid
# overhead without paying divergence — until 64 overshoots).
B_ROWS_SORTED = 32


def _any(*xs):
    out = None
    for x in xs:
        if x is None:
            continue
        out = x if out is None else jnp.logical_or(out, x)
    return out


# --------------------------------------------------------------------------
# A: the record pass
# --------------------------------------------------------------------------


def _record_march_loop(scene: SceneConfig, max_steps: int, unroll: int,
                       slots: int, t, make_state, rec_refs):
    """Tile march loop at vacuum cost + segment recording into `rec_refs`
    = (px, py, pz, vx, vy, vz, length)[slots] output refs (tile blocks).

    The while carry is the vacuum MarchState plus three f32 planes
    (in_seg, slot count k, current-segment entry step) and the step
    counter; the record planes live in the refs and are only touched under
    a per-step "any lane probes" lax.cond."""
    state = make_state()
    zeros = jnp.zeros_like(state.p.x)
    for refs in rec_refs:
        refs[6][...] = zeros          # lengths: 0 = empty slot
        for j in range(6):
            refs[j][...] = zeros      # entry states: benign r=0 (acc==0)

    # Two structural lessons are baked into this loop, both measured on
    # chip at 1080p (tools/bench_compact.py):
    #   * the while carry is expensive — intensity/transmittance are
    #     dropped (they enter march_step as constants; the dead selects
    #     are eliminated), and a denser k+in_seg floor-packing measured
    #     38 ms WORSE (decode ops beat the saved plane);
    #   * a lax.cond EVALUATED per step costs ~75 ns per tile-step even
    #     when it almost never fires (~40 ms/frame at 1080p), so the
    #     recorder tracks events UNCONDITIONALLY with ~11 cheap ops per
    #     substep and commits ref writes in ONE block-end cond per
    #     `unroll` steps. Within-block gaps (a segment falling and
    #     re-entering between two commits) merge into one recorded span —
    #     exact, because the replay shades the gap steps as provable
    #     zeros, the same argument as slot-overflow merging.
    #
    # Per-lane recording state across blocks: in_seg (was the lane probing
    # at its last executed substep), k (segments seen), entry (entry step
    # of the current slot). Within a block the hook folds per-substep
    # capture into running planes (first-entry position/velocity/step,
    # last probing step), so nothing beyond ~8 planes stays live.
    def pack(st, in_seg, k, entry, i):
        return (st.p, st.v, st.hit_horizon.astype(jnp.float32),
                st.active.astype(jnp.float32), in_seg, k, entry, i)

    def unpack(c):
        p, v, hit_f, act_f = c[:4]
        zero = jnp.zeros_like(p.x)
        st = MarchState(p, v, Vec3(zero, zero, zero), jnp.ones_like(zero),
                        hit_f > 0.5, act_f > 0.5)
        return st, c[4], c[5], c[6], c[7]

    def cond(carry):
        return jnp.logical_and(carry[7] < max_steps, jnp.any(carry[3] > 0.5))

    def body(carry):
        st, in_seg, k, entry, i = unpack(carry)
        open0 = in_seg > 0.5
        zero = jnp.zeros_like(in_seg)
        cell = {
            "u": 0,
            "entered": jnp.zeros_like(open0),
            # last probing step; seeded i-1 so an open0 segment that never
            # probes again in this block flushes len = (i-1) + 1 - entry
            "last_probe": i - 1.0 + zero,
            "cap_p": (zero, zero, zero),
            "cap_v": (zero, zero, zero),
            "cap_fi": zero,
            "probe_last": open0,
        }

        def hook(p_pre, v_pre, rel, r2, v_new, in_disk_zone, in_cloud_zone,
                 h, active, intensity, trans):
            pd, pc = media_probes(scene, rel, in_disk_zone, in_cloud_zone,
                                  active)
            probe = _any(pd, pc)
            fi = i + float(cell["u"])
            first_entry = jnp.logical_and(
                probe,
                jnp.logical_and(jnp.logical_not(open0),
                                jnp.logical_not(cell["entered"])),
            )
            cell["cap_p"] = tuple(
                jnp.where(first_entry, val, cap)
                for cap, val in zip(cell["cap_p"], (p_pre.x, p_pre.y, p_pre.z))
            )
            cell["cap_v"] = tuple(
                jnp.where(first_entry, val, cap)
                for cap, val in zip(cell["cap_v"], (v_pre.x, v_pre.y, v_pre.z))
            )
            cell["cap_fi"] = jnp.where(first_entry, fi, cell["cap_fi"])
            cell["last_probe"] = jnp.where(probe, fi, cell["last_probe"])
            cell["entered"] = jnp.logical_or(cell["entered"], probe)
            cell["probe_last"] = probe
            cell["u"] += 1
            return intensity, trans

        for _ in range(unroll):
            st = march_step(scene, st, t, media_hook=hook)

        new_commit = jnp.logical_and(cell["entered"],
                                     jnp.logical_not(open0))
        seg_exists = jnp.logical_or(open0, cell["entered"])
        flush = jnp.logical_and(seg_exists,
                                jnp.logical_not(cell["probe_last"]))

        def commit(k, entry):
            k2 = k + new_commit.astype(jnp.float32)
            new_slot = jnp.logical_and(new_commit, k < float(slots))
            # re-entry past the last slot merges: entry (and any length
            # already flushed for that slot) stretches over the gap
            entry2 = jnp.where(new_slot, cell["cap_fi"], entry)
            for j, refs in enumerate(rec_refs):
                mj = jnp.logical_and(new_slot, k == float(j))
                for ref, val in zip(refs[:6],
                                    cell["cap_p"] + cell["cap_v"]):
                    ref[...] = jnp.where(mj, val, ref[...])
            slot = jnp.minimum(k2, float(slots)) - 1.0
            for j, refs in enumerate(rec_refs):
                upd = jnp.logical_and(flush, slot == float(j))
                refs[6][...] = jnp.where(
                    upd, cell["last_probe"] + 1.0 - entry2, refs[6][...]
                )
            return k2, entry2

        def skip(k, entry):
            return k, entry

        k, entry = jax.lax.cond(
            jnp.any(jnp.logical_or(new_commit, flush)), commit, skip,
            k, entry,
        )
        return pack(st, cell["probe_last"].astype(jnp.float32), k, entry,
                    i + float(unroll))

    init = pack(state, zeros, zeros, zeros, jnp.float32(0.0))
    carry = jax.lax.while_loop(cond, body, init)
    st, in_seg, k, entry, i = unpack(carry)
    # Flush segments still open at loop exit (step-cap saturation, or the
    # tile finished on the same step a segment ended): the block-end flush
    # never fired for these lanes. The last probing step was i-1.
    open_seg = in_seg > 0.5
    slot = jnp.minimum(k, float(slots)) - 1.0
    for j, refs in enumerate(rec_refs):
        upd = jnp.logical_and(open_seg, slot == float(j))
        refs[6][...] = jnp.where(upd, i - entry, refs[6][...])
    return st


def _record_camera_sky_kernel(scene: SceneConfig, max_steps: int,
                              unroll: int, slots: int,
                              width: int, height: int,
                              block_h: int, block_w: int, nbx: int,
                              sky_h: int, sky_w: int,
                              scal_ref, hit_ref,
                              idx_refs, fx_refs, fy_refs, rec_refs,
                              origin_idx=None, strips=None, cstrips=None):
    """Record-pass kernel: in-kernel ray gen + vacuum march + segment
    recording + in-kernel sky addressing (same epilogue as
    ops/pallas_march._march_camera_sky_kernel). `origin_idx` selects the
    SMEM (x0, y0) global-pixel offset for the multi-chip tile path;
    `strips` the optional strip-interleaved row map (_gen_tile_rays)."""
    from relativisticraytracer_tpu.ops.pallas_march import _gen_tile_rays

    t, cam_pos, rd = _gen_tile_rays(scal_ref, width, height,
                                    block_h, block_w, nbx,
                                    origin_idx=origin_idx, strips=strips,
                                    cstrips=cstrips)
    ca_eff = scal_ref[15]

    def make_state():
        zeros = jnp.zeros_like(rd.x)
        return MarchState(
            p=Vec3(zeros + cam_pos[0], zeros + cam_pos[1],
                   zeros + cam_pos[2]),
            v=Vec3(rd.x, rd.y, rd.z),
            intensity=Vec3(zeros, zeros, zeros),
            transmittance=jnp.ones_like(zeros),
            hit_horizon=jnp.zeros_like(zeros, dtype=bool),
            active=jnp.ones_like(zeros, dtype=bool),
        )

    state = _record_march_loop(scene, max_steps, unroll, slots, t,
                               make_state, rec_refs)
    hit_ref[...] = state.hit_horizon.astype(jnp.float32)
    d = normalize(state.v)
    for (idx, fx, fy), idx_ref, fx_ref, fy_ref in zip(
        sky_coords(d, ca_eff, sky_h, sky_w), idx_refs, fx_refs, fy_refs
    ):
        idx_ref[...] = idx
        fx_ref[...] = fx
        fy_ref[...] = fy


@functools.partial(
    jax.jit,
    static_argnames=(
        "scene", "width", "height", "max_steps", "sky_h", "sky_w",
        "block_h", "block_w", "unroll", "slots", "interpret",
        "img_w", "img_h", "strips", "cstrips",
    ),
)
def march_pallas_camera_sky_record(
    scene: SceneConfig,
    camera,
    effects: CameraEffects,
    time,
    width: int,
    height: int,
    max_steps: int,
    sky_h: int,
    sky_w: int,
    block_h: int = A_BLOCK_H,
    block_w: int = BLOCK_W,
    unroll: int = A_UNROLL,
    slots: int = SLOTS,
    interpret: bool = False,
    img_w: int = None,
    img_h: int = None,
    origin=None,
    strips=None,
    cstrips=None,
):
    """The A pass. Returns lane-tile-layout planes:

      (hit, (idx_r, idx_g, idx_b), (fx_r...), (fy_r...),
       records) where records = tuple of `slots` tuples
      (px, py, pz, vx, vy, vz, length).

    Multi-chip tile mode: `origin=(x0, y0)` (traced f32 scalars) marches
    the (height, width) sub-rectangle whose top-left GLOBAL pixel is
    (x0, y0) of an (img_h, img_w) frame — ray gen normalizes uv by the
    full-image dims, so shard rays are bitwise the single-chip rays
    (parallel/sharding.py)."""
    if (block_h * block_w) % 128:
        raise ValueError("block_h*block_w must be a multiple of 128")
    if (origin is None) != (img_w is None or img_h is None):
        raise ValueError("origin and img_w/img_h must be given together")
    hp = _round_up(height, block_h)
    wp = _round_up(width, block_w)
    nby, nbx = hp // block_h, wp // block_w
    num_blocks = nby * nbx
    tile_rows = (block_h * block_w) // 128

    scal = pack_camera_scalars(camera, effects, time)
    origin_idx = None
    gen_w, gen_h = width, height
    if origin is not None:
        origin_idx = scal.shape[0]
        gen_w, gen_h = img_w, img_h
        scal = jnp.concatenate([
            scal,
            jnp.asarray(origin[0], jnp.float32).reshape(1),
            jnp.asarray(origin[1], jnp.float32).reshape(1),
        ])

    tile_spec = pl.BlockSpec(
        (tile_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fshape = jax.ShapeDtypeStruct((num_blocks * tile_rows, 128), jnp.float32)
    ishape = jax.ShapeDtypeStruct((num_blocks * tile_rows, 128), jnp.int32)

    unroll = largest_divisor_at_most(max_steps, unroll)
    n_out = 10 + 7 * slots

    def kernel(scal_ref, *refs):
        hit_ref = refs[0]
        idx_refs = refs[1:4]
        fx_refs = refs[4:7]
        fy_refs = refs[7:10]
        rec_refs = tuple(
            tuple(refs[10 + 7 * s + j] for j in range(7))
            for s in range(slots)
        )
        _record_camera_sky_kernel(
            scene, max_steps, unroll, slots, gen_w, gen_h,
            block_h, block_w, nbx, sky_h, sky_w,
            scal_ref, hit_ref, idx_refs, fx_refs, fy_refs, rec_refs,
            origin_idx=origin_idx, strips=strips, cstrips=cstrips,
        )

    avg_steps = max(1, max_steps // 3)
    cost = pl.CostEstimate(
        flops=int(hp * wp) * avg_steps * 220,
        bytes_accessed=int(hp * wp) * 4 * n_out,
        transcendentals=int(hp * wp) * avg_steps * 4,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[tile_spec] * n_out,
        out_shape=[fshape] + [ishape] * 3 + [fshape] * (6 + 7 * slots),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(scal)

    hit = outs[0]
    idx3, fx3, fy3 = tuple(outs[1:4]), tuple(outs[4:7]), tuple(outs[7:10])
    records = tuple(
        tuple(outs[10 + 7 * s + j] for j in range(7)) for s in range(slots)
    )
    return hit, idx3, fx3, fy3, records


# --------------------------------------------------------------------------
# B: the replay pass
# --------------------------------------------------------------------------


def _replay_step(scene: SceneConfig, p, v, intensity, trans, steps_left, t):
    """One replay step: the inline march_step's h/RK4/shading path restricted
    to what can happen inside a recorded span (r >= the media inner radii,
    so no horizon/escape handling — see module docstring). Reuses the exact
    shared helpers so every op matches the inline path bitwise.

    The disk/cloud blocks run under the SAME per-type tile conds as the
    inline kernel: segments are recorded on the UNION probe, but e.g. a
    disk-only crossing never pays the (2x more expensive) cloud noise —
    the probe being False guarantees that block contributes exactly 0."""
    from relativisticraytracer_tpu.physics.integrators import rk4_step

    active = steps_left > 0.0
    rel = p if scene.mass_pos == (0.0, 0.0, 0.0) else Vec3(
        p.x - scene.mass_pos[0], p.y - scene.mass_pos[1],
        p.z - scene.mass_pos[2],
    )
    r2 = rel.x * rel.x + rel.y * rel.y + rel.z * rel.z
    in_disk_zone, in_cloud_zone = media_zones(scene, rel, r2)
    h = adaptive_h(scene, r2, in_disk_zone, in_cloud_zone, active)
    pd, pc = media_probes(scene, rel, in_disk_zone, in_cloud_zone, active)
    p, v = rk4_step(scene, p, v, h)
    in_media = jnp.logical_and(
        active, jnp.logical_or(in_disk_zone, in_cloud_zone)
    )
    emit, opacity = _media_contribution(
        scene, rel, r2, v, in_disk_zone, in_cloud_zone, t,
        disk_pred=None if pd is None else jnp.any(pd),
        cloud_pred=None if pc is None else jnp.any(pc),
    )
    intensity, trans = compose_step(
        intensity, trans, emit.x, emit.y, emit.z, opacity, in_media, h
    )
    return p, v, intensity, trans, steps_left - active.astype(jnp.float32)


def _replay_kernel(scene: SceneConfig, slots: int, unroll: int, max_steps: int,
                   scal_ref, *refs):
    """Replay-pass kernel: lanes march their recorded segments back-to-back;
    the tile runs to its slowest lane's total media steps."""
    rec = tuple(
        tuple(refs[7 * s + j] for j in range(7)) for s in range(slots)
    )
    ir_ref, ig_ref, ib_ref, tr_ref = refs[7 * slots:7 * slots + 4]
    t = scal_ref[0]

    def rvec(s):
        return (Vec3(rec[s][0][...], rec[s][1][...], rec[s][2][...]),
                Vec3(rec[s][3][...], rec[s][4][...], rec[s][5][...]),
                rec[s][6][...])

    p, v, steps_left = rvec(0)
    zeros = jnp.zeros_like(steps_left)
    intensity = Vec3(zeros, zeros, zeros)
    trans = jnp.ones_like(zeros)
    slot = zeros

    def pack(p, v, inten, trans, steps_left, slot, i=jnp.int32(0)):
        return (p, v, inten, trans, steps_left, slot, i)

    def cond(c):
        # iteration cap: recorded lengths are <= max_steps by construction,
        # so slots*max_steps bounds any lane — insurance, not a semantic
        return jnp.logical_and(c[6] < slots * max_steps,
                               jnp.any(c[4] > 0.0))

    def body(c):
        p, v, intensity, trans, steps_left, slot, i = c
        for _ in range(unroll):
            was_active = steps_left > 0.0
            p, v, intensity, trans, steps_left = _replay_step(
                scene, p, v, intensity, trans, steps_left, t
            )
            if slots > 1:
                # a lane whose segment just drained loads its next slot
                need = jnp.logical_and(
                    jnp.logical_and(was_active, steps_left <= 0.0),
                    slot < float(slots - 1),
                )

                def load(p, v, steps_left, slot):
                    s2 = slot + need.astype(jnp.float32)
                    for s in range(1, slots):
                        m = jnp.logical_and(need, s2 == float(s))
                        ps, vs, ls = rvec(s)
                        p = Vec3(jnp.where(m, ps.x, p.x),
                                 jnp.where(m, ps.y, p.y),
                                 jnp.where(m, ps.z, p.z))
                        v = Vec3(jnp.where(m, vs.x, v.x),
                                 jnp.where(m, vs.y, v.y),
                                 jnp.where(m, vs.z, v.z))
                        steps_left = jnp.where(m, ls, steps_left)
                    return p, v, steps_left, s2

                def skip(p, v, steps_left, slot):
                    return p, v, steps_left, slot

                p, v, steps_left, slot = jax.lax.cond(
                    jnp.any(need), load, skip, p, v, steps_left, slot
                )
        return pack(p, v, intensity, trans, steps_left, slot, i + unroll)

    c = jax.lax.while_loop(
        cond, body, pack(p, v, intensity, trans, steps_left, slot)
    )
    intensity, trans = c[2], c[3]
    ir_ref[...] = intensity.x
    ig_ref[...] = intensity.y
    ib_ref[...] = intensity.z
    tr_ref[...] = trans


@functools.partial(
    jax.jit,
    static_argnames=("scene", "slots", "unroll", "max_steps", "b_rows",
                     "interpret"),
)
def media_replay(
    scene: SceneConfig,
    records,
    time,
    max_steps: int,
    slots: int = SLOTS,
    unroll: int = B_UNROLL,
    b_rows: int = 16,
    interpret: bool = False,
):
    """The B pass: replay recorded media segments. `records` is the tuple
    from march_pallas_camera_sky_record, in lane-tile layout [(N, 128)].
    Returns (intensity Vec3, transmittance), same layout.

    b_rows: lane rows per replay tile. The record layout groups each
    (32, 128) image block as 32 consecutive lane rows, so any divisor of
    32 slices blocks into spatially-coherent (b_rows, 128) image strips —
    smaller tiles pay less max-over-lanes divergence."""
    n_rows = records[0][0].shape[0]
    tile_rows = b_rows
    if n_rows % tile_rows:
        raise ValueError(
            f"b_rows={tile_rows} must divide the {n_rows} lane rows "
            f"(use a divisor of the 32-row record blocks)"
        )
    num_blocks = n_rows // tile_rows
    tile_spec = pl.BlockSpec(
        (tile_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fshape = jax.ShapeDtypeStruct((n_rows, 128), jnp.float32)
    scal = jnp.asarray(time, jnp.float32).reshape(1)
    flat = [r for slot in records for r in slot]

    kernel = functools.partial(_replay_kernel, scene, slots,
                               largest_divisor_at_most(max_steps, unroll),
                               max_steps)
    # media replay: ~35 ideal media steps/ray avg at 1080p, dense shading
    cost = pl.CostEstimate(
        flops=int(n_rows * 128) * 40 * 700,
        bytes_accessed=int(n_rows * 128) * 4 * (7 * slots + 4),
        transcendentals=int(n_rows * 128) * 40 * 40,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [tile_spec] * (7 * slots),
        out_specs=[tile_spec] * 4,
        out_shape=[fshape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(scal, *flat)
    ir, ig, ib, tr = outs
    return Vec3(ir, ig, ib), tr


def media_replay_sorted(
    scene: SceneConfig,
    records,
    time,
    max_steps: int,
    slots: int = SLOTS,
    unroll: int = B_UNROLL,
    b_rows: int = B_ROWS_SORTED,
    dense_b_rows: int = 16,
    capacity: int = 1 << 17,
    interpret: bool = False,
):
    """The B pass with row compaction + per-lane length sort.

    `media_replay` runs in image layout: a (b_rows, 128) tile pays
    max-over-lanes of its lanes' replay steps, and at 1080p only ~3.4% of
    rays carry media at all — measured 47.9M lane-steps vs the 21.3M
    per-ray ideal (docs/segment_stats.json). Round 2 rejected a FULL
    per-ray sort (2M elements); the per-ray bookkeeping over 2M lanes is
    indeed hopeless (a slot->lane `searchsorted` alone measures 63 ms,
    tools/bench_bookkeeping.py). But only ~800 of the 16320 lane-rows
    carry media at all (docs/segment_stats.json media_rows), so the
    bookkeeping runs at ROW granularity first:

      1. compact the media-carrying 128-lane rows with a 16K-row
         cumsum + searchsorted and one contiguous row-gather of the
         stacked record planes into a (capacity/128)-row buffer,
      2. argsort the buffer's lanes by total replay length (longest
         first; lanes of invalid rows are zeroed and sort to the end) so
         replay tiles are length-uniform — the census says sorted 8x128
         tiles pay 21.9M lane-steps, 1.03x of ideal,
      3. replay the sorted buffer with the unchanged `_replay_kernel`
         (all-zero tail tiles exit on their first `while` check),
      4. inverse-permute (intensity, transmittance) and row-scatter them
         back into the image (media-free rows keep I=0, T=1 — exactly
         what replaying their all-zero records produces).

    Replay of a ray depends only on its own recorded segments, so the
    result is BITWISE equal to the image-layout pass in any order.

    The whole bookkeeping chain lives in one fused XLA program: measured
    7.9 ms (steps 1-3) + 9.4 ms (step 4) at 1080p on v5e
    (tools/bench_bookkeeping2.py) vs ~100 ms for the per-lane variant.

    `capacity` (in lanes; used as capacity/128 rows) is static — XLA
    needs shapes. A pose with more media rows than the capacity (e.g. a
    camera inside the disk) falls back to the exact image-layout replay
    under one `lax.cond`, so the output is exact for every pose. At
    1080p the default 131072 (1024 rows) covers 1.28x the headline
    pose's 801-row census.

    Reference correspondence: raymarcher.cu:67-117 — the GPU pays media
    only on threads inside media; this is the TPU scheduling equivalent,
    one step further than plain record/replay.
    """
    n_rows = records[0][0].shape[0]
    total = records[0][6]
    for s in range(1, slots):
        total = total + records[s][6]

    cap_rows = _round_up(min(max(capacity // 128, b_rows), n_rows), b_rows)
    m = cap_rows * 128
    row_mask = jnp.any(total > 0.0, axis=1)
    rcm = jnp.cumsum(row_mask.astype(jnp.int32))
    rcount = rcm[-1]

    def compact_branch(records):
        rsrc = jnp.searchsorted(
            rcm, jnp.arange(1, cap_rows + 1, dtype=jnp.int32))
        rvalid = jnp.arange(cap_rows, dtype=jnp.int32) < rcount
        rsrc = jnp.where(rvalid, rsrc, 0)
        planes = [records[s][j] for s in range(slots) for j in range(7)]
        st = jnp.stack(planes, axis=-1)            # (n_rows, 128, 7*slots)
        # invalid rows alias image row 0, which may itself carry media —
        # zero them entirely (zero lengths replay as no-ops)
        comp = st[rsrc] * rvalid[:, None, None].astype(jnp.float32)
        lens_c = (total[rsrc] * rvalid[:, None].astype(jnp.float32)
                  ).reshape(m)
        order = jnp.argsort(-lens_c)
        # Two-step gather: cheap contiguous row-gather into the compact
        # buffer, THEN the per-lane permute within the small m-lane
        # domain. (A round-5 attempt fused these into one per-lane gather
        # from image layout — measured ~2.5 ms SLOWER at 1080p: the
        # permute of a compact buffer beats the same-size gather spread
        # over the full 2M-lane frame.)
        flat = comp.reshape(m, 7 * slots)[order]
        crecords = tuple(
            tuple(flat[:, 7 * s + j].reshape(cap_rows, 128)
                  for j in range(7))
            for s in range(slots)
        )
        inten_c, trans_c = media_replay(
            scene, crecords, time, max_steps, slots=slots,
            unroll=unroll, b_rows=b_rows, interpret=interpret,
        )
        res = jnp.stack(
            [inten_c.x, inten_c.y, inten_c.z, trans_c], axis=-1
        ).reshape(m, 4)
        # Results go back via inverse-permutation GATHER + a row-granular
        # scatter. (A round-5 attempt replaced these with one per-lane
        # scatter to image positions — measured 6.5 ms SLOWER at 1080p:
        # XLA serializes large scatters where the same-size gather streams,
        # so keep scatters at row granularity.)
        inv = jnp.zeros((m,), jnp.int32).at[order].set(
            jnp.arange(m, dtype=jnp.int32), unique_indices=True)
        back = res[inv].reshape(cap_rows, 128, 4)
        img = jnp.zeros((n_rows, 128, 4), jnp.float32).at[:, :, 3].set(1.0)
        # distinct out-of-bounds sentinels keep the scattered rows unique
        rdst = jnp.where(
            rvalid, rsrc,
            n_rows + jnp.arange(cap_rows, dtype=jnp.int32))
        img = img.at[rdst].set(back, mode="drop", unique_indices=True)
        return (
            Vec3(img[:, :, 0], img[:, :, 1], img[:, :, 2]),
            img[:, :, 3],
        )

    def dense_branch(records):
        return media_replay(scene, records, time, max_steps, slots=slots,
                            unroll=unroll, b_rows=dense_b_rows,
                            interpret=interpret)

    if cap_rows >= n_rows:
        return compact_branch(records)  # cannot overflow
    return jax.lax.cond(rcount <= cap_rows, compact_branch, dense_branch,
                        records)


# --------------------------------------------------------------------------
# Full-frame pipeline
# --------------------------------------------------------------------------


def _compact_tile_rgba(
    scene: SceneConfig,
    settings: RenderSettings,
    camera,
    effects: CameraEffects,
    time,
    sky: Skybox,
    w: int,
    h: int,
    interpret: bool,
    origin=None,
    img_w: int = None,
    img_h: int = None,
    strips=None,
    cstrips=None,
) -> jnp.ndarray:
    """uint8 RGBA for the (h, w) supersampled rectangle of the frame.

    Single-chip: origin=None and (w, h) IS the frame. Multi-chip tile
    (parallel/sharding.render_frame_sharded): origin=(x0, y0) traced
    global-pixel offsets of this shard's rectangle inside the
    (img_h, img_w) supersampled frame — ray gen, sky addressing, and the
    vignette uv all use global coordinates, so the shard output is
    bitwise the corresponding crop of the single-chip frame.

    `strips=(sh, ystride)` (static): strip-interleaved shard assignment —
    local row r renders global row y0 + (r // sh) * ystride + r % sh, so
    each device's rows are spread over the frame in strips of sh (load
    balance; parallel/sharding.py). The output rows are in LOCAL order;
    the host reassembles (sharding.reassemble_strips)."""
    from relativisticraytracer_tpu.ops.pallas_march import (
        _from_lane_tiles,
        _to_lane_tiles,
        _uv_planes,
    )

    ss = settings.supersample
    sky_h, sky_w = sky.shape
    hp, wp = _round_up(h, A_BLOCK_H), _round_up(w, BLOCK_W)
    max_steps = settings.resolved_max_steps(scene)

    hit, idx3, fx3, fy3, records = march_pallas_camera_sky_record(
        scene, camera, effects, jnp.asarray(time, jnp.float32),
        w, h, max_steps, sky_h, sky_w, slots=settings.media_slots,
        interpret=interpret, img_w=img_w, img_h=img_h, origin=origin,
        strips=strips, cstrips=cstrips,
    )
    if settings.media_sort:
        intensity, trans = media_replay_sorted(
            scene, records, jnp.asarray(time, jnp.float32), max_steps,
            slots=settings.media_slots, capacity=settings.media_capacity,
            interpret=interpret,
        )
    else:
        intensity, trans = media_replay(
            scene, records, jnp.asarray(time, jnp.float32), max_steps,
            slots=settings.media_slots, interpret=interpret,
        )

    # Captured rays: transmittance 0 (raymarcher.cu:49) — B cannot know
    # about captures, so the mask applies here.
    trans = jnp.where(hit > 0.5, jnp.float32(0.0), trans)

    if settings.sky_gather == "windowed":
        from relativisticraytracer_tpu.ops.pallas_sky import (
            sky_background_windowed,
        )

        bg = sky_background_windowed(
            sky, tuple(zip(idx3, fx3, fy3)), effects,
            masked=hit > 0.5, interpret=interpret,
        )
    else:
        bg = gather_sky_coords(sky, tuple(zip(idx3, fx3, fy3)), effects)
    hdr = Vec3(
        intensity.x + bg.x * trans,
        intensity.y + bg.y * trans,
        intensity.z + bg.z * trans,
    )
    uv_x, uv_y = _uv_planes(w, h, effects, origin=origin,
                            img_w=img_w, img_h=img_h, strips=strips,
                            cstrips=cstrips)

    def lanes(a):
        return _to_lane_tiles(
            jnp.pad(a, ((0, hp - h), (0, wp - w)), mode="edge"),
            A_BLOCK_H, BLOCK_W,
        )

    ldr = apply_effects_and_tonemap(
        hdr, lanes(uv_x), lanes(uv_y), effects, scene.exposure
    )
    if ss != 1:
        def unlane(a):
            return _from_lane_tiles(a, hp, wp, A_BLOCK_H, BLOCK_W)[:h, :w]

        ldr = Vec3(unlane(ldr.x), unlane(ldr.y), unlane(ldr.z))
        return pack_rgba8(downsample_box(ldr, ss))

    word = pack_rgba8_word(ldr)
    word = _from_lane_tiles(word, hp, wp, A_BLOCK_H, BLOCK_W)[:h, :w]
    return word_to_rgba8(word)


def render_frame_pallas_compact(
    scene: SceneConfig,
    settings: RenderSettings,
    camera,
    effects: CameraEffects,
    time,
    sky: Optional[Skybox],
    interpret: bool = False,
) -> jnp.ndarray:
    """render_frame_pallas with the segment-replay media pass. Exactly equal
    to the inline path (bitwise when no ray exceeds SLOTS segments; within
    1 ulp/step reassociation otherwise — still far inside the RMSE budget).
    Requires a skybox and at least one enabled medium; other configs fall
    back to the fused inline kernel."""
    from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas

    if sky is None or not (scene.enable_disk or scene.enable_clouds):
        return render_frame_pallas(scene, settings, camera, effects, time,
                                   sky, interpret=interpret)

    ss = settings.supersample
    w, h = settings.width * ss, settings.height * ss
    return _compact_tile_rgba(scene, settings, camera, effects, time, sky,
                              w, h, interpret)
