"""Segment-replay media compaction (ops/pallas_compact.py) vs the inline
fused kernel.

The compact path's exactness argument: the trajectory is media-independent,
probes are conservative (zero emission AND opacity where False — fuzzed in
test_densities.py), RK4 replay from a recorded entry state reproduces the
recorded trajectory bitwise, and merged-slot gap steps contribute exactly
zero. Hence the full frame must equal the inline path BYTE FOR BYTE in
interpret mode — including with slots=1, where every segment after the
first merges. These tests pin that, plus the record-pass bookkeeping
against a pure-XLA reference scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relativisticraytracer_tpu.config import (
    CameraEffects,
    RenderSettings,
    SceneConfig,
    effects_off,
)
from relativisticraytracer_tpu.core.vecmath import Vec3
from relativisticraytracer_tpu.ops.pallas_compact import (
    march_pallas_camera_sky_record,
    media_replay,
    render_frame_pallas_compact,
)
from relativisticraytracer_tpu.ops.pallas_march import render_frame_pallas
from relativisticraytracer_tpu.render.camera import camera_state_from_pose
from relativisticraytracer_tpu.render.skybox import (
    procedural_starfield,
    skybox_from_array,
)

ON_TPU = jax.devices()[0].platform == "tpu"
INTERPRET = not ON_TPU

# Edge-on pose threads rays through the disk plane repeatedly (multiple
# segments per ray); the high pose sees one clean crossing.
POSES = {
    "high": ((0.0, 10.0, -60.0), 0.0, -10.0),
    "edge": ((0.0, 0.8, -40.0), 0.0, 0.0),
}


def _sky():
    return skybox_from_array(procedural_starfield(64, 128), fast_table=True)


def _frames(scene, pose, time, slots, w=160, h=96, steps=160):
    settings_i = RenderSettings(width=w, height=h, max_steps=steps,
                                loop="pallas", media_pass="inline")
    settings_c = RenderSettings(width=w, height=h, max_steps=steps,
                                loop="pallas", media_pass="compact",
                                media_slots=slots)
    cam = camera_state_from_pose(*pose)
    eff = CameraEffects()
    sky = _sky()
    a = render_frame_pallas(scene, settings_i, cam, eff, time, sky,
                            interpret=INTERPRET)
    b = render_frame_pallas_compact(scene, settings_c, cam, eff, time, sky,
                                    interpret=INTERPRET)
    return np.asarray(a), np.asarray(b)


@pytest.mark.slow
@pytest.mark.parametrize("scene_kw,pose", [
    (dict(), "high"),
    (dict(), "edge"),
    (dict(spin_a=0.9), "high"),
    (dict(enable_clouds=False), "edge"),
    (dict(enable_disk=False), "high"),
])
def test_compact_frame_matches_inline(scene_kw, pose):
    scene = SceneConfig(max_steps=160, **scene_kw)
    a, b = _frames(scene, POSES[pose], 1.5, slots=3)
    if ON_TPU:
        # separately compiled programs may differ at fusion boundaries
        assert int(np.abs(a.astype(np.int16) - b.astype(np.int16)).max()) <= 1
    else:
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_compact_slots1_merge_is_exact():
    """slots=1 merges EVERY later crossing into the first record; the replay
    then marches the probe-false gaps, whose contributions are exactly zero
    — output must still be identical."""
    scene = SceneConfig(max_steps=160)
    a, b = _frames(scene, POSES["edge"], 1.5, slots=1)
    if ON_TPU:
        assert int(np.abs(a.astype(np.int16) - b.astype(np.int16)).max()) <= 1
    else:
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_record_pass_bookkeeping_matches_scan():
    """Record-pass segment lengths and the replay (I, T) must reproduce a
    pure-XLA reference: total recorded length >= per-ray probe-true count
    (equality when a ray has <= slots segments; merged spans add gap
    steps), and the replay's media accumulation equals the inline march's
    (intensity, transmittance) exactly."""
    from relativisticraytracer_tpu.render.march import (
        init_state,
        march_step,
        media_probes,
        media_zones,
    )
    from relativisticraytracer_tpu.render.camera import generate_rays

    scene = SceneConfig(max_steps=128)
    w, h, steps = 128, 64, 128
    cam = camera_state_from_pose(*POSES["edge"])
    eff = CameraEffects()
    sky = _sky()
    t = jnp.float32(2.0)

    hit, idx3, fx3, fy3, records = march_pallas_camera_sky_record(
        scene, cam, eff, t, w, h, steps, *sky.shape,
        slots=3, interpret=INTERPRET,
    )
    intensity, trans = media_replay(scene, records, t, steps, slots=3,
                                    interpret=INTERPRET)

    # XLA reference: probe-true count + inline march accumulation
    origin, direction, _, _ = generate_rays(w, h, cam, eff)

    def body(carry, _):
        st, m = carry
        rel = st.p
        r2 = rel.x * rel.x + rel.y * rel.y + rel.z * rel.z
        zd, zc = media_zones(scene, rel, r2)
        pd, pc = media_probes(scene, rel, zd, zc, st.active)
        probe = jnp.logical_or(pd, pc)
        return (march_step(scene, st, t), m + probe.astype(jnp.float32)), None

    (ref, m), _ = jax.lax.scan(
        body, (init_state(origin, direction), jnp.zeros((h, w))), None,
        length=steps,
    )

    from relativisticraytracer_tpu.ops.pallas_march import _from_lane_tiles

    def unlane(a):
        return np.asarray(_from_lane_tiles(a, 64, 128, 32, 128)[:h, :w])

    total_len = sum(unlane(rec[6]) for rec in records)
    m = np.asarray(m)
    assert (total_len >= m - 1e-4).all()
    # most rays on this pose have <= 3 segments: lengths match exactly there
    assert (total_len == m).mean() > 0.5
    # capture mask: raygen ulp divergence could flip a photon-ring-boundary
    # pixel, so allow a vanishing mismatch fraction rather than bitwise
    assert ((unlane(hit) > 0.5) != np.asarray(ref.hit_horizon)).mean() < 1e-3
    # (I, T) ground truth: the INLINE Pallas kernel fed with HOST-generated
    # rays. The record pass generates rays IN-kernel, which differs from
    # generate_rays at the ulp level (iota-int vs arange — the established
    # allowance in test_pallas.test_camera_kernel_matches_plane_kernel), so
    # the comparison uses that test's tolerances, not bitwise. The bitwise
    # compact==inline guarantee is pinned by the frame-level tests above,
    # where BOTH paths use in-kernel ray gen.
    from relativisticraytracer_tpu.ops.pallas_march import march_pallas

    ri, rt, rh, _ = march_pallas(
        scene, origin, direction, t, steps, interpret=INTERPRET,
    )
    # B cannot see captures; the pipeline applies T=0 via A's hit mask
    # (raymarcher.cu:49) — mirror that before comparing.
    trans_final = np.where(unlane(hit) > 0.5, 0.0, unlane(trans))
    for got, want in [
        (unlane(intensity.x), np.asarray(ri.x)),
        (unlane(intensity.y), np.asarray(ri.y)),
        (unlane(intensity.z), np.asarray(ri.z)),
        (trans_final.astype(np.float32), np.asarray(rt)),
    ]:
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=5e-7)


@pytest.mark.slow
def test_compact_falls_back_without_media_or_sky():
    scene = SceneConfig(max_steps=64, enable_disk=False, enable_clouds=False)
    settings = RenderSettings(width=96, height=64, max_steps=64,
                              loop="pallas", media_pass="compact")
    cam = camera_state_from_pose(*POSES["high"])
    frame = render_frame_pallas_compact(
        scene, settings, cam, effects_off(), 0.5, _sky(),
        interpret=INTERPRET,
    )
    assert np.asarray(frame).shape == (64, 96, 4)
    # no sky: must also not blow up (delegates to the nosky inline path)
    frame2 = render_frame_pallas_compact(
        SceneConfig(max_steps=64), settings, cam, effects_off(), 0.5, None,
        interpret=INTERPRET,
    )
    assert np.asarray(frame2).shape == (64, 96, 4)


@pytest.mark.slow
@pytest.mark.parametrize("pose", ["edge"])
def test_sorted_replay_bitwise_equals_image_layout(pose):
    # one pose: "edge" has multi-segment rays (the hard bookkeeping case)
    # and a real media/vacuum row mix; the "high" pose adds ~4 min of
    # 1-CPU interpret time without exercising a new branch (the chip-side
    # bench gates both layouts bitwise at the headline pose every run,
    # tools/bench_replay_sorted.py).
    """media_replay_sorted must be BITWISE equal to the image-layout
    replay in every branch: always-compact (capacity >= all rows),
    lax.cond-compact (capacity covers the media rows), and the overflow
    fallback (capacity smaller than the media-row count). Replay of a ray
    depends only on its own recorded segments, so any lane order is
    exact by construction — this pins the bookkeeping (row compaction,
    sort, inverse permutation, row scatter-back)."""
    from relativisticraytracer_tpu.ops.pallas_compact import (
        media_replay_sorted,
    )

    scene = SceneConfig(max_steps=192)
    w, h, steps = 128, 64, 192
    cam = camera_state_from_pose(*POSES[pose])
    sky = _sky()
    t = jnp.float32(2.0)
    _, _, _, _, records = march_pallas_camera_sky_record(
        scene, cam, CameraEffects(), t, w, h, steps, *sky.shape,
        slots=3, interpret=INTERPRET,
    )
    ref_i, ref_t = media_replay(scene, records, t, steps, slots=3,
                                b_rows=8, interpret=INTERPRET)
    n_rows = records[0][0].shape[0]
    media_rows = int(jnp.sum(jnp.any(
        (records[0][6] + records[1][6] + records[2][6]) > 0.0, axis=1)))
    assert 0 < media_rows < n_rows  # both poses must exercise a real mix
    for cap_lanes in (n_rows * 128,          # static always-compact
                      (media_rows + 8) * 128,  # cond -> compact branch
                      8 * 128):              # cond -> dense fallback
        got_i, got_t = media_replay_sorted(
            scene, records, t, steps, slots=3, b_rows=8, dense_b_rows=8,
            capacity=cap_lanes, interpret=INTERPRET,
        )
        for a, b in [(ref_i.x, got_i.x), (ref_i.y, got_i.y),
                     (ref_i.z, got_i.z), (ref_t, got_t)]:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_media_replay_rejects_non_dividing_b_rows():
    """b_rows must divide the lane-row count — silent truncation would
    leave tail rows of intensity/transmittance uninitialized (review
    round 3)."""
    import jax.numpy as jnp
    import pytest

    from relativisticraytracer_tpu.config import SceneConfig
    from relativisticraytracer_tpu.ops.pallas_compact import media_replay

    n_rows = 64  # two 32-row record blocks
    z = jnp.zeros((n_rows, 128), jnp.float32)
    records = tuple((z, z, z, z, z, z, z) for _ in range(1))
    with pytest.raises(ValueError, match="divide"):
        media_replay(SceneConfig(max_steps=8), records, 0.0, 8, slots=1,
                     b_rows=48, interpret=True)
