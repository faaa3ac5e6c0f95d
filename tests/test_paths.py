"""Camera path system parity (reference: src/camera_paths.cpp, src/main.cpp:171-220)."""

import numpy as np

from relativisticraytracer_tpu.paths import (
    CameraController,
    CameraPath,
    Keyframe,
    PathController,
    PathManager,
    catmull_rom,
    default_paths,
    fixed_step_dt,
    init_default_paths,
    interpolate_path,
    lerp_angle,
)
from tests.oracle import numpy_ref as oracle


def test_catmull_rom_matches_oracle(rng):
    for _ in range(32):
        pts = (rng.random((4, 3), dtype=np.float32) - 0.5) * 80.0
        t = float(rng.random())
        got = catmull_rom(pts[0], pts[1], pts[2], pts[3], t)
        want = oracle.catmull_rom(pts[0], pts[1], pts[2], pts[3], t)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_catmull_rom_endpoints():
    p = np.array([[0, 0, 0], [1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.float32)
    np.testing.assert_allclose(catmull_rom(*p, 0.0), p[1], atol=1e-6)
    np.testing.assert_allclose(catmull_rom(*p, 1.0), p[2], atol=1e-6)


def test_lerp_angle_matches_oracle(rng):
    cases = [(0, 90, 0.5), (350, 10, 0.5), (-450, -90, 0.25), (10, 350, 0.5),
             (-196, 20, 0.9), (180, -180, 0.3)]
    for a, b, t in cases:
        assert abs(lerp_angle(a, b, t) - oracle.lerp_angle(a, b, t)) < 1e-4
    for _ in range(64):
        a, b = (rng.random(2) - 0.5) * 1000.0
        t = float(rng.random())
        assert abs(lerp_angle(a, b, t) - oracle.lerp_angle(a, b, t)) < 1e-3


def test_lerp_angle_shortest_arc():
    # 350 -> 10 goes +20 degrees through 0, not -340.
    assert abs(lerp_angle(350.0, 10.0, 0.5) - 360.0) < 1e-5


def test_default_paths_verbatim():
    paths = default_paths()
    assert [p.name for p in paths] == [
        "Gargantua Fly-By", "Event Horizon Focus", "Horizon Skimmer",
    ]
    assert len(paths[0].keyframes) == 5
    assert len(paths[2].keyframes) == 6
    k = paths[0].keyframes[2]
    assert (k.time, k.pos, k.yaw, k.pitch) == (12.0, (35.0, 0.8, 10.0), -106.0, -1.2)
    assert paths[1].keyframes[-1].yaw == -450.0


def test_interpolate_path_clamps_ends():
    path = default_paths()[0]
    pos, yaw, pitch = interpolate_path(path, -5.0)
    np.testing.assert_allclose(pos, path.keyframes[0].pos)
    assert yaw == path.keyframes[0].yaw
    pos, yaw, pitch = interpolate_path(path, 999.0)
    np.testing.assert_allclose(pos, path.keyframes[-1].pos)


def test_interpolate_path_hits_keyframes():
    path = default_paths()[0]
    for k in path.keyframes:
        pos, yaw, pitch = interpolate_path(path, k.time)
        np.testing.assert_allclose(pos, k.pos, atol=1e-4)
        assert abs(yaw - k.yaw) < 1e-4
        assert abs(pitch - k.pitch) < 1e-4


def test_path_controller_clock_and_cycling():
    mgr = PathManager()
    init_default_paths(mgr)
    ctl = PathController(manager=mgr)
    ctl.start()
    assert ctl.active and ctl.path_time == 0.0
    ctl.update(0.5)
    ctl.update(0.25)
    assert abs(ctl.path_time - 0.75) < 1e-9
    ctl.stop()
    ctl.update(1.0)
    assert abs(ctl.path_time - 0.75) < 1e-9  # frozen while inactive
    assert ctl.current_path_index == 0
    ctl.next_path()
    ctl.next_path()
    ctl.next_path()
    assert ctl.current_path_index == 0  # wraps mod 3
    st = ctl.interpolated_state()
    assert np.asarray(st.pos).shape == (3,)


def test_fixed_step_clock():
    assert fixed_step_dt(True, 0.123) == 1.0 / 24
    assert fixed_step_dt(False, 0.123) == 0.123


def test_camera_controller_movement_quirks():
    cam = CameraController()
    y0 = float(cam.pos[1])
    cam.move("space")  # reference: SPACE moves DOWN (main.cpp:351-353)
    assert float(cam.pos[1]) == y0 - np.float32(0.3)
    cam.move("shift")  # SHIFT moves UP (main.cpp:354-356)
    assert abs(float(cam.pos[1]) - y0) < 1e-6
    # reference: xoffset = lastX - xpos, yaw -= xoffset*sens => cursor
    # moving right (+dx) INCREASES yaw (main.cpp:316-323)
    cam.look(10.0, 0.0)
    assert cam.yaw == 1.0
    cam.look(0.0, -1e6)
    assert cam.pitch == -89.0  # clamped


def test_custom_path_registration():
    mgr = PathManager()
    mgr.register_path(CameraPath("test", [Keyframe(0.0, (0, 0, -50), 0.0, 0.0),
                                          Keyframe(2.0, (0, 0, -40), 10.0, 0.0)]))
    assert mgr.get_path(0).name == "test"
    assert mgr.get_path(1) is None
    pos, yaw, _ = interpolate_path(mgr.get_path(0), 1.0)
    assert abs(yaw - 5.0) < 1e-5
