"""Observability helpers + command-line launcher."""

import pytest
import numpy as np

from relativisticraytracer_tpu.__main__ import main as cli_main
from relativisticraytracer_tpu.config import SceneConfig
from relativisticraytracer_tpu.core.vecmath import Vec3
from relativisticraytracer_tpu.render.camera import camera_state_from_pose, generate_rays
from relativisticraytracer_tpu.config import effects_off
from relativisticraytracer_tpu.render.march import march
from relativisticraytracer_tpu.runtime.profiling import FrameTimer, march_stats


def test_march_stats_accounts_all_rays():
    scene = SceneConfig(max_steps=1200, enable_disk=False, enable_clouds=False)
    cam = camera_state_from_pose((0.0, 2.0, -30.0), 0.0, 0.0)
    origin, direction, _, _ = generate_rays(32, 24, cam, effects_off())
    st = march(scene, origin, direction, 0.0, max_steps=1200)
    stats = march_stats(st)
    assert stats["rays"] == 32 * 24
    assert 0.0 < stats["captured"] < 1.0  # BH dead ahead: some capture
    total = stats["captured"] + stats["escaped"] + stats["saturated"]
    assert abs(total - 1.0) < 1e-6
    assert 0.0 <= stats["mean_transmittance"] <= 1.0


def test_frame_timer_report():
    t = FrameTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "(n=2)" in rep and "b:" in rep
    t.reset()
    assert t.report() == "(no stages timed)"


def test_cli_paths(capsys):
    cli_main(["paths"])
    out = capsys.readouterr().out
    assert "Gargantua Fly-By" in out and "[2]" in out


def test_cli_still(tmp_path):
    out = tmp_path / "f.png"
    cli_main([
        "still", "--width", "32", "--height", "24", "--max-steps", "16",
        "--loop", "while", "--out", str(out),
    ])
    assert out.exists()
    from relativisticraytracer_tpu.io.image import load_image_rgba

    img = load_image_rgba(str(out))
    assert img.shape == (24, 32, 4)


def test_cli_anim(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    out = tmp_path / "a.mp4"
    cli_main([
        "anim", "--width", "16", "--height", "8", "--max-steps", "8",
        "--loop", "while", "--fps", "2", "--duration", "1.0",
        "--out", str(out), "--no-effects",
    ])
    raw = out.with_suffix(".rgba")
    assert raw.exists()
    assert raw.stat().st_size == 2 * 16 * 8 * 4


def test_cli_interactive_args():
    """`interactive` subcommand is wired: --help exits 0 and bad args fail."""
    with pytest.raises(SystemExit) as e:
        cli_main(["interactive", "--help"])
    assert e.value.code == 0
    with pytest.raises(SystemExit):
        cli_main(["interactive", "--loop", "nonsense"])


def test_cli_interactive_terminal(tmp_path, monkeypatch, capsys):
    """The --terminal path renders at least one ANSI frame end to end."""
    import relativisticraytracer_tpu.runtime.preview as preview

    calls = {}
    real = preview.run_terminal_preview

    def capped(session, frames=0, width=100, fps_cap=15.0, out=None):
        calls["width"] = width
        return real(session, frames=1, width=width, fps_cap=1000.0, out=out)

    monkeypatch.setattr(preview, "run_terminal_preview", capped)
    cli_main(["interactive", "--terminal", "--term-width", "24",
          "--width", "32", "--height", "16", "--max-steps", "8",
          "--no-clouds"])
    assert calls["width"] == 24
    assert "▀" in capsys.readouterr().out


def test_cli_preset_resolution(tmp_path):
    """--preset sets the resolution; explicit --width/--height override it
    dimension-wise."""
    out = tmp_path / "p.png"
    cli_main([
        "still", "--preset", "realtime", "--height", "12", "--max-steps",
        "8", "--loop", "while", "--no-disk", "--no-clouds",
        "--out", str(out),
    ])
    from relativisticraytracer_tpu.io.image import load_image_rgba

    img = load_image_rgba(str(out))
    assert img.shape == (12, 480, 4)


@pytest.mark.slow
def test_cli_anim_frame_parallel_devices(tmp_path, monkeypatch):
    """anim --devices all round-robins frames across the virtual CPU mesh
    and produces the identical byte stream to a single-device run."""
    monkeypatch.setattr(
        "relativisticraytracer_tpu.io.video.ffmpeg_available", lambda: False
    )
    one = tmp_path / "one.mp4"
    par = tmp_path / "par.mp4"
    base = ["anim", "--width", "16", "--height", "8", "--max-steps", "8",
            "--loop", "while", "--fps", "2", "--duration", "2.0",
            "--no-effects"]
    cli_main(base + ["--out", str(one)])
    cli_main(base + ["--out", str(par), "--devices", "all"])
    a = one.with_suffix(".rgba").read_bytes()
    b = par.with_suffix(".rgba").read_bytes()
    assert a == b and len(a) == 4 * 16 * 8 * 4


def test_cli_devices_arg_validation(tmp_path):
    """--devices validates at parse time: non-integers and non-positive
    counts are usage errors; counts beyond the device pool fail loudly
    instead of silently clamping (advisor round 2)."""
    base = ["anim", "--width", "8", "--height", "6", "--fps", "2",
            "--duration", "1.0", "--max-steps", "8",
            "--out", str(tmp_path / "f") + "/"]
    with pytest.raises(SystemExit):
        cli_main(base + ["--devices", "two"])
    with pytest.raises(SystemExit):
        cli_main(base + ["--devices", "0"])
    with pytest.raises(SystemExit):
        cli_main(base + ["--devices", "-3"])
    import jax

    too_many = str(len(jax.devices()) + 1)
    with pytest.raises(SystemExit):
        cli_main(base + ["--devices", too_many])


def test_cli_interactive_defaults_to_realtime_preset(monkeypatch, capsys):
    """With no size/preset given, `interactive` drops to the measured-
    interactive realtime preset (480x272) with motion-adaptive stepping;
    explicit sizes are honored unchanged (VERDICT r2 #9)."""
    import relativisticraytracer_tpu.runtime.preview as preview

    seen = {}

    def fake_preview(session, frames=0, width=100, fps_cap=15.0, out=None):
        seen["settings"] = session.renderer.settings
        seen["motion"] = session.motion_renderer

    monkeypatch.setattr(preview, "run_terminal_preview", fake_preview)
    cli_main(["interactive", "--terminal"])  # reference step budget (2000)
    s = seen["settings"]
    assert (s.width, s.height) == (480, 272)
    assert seen["motion"] is not None
    assert seen["motion"].settings.max_steps == 600
    # explicit size: untouched, no implied motion renderer
    cli_main(["interactive", "--terminal", "--width", "32", "--height", "16",
              "--max-steps", "8"])
    s = seen["settings"]
    assert (s.width, s.height) == (32, 16)
    assert seen["motion"] is None


def test_cli_interactive_explicit_motion_steps_zero(monkeypatch):
    """Explicit '--motion-steps 0' disables motion-adaptive stepping even
    when the realtime-preset default (which sets 600) kicks in — only an
    OMITTED flag gets the preset's value (review round 3)."""
    import relativisticraytracer_tpu.runtime.preview as preview

    seen = {}

    def capped(session, frames=0, width=100, fps_cap=15.0, out=None):
        seen["session"] = session
        return None

    monkeypatch.setattr(preview, "run_terminal_preview", capped)
    cli_main(["interactive", "--terminal", "--motion-steps", "0",
              "--max-steps", "8", "--no-clouds", "--no-disk"])
    s = seen["session"]
    # realtime preset resolution applied...
    assert s.renderer.settings.width == 480
    # ...but motion stepping stays disabled as explicitly requested
    assert s.motion_renderer is None


def test_cli_interactive_native_preset_motion_default(monkeypatch):
    """--preset native (the reference's 1000x700 window) gets the measured
    motion-step default (400) so it is interactive while flying."""
    import relativisticraytracer_tpu.runtime.preview as preview

    seen = {}
    monkeypatch.setattr(
        preview, "run_terminal_preview",
        lambda session, frames=0, width=100, fps_cap=15.0, out=None:
        seen.update(session=session),
    )
    cli_main(["interactive", "--terminal", "--preset", "native",
              "--no-clouds", "--no-disk"])
    s = seen["session"]
    assert s.renderer.settings.width == 1000
    assert s.renderer.settings.height == 700
    assert s.motion_renderer is not None
    assert s.motion_renderer.settings.max_steps == 400


def test_cli_octave_cap_flag(tmp_path):
    """--octave-cap reaches SceneConfig.noise_octave_cap and still renders
    (stylized preview; PERF.md precision-trade knob)."""
    out = tmp_path / "f.png"
    cli_main([
        "still", "--width", "32", "--height", "24", "--max-steps", "16",
        "--loop", "while", "--octave-cap", "2", "--out", str(out),
    ])
    assert out.exists()
    # the default stays reference-exact (None), and non-positive caps fail
    # at parse time instead of silently rendering noiseless media
    import pytest as _pytest

    from relativisticraytracer_tpu.__main__ import _positive_int

    from relativisticraytracer_tpu.config import SceneConfig

    assert SceneConfig().noise_octave_cap is None
    with _pytest.raises(Exception):
        _positive_int("0")
    assert _positive_int("3") == 3
