"""Config knobs must fail loudly at construction, not silently degrade
(round-3 review findings): a media_pass typo used to silently select the
~30% slower inline kernel, media_slots < 1 failed much later as an opaque
IndexError in the replay, noise_octave_cap <= 0 silently erased the
disk/cloud structure, and odd dims with yuv420p crashed mid-run after
destructive sink setup."""

import pytest

from relativisticraytracer_tpu.config import RenderSettings, SceneConfig


def test_media_pass_typo_rejected():
    with pytest.raises(ValueError, match="media_pass"):
        RenderSettings(media_pass="Compact")
    # both legal spellings construct
    RenderSettings(media_pass="compact")
    RenderSettings(media_pass="inline")


def test_media_slots_must_be_positive():
    with pytest.raises(ValueError, match="media_slots"):
        RenderSettings(media_slots=0)
    RenderSettings(media_slots=1)


def test_octave_cap_validated_at_the_source():
    """The >=1 guard must live on SceneConfig itself, not only in the CLI
    (__main__._positive_int) — a library caller passing 0 used to get a
    silently noiseless render."""
    with pytest.raises(ValueError, match="noise_octave_cap"):
        SceneConfig(noise_octave_cap=0)
    assert SceneConfig(noise_octave_cap=1).octaves(5) == 1
    assert SceneConfig().octaves(5) == 5


def test_yuv420_recorder_rejects_odd_dims():
    """Both recorders route through io.video._frame_bytes: odd dims with
    yuv420p must fail at CONSTRUCTION, before any sink opens or stale
    segments are cleaned up."""
    from relativisticraytracer_tpu.io.video import (
        SegmentedRecorder,
        VideoRecorder,
    )

    for cls in (VideoRecorder, SegmentedRecorder):
        with pytest.raises(ValueError, match="even"):
            cls(333, 272, pix_fmt="yuv420p")
        cls(332, 272, pix_fmt="yuv420p")   # even dims fine
        cls(333, 271, pix_fmt="rgba")      # rgba has no parity constraint
