"""Scene / render configuration.

`SceneConfig` mirrors the reference compile-time constants name-for-name
(reference: include/config.h:6-49) — it is the pixel-parity contract.
It is a frozen, hashable dataclass passed as a *static* argument to jitted
renders (the reference requires a recompile to change the scene; we retrace,
which is the XLA analog and lets every constant fold into the kernel).

`CameraEffects` mirrors the runtime-mutable effects struct
(reference: include/camera_effects/camera_settings.h:4-17). It is a JAX
pytree of scalars so toggling an effect does NOT retrace the frame program.

`RenderSettings` holds shape-affecting quality knobs (resolution, step cap)
that are static by necessity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Window defaults (reference: include/config.h:7-9)
WINDOW_WIDTH = 1000
WINDOW_HEIGHT = 700
RECORDING_FPS = 24

PI = 3.1415926535  # reference: include/math_utils.h:7 (float32 literal)


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Physics + scene constants (reference: include/config.h:11-48).

    All values are geometric units (1.0 = M, the black-hole mass) unless
    noted. Defaults reproduce the reference scene (Sagittarius A*).
    """

    # --- physical constants (SI), kept for unit conversions ---
    c_light: float = 299792458.0          # config.h:12
    g_constant: float = 6.67430e-11       # config.h:13
    solar_mass: float = 1.98847e30        # config.h:14

    # --- target object ---
    bh_mass_solar: float = 4.154e6        # config.h:17
    disk_temp_ref: float = 1.5e7          # [K] config.h:18

    # --- Kerr parameters ---
    spin_a: float = 0.0                   # config.h:21 (dimensionless, 0..1)
    spin_axis: Tuple[float, float, float] = (0.0, 1.0, 0.0)  # config.h:22

    # --- geometric units ---
    event_horizon: float = 2.0            # [M] Rs = 2M, config.h:29
    mass_pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)   # config.h:30

    # --- disk tuning ---
    isco_radius: float = 10.0             # config.h:33
    disk_out_m: float = 25.0              # config.h:34
    disk_h_m: float = 0.8                 # config.h:35
    disk_luminosity: float = 6.0          # config.h:36
    disk_opacity: float = 0.4             # config.h:37
    exposure: float = 0.8                 # config.h:38

    # --- dust-cloud layer ---
    cloud_h_m: float = 0.5                # config.h:41
    cloud_out_m: float = 25.0             # config.h:42
    cloud_opacity: float = 0.3            # config.h:43
    cloud_luminosity: float = 0.4         # config.h:44

    # --- integration quality ---
    step_size_m: float = 0.3              # config.h:47
    max_steps: int = 2000                 # config.h:48

    # --- escape condition (reference: src/raymarcher.cu:120) ---
    escape_radius: float = 250.0

    # --- feature gates (static: fold entire subsystems out of the program) ---
    enable_disk: bool = True
    enable_clouds: bool = True

    # --- quality knob: cap every fbm/ridge octave count in the media noise
    # stack (None = the reference's exact counts). The sanctioned
    # precision-for-speed axis inside the RMSE < 1e-3 parity budget
    # (BASELINE.json) — measured ms/RMSE per cap in
    # docs/precision_trades.json; None is bitwise reference semantics. ---
    noise_octave_cap: Optional[int] = None

    def __post_init__(self):
        # Validate at the source, not only in the CLI: a cap of 0 would
        # run every fbm/ridge loop for zero iterations — the disk/cloud
        # structure silently vanishes instead of erroring.
        if self.noise_octave_cap is not None and self.noise_octave_cap < 1:
            raise ValueError(
                f"noise_octave_cap must be >= 1 or None, got "
                f"{self.noise_octave_cap}"
            )

    def octaves(self, n: int) -> int:
        """Effective octave count for a reference count of `n`."""
        return n if self.noise_octave_cap is None else min(n, self.noise_octave_cap)

    @property
    def m_unit(self) -> float:
        """Mass in meters, M = G*Mass/c^2 (reference: config.h:26)."""
        return self.g_constant * (self.bh_mass_solar * self.solar_mass) / (
            self.c_light * self.c_light
        )


DEFAULT_SCENE = SceneConfig()

# Kerr a=0.9 variant used by the BASELINE config ladder (BASELINE.json configs[1]).
KERR_SCENE = dataclasses.replace(DEFAULT_SCENE, spin_a=0.9)


def _register_dataclass(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclasses.dataclass
class CameraEffects:
    """Runtime-togglable post effects (reference: camera_settings.h:4-17).

    A pytree of scalars: flags are 0.0/1.0 floats so toggling at runtime
    re-uses the compiled program (no retrace), matching the reference's
    hotkey toggles (reference: src/main.cpp:286-301).
    """

    use_bloom: jnp.ndarray = None
    bloom_threshold: jnp.ndarray = None
    bloom_intensity: jnp.ndarray = None
    use_vignette: jnp.ndarray = None
    vignette_intensity: jnp.ndarray = None
    use_chromatic_aberration: jnp.ndarray = None
    ca_amount: jnp.ndarray = None
    use_lens_distortion: jnp.ndarray = None
    distortion_amount: jnp.ndarray = None

    def __post_init__(self):
        # Reference defaults (camera_settings.h:5-16).
        defaults = dict(
            use_bloom=1.0,
            bloom_threshold=0.8,
            bloom_intensity=0.5,
            use_vignette=1.0,
            vignette_intensity=0.4,
            use_chromatic_aberration=0.0,
            ca_amount=0.005,
            use_lens_distortion=1.0,
            distortion_amount=0.15,
        )
        for name, default in defaults.items():
            value = getattr(self, name)
            if value is None:
                value = default
            object.__setattr__(self, name, jnp.asarray(value, dtype=jnp.float32))

    def replace(self, **kwargs) -> "CameraEffects":
        return dataclasses.replace(self, **kwargs)


_register_dataclass(
    CameraEffects,
    data_fields=[f.name for f in dataclasses.fields(CameraEffects)],
    meta_fields=[],
)


def effects_off() -> CameraEffects:
    """All post effects disabled (BASELINE configs 1-4 before the animation)."""
    return CameraEffects(
        use_bloom=0.0,
        use_vignette=0.0,
        use_chromatic_aberration=0.0,
        use_lens_distortion=0.0,
    )


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static, shape-affecting render quality knobs."""

    width: int = WINDOW_WIDTH
    height: int = WINDOW_HEIGHT
    # Step-cap override. None (default) = use the scene's max_steps
    # (config.h:48) — one source of truth; setting BOTH SceneConfig and
    # RenderSettings used to be required and silently diverged otherwise.
    max_steps: Optional[int] = None
    # March loop strategy: "auto" (pallas on TPU, while elsewhere), "scan"
    # (fixed trip count, differentiable-friendly), "while" (chunked scan +
    # all-rays-done early exit), or "pallas" (fused Pallas TPU kernel with
    # per-tile early exit — the fast path).
    loop: str = "auto"
    chunk: int = 64                # steps per chunk for loop="while"
    # Supersampling AA factor (beyond the reference, which renders 1 ray per
    # pixel): rays are traced on an (s*H, s*W) grid and box-filtered after
    # tone mapping. 1 = reference behavior.
    supersample: int = 1
    # Media scheduling on the Pallas path: "inline" shades under whole-tile
    # conds inside the march (round-2 kernel); "compact" records media
    # segments during a vacuum-cost march and replays ONLY those segments in
    # a dense second pass (ops/pallas_compact.py) — bitwise-equal output
    # (chip-gated, tools/chip_parity_compact.py) at ~200 vs 258 ms for the
    # 1080p headline frame. Ignored off the pallas path.
    media_pass: str = "compact"
    # Exactly-tracked media segments per ray on the compact path; later
    # crossings merge into the last slot (replayed with harmless gap steps).
    media_slots: int = 3
    # Replay layout on the compact path. True (default): row-compact the
    # media rays into a `media_capacity`-lane buffer sorted by replay
    # length so tiles are length-uniform
    # (ops/pallas_compact.media_replay_sorted; bitwise-equal, falls back
    # to the image layout under one lax.cond when a pose has more media
    # rows than media_capacity/128). False: replay in image layout.
    # Measured at the 1080p headline pose: 215.1 -> 199.8 ms/frame
    # (docs/bench_replay_sorted.json).
    media_sort: bool = True
    media_capacity: int = 1 << 17
    # Sky background fetch on the compact Pallas path: "windowed"
    # (default) = per-sub-tile sky-window DMA + MXU one-hot quad fetch
    # with the row-gather compacted onto incoherent sub-tiles
    # (ops/pallas_sky.py); "rows" = the plain q4 row-gather (one XLA
    # gathered slice per lane). Measured on chip at 1080p
    # (docs/sky_window.json full_frame, round 5): windowed is BITWISE the
    # rows frame and faster at all three census poses — headline
    # 182.9 -> 169.7 ms/frame (stage 31.0 -> 17.4 ms). Ignored off the
    # compact path.
    sky_gather: str = "windowed"

    def __post_init__(self):
        # A typo like media_pass="Compact" would otherwise silently select
        # the inline kernel (~30% slower) with no error; media_slots < 1
        # only fails much later as an opaque IndexError in the replay.
        if self.media_pass not in ("compact", "inline"):
            raise ValueError(
                f"media_pass must be 'compact' or 'inline', got "
                f"{self.media_pass!r}"
            )
        if self.media_slots < 1:
            raise ValueError(
                f"media_slots must be >= 1, got {self.media_slots}"
            )
        if self.sky_gather not in ("rows", "windowed"):
            raise ValueError(
                f"sky_gather must be 'rows' or 'windowed', got "
                f"{self.sky_gather!r}"
            )

    def resolved_loop(self) -> str:
        if self.loop != "auto":
            return self.loop
        import jax

        return "pallas" if jax.devices()[0].platform == "tpu" else "while"

    def resolved_max_steps(self, scene: SceneConfig) -> int:
        """The march step cap: this override if set, else the scene's."""
        return self.max_steps if self.max_steps is not None else scene.max_steps
