"""Build + bind the parity oracle compiled FROM THE REFERENCE SOURCE.

`load(spin_a=..., max_steps=...)` compiles /root/reference's device headers
and render kernel as plain C++ (via the CUDA shim in shim/) into a shared
library in a temp dir and returns a thin numpy-facing wrapper. Nothing from
the reference tree is copied into the repository: the build reads it at
test time, truncates `src/raymarcher.cu` just before the CUDA `<<<>>>`
launcher, and compiles it in /tmp.

This is the answer to "parity ground truth is the builder's own
transcription": tests/test_reference_native_parity.py checks the JAX
framework against the reference's OWN compiled code, not against
tests/oracle/numpy_ref.py (which remains as a second, style-diverse
oracle).

Skips cleanly (``load`` returns None) when the reference tree or a C++
compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import shutil
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SHIM = _HERE / "shim"
_REFERENCE = pathlib.Path(os.environ.get("RRT_REFERENCE_ROOT", "/root/reference"))
_BUILD_ROOT = pathlib.Path(
    os.environ.get("RRT_ORACLE_BUILD_DIR", "/tmp/rrt_ref_oracle")
)

_REF_SOURCES = [
    "include/config.h",
    "include/math_utils.h",
    "include/geodesics.h",
    "include/integrators.h",
    "include/densities.h",
    "include/raymarcher.h",
    "include/camera_effects/post_processing.h",
    "include/camera_effects/camera_settings.h",
    "src/raymarcher.cu",
]

_LAUNCHER_MARKER = "void launch_raymarch"

_cache: dict = {}


def available() -> bool:
    """True when the reference tree and a C++ compiler are present."""
    if shutil.which("g++") is None:
        return False
    return all((_REFERENCE / rel).is_file() for rel in _REF_SOURCES)


def _truncated_kernel() -> str:
    """src/raymarcher.cu up to (excluding) the host-side CUDA launcher,
    whose `<<<grid, block>>>` syntax is not C++. The kernel body itself
    compiles unmodified."""
    text = (_REFERENCE / "src/raymarcher.cu").read_text()
    cut = text.find(_LAUNCHER_MARKER)
    if cut < 0:  # pragma: no cover - layout change in the reference
        raise RuntimeError("launch_raymarch marker not found in raymarcher.cu")
    return text[:cut]


def _build_key(defines: list) -> str:
    h = hashlib.sha256()
    for f in sorted(_SHIM.glob("*.h")) + [_HERE / "oracle.cpp"]:
        h.update(f.read_bytes())
    for rel in _REF_SOURCES:
        h.update((_REFERENCE / rel).read_bytes())
    h.update(" ".join(defines).encode())
    return h.hexdigest()[:16]


def _build(spin_a: float, max_steps: int) -> pathlib.Path:
    defines = []
    if spin_a != 0.0:
        defines.append(f"-DORACLE_SPIN_A={spin_a!r}f")
    if max_steps != 2000:
        defines.append(f"-DORACLE_MAX_STEPS={int(max_steps)}")

    build_dir = _BUILD_ROOT / _build_key(defines)
    lib = build_dir / "liboracle.so"
    if lib.exists():
        return lib

    build_dir.mkdir(parents=True, exist_ok=True)
    (build_dir / "raymarcher_device.inc").write_text(_truncated_kernel())

    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        # plain IEEE float arithmetic: no FMA contraction, no fast-math
        "-ffp-contract=off", "-fno-fast-math",
        f"-I{_SHIM}",
        f"-I{_REFERENCE / 'include'}",
        f"-I{build_dir}",
        *defines,
        str(_HERE / "oracle.cpp"),
        "-o", str(lib),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib


class RefOracle:
    """numpy-facing bindings over the compiled reference library."""

    def __init__(self, lib_path: pathlib.Path, spin_a: float, max_steps: int):
        self._lib = ctypes.CDLL(str(lib_path))
        self._lib.ref_config_spin_a.restype = ctypes.c_float
        self._lib.ref_config_max_steps.restype = ctypes.c_int
        self._lib.ref_march_ray.restype = ctypes.c_int
        got_spin = float(self._lib.ref_config_spin_a())
        got_steps = int(self._lib.ref_config_max_steps())
        assert abs(got_spin - spin_a) < 1e-6, (got_spin, spin_a)
        assert got_steps == max_steps, (got_steps, max_steps)
        self.spin_a = spin_a
        self.max_steps = max_steps

    # ---- helpers ----

    @staticmethod
    def _pts(p) -> np.ndarray:
        p = np.ascontiguousarray(np.asarray(p, np.float32).reshape(-1, 3))
        return p

    @staticmethod
    def _fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def _map_scalar(self, fn, p, *scalars) -> np.ndarray:
        p = self._pts(p)
        out = np.empty(p.shape[0], np.float32)
        fn(self._fp(p), *scalars, ctypes.c_int(p.shape[0]), self._fp(out))
        return out

    # ---- noise ----

    def hash31(self, p):
        return self._map_scalar(self._lib.ref_hash31, p)

    def hash33(self, p):
        p = self._pts(p)
        out = np.empty_like(p)
        self._lib.ref_hash33(self._fp(p), ctypes.c_int(p.shape[0]), self._fp(out))
        return out

    def noise3d(self, p):
        return self._map_scalar(self._lib.ref_noise3d, p)

    def fbm(self, p, octaves: int):
        p = self._pts(p)
        out = np.empty(p.shape[0], np.float32)
        self._lib.ref_fbm(self._fp(p), ctypes.c_int(p.shape[0]),
                          ctypes.c_int(octaves), self._fp(out))
        return out

    def fbm_billow(self, p, octaves: int):
        p = self._pts(p)
        out = np.empty(p.shape[0], np.float32)
        self._lib.ref_fbm_billow(self._fp(p), ctypes.c_int(p.shape[0]),
                                 ctypes.c_int(octaves), self._fp(out))
        return out

    def worley3d(self, p):
        return self._map_scalar(self._lib.ref_worley3d, p)

    def rotate3d(self, p, axis, angle):
        p = self._pts(p)
        axis = self._pts(np.broadcast_to(np.asarray(axis, np.float32), p.shape))
        angle = np.ascontiguousarray(
            np.broadcast_to(np.asarray(angle, np.float32), p.shape[0]).astype(np.float32)
        )
        out = np.empty_like(p)
        self._lib.ref_rotate3d(self._fp(p), self._fp(axis), self._fp(angle),
                               ctypes.c_int(p.shape[0]), self._fp(out))
        return out

    # ---- physics ----

    def geodesic_acc(self, p, v):
        p, v = self._pts(p), self._pts(v)
        out = np.empty_like(p)
        self._lib.ref_geodesic_acc(self._fp(p), self._fp(v),
                                   ctypes.c_int(p.shape[0]), self._fp(out))
        return out

    def redshift(self, p, v):
        p, v = self._pts(p), self._pts(v)
        out = np.empty(p.shape[0], np.float32)
        self._lib.ref_redshift(self._fp(p), self._fp(v),
                               ctypes.c_int(p.shape[0]), self._fp(out))
        return out

    def _integrate(self, fn, p, v, h):
        p, v = self._pts(p), self._pts(v)
        h = np.ascontiguousarray(
            np.broadcast_to(np.asarray(h, np.float32), p.shape[0]).astype(np.float32)
        )
        out_p, out_v = np.empty_like(p), np.empty_like(v)
        fn(self._fp(p), self._fp(v), self._fp(h), ctypes.c_int(p.shape[0]),
           self._fp(out_p), self._fp(out_v))
        return out_p, out_v

    def rk4(self, p, v, h):
        return self._integrate(self._lib.ref_rk4, p, v, h)

    def euler(self, p, v, h):
        return self._integrate(self._lib.ref_euler, p, v, h)

    # ---- media ----

    def disk_temperature(self, r):
        r = np.ascontiguousarray(np.asarray(r, np.float32).reshape(-1))
        out = np.empty_like(r)
        self._lib.ref_disk_temperature(self._fp(r), ctypes.c_int(r.size),
                                       self._fp(out))
        return out

    def accretion_density(self, p, time: float):
        return self._map_scalar(self._lib.ref_accretion_density, p,
                                ctypes.c_float(time))

    def dust_density(self, p, time: float):
        return self._map_scalar(self._lib.ref_dust_density, p,
                                ctypes.c_float(time))

    # ---- post FX ----

    def vignette(self, rgb, uv, intensity: float):
        rgb = self._pts(rgb)
        uv = np.ascontiguousarray(np.asarray(uv, np.float32).reshape(-1, 2))
        out = np.empty_like(rgb)
        self._lib.ref_vignette(self._fp(rgb), self._fp(uv),
                               ctypes.c_float(intensity),
                               ctypes.c_int(rgb.shape[0]), self._fp(out))
        return out

    def lens_distortion(self, uv, k: float):
        uv = np.ascontiguousarray(np.asarray(uv, np.float32).reshape(-1, 2))
        out = np.empty_like(uv)
        self._lib.ref_lens_distortion(self._fp(uv), ctypes.c_float(k),
                                      ctypes.c_int(uv.shape[0]), self._fp(out))
        return out

    def bloom(self, rgb, threshold: float):
        rgb = self._pts(rgb)
        out = np.empty_like(rgb)
        self._lib.ref_bloom(self._fp(rgb), ctypes.c_float(threshold),
                            ctypes.c_int(rgb.shape[0]), self._fp(out))
        return out

    # ---- march / frame ----

    def march_ray(self, p0, v0, time: float, max_steps: int | None = None):
        """-> (p, v, intensity, transmittance, hit_horizon, steps)."""
        p0 = np.ascontiguousarray(np.asarray(p0, np.float32).reshape(3))
        v0 = np.ascontiguousarray(np.asarray(v0, np.float32).reshape(3))
        out = np.empty(11, np.float32)
        steps = self._lib.ref_march_ray(
            self._fp(p0), self._fp(v0), ctypes.c_float(time),
            ctypes.c_int(self.max_steps if max_steps is None else max_steps),
            self._fp(out),
        )
        return (out[0:3].copy(), out[3:6].copy(), out[6:9].copy(),
                float(out[9]), bool(out[10] > 0.5), int(steps))

    def render_frame(self, width: int, height: int, time: float, camera,
                     effects9, sky_rgba: np.ndarray | None) -> np.ndarray:
        """Full frame through the reference's unmodified raymarch_kernel.

        camera: 12 floats (pos, forward, right, up); effects9: 9 floats
        (see oracle.cpp); sky_rgba: uint8 [H, W, 4] or None for black.
        Returns uint8 [height, width, 4] (the kernel writes the vertical
        flip itself)."""
        cam = np.ascontiguousarray(np.asarray(camera, np.float32).reshape(12))
        fx = np.ascontiguousarray(np.asarray(effects9, np.float32).reshape(9))
        out = np.empty((height, width, 4), np.uint8)
        if sky_rgba is None:
            sky_ptr, sw, sh = None, 0, 0
        else:
            sky_rgba = np.ascontiguousarray(sky_rgba.astype(np.uint8))
            assert sky_rgba.ndim == 3 and sky_rgba.shape[2] == 4
            sky_ptr = sky_rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            sh, sw = sky_rgba.shape[:2]
        self._lib.ref_render_frame(
            ctypes.c_int(width), ctypes.c_int(height), ctypes.c_float(time),
            self._fp(cam), self._fp(fx), sky_ptr,
            ctypes.c_int(sw), ctypes.c_int(sh),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out


def load(spin_a: float = 0.0, max_steps: int = 2000) -> RefOracle | None:
    """Compile (cached) and load the reference oracle; None if unavailable."""
    if not available():
        return None
    key = (spin_a, max_steps)
    if key not in _cache:
        _cache[key] = RefOracle(_build(spin_a, max_steps), spin_a, max_steps)
    return _cache[key]
