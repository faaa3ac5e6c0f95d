from relativisticraytracer_tpu.physics import geodesics, integrators  # noqa: F401
