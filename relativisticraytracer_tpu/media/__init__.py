from relativisticraytracer_tpu.media import densities  # noqa: F401
