from relativisticraytracer_tpu.core import vecmath, noise  # noqa: F401
