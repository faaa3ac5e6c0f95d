from relativisticraytracer_tpu.render import camera, skybox, postfx, march, pipeline  # noqa: F401
