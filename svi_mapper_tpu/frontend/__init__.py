from svi_mapper_tpu.frontend import stereo, tracking  # noqa: F401
