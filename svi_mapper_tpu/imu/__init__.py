from svi_mapper_tpu.imu import interpolator  # noqa: F401
