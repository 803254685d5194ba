from svi_mapper_tpu.io import synthetic  # noqa: F401
