from svi_mapper_tpu.parallel import mesh  # noqa: F401
