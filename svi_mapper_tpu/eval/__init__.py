from svi_mapper_tpu.eval import trajectory  # noqa: F401
