from svi_mapper_tpu.ops import corners, descriptors, hamming, image  # noqa: F401
