from svi_mapper_tpu.mapping import landmarks  # noqa: F401
from svi_mapper_tpu.mapping.landmarks import LandmarkTable  # noqa: F401
