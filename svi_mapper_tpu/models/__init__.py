from svi_mapper_tpu.models import frame  # noqa: F401
from svi_mapper_tpu.models.tracker import StereoTracker  # noqa: F401
