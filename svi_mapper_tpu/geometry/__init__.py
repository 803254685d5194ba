from svi_mapper_tpu.geometry import se3, camera, triangulation  # noqa: F401
from svi_mapper_tpu.geometry.camera import PinholeCamera, StereoCamera  # noqa: F401
