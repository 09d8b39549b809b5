from . import se3  # noqa: F401
from .pointcloud import PointBatch  # noqa: F401
