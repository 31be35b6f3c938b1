from . import correspond, frameset, pipeline  # noqa: F401
from .correspond import Correspondences, find_correspondences  # noqa: F401
from .frameset import FrameSet, knn_pose_graph  # noqa: F401
