from .render import render_map  # noqa: F401
from .metrics import (
    TrajectoryStats,
    ate_stats,
    load_kitti_trajectory,
    rpe_stats,
    save_kitti_trajectory,
    umeyama_alignment,
)
