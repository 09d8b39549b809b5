from .distributed import (
    make_mesh,
    optimize_pose_graph_sharded,
    register_frames_batched,
    slam_training_step,
)

__all__ = [
    "make_mesh",
    "optimize_pose_graph_sharded",
    "register_frames_batched",
    "slam_training_step",
]
