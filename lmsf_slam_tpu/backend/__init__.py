from .pose_graph import PoseGraphParams, optimize_pose_graph
