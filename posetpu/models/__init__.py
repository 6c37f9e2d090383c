from posetpu.models.pose_resnet import PoseResNet, get_pose_net
from posetpu.models.multiview import Aggregation, MultiViewPose, get_multiview_pose_net

__all__ = [
    "PoseResNet",
    "get_pose_net",
    "Aggregation",
    "MultiViewPose",
    "get_multiview_pose_net",
]
