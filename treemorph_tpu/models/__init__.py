from .loss import point_wise_loss
from .pointnet2 import PointNet2, pointnet2_loss
from .ptv3 import PointTransformerWithHeads, ptv3_loss
from .treelearn import TreeLearn, treelearn_loss

__all__ = [
    "point_wise_loss",
    "PointNet2",
    "pointnet2_loss",
    "PointTransformerWithHeads",
    "ptv3_loss",
    "TreeLearn",
    "treelearn_loss",
]
