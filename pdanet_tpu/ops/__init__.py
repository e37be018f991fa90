from . import (  # noqa: F401
    ball_query,
    chamfer,
    ellipsoid_query,
    geometry,
    grouping,
    interpolate,
    nms,
    roi_pool,
    rotated_iou,
    sampling,
)
from .ellipsoid_query import (  # noqa: F401
    ellipsoid_query as ellipsoid_query_op,
    query_and_group_ellipsoid,
)
from .ball_query import ball_query as ball_query_op  # noqa: F401
from .ball_query import ball_query_dilated  # noqa: F401
from .chamfer import cd_loss_l1, cd_loss_l2, chamfer_distance  # noqa: F401
from .geometry import (  # noqa: F401
    boxes_to_corners_3d,
    enlarge_box3d,
    in_box_mask,
    points_in_boxes,
    rotate_points_along_z,
)
from .grouping import gather_points, gaussian_density, group_points  # noqa: F401
from .interpolate import three_interpolate, three_nn  # noqa: F401
from .nms import nms_rotated  # noqa: F401
from .roi_pool import roiaware_pool3d, roipoint_pool3d  # noqa: F401
from .rotated_iou import boxes_iou3d, boxes_iou_bev, boxes_overlap_bev  # noqa: F401
from .sampling import (  # noqa: F401
    calc_square_dist,
    ds_fps,
    farthest_point_sample,
    farthest_point_sample_features,
    farthest_point_sample_with_dist,
    ry_fps,
)

__all__ = [
    "ball_query",
    "geometry",
    "grouping",
    "interpolate",
    "nms",
    "rotated_iou",
    "sampling",
]
