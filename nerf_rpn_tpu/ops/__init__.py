"""Pure-jnp / Pallas geometry and box ops (static shapes, mask-based)."""

from nerf_rpn_tpu.ops.aabb import (
    box_volume,
    box_iou_aabb,
    pairwise_iou_aabb,
    clip_boxes_to_grid,
    small_box_mask,
)
from nerf_rpn_tpu.ops.obb import (
    regular_theta,
    regular_obb,
    rectpoly2obb,
    obb2poly,
    obb2poly_3d,
    obb2hbb,
    obb2hbb_3d,
    obb2points_3d,
)
from nerf_rpn_tpu.ops.rotated_iou import (
    box2corners,
    oriented_box_intersection_area,
    iou_rotated_2d,
    iou_rotated_3d,
    giou_rotated_3d,
    diou_rotated_3d,
    pairwise_iou_rotated_3d,
)

__all__ = [
    "box_volume",
    "box_iou_aabb",
    "pairwise_iou_aabb",
    "clip_boxes_to_grid",
    "small_box_mask",
    "regular_theta",
    "regular_obb",
    "rectpoly2obb",
    "obb2poly",
    "obb2poly_3d",
    "obb2hbb",
    "obb2hbb_3d",
    "obb2points_3d",
    "box2corners",
    "oriented_box_intersection_area",
    "iou_rotated_2d",
    "iou_rotated_3d",
    "giou_rotated_3d",
    "diou_rotated_3d",
    "pairwise_iou_rotated_3d",
]
