from posetpu.ops.affine import (
    affine_transform_points,
    get_affine_transform,
    transform_preds,
)
from posetpu.ops.heatmap import (
    decode_heatmaps,
    flip_back,
    render_gaussian_heatmaps,
    soft_argmax_2d,
)
from posetpu.ops.warp import affine_warp_image

__all__ = [
    "get_affine_transform",
    "affine_transform_points",
    "transform_preds",
    "render_gaussian_heatmaps",
    "decode_heatmaps",
    "flip_back",
    "soft_argmax_2d",
    "affine_warp_image",
]
