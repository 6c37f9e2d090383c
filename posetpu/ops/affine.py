"""Batched affine crop transforms.

The reference derives its 2x3 crop matrix by handing three constructed points
to ``cv2.getAffineTransform`` (lib/utils/transforms.py:76-109). The transform
it constructs is always a *similarity* (uniform scale + rotation + shift), so
here we derive it analytically — a closed form that vmaps/jits over the batch
instead of a per-sample 3-point linear solve on the host.

Derivation: the source frame is a box of width ``scale*200`` centred at
``center`` (plus optional ``shift`` in box units), rotated by ``rot`` degrees;
the destination frame is ``output_size``. Matching the reference's three
points (center, center + rotated up-vector of half box width, and the
perpendicular third point) forces

    A = (out_w / (scale_x*200)) * R(-rot),   t = out_center - A @ src_center.

Only the x-extent sets the zoom, exactly as in the reference (its ``src_dir``
uses ``src_w`` only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _as_pair(x):
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 0:
        x = jnp.stack([x, x])
    return x


def get_affine_transform(center, scale, rot, output_size, shift=None, inv: bool = False):
    """2x3 affine mapping the scaled/rotated person box onto the output frame.

    Args:
        center: [..., 2] box centre in source-image pixels.
        scale: [..., 2] or [...] box scale; box extent is ``scale * 200`` px.
        rot: [...] rotation in degrees.
        output_size: (w, h) of the destination frame (static Python values).
        shift: optional [..., 2] shift in box-size units.
        inv: if True, return the inverse map (output frame -> source image).

    Returns:
        [..., 2, 3] affine matrices; ``pts_dst = A[:, :2] @ pts_src + A[:, 2]``.
    """
    center = jnp.asarray(center, dtype=jnp.float32)
    scale = jnp.asarray(scale, dtype=jnp.float32)
    if scale.ndim == center.ndim - 1:
        scale = jnp.stack([scale, scale], axis=-1)
    rot = jnp.asarray(rot, dtype=jnp.float32)
    out_w = float(output_size[0])
    out_h = float(output_size[1])

    box = scale * 200.0
    src_center = center if shift is None else center + box * jnp.asarray(shift, jnp.float32)
    dst_center = jnp.array([out_w * 0.5, out_h * 0.5], dtype=jnp.float32)

    rad = rot * (np.pi / 180.0)
    cs, sn = jnp.cos(rad), jnp.sin(rad)

    if not inv:
        s = out_w / box[..., 0]
        # R(-rot) scaled by s
        a00 = s * cs
        a01 = s * sn
        a10 = -s * sn
        a11 = s * cs
        tx = dst_center[0] - (a00 * src_center[..., 0] + a01 * src_center[..., 1])
        ty = dst_center[1] - (a10 * src_center[..., 0] + a11 * src_center[..., 1])
    else:
        s = box[..., 0] / out_w
        # R(rot) scaled by s
        a00 = s * cs
        a01 = -s * sn
        a10 = s * sn
        a11 = s * cs
        tx = src_center[..., 0] - (a00 * dst_center[0] + a01 * dst_center[1])
        ty = src_center[..., 1] - (a10 * dst_center[0] + a11 * dst_center[1])

    row0 = jnp.stack([a00, a01, tx], axis=-1)
    row1 = jnp.stack([a10, a11, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def affine_transform_points(points, trans):
    """Apply [..., 2, 3] affines to [..., K, 2] points (batched homogeneous
    product; replaces the per-point host loop at transforms.py:112-120)."""
    points = jnp.asarray(points, dtype=jnp.float32)
    xy = points[..., :2]
    # full f32 accumulation: coordinate math must not drop to bf16 on TPU
    lin = jnp.einsum("...ij,...kj->...ki", trans[..., :2, :2], xy, precision="highest")
    return lin + trans[..., None, :2, 2]


def transform_preds(coords, center, scale, output_size):
    """Map heatmap-frame coords back to source-image pixels
    (reference: transform_preds, transforms.py:67-73). coords: [..., K, 2]."""
    trans = get_affine_transform(center, scale, 0.0, output_size, inv=True)
    return affine_transform_points(coords, trans)
