"""In-graph bilinear affine warp — the TPU image frontend.

Replaces the host-side ``cv2.warpAffine`` crop at
joints_dataset_compatible.py:161-165. cv2 maps each destination pixel through
the inverse affine and bilinearly samples the source with zero border; we do
the same as one batched gather+lerp, fused by XLA with the surrounding
normalisation, so the whole crop/warp/normalise frontend lives on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(image, x, y):
    """Bilinearly sample ``image`` [H, W, C] at float coords (x, y) [...],
    zero outside. Returns [..., C]."""
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        v = image[yc, xc]
        return v * valid.astype(image.dtype)[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fx = fx[..., None].astype(image.dtype)
    fy = fy[..., None].astype(image.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def affine_warp_image(image, inv_trans, output_size):
    """Warp one [H, W, C] image to [out_h, out_w, C].

    ``inv_trans`` is the [2, 3] map from *destination* pixel coords to source
    coords (i.e. ``get_affine_transform(..., inv=True)``), matching cv2's
    internal inversion of the forward matrix.
    """
    out_w, out_h = int(output_size[0]), int(output_size[1])
    dx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    dy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    sx = inv_trans[0, 0] * dx + inv_trans[0, 1] * dy + inv_trans[0, 2]
    sy = inv_trans[1, 0] * dx + inv_trans[1, 1] * dy + inv_trans[1, 2]
    return bilinear_sample(image, sx, sy)


affine_warp_batch = jax.vmap(affine_warp_image, in_axes=(0, 0, None))
