"""Heatmap rendering, decoding and flip utilities — all batched XLA ops.

The reference renders Gaussian targets with a per-joint Python loop and window
arithmetic (lib/dataset/joints_dataset_compatible.py:207-253) and decodes with
numpy argmax + a per-(sample, joint) host loop for the quarter-pixel offset
(lib/core/inference.py:19-75). Here both are single fused tensor expressions
over [..., J, H, W] — the forms TPU/VPU want.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_gaussian_heatmaps(joints, joints_vis, heatmap_size, image_size, sigma):
    """Gaussian target heatmaps with the reference's integer-quantised centres.

    Matches joints_dataset_compatible.py:207-253 bit-for-bit in structure:
    the centre is ``floor(x/stride + 0.5)``, the Gaussian is evaluated on the
    un-clipped pixel grid (exp(-(d^2)/(2 sigma^2))), support is clipped to a
    ±3*sigma window, and a joint whose window misses the map entirely gets
    weight 0.

    Args:
        joints: [..., J, 2] joint coords in input-image pixels.
        joints_vis: [..., J] visibility (0/1).
        heatmap_size: (W, H) static.
        image_size: (W, H) static.
        sigma: Gaussian sigma in heatmap pixels (static).

    Returns:
        target: [..., J, H, W] float32; weight: [..., J] float32.
    """
    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    hw, hh = int(heatmap_size[0]), int(heatmap_size[1])
    iw, ih = float(image_size[0]), float(image_size[1])
    tmp = 3 * sigma

    stride = jnp.array([iw / hw, ih / hh], jnp.float32)
    mu = jnp.trunc(joints / stride + 0.5)  # reference: int() truncates toward 0
    mux, muy = mu[..., 0], mu[..., 1]

    # window validity: ul = mu - tmp, br = mu + tmp + 1 must intersect the map
    inside = (
        (mux - tmp < hw) & (muy - tmp < hh) & (mux + tmp + 1 >= 1) & (muy + tmp + 1 >= 1)
    )
    weight = vis * inside.astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (hh, hw), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (hh, hw), 0)
    dx = xs - mux[..., None, None]
    dy = ys - muy[..., None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    support = (jnp.abs(dx) <= tmp) & (jnp.abs(dy) <= tmp)
    target = g * support.astype(jnp.float32) * (weight[..., None, None] > 0.5)
    return target, weight


def _first_max_index(flat, axis):
    """(maxvals, first-argmax index) along ``axis`` via two plain reduces.

    ``jnp.argmax`` lowers to XLA's variadic (value, index) reduce, which the
    TPU emitter runs ~10x slower than simple reduces (measured 1.7 ms for
    [128, 20, 4096] f32 inside the serving pipeline). max + min-of-matching-
    iota reproduces argmax's first-occurrence tie-break with two fast
    reduces and one elementwise select."""
    n = flat.shape[axis]
    maxvals = jnp.max(flat, axis=axis)
    iota = jax.lax.broadcasted_iota(jnp.int32, flat.shape, axis % flat.ndim)
    hit = flat == jnp.expand_dims(maxvals, axis)
    idx = jnp.min(jnp.where(hit, iota, n), axis=axis)
    return maxvals, idx


def max_preds(heatmaps):
    """Argmax decode: coords (x, y) + max value, masked where max <= 0
    (reference: get_max_preds, inference.py:19-47). heatmaps: [..., H, W]."""
    h, w = heatmaps.shape[-2:]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    maxvals, idx = _first_max_index(flat, -1)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0).astype(jnp.float32)[..., None]
    return coords, maxvals


def decode_heatmaps(heatmaps, post_process: bool = True):
    """Argmax + quarter-pixel offset decode in heatmap coordinates.

    Replaces the host double loop of get_final_preds (inference.py:57-66):
    where the peak is strictly inside [2, W-2) x [2, H-2), nudge 0.25 px
    toward the larger neighbour along each axis.

    Returns coords [..., 2] (x, y) and maxvals [...].
    """
    coords, maxvals = max_preds(heatmaps)
    if not post_process:
        return coords, maxvals

    h, w = heatmaps.shape[-2:]
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)

    def at(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jnp.take_along_axis(
            heatmaps.reshape(heatmaps.shape[:-2] + (h * w,)),
            (yy * w + xx)[..., None],
            axis=-1,
        )[..., 0]

    diff_x = at(0, 1) - at(0, -1)
    diff_y = at(1, 0) - at(-1, 0)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    offs = 0.25 * jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1)
    return coords + offs * ok.astype(jnp.float32)[..., None], maxvals


def decode_heatmaps_hwj(heatmaps, post_process: bool = True):
    """Channels-last twin of :func:`decode_heatmaps` for [..., H, W, J] maps.

    Decoding in the network's native layout keeps J on TPU lanes through the
    reduces and skips the [..., J, H, W] transpose ``final_preds`` otherwise
    pays (a full-tensor copy of the serving batch's heatmaps).

    Returns coords [..., J, 2] (x, y) and maxvals [..., J].
    """
    h, w, j = heatmaps.shape[-3:]
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (h * w, j))
    maxvals, idx = _first_max_index(flat, -2)  # [..., J]
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0).astype(jnp.float32)[..., None]
    if not post_process:
        return coords, maxvals

    px = idx % w
    py = idx // w

    def at(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None, :], axis=-2)[..., 0, :]

    diff_x = at(0, 1) - at(0, -1)
    diff_y = at(1, 0) - at(-1, 0)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    offs = 0.25 * jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1)
    return coords + offs * ok.astype(jnp.float32)[..., None], maxvals


def decode_heatmaps_jns(heatmaps, hw, post_process: bool = True):
    """S-minor twin of :func:`decode_heatmaps` for [J, ..., S] maps
    (S = H*W flattened, the serving tail's lane axis).

    The max/argmax reduces run over the MINOR axis at full 128-lane width
    (the [..., H, W, J] form puts J=16 on lanes — 1/8 utilisation), and the
    quarter-pixel gathers stay on the same axis.

    Args:
        heatmaps: [J, ..., S] float maps.
        hw: static (h, w) with h*w == S.

    Returns coords [J, ..., 2] (x, y) and maxvals [J, ...].
    """
    h, w = int(hw[0]), int(hw[1])
    maxvals, idx = _first_max_index(heatmaps, -1)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0).astype(jnp.float32)[..., None]
    if not post_process:
        return coords, maxvals

    px = idx % w
    py = idx // w

    def at(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jnp.take_along_axis(
            heatmaps, (yy * w + xx)[..., None], axis=-1
        )[..., 0]

    diff_x = at(0, 1) - at(0, -1)
    diff_y = at(1, 0) - at(-1, 0)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    offs = 0.25 * jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1)
    return coords + offs * ok.astype(jnp.float32)[..., None], maxvals


def phase_index_tables(hw, levels: int = 1):
    """Static index tables tying the phase-packed heatmap layout to the
    row-major one (see quant._Int8Runner.{subpixel_phases, final_phase} —
    the phase tail's head emits this order directly; no runtime gather or
    interleave exists anywhere in the tail).

    ``levels=1``: packed index p = (2a+b)*bh*bw + i*bw + j is the
    row-major pixel (y, x) = (2i+a, 2j+b) — the LAST deconv's phase
    groups.

    ``levels=2``: the two-level packing of the deconv1+deconv2 fused tail
    (ops/pallas/phase_tail.fused_phase_tail2): packed index
    p = (((2*a2+b2)*4 + 2*al+be) * bh*bw) + i*bw + j  (bh = h//4) is pixel
    (y, x) = (4i + 2*al + a2, 4j + 2*be + b2) — (a2, b2) indexes deconv2's
    phase, (al, be) the parity of deconv1's phase plane.

    Returns dict of [h*w] int32 numpy arrays: ``rowmajor`` (rowmajor index
    of packed position p) and ``packed`` (packed position of rowmajor
    index r).
    """
    import numpy as np

    h, w = int(hw[0]), int(hw[1])
    if levels == 1:
        bh, bw = h // 2, w // 2
        g, i, j = np.meshgrid(np.arange(4), np.arange(bh), np.arange(bw),
                              indexing="ij")
        a, b = g // 2, g % 2
        rowmajor = ((2 * i + a) * w + (2 * j + b)).reshape(-1)
    else:
        assert levels == 2 and h % 4 == 0 and w % 4 == 0
        bh, bw = h // 4, w // 4
        g, p, i, j = np.meshgrid(np.arange(4), np.arange(4), np.arange(bh),
                                 np.arange(bw), indexing="ij")
        a2, b2 = g // 2, g % 2
        al, be = p // 2, p % 2
        rowmajor = ((4 * i + 2 * al + a2) * w
                    + (4 * j + 2 * be + b2)).reshape(-1)
    rowmajor = rowmajor.astype(np.int32)
    packed = np.empty(h * w, np.int32)
    packed[rowmajor] = np.arange(h * w, dtype=np.int32)
    return {"rowmajor": rowmajor, "packed": packed, "levels": levels}


def decode_heatmaps_packed(heatmaps, tables, hw, post_process: bool = True):
    """decode_heatmaps over PHASE-PACKED [J, ..., S] maps, with the exact
    row-major first-occurrence tie-break of the reference's argmax: the max
    is found over the packed axis, then the winning index is the MINIMUM
    row-major position among the hits (a static [S] lookup).

    Returns coords [J, ..., 2] in row-major (x, y) pixels and maxvals.
    """
    h, w = int(hw[0]), int(hw[1])
    rtab = jnp.asarray(tables["rowmajor"])
    ptab = jnp.asarray(tables["packed"])
    maxvals = jnp.max(heatmaps, axis=-1)
    hit = heatmaps == maxvals[..., None]
    r = jnp.min(jnp.where(hit, rtab, h * w), axis=-1)
    r = jnp.minimum(r, h * w - 1)
    x = (r % w).astype(jnp.float32)
    y = (r // w).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0).astype(jnp.float32)[..., None]
    if not post_process:
        return coords, maxvals

    px = r % w
    py = r // w

    def at(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        p = jnp.take(ptab, yy * w + xx)
        return jnp.take_along_axis(heatmaps, p[..., None], axis=-1)[..., 0]

    diff_x = at(0, 1) - at(0, -1)
    diff_y = at(1, 0) - at(-1, 0)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    offs = 0.25 * jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1)
    return coords + offs * ok.astype(jnp.float32)[..., None], maxvals


def flip_back_packed(heatmaps, flip_pairs, hw, levels: int = 1):
    """Phase-PACKED twin of :func:`flip_back_jns`: [J, ..., S] packed maps
    (phase_index_tables order). The W-reversal decomposes into static,
    layout-preserving moves — phase column swap b -> 1-b and a within-phase
    bw-reversal — because x = 2j+b maps to w-1-x = 2(bw-1-j) + (1-b).
    ``levels=2`` (the two-level packing): x = 4j + 2be + b2 maps to
    w-1-x = 4(bw-1-j) + 2(1-be) + (1-b2), so b2, be AND j all reverse."""
    h, w = int(hw[0]), int(hw[1])
    j = heatmaps.shape[0]
    order = list(range(j))
    for a, b in flip_pairs:
        order[a], order[b] = order[b], order[a]
    if levels == 1:
        bh, bw = h // 2, w // 2
        x = heatmaps.reshape(heatmaps.shape[:-1] + (2, 2, bh, bw))
        x = x[..., :, ::-1, :, ::-1]
    else:
        bh, bw = h // 4, w // 4
        x = heatmaps.reshape(heatmaps.shape[:-1] + (2, 2, 2, 2, bh, bw))
        x = x[..., :, ::-1, :, ::-1, :, ::-1]  # reverse b2, be, j
    x = x.reshape(heatmaps.shape)
    return jnp.take(x, jnp.array(order), axis=0)


def shift_heatmap_right_packed(heatmaps, hw, levels: int = 1):
    """Phase-PACKED twin of :func:`shift_heatmap_right_jns`. Shifting one
    pixel right sends phase b=0 -> b=1 at the same within-phase column and
    b=1 -> b=0 at column j+1 (first column duplicated, like the row-major
    form). ``levels=2``: new(b2=1)=old(b2=0) in place, new(b2=0, be=1) =
    old(b2=1, be=0), new(b2=0, be=0) = old(b2=1, be=1) at column j-1."""
    h, w = int(hw[0]), int(hw[1])
    if levels == 1:
        bh, bw = h // 2, w // 2
        x = heatmaps.reshape(heatmaps.shape[:-1] + (2, 2, bh, bw))
        b0, b1 = x[..., 0, :, :], x[..., 1, :, :]  # [..., 2(a), bh, bw]
        new_b0 = jnp.concatenate([b0[..., :1], b1[..., :-1]], axis=-1)
        x = jnp.stack([new_b0, b0], axis=-3)
        return x.reshape(heatmaps.shape)
    bh, bw = h // 4, w // 4
    # dims (..., a2, b2, al, be, i, j)
    x = heatmaps.reshape(heatmaps.shape[:-1] + (2, 2, 2, 2, bh, bw))
    b20, b21 = x[..., 0, :, :, :, :], x[..., 1, :, :, :, :]
    # new(b2=0, be=0, j) = old(b2=1, be=1, j-1); j=0 duplicates pixel x=0
    nb00 = jnp.concatenate(
        [b20[..., 0:1, :, :1], b21[..., 1:2, :, :-1]], axis=-1)
    # new(b2=0, be=1, j) = old(b2=1, be=0, j)
    nb01 = b21[..., 0:1, :, :]
    new_b20 = jnp.concatenate([nb00, nb01], axis=-3)
    x = jnp.stack([new_b20, b20], axis=-5)
    return x.reshape(heatmaps.shape)


def flip_back(heatmaps, flip_pairs):
    """Un-flip heatmaps from a horizontally flipped input: reverse the W axis
    and swap left/right channels (reference: flip_back_th, transforms.py:33-47).

    heatmaps: [..., J, H, W]; flip_pairs: list of (a, b) joint index pairs.
    """
    j = heatmaps.shape[-3]
    order = list(range(j))
    for a, b in flip_pairs:
        order[a], order[b] = order[b], order[a]
    out = jnp.flip(heatmaps, axis=-1)
    return jnp.take(out, jnp.array(order), axis=-3)


def flip_back_jns(heatmaps, flip_pairs, hw):
    """S-minor twin of :func:`flip_back`: [J, ..., S] maps.

    The L/R joint swap becomes a gather on the OUTERMOST axis (free — J is
    the major dim here, vs the J-minor gather the NHWC form pays) and the
    W-reversal happens inside the flattened S axis."""
    h, w = int(hw[0]), int(hw[1])
    j = heatmaps.shape[0]
    order = list(range(j))
    for a, b in flip_pairs:
        order[a], order[b] = order[b], order[a]
    x = heatmaps.reshape(heatmaps.shape[:-1] + (h, w))[..., ::-1]
    x = x.reshape(heatmaps.shape)
    return jnp.take(x, jnp.array(order), axis=0)


def shift_heatmap_right_jns(heatmaps, hw):
    """S-minor twin of :func:`shift_heatmap_right`: [..., S] maps."""
    h, w = int(hw[0]), int(hw[1])
    x = heatmaps.reshape(heatmaps.shape[:-1] + (h, w))
    x = jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)
    return x.reshape(heatmaps.shape)


def shift_heatmap_right(heatmaps):
    """Shift heatmap one pixel right, duplicating the first column — the
    flip-test alignment trick (reference: function.py:575-580)."""
    return jnp.concatenate([heatmaps[..., :, :1], heatmaps[..., :, :-1]], axis=-1)


def soft_argmax_2d(heatmaps, temperature: float = 100.0):
    """Differentiable expected-coordinate decode (integral pose regression).

    Matches generate_integral_preds_2d_th (lib/utils/transforms.py:149-171):
    scores are scaled by ``temperature`` then softmaxed over H*W; returns the
    (x, y) expectation. heatmaps: [..., H, W] -> [..., 2].
    """
    h, w = heatmaps.shape[-2:]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,)) * temperature
    p = jax.nn.softmax(flat, axis=-1).reshape(heatmaps.shape[:-2] + (h, w))
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    ex = jnp.einsum("...hw,w->...", p, xs, precision="highest")
    ey = jnp.einsum("...hw,h->...", p, ys, precision="highest")
    return jnp.stack([ex, ey], axis=-1)
