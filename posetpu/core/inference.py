"""In-graph inference pipeline pieces: fuse routing, flip-test merge, final
predictions in source-image coordinates.

The reference's ``fuse_routing`` mixes per *sample* in a Python loop
(function.py:33-45); here it is a masked lerp. The flip-test block
(function.py:567-583) becomes a pure function over the second forward's
heatmaps. ``get_final_preds`` (inference.py:50-75) is the decode + inverse
affine, fully batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from posetpu.ops.affine import transform_preds
from posetpu.ops.heatmap import (
    decode_heatmaps_hwj,
    flip_back,
    shift_heatmap_right,
)


def fuse_routing(raw, fused, is_h36m_mask, enabled: bool = True):
    """Blend ``3/5 * fused + 2/5 * raw`` for h36m samples, raw otherwise
    (function.py:33-45). raw/fused: [N, V, h, w, J]; is_h36m_mask: [N]."""
    if fused is None or not enabled:
        return raw
    m = is_h36m_mask.astype(raw.dtype)[:, None, None, None, None]
    return (0.6 * fused + 0.4 * raw) * m + raw * (1.0 - m)


def flip_test_merge(output, output_flipped, flip_pairs, shift: bool = False):
    """Average the straight output with the un-flipped flipped-input output
    (function.py:567-583). Heatmaps [..., h, w, J] — flip_back wants the
    joint axis third-from-last, so we move it around the call."""
    of = jnp.moveaxis(output_flipped, -1, -3)
    of = flip_back(of, flip_pairs)
    if shift:
        of = shift_heatmap_right(of)
    of = jnp.moveaxis(of, -3, -1)
    return 0.5 * (output + of)


def fuse_routing_jns(raw, fused, is_h36m_mask):
    """S-minor twin of :func:`fuse_routing`: raw/fused [J, N, V, S]."""
    if fused is None:
        return raw
    m = is_h36m_mask.astype(raw.dtype)[None, :, None, None]
    return (0.6 * fused + 0.4 * raw) * m + raw * (1.0 - m)


def flip_test_merge_jns(output, output_flipped, flip_pairs, hw,
                        shift: bool = False):
    """S-minor twin of :func:`flip_test_merge`: [J, ..., S] maps."""
    from posetpu.ops.heatmap import flip_back_jns, shift_heatmap_right_jns

    of = flip_back_jns(output_flipped, flip_pairs, hw)
    if shift:
        of = shift_heatmap_right_jns(of, hw)
    return 0.5 * (output + of)


def flip_test_merge_packed(output, output_flipped, flip_pairs, hw,
                           shift: bool = False, levels: int = 1):
    """Phase-PACKED twin of :func:`flip_test_merge_jns` (maps stay in the
    phase_index_tables order; the W-flip and right-shift become static
    phase-group permutations — see ops/heatmap.flip_back_packed).
    ``levels`` selects the packing depth (phase_index_tables)."""
    from posetpu.ops.heatmap import flip_back_packed, shift_heatmap_right_packed

    of = flip_back_packed(output_flipped, flip_pairs, hw, levels=levels)
    if shift:
        of = shift_heatmap_right_packed(of, hw, levels=levels)
    return 0.5 * (output + of)


def final_preds_jns(heatmaps, center, scale, hw, post_process: bool = True):
    """S-minor twin of :func:`final_preds`.

    heatmaps: [J, N, V, S]; center/scale: [N, V, 2]; hw: static (h, w).
    Returns (preds [N, V, J, 2], maxvals [N, V, J]) — same contract as
    final_preds (only the coords/maxvals, which are tiny, get transposed).
    """
    from posetpu.ops.heatmap import decode_heatmaps_jns

    h, w = int(hw[0]), int(hw[1])
    coords, maxvals = decode_heatmaps_jns(heatmaps, (h, w),
                                          post_process=post_process)
    coords = jnp.moveaxis(coords, 0, 2)  # [N, V, J, 2] — tiny tensor
    maxvals = jnp.moveaxis(maxvals, 0, 2)
    preds = transform_preds(coords, center, scale, (w, h))
    return preds, maxvals


def final_preds_packed(heatmaps, center, scale, hw, tables,
                       post_process: bool = True):
    """Phase-packed twin of :func:`final_preds_jns` (see
    ops/heatmap.decode_heatmaps_packed). heatmaps: [J, N, V, S] packed."""
    from posetpu.ops.heatmap import decode_heatmaps_packed

    h, w = int(hw[0]), int(hw[1])
    coords, maxvals = decode_heatmaps_packed(heatmaps, tables, (h, w),
                                             post_process=post_process)
    coords = jnp.moveaxis(coords, 0, 2)
    maxvals = jnp.moveaxis(maxvals, 0, 2)
    preds = transform_preds(coords, center, scale, (w, h))
    return preds, maxvals


def final_preds(heatmaps, center, scale, post_process: bool = True):
    """Decode heatmaps and map to source-image pixels (get_final_preds).

    heatmaps: [..., h, w, J]; center/scale: [..., 2] matching the leading
    dims. Returns (preds [..., J, 2], maxvals [..., J]).
    """
    h, w = heatmaps.shape[-3:-1]
    # decode in the native channels-last layout: no J-major transpose, J
    # stays on lanes through the reduces (see decode_heatmaps_hwj)
    coords, maxvals = decode_heatmaps_hwj(heatmaps, post_process=post_process)
    preds = transform_preds(coords, center, scale, (w, h))
    return preds, maxvals
