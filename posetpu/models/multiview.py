"""Multi-view wrapper + cross-view heatmap aggregation.

The reference runs 12 separate ``ChannelWiseFC`` modules in a Python double
loop over ordered view pairs (lib/models/multiview_pose_resnet.py:42-58).
Here the whole fusion is ONE einsum over a stacked ``[12, S, S]`` weight bank
(S = heatmap H*W) — 12 large matmuls the MXU chews through back to back, with
the per-view mean folded in. Views live in a leading axis and are folded into
the batch for the shared backbone.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from posetpu.models.pose_resnet import PoseResNet

# source-view index for each of the 12 ordered (target i, slot) pairs, in the
# reference's fc_idx order: i=0 reads views 1,2,3; i=1 reads 0,2,3; ...
_SRC_VIEW = tuple(
    src for tgt in range(4) for src in range(4) if src != tgt
)


class Aggregation(nn.Module):
    """12-way learned heatmap warp bank (multiview_pose_resnet.py:31-58)."""

    heatmap_size: int  # spatial side (heatmaps are square here, like the ref)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, heatmaps):
        """heatmaps: [N, 4, h, w, J] -> fused [N, 4, h, w, J].

        Each target view's output is the mean of the three warped source
        views; the target's own raw heatmap is NOT added (the reference's
        'warped views don't add to the cardinal view')."""
        n, v, h, w, j = heatmaps.shape
        assert v == 4, "aggregation bank is built for 4 views"
        s = h * w
        bank = self.param(
            "weight",
            nn.initializers.uniform(scale=0.1),  # ChannelWiseFC init U(0, 0.1)
            (12, s, s),
            jnp.float32,
        )
        # layout: put (n, j) adjacent so each of the 12 batched matmuls has
        # M = N*J rows (>= 128) — with J alone as M the MXU runs 16-row tiles
        # at ~12% occupancy (measured ~3x whole-pipeline slowdown)
        x = jnp.moveaxis(heatmaps.reshape(n, v, s, j), 3, 2)  # [N, V, J, S]
        src = jnp.asarray(_SRC_VIEW)
        gathered = x[:, src]  # [N, 12, J, S]
        gathered = jnp.moveaxis(gathered, 1, 0).reshape(12, n * j, s)
        warped = jnp.einsum(
            "pms,pst->pmt",
            gathered.astype(self.dtype),
            bank.astype(self.dtype),
        )  # [12, N*J, S]
        warped = jnp.moveaxis(warped.reshape(12, n, j, s), 0, 1)  # [N, 12, J, S]
        fused = warped.reshape(n, v, 3, j, s).mean(axis=2)  # [N, V, J, S]
        fused = jnp.moveaxis(fused, 2, 3).reshape(n, v, h, w, j)
        return fused.astype(jnp.float32)


class MultiViewPose(nn.Module):
    """Shared backbone over 4 views + optional aggregation
    (multiview_pose_resnet.py:61-84). Views are folded into the batch for one
    big MXU-friendly forward instead of a Python loop per view."""

    resnet: PoseResNet
    aggre: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, views, train: bool = False):
        """views: [N, V, H, W, 3] -> (raw [N, V, h, w, J], fused or None,
        low_features [N, V, h1, w1, C1], high_features [N, V, h, w, 256])."""
        n, v = views.shape[0], views.shape[1]
        flat = views.reshape((n * v,) + views.shape[2:])
        heatmaps, low, high = self.resnet(flat, train=train)
        heatmaps = heatmaps.reshape((n, v) + heatmaps.shape[1:])
        low = low.reshape((n, v) + low.shape[1:])
        high = high.reshape((n, v) + high.shape[1:])
        fused = None
        if self.aggre:
            fused = Aggregation(
                heatmap_size=heatmaps.shape[2], dtype=self.dtype, name="aggre_layer"
            )(heatmaps)
        return heatmaps, fused, low, high


def get_multiview_pose_net(cfg, dtype=jnp.float32) -> MultiViewPose:
    from posetpu.models.pose_resnet import get_pose_net

    return MultiViewPose(
        resnet=get_pose_net(cfg, dtype=dtype),
        aggre=bool(cfg.NETWORK.AGGRE),
        dtype=dtype,
    )
