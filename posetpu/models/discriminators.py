"""Discriminator/critic networks for the MI and domain-transfer losses.

Functional equivalents of lib/models/discriminator.py:28-242, in Flax/NHWC.
The reference's ``GlobalDiscriminator`` is an empty stub there
(discriminator.py:101-107) and is intentionally not replicated.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _noisy_identity_init(n_input: int):
    """U(-0.01, 0.01) with ones on the leading diagonal — the reference's
    'noisy copy' shortcut init (discriminator.py:52-57, 83-89). Shape [I, O]."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        w = jax.random.uniform(key, shape, dtype, -0.01, 0.01)
        eye = np.zeros(shape, np.float32)
        for i in range(min(n_input, shape[0], shape[1])):
            eye[i, i] = 1.0
        return jnp.where(jnp.asarray(eye) > 0, 1.0, w)

    return init


class MI1x1ConvNet(nn.Module):
    """1x1-conv MI encoder with identity-init shortcut + channel LayerNorm
    (discriminator.py:28-64). Input NHWC."""

    n_units: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.n_units, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(h)
        h = nn.relu(h)
        h = nn.Conv(self.n_units, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        # 1x1 conv == per-position linear; express the shortcut as Dense so the
        # identity init applies to an [I, O] matrix
        sc = nn.Dense(self.n_units, use_bias=False,
                      kernel_init=_noisy_identity_init(x.shape[-1]),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="shortcut")(x)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="ln")(h + sc)


class MIFCNet(nn.Module):
    """MLP MI encoder (discriminator.py:67-98)."""

    n_units: int
    use_ln: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.n_units, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(self.n_units, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        sc = nn.Dense(self.n_units, use_bias=True,
                      kernel_init=_noisy_identity_init(x.shape[-1]),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="shortcut")(x)
        out = h + sc
        if self.use_ln:
            out = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="ln")(out)
        return out


class LocalDiscriminator(nn.Module):
    """Dot-product critic of two MI1x1ConvNet embeddings
    (discriminator.py:110-153). Inputs [..., L, C_low] / [..., L, C_high]
    (channels-last positions); returns scores [..., L]."""

    out_channels: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        # treat position axis as a 1-wide spatial map for the conv encoders
        low4 = low[..., None, :, :] if low.ndim == 3 else low
        high4 = high[..., None, :, :] if high.ndim == 3 else high
        e_low = MI1x1ConvNet(self.out_channels, self.dtype, name="low_net")(low4, train)
        e_high = MI1x1ConvNet(self.out_channels, self.dtype, name="high_net")(high4, train)
        scores = jnp.sum(e_low * e_high, axis=-1)
        if low.ndim == 3:
            scores = scores[..., 0, :]
        return scores


class DomainDiscriminator(nn.Module):
    """PatchGAN-ish domain critic on [N, 8, 8, 2048] backbone features
    (discriminator.py:156-175); returns sigmoid probs [N, 1, 1, 1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(128, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn2")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv3")(h)
        return nn.sigmoid(h)


class ViewDiscriminator(nn.Module):
    """Two MIFCNet embeddings of concatenated per-view 2D joints
    (discriminator.py:178-199)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, joints_view1, joints_view2, train: bool = False):
        n = joints_view1.shape[0]
        e1 = MIFCNet(self.out_channels, use_ln=True, dtype=self.dtype,
                     name="view1_net")(joints_view1.reshape(n, -1), train)
        e2 = MIFCNet(self.out_channels, use_ln=True, dtype=self.dtype,
                     name="view2_net")(joints_view2.reshape(n, -1), train)
        return e1, e2


class JointsDiscriminator(nn.Module):
    """Two MIFCNet embeddings of joint-subset coordinates
    (discriminator.py:202-222)."""

    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, joints_var1, joints_var2, train: bool = False):
        n = joints_var1.shape[0]
        e1 = MIFCNet(self.out_channels, use_ln=True, dtype=self.dtype,
                     name="var1_net")(joints_var1.reshape(n, -1), train)
        e2 = MIFCNet(self.out_channels, use_ln=True, dtype=self.dtype,
                     name="var2_net")(joints_var2.reshape(n, -1), train)
        return e1, e2


class HeatmapDiscriminator(nn.Module):
    """MLP scoring (heatmap prob, image feature) pairs
    (discriminator.py:225-242): c_in -> c_m -> c_m//4 -> 1."""

    inter_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pairs, train: bool = False):
        h = nn.Dense(self.inter_channels, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(pairs)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(self.inter_channels // 4, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn2")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc3")(h)


def build_discriminators(cfg, dtype=jnp.float32) -> dict:
    """Instantiate the discriminator set the config enables, keyed like the
    reference's model_dict (run/pose2d/train.py:163-180)."""
    d = {}
    if cfg.LOSS.USE_LOCAL_MI_LOSS:
        d["local_discriminator"] = LocalDiscriminator(
            out_channels=cfg.LOCAL_DISCRIMINATOR.OUTPUT_CHANNELS, dtype=dtype
        )
    if cfg.LOSS.USE_DOMAIN_TRANSFER_LOSS:
        d["domain_discriminator"] = DomainDiscriminator(dtype=dtype)
    if cfg.LOSS.USE_VIEW_MI_LOSS:
        d["view_discriminator"] = ViewDiscriminator(
            out_channels=cfg.VIEW_DISCRIMINATOR.OUTPUT_CHANNELS, dtype=dtype
        )
    if cfg.LOSS.USE_JOINTS_MI_LOSS:
        d["joints_discriminator"] = JointsDiscriminator(
            out_channels=cfg.JOINTS_DISCRIMINATOR.OUTPUT_CHANNELS, dtype=dtype
        )
    if cfg.LOSS.USE_HEATMAP_MI_LOSS:
        d["heatmap_discriminator"] = HeatmapDiscriminator(
            inter_channels=cfg.HEATMAP_DISCRIMINATOR.INTER_CHANNELS, dtype=dtype
        )
    return d
