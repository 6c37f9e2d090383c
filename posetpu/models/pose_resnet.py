"""SimpleBaseline PoseResNet in Flax — ResNet backbone + deconv heatmap head.

Functionally equivalent to the reference network (lib/models/pose_resnet.py:
102-254): ResNet-18/34/50/101/152 backbone, three stride-2 transposed convs to
256 channels, 1x1 conv to per-joint heatmaps; the forward returns
``(heatmaps, layer1_features, deconv_features)`` for the MI/domain losses.

TPU-first choices: NHWC layout, bf16 compute with f32 params/statistics
(``dtype``/``param_dtype``), views folded into the batch dimension by the
caller, and the transposed convs expressed as input-dilated convolutions with
the exact PyTorch ``ConvTranspose2d`` geometry so converted checkpoints are
bit-compatible.

Module names mirror the torch state-dict structure (layer1/0/conv1, ...) so
the checkpoint converter (posetpu/models/convert_torch.py) is a pure
name-and-layout mapping.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (torch uses 0.1)

# (block kind, per-stage block counts) per depth — the standard ResNet family
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

conv_init = nn.initializers.normal(stddev=0.001)  # reference init_weights


def torch_conv_transpose(x, kernel, stride: int, padding: int, out_padding: int = 0):
    """PyTorch ``ConvTranspose2d`` forward as an input-dilated convolution.

    kernel: [kh, kw, in, out] already spatially *flipped* relative to the
    torch weight (the converter handles that); x: NHWC.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad_h = (kh - 1 - padding, kh - 1 - padding + out_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + out_padding)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


class ConvTranspose(nn.Module):
    """Transposed conv with torch geometry; kernel stored pre-flipped."""

    features: int
    kernel_size: int
    stride: int = 2
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kernel_size == 4:
            padding, out_padding = 1, 0
        elif self.kernel_size == 3:
            padding, out_padding = 1, 1
        elif self.kernel_size == 2:
            padding, out_padding = 0, 0
        else:
            raise ValueError(f"unsupported deconv kernel {self.kernel_size}")
        kernel = self.param(
            "kernel",
            conv_init,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
            self.param_dtype,
        )
        y = torch_conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype), self.stride, padding, out_padding
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        kernel_init=conv_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _bn(train, name=None, dtype=jnp.float32):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype)(out)
        out = _bn(train, "bn2", self.dtype)(out)
        if self.downsample:
            residual = _conv(self.planes, 1, self.stride, "downsample_conv", self.dtype)(x)
            residual = _bn(train, "downsample_bn", self.dtype)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype)(out)
        out = _bn(train, "bn2", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, "conv3", self.dtype)(out)
        out = _bn(train, "bn3", self.dtype)(out)
        if self.downsample:
            residual = _conv(self.planes * 4, 1, self.stride, "downsample_conv", self.dtype)(x)
            residual = _bn(train, "downsample_bn", self.dtype)(residual)
        return nn.relu(out + residual)


class PoseResNet(nn.Module):
    """Backbone + deconv head. Input NHWC [N, H, W, 3]; returns
    (heatmaps [N, h, w, J], layer1 features, deconv features)."""

    num_layers: int = 50
    num_joints: int = 16
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stage_blocks = RESNET_SPEC[self.num_layers]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4

        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        inplanes = 64
        for stage, (planes, nblocks) in enumerate(
            zip((64, 128, 256, 512), stage_blocks), start=1
        ):
            stride = 1 if stage == 1 else 2
            for b in range(nblocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes, s, need_ds, self.dtype, name=f"layer{stage}_{b}"
                )(x, train)
                inplanes = planes * expansion
            feats.append(x)
        x1 = feats[0]

        f = x
        for i, (nf, nk) in enumerate(zip(self.deconv_filters, self.deconv_kernels)):
            f = ConvTranspose(
                nf, nk, 2, self.deconv_with_bias, self.dtype, name=f"deconv{i}_conv"
            )(f)
            f = _bn(train, f"deconv{i}_bn", self.dtype)(f)
            f = nn.relu(f)

        pad = 1 if self.final_conv_kernel == 3 else 0
        heatmaps = nn.Conv(
            self.num_joints,
            (self.final_conv_kernel, self.final_conv_kernel),
            padding=[(pad, pad), (pad, pad)],
            use_bias=True,
            kernel_init=conv_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="final_layer",
        )(f)
        # heatmaps leave in f32: decode/losses are precision-sensitive
        return heatmaps.astype(jnp.float32), x1, f


def get_pose_net(cfg, dtype=jnp.float32) -> PoseResNet:
    """Factory mirroring the reference entry point (pose_resnet.py:257-266)."""
    return PoseResNet(
        num_layers=cfg.POSE_RESNET.NUM_LAYERS,
        num_joints=cfg.NETWORK.NUM_JOINTS,
        deconv_filters=tuple(cfg.POSE_RESNET.NUM_DECONV_FILTERS),
        deconv_kernels=tuple(cfg.POSE_RESNET.NUM_DECONV_KERNELS),
        final_conv_kernel=cfg.POSE_RESNET.FINAL_CONV_KERNEL,
        deconv_with_bias=cfg.POSE_RESNET.DECONV_WITH_BIAS,
        dtype=dtype,
    )
