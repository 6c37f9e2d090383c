"""Pallas TPU kernel: fully-fused int8 ResNet bottleneck block.

The XLA int8 path (posetpu/models/quant.py) materialises every intermediate
activation of a bottleneck block to HBM — conv1/conv2/conv3 outputs, the
dequantised residual, the requantised block output — which is why the early
ResNet stages sit at the HBM roofline (PERF.md). This kernel runs a whole
stride-1 bottleneck (conv1 1x1 -> requant -> conv2 3x3 -> requant -> conv3
1x1 -> +residual -> ReLU -> requant) per grid step with ONE block-input read
and ONE block-output write; h1/h2 and every int32/f32 temporary live in VMEM.

Per-block HBM traffic drops from ~5 full-tensor passes to 2 (2.5x on the
bandwidth-bound layer1/layer2 of the serving path).

Layout: activations as [N, H*W, C] int8 (C on lanes). The 3x3 conv is nine
shifted [H*W, Cm] x [Cm, Cm] MXU matmuls: conv1's output is written into a
zero-margined scratch (W guard rows top and bottom), so tap (dy, dx) is a
STATIC slice at row offset W + dy*W + dx — no rotates (Mosaic only implements
32-bit rotates), no halo exchange, and the dy bounds come free from the
margins; only the dx row-crossing pixels need a mask.

Requantisation matches quant.py's _Int8Runner bit-for-bit: all scale folding
happens host-side (build_bottleneck_args), the kernel computes
clip(round(acc * scale_c + bias_c)) in f32 registers with round-half-even.

Reference semantics: lib/models/pose_resnet.py:63-99 (Bottleneck forward).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 3x3 taps in (dy, dx) row-major order, matching HWIO kernel layout rows.
_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _requant(acc, scale, bias, relu: bool = True):
    """int32 accumulator -> int8 with per-output-channel scale/bias, f32 in
    registers only. round() is round-half-even, like jnp.round in quant.py.
    ReLU folds into the clip floor: clip(round(max(y,0)), -127, 127) ==
    clip(round(y), 0, 127)."""
    y = acc.astype(jnp.float32) * scale[None, :] + bias[None, :]
    lo = 0.0 if relu else -127.0
    return jnp.clip(jnp.round(y), lo, 127.0).astype(jnp.int8)


def _margin(w: int) -> int:
    """Guard rows around the h1 scratch: > W (the largest tap shift is
    W + 1) and 8-aligned to keep slice offsets sublane-friendly."""
    return w + 8


def _conv2_3x3(h1_s, w2_ref, h: int, w: int):
    """3x3 stride-1 conv over the zero-margined h1 scratch: nine static
    slices at offsets margin + dy*W + dx, six dx-crossing masks, nine
    matmuls."""
    hw = h * w
    m = _margin(w)
    cm = w2_ref.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w
    acc2 = jnp.zeros((hw, cm), jnp.int32)
    for t, (dy, dx) in enumerate(_TAPS):
        base = m + dy * w + dx
        tap = h1_s[base:base + hw, :]
        if dx != 0:
            ok = (cols + dx >= 0) & (cols + dx < w)
            tap = jnp.where(ok, tap, jnp.int8(0))
        acc2 += jax.lax.dot_general(
            tap, w2_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return acc2


def _bottleneck_kernel(
    x_ref, w1_ref, w2_ref, w3_ref, v1_ref, v2_ref, v3_ref, vr_ref,
    out_ref, h1_s, h2_s,
    *, h: int, w: int, chunk: int, relu_out: bool,
):
    hw = h * w

    # conv1: 1x1 = one matmul; result goes into the margined scratch
    acc1 = jax.lax.dot_general(
        x_ref[0], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m = _margin(w)
    h1_s[0:m, :] = jnp.zeros((m, acc1.shape[1]), jnp.int8)
    h1_s[m:m + hw, :] = _requant(acc1, v1_ref[0], v1_ref[1])
    h1_s[m + hw:2 * m + hw, :] = jnp.zeros((m, acc1.shape[1]), jnp.int8)

    h2_s[:] = _requant(_conv2_3x3(h1_s, w2_ref, h, w), v2_ref[0], v2_ref[1])

    # conv3 + residual + ReLU + requant, chunked over rows to bound the int32
    # f32 temporaries ([chunk, Cout] each) in VMEM
    lo = 0.0 if relu_out else -127.0
    for c0 in range(0, hw, chunk):
        sl = pl.ds(c0, chunk)
        acc3 = jax.lax.dot_general(
            h2_s[sl, :], w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc3.astype(jnp.float32) * v3_ref[0][None, :] + v3_ref[1][None, :]
        r = x_ref[0, sl, :].astype(jnp.float32) * vr_ref[0][None, :] + vr_ref[1][None, :]
        out_ref[0, sl, :] = jnp.clip(jnp.round(y + r), lo, 127.0).astype(jnp.int8)


def _bottleneck_ds_kernel(
    x_ref, w1_ref, w2_ref, w3_ref, wd_ref,
    v1_ref, v2_ref, v3_ref, vd_ref, vr_ref,
    out_ref, h1_s, h2_s,
    *, h: int, w: int, chunk: int, relu_out: bool,
):
    """Variant with a stride-1 1x1 projection residual (layer1_0): the
    downsample path requantises to int8 first (matching quant.py's graph),
    then dequantises into the add."""
    hw = h * w

    acc1 = jax.lax.dot_general(
        x_ref[0], w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m = _margin(w)
    h1_s[0:m, :] = jnp.zeros((m, acc1.shape[1]), jnp.int8)
    h1_s[m:m + hw, :] = _requant(acc1, v1_ref[0], v1_ref[1])
    h1_s[m + hw:2 * m + hw, :] = jnp.zeros((m, acc1.shape[1]), jnp.int8)

    h2_s[:] = _requant(_conv2_3x3(h1_s, w2_ref, h, w), v2_ref[0], v2_ref[1])

    lo = 0.0 if relu_out else -127.0
    for c0 in range(0, hw, chunk):
        sl = pl.ds(c0, chunk)
        acc3 = jax.lax.dot_general(
            h2_s[sl, :], w3_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc3.astype(jnp.float32) * v3_ref[0][None, :] + v3_ref[1][None, :]
        accd = jax.lax.dot_general(
            x_ref[0, sl, :], wd_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # int8 round-trip with no ReLU, matching the XLA path's downsample
        rd_q = _requant(accd, vd_ref[0], vd_ref[1], relu=False)
        r = rd_q.astype(jnp.float32) * vr_ref[0][None, :] + vr_ref[1][None, :]
        out_ref[0, sl, :] = jnp.clip(jnp.round(y + r), lo, 127.0).astype(jnp.int8)


def fused_bottleneck(x, args, *, h: int, w: int, interpret: bool = False):
    """Run one fused stride-1 int8 bottleneck block.

    x: [N, H*W, Cin] int8. args: dict from :func:`build_bottleneck_args`.
    Returns [N, H*W, Cout] int8.
    """
    n, hw, cin = x.shape
    assert hw == h * w, (hw, h, w)
    w1, w2, w3 = args["w1"], args["w2"], args["w3"]
    cm, cout = w1.shape[1], w3.shape[1]
    chunk = min(hw, max(256, 2 ** 19 // max(cout, 1)))  # ~0.5MB int32 chunks
    while hw % chunk:
        chunk //= 2
    has_ds = "wd" in args

    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    common_in = [
        pl.BlockSpec((1, hw, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        const(cin, cm),
        const(9, cm, cm),
        const(cm, cout),
    ]
    vspecs = [const(2, cm), const(2, cm), const(2, cout), const(2, cout)]
    if has_ds:
        kernel = partial(
            _bottleneck_ds_kernel, h=h, w=w, chunk=chunk, relu_out=True
        )
        in_specs = common_in + [const(cin, cout)] + vspecs[:3] + [const(2, cout), vspecs[3]]
        operands = (
            x, w1, w2, w3, args["wd"],
            args["v1"], args["v2"], args["v3"], args["vd"], args["vr"],
        )
    else:
        kernel = partial(_bottleneck_kernel, h=h, w=w, chunk=chunk, relu_out=True)
        in_specs = common_in + vspecs
        operands = (x, w1, w2, w3, args["v1"], args["v2"], args["v3"], args["vr"])

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hw, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((hw + 2 * _margin(w), cm), jnp.int8),
            pltpu.VMEM((hw, cm), jnp.int8),
        ],
        interpret=interpret,
    )(*operands)


def _bottleneck_kernel_v2(
    x_ref, w1_ref, w2_ref, w3_ref, v1_ref, v2_ref, v3_ref, vr_ref,
    out_ref, h1_s, im_s, h2_s,
    *, h: int, w: int, imgs: int, chunk: int,
):
    """v2: ``imgs`` images per grid step; the 3x3 conv materialises its
    im2col patches [imgs*HW, 9*Cm] in VMEM and runs as ONE MXU matmul
    (contraction 9*Cm=576 at layer1) instead of nine serial [HW, Cm] x
    [Cm, Cm] ops that underfill the 128-wide contraction."""
    hw = h * w
    m = _margin(w)
    cm = w2_ref.shape[-1]
    sec = 2 * m + hw  # per-image section in the margined h1 scratch

    acc1 = jax.lax.dot_general(
        x_ref[...].reshape(imgs * hw, x_ref.shape[-1]), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    q1 = _requant(acc1, v1_ref[0], v1_ref[1])
    for k in range(imgs):
        h1_s[k * sec:k * sec + m, :] = jnp.zeros((m, cm), jnp.int8)
        h1_s[k * sec + m:k * sec + m + hw, :] = q1[k * hw:(k + 1) * hw, :]
        h1_s[k * sec + m + hw:(k + 1) * sec, :] = jnp.zeros((m, cm), jnp.int8)

    cols = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w
    for k in range(imgs):
        for t, (dy, dx) in enumerate(_TAPS):
            base = k * sec + m + dy * w + dx
            tap = h1_s[base:base + hw, :]
            if dx != 0:
                ok = (cols + dx >= 0) & (cols + dx < w)
                tap = jnp.where(ok, tap, jnp.int8(0))
            im_s[k * hw:(k + 1) * hw, t * cm:(t + 1) * cm] = tap
    h2_s[:] = _requant(
        jax.lax.dot_general(
            im_s[:], w2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ),
        v2_ref[0], v2_ref[1],
    )

    for k in range(imgs):
        for c0 in range(0, hw, chunk):
            sl = pl.ds(c0, chunk)
            acc3 = jax.lax.dot_general(
                h2_s[pl.ds(k * hw + c0, chunk), :], w3_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc3.astype(jnp.float32) * v3_ref[0][None, :] + v3_ref[1][None, :]
            r = (x_ref[k, sl, :].astype(jnp.float32) * vr_ref[0][None, :]
                 + vr_ref[1][None, :])
            out_ref[k, sl, :] = jnp.clip(
                jnp.round(y + r), 0.0, 127.0
            ).astype(jnp.int8)


def fused_bottleneck_v2(x, args, *, h: int, w: int, imgs: int = 2,
                        interpret: bool = False):
    """v2 fused block (identity residual only): im2col 3x3 + multi-image
    grid steps. x: [N, H*W, Cin] int8 -> [N, H*W, Cout] int8."""
    n, hw, cin = x.shape
    assert hw == h * w and n % imgs == 0, (n, imgs, hw, h, w)
    w1, w3 = args["w1"], args["w3"]
    cm, cout = w1.shape[1], w3.shape[1]
    w2 = args["w2"].reshape(9 * cm, cm)  # tap-major rows match im2col cols
    chunk = min(hw, max(512, 2 ** 19 // max(cout, 1)))
    while hw % chunk:
        chunk //= 2
    m = _margin(w)

    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_bottleneck_kernel_v2, h=h, w=w, imgs=imgs, chunk=chunk),
        grid=(n // imgs,),
        in_specs=[
            pl.BlockSpec((imgs, hw, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const(cin, cm),
            const(9 * cm, cm),
            const(cm, cout),
            const(2, cm), const(2, cm), const(2, cout), const(2, cout),
        ],
        out_specs=pl.BlockSpec(
            (imgs, hw, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((imgs * (hw + 2 * m), cm), jnp.int8),
            pltpu.VMEM((imgs * hw, 9 * cm), jnp.int8),
            pltpu.VMEM((imgs * hw, cm), jnp.int8),
        ],
        interpret=interpret,
    )(x, w1, w2, w3, args["v1"], args["v2"], args["v3"], args["vr"])


def build_bottleneck_args(qparams, name: str, s_in: float) -> dict:
    """Fold quant.py's per-site scales into kernel-ready packed arguments.

    qparams: the dict from quantize_weights. name: block site prefix, e.g.
    "layer1_1". s_in: the block-input activation scale (= the producing
    site's output scale).
    """
    q = qparams
    ws, b, aw = q["w_scales"], q["biases"], q["weights"]
    s_act = q["act_scales"]

    def f32(a):
        return np.asarray(a, np.float32)

    s1 = float(s_act[f"{name}.conv1.out"])
    s2 = float(s_act[f"{name}.conv2.out"])
    s_out = float(s_act[f"{name}.out"])

    w2 = np.asarray(aw[f"{name}.conv2"])  # [3, 3, Cm, Cm]
    args = {
        "w1": jnp.asarray(np.asarray(aw[f"{name}.conv1"])[0, 0]),  # [Cin, Cm]
        "w2": jnp.asarray(w2.reshape((9,) + w2.shape[2:])),
        "w3": jnp.asarray(np.asarray(aw[f"{name}.conv3"])[0, 0]),
        "v1": jnp.asarray(np.stack([
            s_in * f32(ws[f"{name}.conv1"]) / s1, f32(b[f"{name}.conv1"]) / s1,
        ])),
        "v2": jnp.asarray(np.stack([
            s1 * f32(ws[f"{name}.conv2"]) / s2, f32(b[f"{name}.conv2"]) / s2,
        ])),
        # conv3 result is f32 pre-requant; fold 1/s_out in here and into vr
        "v3": jnp.asarray(np.stack([
            s2 * f32(ws[f"{name}.conv3"]) / s_out, f32(b[f"{name}.conv3"]) / s_out,
        ])),
    }
    cout = args["w3"].shape[1]
    if f"{name}.downsample" in aw:
        sd = float(s_act[f"{name}.downsample.out"])
        args["wd"] = jnp.asarray(np.asarray(aw[f"{name}.downsample"])[0, 0])
        args["vd"] = jnp.asarray(np.stack([
            s_in * f32(ws[f"{name}.downsample"]) / sd,
            f32(b[f"{name}.downsample"]) / sd,
        ]))
        args["vr"] = jnp.asarray(np.stack([
            np.full((cout,), sd / s_out, np.float32), np.zeros((cout,), np.float32),
        ]))
    else:
        args["vr"] = jnp.asarray(np.stack([
            np.full((cout,), s_in / s_out, np.float32),
            np.zeros((cout,), np.float32),
        ]))
    return args
