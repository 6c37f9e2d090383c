"""Pallas TPU kernel: fused int8 subpixel transposed-conv (+ optional head).

The reference upsamples with three ConvTranspose2d(k4, s2, p1) layers
(lib/models/pose_resnet.py:149-188). XLA's input-dilated int8 conv wastes
3/4 of its MACs on the dilation zeros, and the subpixel decomposition in
quant.py pays the win back in depth-to-space data movement (PERF.md). This
kernel keeps everything in VMEM per image:

    pad(x) -> 2x2 phase conv (4 MXU matmuls, 4x fewer MACs than dilated)
    -> requantise (+ReLU) to int8 -> depth-to-space interleave in registers
    -> [optionally] the 1x1 head matmul -> f32 heatmaps

so a deconv costs ONE input read + ONE output write, and fusing the head
into the last deconv removes the largest intermediate (the [N, 64, 64, 256]
tensor) from HBM entirely.

Math matches quant.py's subpixel path (subpixel_deconv_weights /
_subpixel_interleave): with Wf the pre-flipped [4,4,I,O] kernel, output
y[2i+a, 2j+b] = sum_{u,v in {0,1}} Wf[a+2u, b+2v] . x[i+a-1+u, j+b-1+v].
Reference cited for semantics: lib/models/pose_resnet.py:149-188.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _deconv_kernel(
    x_ref, w_ref, v_ref, out_ref, xp_s, zq_s,
    *, h: int, w: int, cin: int, cout: int, chunk: int,
):
    """One image: x_ref [1, H*W, Cin] int8 -> out_ref [1, 4*H*W, Cout] int8.

    xp_s: [(H+2)*(W+2) + W + 10, Cin] int8 padded-image scratch (tail rows
    stay zero so the static tap slices never read junk).
    zq_s: [(H+2)*(W+2), 4*Cout] int8 phase-map scratch (rows beyond the
    (H+1, W+1) conv grid are never read).
    """
    p = w + 2
    pp = (h + 2) * p

    # zero-fill the border once, then paste the image rows
    xp_s[:] = jnp.zeros((pp + p + 8, cin), jnp.int8)
    for i in range(h):
        xp_s[pl.ds((i + 1) * p + 1, w), :] = x_ref[0, pl.ds(i * w, w), :]

    # 2x2 phase conv: 4 taps, no masks — the padded border guarantees the
    # rows we later consume never read wrapped data
    for c0 in range(0, pp, chunk):
        cs = min(chunk, pp - c0)
        acc = jnp.zeros((cs, 4 * cout), jnp.int32)
        for t, (u, v) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            k = u * p + v
            acc += jax.lax.dot_general(
                xp_s[c0 + k:c0 + k + cs, :], w_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        y = acc.astype(jnp.float32) * v_ref[0][None, :] + v_ref[1][None, :]
        zq_s[c0:c0 + cs, :] = jnp.clip(
            jnp.round(y), 0.0, 127.0
        ).astype(jnp.int8)  # deconv BN+ReLU -> clip floor 0

    # depth-to-space: y[2i+a, 2j+b, :] = z[i+a, j+b, group(a, b)]
    z = zq_s[:].reshape(h + 2, p, 4, cout)
    phases = [
        [z[a:h + a, b:w + b, 2 * a + b, :] for b in range(2)] for a in range(2)
    ]
    rows = jnp.stack(
        [jnp.stack(pa, axis=2) for pa in phases], axis=1
    )  # [H, 2(a), W, 2(b), Cout]
    out_ref[0] = rows.reshape(4 * h * w, cout)


def _deconv_head_kernel(
    x_ref, w_ref, v_ref, wh_ref, vh_ref, out_ref, xp_s, zq_s,
    *, h: int, w: int, cin: int, cout: int, joints: int, chunk: int,
):
    """Last deconv + 1x1 head fused: emits f32 heatmaps [1, 4*H*W, J]."""
    p = w + 2
    pp = (h + 2) * p

    xp_s[:] = jnp.zeros((pp + p + 8, cin), jnp.int8)
    for i in range(h):
        xp_s[pl.ds((i + 1) * p + 1, w), :] = x_ref[0, pl.ds(i * w, w), :]

    for c0 in range(0, pp, chunk):
        cs = min(chunk, pp - c0)
        acc = jnp.zeros((cs, 4 * cout), jnp.int32)
        for t, (u, v) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            k = u * p + v
            acc += jax.lax.dot_general(
                xp_s[c0 + k:c0 + k + cs, :], w_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        y = acc.astype(jnp.float32) * v_ref[0][None, :] + v_ref[1][None, :]
        zq_s[c0:c0 + cs, :] = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)

    z = zq_s[:].reshape(h + 2, p, 4, cout)
    phases = [
        [z[a:h + a, b:w + b, 2 * a + b, :] for b in range(2)] for a in range(2)
    ]
    rows = jnp.stack([jnp.stack(pa, axis=2) for pa in phases], axis=1)
    yq = rows.reshape(4 * h * w, cout)  # int8 deconv output, never hits HBM

    acc = jax.lax.dot_general(
        yq, wh_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[0] = acc.astype(jnp.float32) * vh_ref[0][None, :] + vh_ref[1][None, :]


def fused_subpixel_deconv(x, args, *, h: int, w: int, interpret: bool = False):
    """x: [N, H*W, Cin] int8 -> [N, 4*H*W, Cout] int8 (2x upsample)."""
    n, hw, cin = x.shape
    w_phase, v = args["w"], args["v"]
    cout = w_phase.shape[-1] // 4
    pp = (h + 2) * (w + 2)
    chunk = min(pp, 512)

    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_deconv_kernel, h=h, w=w, cin=cin, cout=cout, chunk=chunk),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const(4, cin, 4 * cout),
            const(2, 4 * cout),
        ],
        out_specs=pl.BlockSpec(
            (1, 4 * hw, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 4 * hw, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((pp + w + 10, cin), jnp.int8),
            pltpu.VMEM((pp, 4 * cout), jnp.int8),
        ],
        interpret=interpret,
    )(x, w_phase, v)


def fused_subpixel_deconv_head(x, args, *, h: int, w: int, interpret: bool = False):
    """Last deconv fused with the 1x1 head: [N, H*W, Cin] int8 ->
    f32 heatmaps [N, 4*H*W, J]."""
    n, hw, cin = x.shape
    w_phase, v = args["w"], args["v"]
    wh, vh = args["wh"], args["vh"]
    cout = w_phase.shape[-1] // 4
    joints = wh.shape[-1]
    pp = (h + 2) * (w + 2)
    chunk = min(pp, 512)

    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(
            _deconv_head_kernel,
            h=h, w=w, cin=cin, cout=cout, joints=joints, chunk=chunk,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const(4, cin, 4 * cout),
            const(2, 4 * cout),
            const(cout, joints),
            const(2, joints),
        ],
        out_specs=pl.BlockSpec(
            (1, 4 * hw, joints), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 4 * hw, joints), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((pp + w + 10, cin), jnp.int8),
            pltpu.VMEM((pp, 4 * cout), jnp.int8),
        ],
        interpret=interpret,
    )(x, w_phase, v, wh, vh)


def build_deconv_args(qparams, name: str, s_in: float) -> dict:
    """Pack phase-bank weights + folded requant vectors for one deconv.

    The phase ordering matches quant.subpixel_deconv_weights; biases tile x4
    like quant.py's subpixel branch; the output scale folds into the requant.
    """
    from posetpu.models.quant import subpixel_deconv_weights

    q = qparams
    w = np.asarray(q["weights"][name])
    ws = np.asarray(q["w_scales"][name], np.float32)
    if w.shape[0] == 4:
        # stored un-decomposed [4, 4, I, O]: the phase split is an exact
        # int8 rearrangement; per-O scales tile across the 4 phase groups
        w = subpixel_deconv_weights(w)  # [2, 2, I, 4O]
        ws = np.tile(ws, 4)
    assert w.shape[0] == 2 and w.shape[1] == 2, w.shape
    b = np.asarray(q["biases"][name], np.float32)  # [O]
    s_out = float(q["act_scales"][f"{name}.out"])
    scale = s_in * ws / s_out
    bias = np.tile(b, 4) / s_out
    return {
        "w": jnp.asarray(w.reshape(4, w.shape[2], w.shape[3])),  # [4tap, I, 4O]
        "v": jnp.asarray(np.stack([scale.astype(np.float32), bias.astype(np.float32)])),
    }


def build_head_args(qparams, s_in: float) -> dict:
    """1x1 final head folded for the fused deconv+head kernel."""
    q = qparams
    w = np.asarray(q["weights"]["final"])[0, 0]  # [C, J]
    ws = np.asarray(q["w_scales"]["final"], np.float32)
    b = np.asarray(q["biases"]["final"], np.float32)
    return {
        "wh": jnp.asarray(w),
        "vh": jnp.asarray(np.stack([(s_in * ws).astype(np.float32), b.astype(np.float32)])),
    }
