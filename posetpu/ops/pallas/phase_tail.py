"""Pallas TPU kernel: fused phase-tail (last deconv as 4 phase convs + head).

The phase-packed serving tail (quant._Int8Runner.{subpixel_phases,
final_phase}) is the measured layout winner, but XLA emits its pieces 2-7x
over their HBM rooflines: the four per-phase 2x2 convs re-read the 33.5 MB
deconv input once EACH, the requants round-trip through HBM, and the four
M=16 head dots write padded s32 tiles (device trace, PERF.md). This kernel
runs the whole tail in one VMEM pass per image block:

    x [N, H*W, C] int8  (deconv input, spatial flattened row-major)
      -> 3 column-shifted int8 variants (masked lane rolls, VMEM only)
      -> per phase g=(a,b): 4 aligned row-shifted MXU matmuls accumulate
         the 2x2 conv in int32 (tap (u,v) reads x[i+u-(1-a), j+v-(1-b)])
      -> requant (+ReLU) to int8 in registers
      -> one [C, J] x [4*H*W, C] head matmul per image
      -> f32 heatmaps [J, N, 4*H*W], phase-PACKED, J-major S-minor

so the deconv input is read ONCE from HBM and the only HBM write is the
final heatmap tensor. Row shifts are +-W flat rows = one int8 sublane tile
at W=32 (aligned slices); column shifts are single-row rolls masked at the
row boundary — the padded-scratch misalignment that sank the earlier
ops/pallas/deconv.py kernel never appears.

Bit-exact vs the XLA phase tail: same int8 products, int32 accumulation,
and identical f32 epilogue op order — the folded scale/bias vectors are
computed in f32 so every product rounds once, exactly like the traced
epilogue (tests/test_phase_kernel.py).

Reference semantics: the last ConvTranspose2d(k4, s2, p1) + 1x1 head of
lib/models/pose_resnet.py:149-188, decomposed per output phase.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Route the inner subpixel deconvs through the fully-batched kernel
# variant (one M=nb*hw dot per (phase, tap)). Measured on chip at the
# adopted serving config: 3,010 -> 3,102 f/s same-session A/B (the
# per-image-pair kernel re-streamed deconv0's K=2048 weight slabs 4x per
# block). quant._forward reads this at trace time; the per-pair kernel
# stays for receipts/regression.
SUBPIX_BATCHED = True

# Measured and REJECTED (receipts in PERF.md): batching the two-level
# tail's deconv1 stage across the whole image block (one M=nb*hw dot per
# (phase, tap)) lost 3,160 -> 3,083 f/s on chip — deconv1's M=256 dots
# were not the bottleneck and the per-image dynamic plane slices cost
# more than the batching saved. Bit-exact either way
# (tests/test_phase_kernel.py); kept off.
TAIL2_BATCH_D1 = False

# Share shifted/concatenated dot operands across (phase, tap) combos.
# The 16 deconv2 (phase, tap) pairs index only 9 distinct shifted
# operands (the shift is u-(1-a), v-(1-b) — a difference, not a pair),
# and likewise deconv1; without sharing, the kernel re-rolls, re-masks
# and re-concatenates the same int8 matrices up to 4x. The dots, their
# tap order and the int32 accumulation are unchanged — bit-exact
# (tests/test_phase_kernel.py covers both settings).
TAIL2_SHARE_OPS = True


def _make_shift_helpers(hw: int, w: int, cin: int, interpret: bool,
                        nimg: int = 1):
    """Row/column shift machinery over an [nimg*hw, cin] int8 matrix of
    ``nimg`` row-major [hw, cin] images stacked on the row axis.

    With ``nimg > 1`` every shift is one full-matrix sublane rotate plus a
    positional mask — the circular wrap always lands on a masked position
    (column shifts wrap onto a row-edge column; row shifts wrap onto an
    image-edge row), so per-image slicing never happens and one MXU dot can
    span all ``nimg`` images."""
    tot = nimg * hw
    if interpret:
        rot_rows = lambda x, shift: jnp.roll(x, -shift, 0)
    else:
        def rot_rows(x, shift):
            # Mosaic only rotates 32-bit data: reinterpret 4 int8 lanes as
            # one int32 lane (row content unchanged), rotate, cast back
            xi = pltpu.bitcast(x, jnp.int32)
            return pltpu.bitcast(pltpu.roll(xi, (-shift) % tot, 0), jnp.int8)

    row_j = jax.lax.broadcasted_iota(jnp.int32, (tot, cin), 0) % w
    zero = jnp.zeros((tot, cin), jnp.int8)
    zero_rows = jnp.zeros((w, cin), jnp.int8)

    def col_variants(x):
        # xc[s][r] = x[i, j+s] (zero past the row edge; the circular wrap
        # lands exactly on the masked row)
        return {
            0: x,
            1: jnp.where(row_j != w - 1, rot_rows(x, 1), zero),
            -1: jnp.where(row_j != 0, rot_rows(x, -1), zero),
        }

    if nimg == 1:
        def row_shift(xv, sr):
            # single image: aligned slice + zero block (one sublane tile)
            if sr == -1:  # x rows shift down one image row
                return jnp.concatenate([zero_rows, xv[: hw - w]], axis=0)
            if sr == 1:
                return jnp.concatenate([xv[w:], zero_rows], axis=0)
            return xv
    else:
        row_r = jax.lax.broadcasted_iota(jnp.int32, (tot, cin), 0) % hw

        def row_shift(xv, sr):
            # batched: rotate by one image row and zero the rows that fell
            # off each image's edge (the wrap crosses image boundaries only
            # at masked rows)
            if sr == 1:  # reads x[i+1, :]: last image row becomes zero
                return jnp.where(row_r < hw - w, rot_rows(xv, w), zero)
            if sr == -1:
                return jnp.where(row_r >= w, rot_rows(xv, -w), zero)
            return xv

    return col_variants, row_shift


def _phase_tail_kernel(
    x_ref, w_ref, sv_ref, so_ref, wh_ref, vh_ref, out_ref, z_s,
    *, nb: int, h: int, w: int, cin: int, cout: int, joints: int,
    interpret: bool,
):
    """``nb`` images per grid step. x_ref [nb, H*W, Cin] int8 (a
    leading-axis block of the row-major [N, HW, Cin] operand); w_ref
    [4, 4, Cin, Cout] int8 (phase, tap); sv_ref [2, Cout] f32 (requant
    scale s_in*ws / bias); so_ref [1, 1] f32 (requant output scale);
    wh_ref [Cout, J] int8 head; vh_ref [2, J] f32 (head scale s_out*ws_f /
    bias); out_ref [J, nb, 4*H*W] f32; z_s [4*H*W, Cout] int8 scratch (the
    packed int8 deconv output, reused per image).

    The per-image loop is a fori_loop, NOT a python unroll: unrolling nb=8
    copies of the body (128 dots) measured the kernel 0.83 -> 0.97 ms at
    batch 32 (scheduling/code-size blowup)."""
    hw = h * w
    sv = sv_ref[0]
    bv = sv_ref[1]
    inv_so = 1.0 / so_ref[0, 0]  # matches _quant's reciprocal form exactly
    col_variants, row_shift = _make_shift_helpers(hw, w, cin, interpret)

    def one_image(n, _):
        xc = col_variants(x_ref[n])

        for g, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            acc = jnp.zeros((hw, cout), jnp.int32)
            for t, (u, v) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                sr = u - (1 - a)  # tap reads x[i+sr, j+sc]
                sc = v - (1 - b)
                acc += jax.lax.dot_general(
                    row_shift(xc[sc], sr), w_ref[g, t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            # exact subpixel_phases epilogue: f32 scale+bias, ReLU, /s_out
            zf = acc.astype(jnp.float32) * sv[None, :] + bv[None, :]
            zf = jnp.maximum(zf, 0.0)
            z_s[g * hw:(g + 1) * hw, :] = jnp.clip(
                jnp.round(zf * inv_so), -127, 127
            ).astype(jnp.int8)

        # head: [Cout, J] x [4*hw, Cout] -> [J, 4*hw]; z_s row g*hw + r IS
        # final_phase's stacked-phase (packed) column order
        acc = jax.lax.dot_general(
            wh_ref[:], z_s[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:, n, :] = (
            acc.astype(jnp.float32) * vh_ref[0][:, None]
            + vh_ref[1][:, None]
        )
        return 0

    jax.lax.fori_loop(0, nb, one_image, 0)


def fused_phase_tail(x, args, *, h: int, w: int, interpret: bool = False):
    """x: [N, H*W, Cin] int8 (last-deconv output, row-major) -> f32
    phase-PACKED heatmaps [J, N, 4*H*W] (final_phase's layout).

    Layout notes (all three orientations were measured on v5e, PERF.md):
    demanding [HW, N, Cin] to match the dilated conv's one-time {3,0,2,1}
    output layout just moved the layout copy elsewhere — XLA's layout
    assignment re-converged with the conv emitting row-major and a BIGGER
    copy in front of the kernel (2.35 ms/10-iter). Plain row-major
    [N, HW, Cin] with nb=8 images per leading-axis block is the stable
    choice: per-image DMAs are fully contiguous 256 KB runs.
    ``args`` from :func:`build_phase_tail_args`."""
    n, hw, cin = x.shape
    assert hw == h * w and h % 2 == 0 and w % 2 == 0
    nb = 8 if n % 8 == 0 else 1
    pad = 0
    if nb == 1 and not interpret:
        # Mosaic forbids a middle-axis output block of 1 unless it equals
        # the array dim — pad odd batches up to the 8-image block
        pad = (-n) % 8
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, hw, cin), x.dtype)], axis=0)
            n, nb = n + pad, 8
        else:
            nb = 8
    wp, sv, so, wh, vh = (args["w"], args["sv"], args["so"], args["wh"],
                          args["vh"])
    cout, joints = wh.shape

    const = lambda *s: pl.BlockSpec(
        s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_phase_tail_kernel, nb=nb, h=h, w=w, cin=cin, cout=cout,
                joints=joints, interpret=interpret),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(4, 4, cin, cout),
            const(2, cout),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            const(cout, joints),
            const(2, joints),
        ],
        out_specs=pl.BlockSpec((joints, nb, 4 * hw), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((joints, n, 4 * hw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * hw, cout), jnp.int8)],
        interpret=interpret,
    )(x, wp, sv, so, wh, vh)
    return out[:, :n - pad] if pad else out


def _phase_tail2_kernel(
    x_ref, w1_ref, s1_ref, so1_ref, w2_ref, s2_ref, so2_ref, wh_ref,
    vh_ref, out_ref, z1_s, z2_s,
    *, nb: int, h: int, w: int, cin: int, cmid: int, cout: int,
    joints: int, interpret: bool, batch_d1: bool = False,
    share_ops: bool = False,
):
    """Two-level fused tail: deconv1's four phase planes AND deconv2's
    phase convs AND the 1x1 head, all in one VMEM pass per image — the
    32x32 intermediate never exists in HBM (neither does its interleave:
    deconv2's taps read deconv1's planes directly via the parity
    decomposition below).

    x_ref [nb, H*W, Cin] int8 = deconv1's INPUT (deconv0's interleaved
    output, 16x16 row-major); w1/w2 [4, 4, C, C'] int8 phase-tap packs;
    s1/s2 [2, C'] f32 (requant scale s_in*ws / bias); so1/so2 [1, 1] f32;
    wh [Cout, J] int8 head; vh [2, J] f32; out_ref [J, nb, 16*H*W] f32 in
    the TWO-level packing of ops/heatmap.phase_index_tables(levels=2);
    z1_s [4*hw, Cmid] / z2_s [16*hw, Cout] int8 scratch.

    Parity decomposition: deconv2's tap (u, v) for phase (a2, b2) at the
    virtual 32x32 position (2i+al, 2j+be) reads the virtual image at
    r = 2i + al + sr (sr = u-(1-a2)) — i.e. deconv1's phase plane
    pa = (al+sr) & 1 at row i + (al+sr-pa)/2, and likewise for columns.
    All plane selections and +-1 shifts are static; row/column zero
    boundaries coincide exactly with the virtual image's edges."""
    hw = h * w
    sv1, bv1 = s1_ref[0], s1_ref[1]
    inv_so1 = 1.0 / so1_ref[0, 0]
    sv2, bv2 = s2_ref[0], s2_ref[1]
    inv_so2 = 1.0 / so2_ref[0, 0]
    col_variants, row_shift = _make_shift_helpers(hw, w, cin, interpret)
    col_variants2, row_shift2 = _make_shift_helpers(hw, w, cmid, interpret)
    phases = ((0, 0), (0, 1), (1, 0), (1, 1))

    if batch_d1:
        # deconv1 batched across the whole image block: one M=nb*hw dot per
        # (phase, tap) — weight slabs stream once per block and the four
        # big epilogues replace 4*nb small ones. z1_s is [4, nb*hw, cmid]
        # (plane-major, image-major rows); deconv2 below slices per image.
        colb, rowb = _make_shift_helpers(hw, w, cin, interpret, nimg=nb)
        xc = colb(x_ref[:].reshape(nb * hw, cin))
        for g, (a, b) in enumerate(phases):
            acc = jnp.zeros((nb * hw, cmid), jnp.int32)
            for t, (u, v) in enumerate(phases):
                acc += jax.lax.dot_general(
                    rowb(xc[v - (1 - b)], u - (1 - a)), w1_ref[g, t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            zf = acc.astype(jnp.float32) * sv1[None, :] + bv1[None, :]
            zf = jnp.maximum(zf, 0.0)
            z1_s[g] = jnp.clip(
                jnp.round(zf * inv_so1), -127, 127
            ).astype(jnp.int8)

    def one_image(n, _):
        if not batch_d1:
            xc = col_variants(x_ref[n])
            xv1 = {}  # (sr, sc) -> shifted operand; 16 (phase, tap) combos
                      # index only 9 distinct shifts

            def xvar1(sr, sc):
                if (sr, sc) not in xv1 or not share_ops:
                    xv1[(sr, sc)] = row_shift(xc[sc], sr)
                return xv1[(sr, sc)]

            # deconv1: four phase planes, requantized (bit-exact vs the
            # dilated-conv + requant XLA path)
            for g, (a, b) in enumerate(phases):
                acc = jnp.zeros((hw, cmid), jnp.int32)
                for t, (u, v) in enumerate(phases):
                    acc += jax.lax.dot_general(
                        xvar1(u - (1 - a), v - (1 - b)), w1_ref[g, t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                zf = acc.astype(jnp.float32) * sv1[None, :] + bv1[None, :]
                zf = jnp.maximum(zf, 0.0)
                z1_s[g * hw:(g + 1) * hw, :] = jnp.clip(
                    jnp.round(zf * inv_so1), -127, 127
                ).astype(jnp.int8)

        # column variants of each deconv1 plane, computed once
        plane = (
            (lambda p: z1_s[p, pl.ds(n * hw, hw), :]) if batch_d1
            else (lambda p: z1_s[p * hw:(p + 1) * hw, :])
        )
        pv = {
            (pa, pb): col_variants2(plane(pa * 2 + pb))
            for pa in range(2) for pb in range(2)
        }

        # deconv2 phases, split by the parity of the virtual position; the
        # four parity variants CONCATENATE into one M=4*hw dot per tap
        # (separate M=hw dots per parity measured the kernel MXU-underfed).
        # The operand depends on (phase, tap) only through the DIFFERENCE
        # (u-(1-a2), v-(1-b2)) — 9 distinct operands for 16 dots; memoised
        # when share_ops (xop), as are the underlying plane shifts (var2).
        v2cache, xcache = {}, {}

        def var2(pa, pb, cs, rs):
            k = (pa, pb, cs, rs)
            if k not in v2cache or not share_ops:
                v2cache[k] = row_shift2(pv[(pa, pb)][cs], rs)
            return v2cache[k]

        def xop(sr, sc):
            if (sr, sc) not in xcache or not share_ops:
                parts = []
                for par, (al, be) in enumerate(phases):
                    ra, rc = al + sr, be + sc
                    pa, pb = ra & 1, rc & 1
                    parts.append(var2(pa, pb, (rc - pb) // 2,
                                      (ra - pa) // 2))
                xcache[(sr, sc)] = jnp.concatenate(parts, axis=0)
            return xcache[(sr, sc)]

        for g2, (a2, b2) in enumerate(phases):
            acc = jnp.zeros((4 * hw, cout), jnp.int32)
            for t, (u, v) in enumerate(phases):
                acc += jax.lax.dot_general(
                    xop(u - (1 - a2), v - (1 - b2)), w2_ref[g2, t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            zf = acc.astype(jnp.float32) * sv2[None, :] + bv2[None, :]
            zf = jnp.maximum(zf, 0.0)
            z2_s[g2 * 4 * hw:(g2 + 1) * 4 * hw, :] = jnp.clip(
                jnp.round(zf * inv_so2), -127, 127
            ).astype(jnp.int8)

        acc = jax.lax.dot_general(
            wh_ref[:], z2_s[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:, n, :] = (
            acc.astype(jnp.float32) * vh_ref[0][:, None]
            + vh_ref[1][:, None]
        )
        return 0

    jax.lax.fori_loop(0, nb, one_image, 0)


def fused_phase_tail2(x, args, *, h: int, w: int, interpret: bool = False):
    """x: [N, H*W, Cin] int8 (deconv1's input = deconv0's interleaved
    output, 16x16 row-major) -> f32 TWO-level phase-packed heatmaps
    [J, N, 16*H*W] (phase_index_tables(levels=2) order).

    Folds deconv1 + deconv2 + head into one kernel: kills the dilated
    deconv1 conv, its 33.5 MB HBM round-trip AND the layout copy that XLA
    pinned in front of the single-level kernel (device trace, PERF.md).
    ``args`` from :func:`build_phase_tail2_args`."""
    n, hw, cin = x.shape
    assert hw == h * w and h % 2 == 0 and w % 2 == 0
    nb = 8 if n % 8 == 0 else 1
    pad = 0
    if nb == 1 and not interpret:
        pad = (-n) % 8
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, hw, cin), x.dtype)], axis=0)
        n, nb = n + pad, 8
    cmid = args["w1"].shape[-1]
    cout, joints = args["wh"].shape

    batch_d1 = TAIL2_BATCH_D1
    const = lambda *s: pl.BlockSpec(
        s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        partial(_phase_tail2_kernel, nb=nb, h=h, w=w, cin=cin, cmid=cmid,
                cout=cout, joints=joints, interpret=interpret,
                batch_d1=batch_d1, share_ops=TAIL2_SHARE_OPS),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(4, 4, cin, cmid),
            const(2, cmid),
            smem(),
            const(4, 4, cmid, cout),
            const(2, cout),
            smem(),
            const(cout, joints),
            const(2, joints),
        ],
        out_specs=pl.BlockSpec((joints, nb, 16 * hw), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((joints, n, 16 * hw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, nb * hw, cmid), jnp.int8)
                        if batch_d1 else
                        pltpu.VMEM((4 * hw, cmid), jnp.int8),
                        pltpu.VMEM((16 * hw, cout), jnp.int8)],
        interpret=interpret,
    )(x, args["w1"], args["s1"], args["so1"], args["w2"], args["s2"],
      args["so2"], args["wh"], args["vh"])
    return out[:, :n - pad] if pad else out


def _pack_phase_taps(wq):
    """[4, 4, I, O] deconv kernel -> [4 phase, 4 tap, I, O]: phase g=(a,b)
    tap t=(u,v) is wq[a::2, b::2][u, v] (quant.subpixel_phases order)."""
    return np.stack([
        np.stack([wq[a::2, b::2][u, v] for u in range(2) for v in range(2)])
        for a in range(2) for b in range(2)
    ])


def build_phase_tail2_args(qparams, name1: str, name2: str,
                           s_in: float) -> dict:
    """Pack deconv1 (``name1``), deconv2 (``name2``) and the head for
    :func:`fused_phase_tail2` (host-folded single-rounded f32 scale
    products, exactly like the traced epilogues')."""
    q = qparams
    wq1 = np.asarray(q["weights"][name1])
    wq2 = np.asarray(q["weights"][name2])
    assert wq1.shape[:2] == (4, 4) and wq2.shape[:2] == (4, 4)
    ws1 = np.asarray(q["w_scales"][name1], np.float32)
    ws2 = np.asarray(q["w_scales"][name2], np.float32)
    b1 = np.asarray(q["biases"][name1], np.float32)
    b2 = np.asarray(q["biases"][name2], np.float32)
    so1 = np.float32(q["act_scales"][f"{name1}.out"])
    so2 = np.float32(q["act_scales"][f"{name2}.out"])
    wh = np.asarray(q["weights"]["final"])[0, 0]
    ws_f = np.asarray(q["w_scales"]["final"], np.float32)
    bias_f = np.asarray(q["biases"]["final"], np.float32)
    return {
        "w1": jnp.asarray(_pack_phase_taps(wq1)),
        "s1": jnp.asarray(np.stack([np.float32(s_in) * ws1, b1])),
        "so1": jnp.asarray([[so1]], dtype=jnp.float32),
        "w2": jnp.asarray(_pack_phase_taps(wq2)),
        "s2": jnp.asarray(np.stack([so1 * ws2, b2])),
        "so2": jnp.asarray([[so2]], dtype=jnp.float32),
        "wh": jnp.asarray(wh),
        "vh": jnp.asarray(np.stack([so2 * ws_f, bias_f])),
    }


def _subpixel_deconv_kernel(
    x_ref, w_ref, sv_ref, bv_ref, so_ref, out_ref,
    *, nb: int, h: int, w: int, cin: int, cout: int, interpret: bool,
):
    """Head-less phase kernel for an INNER k4/s2 deconv (e.g. deconv0):
    the four per-phase 2x2 convs + requant(+ReLU) in one VMEM pass.
    ``nb`` images per grid step. x_ref [nb, H*W, Cin] int8 (leading-axis
    block of the row-major [N, HW, Cin] operand); w_ref [4, 4, Cin, Cout]
    int8 (phase, tap — see build_subpixel_deconv_args); sv_ref/bv_ref
    [4, Cout] f32 PER-PHASE requant scale (s_in*ws[g]) / bias (the XLA
    subpixel path quantizes the [2,2,I,4O] form with per-(phase, channel)
    scales, quant.qchain subpixel=True); so_ref [1, 1] f32; out_ref
    [4*H*W, nb*Cout] int8 phase-packed (row g*hw + r), lane-slice of
    [4*H*W, N*Cout]."""
    hw = h * w
    inv_so = 1.0 / so_ref[0, 0]
    col_variants, row_shift = _make_shift_helpers(hw, w, cin, interpret)
    # pair images per dot: at deconv0's 8x8 the per-image M=64 underfills
    # the MXU; two per-image-shifted operands CONCATENATE into one M=128
    # dot (shifts/masks are per-image and applied before the concat)
    pair = 2 if nb % 2 == 0 else 1

    for k in range(0, nb, pair):
        xcs = [col_variants(x_ref[k + i]) for i in range(pair)]
        for g, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            acc = jnp.zeros((pair * hw, cout), jnp.int32)
            for t, (u, v) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                sr = u - (1 - a)
                sc = v - (1 - b)
                xv = jnp.concatenate(
                    [row_shift(xc[sc], sr) for xc in xcs], axis=0)
                acc += jax.lax.dot_general(
                    xv, w_ref[g, t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            zf = (acc.astype(jnp.float32) * sv_ref[g][None, :]
                  + bv_ref[g][None, :])
            zf = jnp.maximum(zf, 0.0)
            zq = jnp.clip(jnp.round(zf * inv_so), -127, 127).astype(jnp.int8)
            for i in range(pair):
                out_ref[g * hw:(g + 1) * hw,
                        (k + i) * cout:(k + i + 1) * cout] = (
                    zq[i * hw:(i + 1) * hw]
                )


def fused_subpixel_deconv(x, args, *, h: int, w: int,
                          interpret: bool = False):
    """x: [N, H*W, Cin] int8 (deconv input, row-major — leading-axis
    nb-image blocks, fully contiguous DMAs) -> int8 phase maps
    [4, H, W, N, Cout] (phase (a, b) major), requantized.

    The caller interleaves the tiny phase tensor to [N, 2H, 2W, Cout]
    row-major (a cheap XLA transpose at deconv0's 16x16 scale) before the
    next stage. ``args`` from :func:`build_subpixel_deconv_args`.

    Bit-exact vs quant.qchain(subpixel=True): same int8 products and int32
    sums per phase window (the XLA path's single padded conv computes
    exactly these per-window accumulations), identical f32 epilogue order
    (tests/test_phase_kernel.py)."""
    n, hw, cin = x.shape
    assert hw == h * w
    nb = 8 if n % 8 == 0 else 1
    wp, sv, bv, so = args["w"], args["sv"], args["bv"], args["so"]
    cout = wp.shape[-1]

    const = lambda *s: pl.BlockSpec(
        s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_subpixel_deconv_kernel, nb=nb, h=h, w=w, cin=cin,
                cout=cout, interpret=interpret),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(4, 4, cin, cout),
            const(4, cout),
            const(4, cout),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4 * hw, nb * cout), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * hw, n * cout), jnp.int8),
        interpret=interpret,
    )(x, wp, sv, bv, so)
    return out.reshape(4, h, w, n, cout)


def _subpixel_deconv_kernel_batched(
    x_ref, w_ref, sv_ref, bv_ref, so_ref, out_ref,
    *, nb: int, h: int, w: int, cin: int, cout: int, interpret: bool,
):
    """Fully-batched subpixel deconv: ONE M=nb*H*W dot per (phase, tap), so
    each [Cin, Cout] weight slab streams from VMEM to the MXU once per
    block (the per-image-pair form re-streamed all 16 slabs nb/2 times —
    at deconv0's K=2048 that re-streaming is the measured bottleneck).
    Shifts become full-matrix rotates with positional masks
    (_make_shift_helpers nimg=nb). out_ref [4, nb, H*W, Cout] int8."""
    hw = h * w
    inv_so = 1.0 / so_ref[0, 0]
    col_variants, row_shift = _make_shift_helpers(
        hw, w, cin, interpret, nimg=nb)

    xall = x_ref[:].reshape(nb * hw, cin)
    xc = col_variants(xall)
    xv = {}  # 16 (phase, tap) combos index only 9 distinct (sr, sc) shifts

    def xvar(sr, sc):
        if (sr, sc) not in xv or not TAIL2_SHARE_OPS:
            xv[(sr, sc)] = row_shift(xc[sc], sr)
        return xv[(sr, sc)]

    for g, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        acc = jnp.zeros((nb * hw, cout), jnp.int32)
        for t, (u, v) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            acc += jax.lax.dot_general(
                xvar(u - (1 - a), v - (1 - b)), w_ref[g, t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        zf = (acc.astype(jnp.float32) * sv_ref[g][None, :]
              + bv_ref[g][None, :])
        zf = jnp.maximum(zf, 0.0)
        out_ref[g] = jnp.clip(
            jnp.round(zf * inv_so), -127, 127
        ).astype(jnp.int8).reshape(nb, hw, cout)


def fused_subpixel_deconv_batched(x, args, *, h: int, w: int,
                                  interpret: bool = False):
    """Batched-dot twin of :func:`fused_subpixel_deconv`: x [N, H*W, Cin]
    int8 -> int8 phase maps [4, N, H, W, Cout] (phase major, image-major
    rows). Same int8 products / int32 sums / f32 epilogue order as the
    per-pair kernel — bit-exact vs quant.qchain(subpixel=True)
    (tests/test_phase_kernel.py)."""
    n, hw, cin = x.shape
    assert hw == h * w
    nb = 8
    pad = (-n) % nb
    if pad:  # Mosaic forbids a middle-axis output block < the array dim
        x = jnp.concatenate([x, jnp.zeros((pad, hw, cin), x.dtype)], axis=0)
        n += pad
    wp, sv, bv, so = args["w"], args["sv"], args["bv"], args["so"]
    cout = wp.shape[-1]

    const = lambda *s: pl.BlockSpec(
        s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_subpixel_deconv_kernel_batched, nb=nb, h=h, w=w, cin=cin,
                cout=cout, interpret=interpret),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(4, 4, cin, cout),
            const(4, cout),
            const(4, cout),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, nb, hw, cout), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n, hw, cout), jnp.int8),
        interpret=interpret,
    )(x, wp, sv, bv, so)
    if pad:
        out = out[:, :n - pad]
    return out.reshape(4, n - pad if pad else n, h, w, cout)


def subpixel_interleave_packed_nmajor(z):
    """[4, N, H, W, Cout] phase maps ((a, b) major, image-major) ->
    [N, 2H, 2W, Cout] depth-to-space (fused_subpixel_deconv_batched's
    output contract)."""
    _, n, h, w, cout = z.shape
    y = z.reshape(2, 2, n, h, w, cout)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))  # [N, H, 2, W, 2, Cout]
    return y.reshape(n, 2 * h, 2 * w, cout)


def subpixel_interleave_packed(z):
    """[4, H, W, N, Cout] phase maps ((a, b) major) -> [N, 2H, 2W, Cout]
    depth-to-space, XLA-side (tiny tensor at inner-deconv scales)."""
    _, h, w, n, cout = z.shape
    y = z.reshape(2, 2, h, w, n, cout)
    y = jnp.transpose(y, (4, 2, 0, 3, 1, 5))  # [N, H, 2, W, 2, Cout]
    return y.reshape(n, 2 * h, 2 * w, cout)


def build_subpixel_deconv_args(qparams, name: str, s_in: float) -> dict:
    """Pack an inner subpixel deconv's quantized weights for
    :func:`fused_subpixel_deconv` (host floats — single-rounded f32 folded
    products, exactly like the traced epilogue's ``s_h * ws``).

    The layer's weights are stored in the [2, 2, I, 4*O] subpixel form with
    per-(phase, out-channel) scales ws [4*O] (quantize_weights with
    subpixel_deconvs covering ``name``); phase g reads taps wq[u, v, :,
    g*O:(g+1)*O]."""
    q = qparams
    wq = np.asarray(q["weights"][name])  # [2, 2, I, 4*O] int8
    assert wq.shape[0] == 2 and wq.shape[1] == 2, wq.shape
    o4 = wq.shape[-1]
    assert o4 % 4 == 0
    o = o4 // 4
    ws = np.asarray(q["w_scales"][name], np.float32)  # [4*O]
    b = np.asarray(q["biases"][name], np.float32)  # [O]
    s_in32 = np.float32(s_in)
    s_out = np.float32(q["act_scales"][f"{name}.out"])
    # [4 phase, 4 tap, I, O]: phase g slices channels g*O:(g+1)*O of every tap
    wp = np.stack([
        np.stack([wq[u, v, :, g * o:(g + 1) * o]
                  for u in range(2) for v in range(2)])
        for g in range(4)
    ])
    sv = np.stack([s_in32 * ws[g * o:(g + 1) * o] for g in range(4)])
    return {
        "w": jnp.asarray(wp),
        "sv": jnp.asarray(sv),
        "bv": jnp.asarray(np.broadcast_to(b, (4, o)).copy()),
        "so": jnp.asarray([[s_out]], dtype=jnp.float32),
    }


def build_phase_tail_args(qparams, name: str, s_in: float) -> dict:
    """Pack the last deconv's quantized weights + the final head for the
    fused kernel, OUTSIDE the jit (host floats, so the folded products are
    single-rounded f32 like the traced epilogue's).

    Phase/tap order matches quant.subpixel_phases exactly: phase g=(a,b)
    tap t=(u,v) is wq[a::2, b::2][u, v]."""
    q = qparams
    wq = np.asarray(q["weights"][name])  # [4, 4, I, O] int8
    assert wq.shape[0] == 4 and wq.shape[1] == 4, wq.shape
    ws = np.asarray(q["w_scales"][name], np.float32)  # [O]
    b = np.asarray(q["biases"][name], np.float32)
    s_in32 = np.float32(s_in)
    s_out = np.float32(q["act_scales"][f"{name}.out"])
    wp = np.stack([
        np.stack([wq[a::2, bb::2][u, v] for u in range(2) for v in range(2)])
        for a in range(2) for bb in range(2)
    ])  # [4 phase, 4 tap, I, O]

    wh = np.asarray(q["weights"]["final"])[0, 0]  # [O, J] int8
    ws_f = np.asarray(q["w_scales"]["final"], np.float32)
    bias_f = np.asarray(q["biases"]["final"], np.float32)
    return {
        "w": jnp.asarray(wp),
        "sv": jnp.asarray(np.stack([s_in32 * ws, b.astype(np.float32)])),
        "so": jnp.asarray([[s_out]], dtype=jnp.float32),
        "wh": jnp.asarray(wh),
        "vh": jnp.asarray(np.stack([s_out * ws_f, bias_f.astype(np.float32)])),
    }
