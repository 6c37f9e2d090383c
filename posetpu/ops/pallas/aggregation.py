"""Pallas TPU kernel: grouped int8 aggregation fusion, weight-stream bound.

The cross-view aggregation (reference: the 12 ChannelWiseFC matmuls of
lib/models/multiview_pose_resnet.py:16-58) is served as the grouped int8
dot of quant.aggregation_int8_apply_jns_grouped: for each target view t,
fused[t] = (1/3) * sum_p  x[src(t, p)] @ wq[t, p]  over its 3 source
views, with the [4, 3, S, S] int8 bank (201 MB at S=4096) streamed from
HBM once per step.

STATUS: ADOPTED (round 3) — the default in posetpu.serving
(build_serving_pipeline(aggre_kernel=True)). Measured same-session A/B at
the adopted serving config (tools/ab_agg_kernel.py, rtt 29.1 ms):
XLA grouped dot 3,223.8 -> kernel **3,288.8** 4-view frames/s. History:
round 2 called the XLA chain compute-bound (0.61 ms vs 0.56 ms int8 peak
for 103 GMAC) and shelved the kernel unlaunched; round 3 fixed its sv
BlockSpec (a [1, BS] block violates the TPU (8,128) tiling rule — the
kernel had only ever run in interpret mode) and the A/B showed the
gathered 3x-duplicated operand's materialization was NOT free: removing
it + overlapping the source DMAs recovers ~0.06 ms/iter.

What the kernel does:

  - the quantized heatmaps xq [V, J*N, S] int8 stay in HBM (ANY memory);
    each target's 3 source planes are DMAd into VMEM scratch ONCE per
    target (at the first S-block step) — 24 MB total instead of a 25 MB
    materialised gather plus its re-read;
  - the weight bank streams through the normal Pallas pipeline in
    [3, S, BS] blocks, double-buffered, overlapping the MXU dots;
  - the 3-source mean stays folded in the MXU accumulator (int32-exact),
    and the epilogue applies the same single pre-folded f32 scale
    ((x_scale/3) * w_scale) as the XLA path — bit-exact
    (tests/test_aggregation_kernel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _agg_kernel(x_hbm, w_ref, sv_ref, out_ref, xs0, xs1, xs2, sem,
                *, n_jb: int, jn: int, s: int, interpret: bool):
    """Grid (t, jb), jb fastest. x_hbm [V, JN, S] int8 (ANY); w_ref
    [1, 3, S, BS] int8 (target t's bank, S-block jb); sv_ref [4, BS] f32
    (pre-folded (x_scale/3)*w_scale blocks, all targets — a [1, BS] block
    violates the TPU (8, 128) block-tiling rule, so the full 4-row axis
    rides along and the kernel slices row t); out_ref [1, JN, BS] f32;
    xs0..xs2 [JN, S] int8 VMEM scratch (the 3 source planes, persistent
    across the S-block steps of one target); sem DMA semaphores [3]."""
    t = pl.program_id(0)
    jb = pl.program_id(1)
    scratch = (xs0, xs1, xs2)

    @pl.when(jb == 0)
    def _load_sources():
        # source views of target t: {0..3} \ {t} in ascending order
        for p in range(3):
            sv = jnp.where(t > p, p, p + 1)
            copy = pltpu.make_async_copy(x_hbm.at[sv], scratch[p], sem.at[p])
            copy.start()
        for p in range(3):
            sv = jnp.where(t > p, p, p + 1)
            pltpu.make_async_copy(x_hbm.at[sv], scratch[p], sem.at[p]).wait()

    acc = jnp.zeros((jn, out_ref.shape[-1]), jnp.int32)
    for p in range(3):
        acc += jax.lax.dot_general(
            scratch[p][:], w_ref[0, p],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out_ref[0] = acc.astype(jnp.float32) * sv_ref[pl.ds(t, 1), :]


# VMEM budget for the kernel's persistent scratch (3 source planes) plus
# the pipelined weight/out blocks. >16 MB of scoped scratch OOMs this
# chip's stack (PERF.md, round-2 layer1 kernel receipts); stay under it
# with margin for Mosaic's own double-buffering.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _pick_block_s(s: int, block_s: int) -> int | None:
    """Largest divisor of ``s`` that is ≤ block_s and a multiple of 128
    (the TPU lane tile), or None if no legal block exists."""
    # Round the starting candidate down to a lane-tile multiple first:
    # stepping by -128 from a non-multiple start would only visit values
    # congruent to it mod 128 and could miss every legal block (ADVICE r4).
    start = (min(block_s, s) // 128) * 128
    for bs in range(start, 127, -128):
        if s % bs == 0 and bs % 128 == 0:
            return bs
    return None


def _agg_kernel_jnb(x_hbm, w_ref, sv_ref, out_ref, xs0, xs1, xs2, sem,
                    *, jnb: int, s: int, interpret: bool):
    """JN-blocked twin of :func:`_agg_kernel` for batches whose full
    source planes exceed VMEM: grid (t, jn-block, s-block), jb fastest.
    Only the current jn-block's rows of the 3 source planes live in VMEM
    (DMAd once per (t, jn-block), at the first s-block step) — total DMA
    traffic is unchanged (3·JN·S per target), scratch is 3·jnb·S."""
    t = pl.program_id(0)
    rb = pl.program_id(1)
    jb = pl.program_id(2)
    scratch = (xs0, xs1, xs2)

    @pl.when(jb == 0)
    def _load_sources():
        for p in range(3):
            sv = jnp.where(t > p, p, p + 1)
            pltpu.make_async_copy(
                x_hbm.at[sv, pl.ds(rb * jnb, jnb)], scratch[p], sem.at[p]
            ).start()
        for p in range(3):
            sv = jnp.where(t > p, p, p + 1)
            pltpu.make_async_copy(
                x_hbm.at[sv, pl.ds(rb * jnb, jnb)], scratch[p], sem.at[p]
            ).wait()

    acc = jnp.zeros((jnb, out_ref.shape[-1]), jnp.int32)
    for p in range(3):
        acc += jax.lax.dot_general(
            scratch[p][:], w_ref[0, p],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out_ref[0] = acc.astype(jnp.float32) * sv_ref[pl.ds(t, 1), :]


def _pick_jn_block(jn: int, s: int, budget: int) -> int | None:
    """Largest divisor of ``jn`` that is a multiple of 32 — the int8 VMEM
    sublane tile is (32, 128), so jnb of 8/16/24 would only ever work in
    interpret mode and risks Mosaic layout errors or padding waste on real
    hardware (ADVICE r4) — whose 3 int8 row-slices fit the scratch budget."""
    for nb in range(1, jn + 1):
        if jn % nb:
            continue
        jnb = jn // nb
        if jnb % 32 == 0 and 3 * jnb * s <= budget:
            return jnb
    return None


def aggregation_grouped_pallas(qagg, hm, *, block_s: int = 256,
                               interpret: bool = False):
    """Drop-in twin of quant.aggregation_int8_apply_jns_grouped: hm
    [J, N, V, S] f32 -> fused [J, N, V, S] f32, grouped int8 bank ``qagg``
    (wq [4, 3, S, S], w_scale [4, 1, S], x_scale) — bit-exact vs the XLA
    path (same int8 products, int32-exact pair sum, identical single f32
    epilogue multiply).

    Configs the kernel cannot tile fall back gracefully instead of
    failing the build (the kernel is a measured ~2% win at the adopted
    serving shape, not a correctness requirement): when the full source
    planes exceed the VMEM scratch budget (large batches) the JN-BLOCKED
    grid runs instead (same total DMA, scratch = 3 row-slices); when S is
    not lane-tileable (e.g. 56x56 heatmaps) or no legal JN block exists,
    the XLA grouped dot takes over."""
    j, n, v, s = hm.shape
    assert v == 4
    jn = j * n
    assert jn > 0
    # the grid only visits s // block_s output column blocks: a ragged S
    # would leave the trailing columns uninitialised, so re-pick a legal
    # divisor block or fall back
    bs = block_s if s % block_s == 0 and block_s % 128 == 0 else \
        _pick_block_s(s, block_s)
    jnb = None
    if bs is not None:
        pipeline_bytes = 2 * (3 * s * bs) + 2 * (jn * bs * 4)
        scratch_budget = _VMEM_BUDGET_BYTES - pipeline_bytes
        if 3 * jn * s <= scratch_budget:
            jnb = jn  # full planes persist across the S-block steps
        else:
            jnb = _pick_jn_block(jn, s, scratch_budget)
    if bs is None or jnb is None:
        from posetpu.models.quant import aggregation_int8_apply_jns_grouped

        return aggregation_int8_apply_jns_grouped(qagg, hm)
    block_s = bs
    # quantize on the XLA side (one elementwise fusion; the kernel reads
    # the int8 planes straight from HBM — no gathered operand)
    xq8 = jnp.clip(
        jnp.round(hm * (1.0 / qagg["x_scale"])), -127, 127
    ).astype(jnp.int8)
    xq = jnp.moveaxis(xq8, 2, 0).reshape(v, jn, s)  # major-only permute
    # pre-folded epilogue scale, identical rounding to the XLA path's
    # ((x_scale/3) * w_scale) broadcast multiply
    sv = ((qagg["x_scale"] / 3.0) * qagg["w_scale"]).reshape(4, s)

    n_jb = s // block_s
    if jnb == jn:
        y = pl.pallas_call(
            partial(_agg_kernel, n_jb=n_jb, jn=jn, s=s, interpret=interpret),
            grid=(4, n_jb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 3, s, block_s), lambda t, jb: (t, 0, 0, jb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, block_s), lambda t, jb: (0, jb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, jn, block_s), lambda t, jb: (t, 0, jb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, jn, s), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((jn, s), jnp.int8),
                pltpu.VMEM((jn, s), jnp.int8),
                pltpu.VMEM((jn, s), jnp.int8),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(xq, qagg["wq"], sv)
    else:
        # JN-blocked grid: scratch holds only jnb source rows per step, so
        # any batch size runs; the weight bank re-streams once per
        # jn-block (jn//jnb x the HBM weight traffic). Measured at batch
        # 64 (jnb=256, re-stream 4x): 3,096 vs the XLA dot's 3,105 f/s —
        # a wash; the re-streaming roughly cancels the gathered-operand
        # win, so the blocked path is a robustness fallback, not a win
        # (the full-plane grid above is the adopted +2%).
        y = pl.pallas_call(
            partial(_agg_kernel_jnb, jnb=jnb, s=s, interpret=interpret),
            grid=(4, jn // jnb, n_jb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 3, s, block_s),
                             lambda t, rb, jb: (t, 0, 0, jb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, block_s), lambda t, rb, jb: (0, jb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, jnb, block_s),
                                   lambda t, rb, jb: (t, rb, jb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, jn, s), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((jnb, s), jnp.int8),
                pltpu.VMEM((jnb, s), jnp.int8),
                pltpu.VMEM((jnb, s), jnp.int8),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(xq, qagg["wq"], sv)
    fused = y.reshape(v, j, n, s)
    return jnp.moveaxis(fused, 0, 2).astype(hm.dtype)  # [J, N, V, S]


def _agg_kernel_s4(x_hbm, w_ref, sv_ref, dv_ref, out_ref, xs0, xs1, xs2,
                   sem, *, jn: int, s: int, block_s: int, interpret: bool):
    """s4 diag-split twin of :func:`_agg_kernel` — the kernel is
    weight-stream bound, so the [1, 3, S, BS] residual block arriving at
    4 bits halves the stream that sets its floor. Epilogue adds the exact
    f32 diagonal term dia = sum_p xs_p[:, block] * dv[t, p, block] in pair
    order, matching quant.aggregation_int4_apply_jns_grouped to 1 ulp (the
    multiply+add may fuse into FMA differently across the two programs).
    dv rides as a full [12, S] plane (a [1, BS] or [3, BS] block would
    violate the (8, 128) block-tiling rule — same workaround as sv) and
    the kernel slices row 3*t + p."""
    t = pl.program_id(0)
    jb = pl.program_id(1)
    scratch = (xs0, xs1, xs2)

    @pl.when(jb == 0)
    def _load_sources():
        for p in range(3):
            sv = jnp.where(t > p, p, p + 1)
            pltpu.make_async_copy(x_hbm.at[sv], scratch[p], sem.at[p]).start()
        for p in range(3):
            sv = jnp.where(t > p, p, p + 1)
            pltpu.make_async_copy(x_hbm.at[sv], scratch[p], sem.at[p]).wait()

    acc = jnp.zeros((jn, out_ref.shape[-1]), jnp.int32)
    for p in range(3):
        acc += jax.lax.dot_general(
            scratch[p][:], w_ref[0, p].astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    res = acc.astype(jnp.float32) * sv_ref[pl.ds(t, 1), :]
    dia = (scratch[0][:, pl.ds(jb * block_s, block_s)].astype(jnp.float32)
           * dv_ref[pl.ds(3 * t, 1), :])
    for p in range(1, 3):
        dia = dia + (
            scratch[p][:, pl.ds(jb * block_s, block_s)].astype(jnp.float32)
            * dv_ref[pl.ds(3 * t + p, 1), :])
    out_ref[0] = res + dia


def aggregation_grouped_pallas_s4(qagg, hm, *, block_s: int = 256,
                                  interpret: bool = False):
    """Drop-in twin of quant.aggregation_int4_apply_jns_grouped (s4
    diag-split bank from quantize_aggregation_grouped_s4) — int-exact dot
    vs that XLA path, f32 epilogue equal to 1 ulp (FMA fusion). Configs the full-plane grid cannot tile (ragged S,
    oversized batch) fall back to the XLA twin; the JN-blocked grid is not
    replicated here because re-streaming the bank is what the s4 encoding
    exists to avoid (the blocked int8 grid already measured a wash)."""
    j, n, v, s = hm.shape
    assert v == 4
    jn = j * n
    assert jn > 0
    bs = block_s if s % block_s == 0 and block_s % 128 == 0 else \
        _pick_block_s(s, block_s)
    ok = bs is not None
    if ok:
        # weight block at 4 bits = half the int8 bytes; dv plane [12, S] f32
        pipeline_bytes = 2 * (3 * s * bs // 2) + 2 * (jn * bs * 4) \
            + 2 * (12 * bs * 4)
        ok = 3 * jn * s <= _VMEM_BUDGET_BYTES - pipeline_bytes
    if not ok:
        from posetpu.models.quant import aggregation_int4_apply_jns_grouped

        return aggregation_int4_apply_jns_grouped(qagg, hm)
    block_s = bs
    xq8 = jnp.clip(
        jnp.round(hm * (1.0 / qagg["x_scale"])), -127, 127
    ).astype(jnp.int8)
    xq = jnp.moveaxis(xq8, 2, 0).reshape(v, jn, s)
    sv = ((qagg["x_scale"] / 3.0) * qagg["w_scale"]).reshape(4, s)
    dv = qagg["dv"].reshape(12, s)

    y = pl.pallas_call(
        partial(_agg_kernel_s4, jn=jn, s=s, block_s=block_s,
                interpret=interpret),
        grid=(4, s // block_s),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, s, block_s), lambda t, jb: (t, 0, 0, jb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_s), lambda t, jb: (0, jb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, block_s), lambda t, jb: (0, jb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jn, block_s), lambda t, jb: (t, 0, jb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, jn, s), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((jn, s), jnp.int8),
            pltpu.VMEM((jn, s), jnp.int8),
            pltpu.VMEM((jn, s), jnp.int8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xq, qagg["wq4"], sv, dv)
    fused = y.reshape(v, j, n, s)
    return jnp.moveaxis(fused, 0, 2).astype(hm.dtype)  # [J, N, V, S]
