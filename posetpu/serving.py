"""The int8 serving pipeline as a public package API.

This packages the bench-proven serving configuration (PERF.md wins #4-#10)
behind one builder, so framework users get the measured-fastest path through
the package boundary instead of re-assembling it from quant.py primitives:

- PTQ int8 trunk with the phase-PACKED tail: the last two deconvs + the 1x1
  head run as ONE fused Pallas kernel (`ops/pallas/phase_tail.fused_phase_
  tail2`), deconv0 as the batched subpixel kernel — heatmaps never exist in
  row-major form on HBM.
- grouped int8 aggregation fusion: the reference's 12 ChannelWiseFC
  (lib/models/multiview_pose_resnet.py:16-58) as one dot_general with the
  3-source mean inside the MXU accumulator, bank permuted offline into the
  packed index order.
- the reference's inference-time fuse routing (3/5 fused + 2/5 raw on h36m
  samples, lib/core/function.py:33-88) and flip test
  (lib/core/function.py:557-583) — the flip-test mirror is a pure index
  permutation on the packed input (quant.mirror_s2d_hwcn).
- the batch-minor pre-packed space-to-depth input contract: raw uint8
  camera crops arrive [H/2, W/2, 12, N·V] ((h, w, c, n) byte order — what
  `native.load_warp_batch_geom(s2d=True, hwcn=True)` writes for free), the
  (x/255-mean)/std normalisation + input quantisation fold into one affine
  on the bytes, and the u8 affine emits the stem conv's preferred N-minor
  layout with no device-side retile.

bench.py's headline measures exactly this configuration (via its ablation
harness `_build_int8`, which keeps the knobs for `tools/ab_*.py`);
`tools/ab_serving.py` is the A/B receipt that this public builder matches
the harness number.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ServingPipeline(NamedTuple):
    """A built serving pipeline.

    infer(params, x_u8, center, scale, is_h36m) -> (preds, maxvals):
        jitted; x_u8 is the packed uint8 input from :meth:`prepare` (or the
        native loader's hwcn mode), center/scale [N, V, 2] the reference
        crop geometry, is_h36m [N] f32 the fuse-routing source mask.
        preds [N, V, J, 2] source-image coords, maxvals [N, V, J].
    params: pytree holding the quantized trunk + aggregation bank — pass to
        infer as a traced argument (embedding it as constants stalls XLA).
    prepare(images_u8 [N, V, H, W, 3]) -> packed [H/2, W/2, 12, N*V]:
        host-side numpy packing, byte-identical to the native loader's
        `s2d=True, hwcn=True` output.
    """

    infer: Callable
    params: Any
    prepare: Callable
    views: int
    flip_test: bool | str


def pack_hwcn(images: np.ndarray) -> np.ndarray:
    """[N, H, W, 3] uint8 -> [H/2, W/2, 12, N] space-to-depth packed,
    batch-minor — the serving input contract (numpy mirror of
    native.load_warp_batch_geom(s2d=True, hwcn=True), byte-identical:
    tests/test_serving.py)."""
    n, h, w, c = images.shape
    x = images.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(1, 3, 2, 4, 5, 0)  # [H/2, W/2, 2, 2, C, N]
    return np.ascontiguousarray(x.reshape(h // 2, w // 2, 4 * c, n))


def finalize_device_params(params):
    """Cast the s4 aggregation bank's int8 carrier to native ``jnp.int4``
    ON the device the params already live on — call once after
    ``jax.device_put(pipeline.params, device)`` when the pipeline was built
    with ``agg_w4=True``. The cast must happen device-side because host->TPU
    transfers of s4 arrays are broken on this backend (device_put recursion,
    the round-2 receipt); in-graph ``astype`` compiles fine, and a jitted
    one-off cast leaves a committed device-resident s4 array that jit
    accepts as a parameter. No-op for int8-bank or no-aggregation params —
    safe to call unconditionally."""
    import jax

    qagg = params.get("qagg")
    if not qagg or "wq4" not in qagg or qagg["wq4"].dtype == jnp.int4:
        return params
    qagg = dict(qagg, wq4=jax.jit(lambda w: w.astype(jnp.int4))(qagg["wq4"]))
    return dict(params, qagg=qagg)


def build_serving_pipeline(
    cfg,
    variables,
    calib_batches,
    *,
    flip_test: bool | str = False,
    views: int = 4,
    subpixel_deconvs={"deconv0"},
    flip_pairs=None,
    interpret: bool = False,
    aggre_kernel: bool = True,
    act4="l12",
    agg_w4: bool = False,
) -> ServingPipeline:
    """Quantize a MultiViewPose ``variables`` tree into the adopted int8
    serving pipeline.

    cfg: the reference-schema config (NETWORK.IMAGE_SIZE/HEATMAP_SIZE,
    DATASET.MEAN/STD, NETWORK.AGGRE). variables: MultiViewPose variables
    (params/batch_stats with a ``resnet`` subtree and, when AGGRE, an
    ``aggre_layer`` bank). calib_batches: iterable of [N, H, W, 3]
    normalised float batches for PTQ calibration.

    ``subpixel_deconvs``: deconv names quantized in the per-phase subpixel
    form (finer per-phase weight scales — approximate vs the dilated int8
    path, PCKh-delta measured zero; pass False for the bit-exact-vs-NHWC
    config). ``interpret``: run the Pallas kernels in interpret mode (CPU
    tests).

    ``flip_test``: False, True, or ``"premirrored"``. True mirrors the
    packed input in-graph (quant.mirror_s2d_hwcn) — a pure index
    permutation, but XLA does not fuse it into the u8 affine, so it costs a
    materialised 25 MB reverse per step (0.316 ms on chip, PERF.md).
    ``"premirrored"`` moves the mirror to the HOST input contract instead:
    :meth:`prepare` (and the native loader, which composes the flip into
    the warp for free — ``load_warp_batch_geom`` geom rows carry a flip
    field) delivers the packed batch with the mirrored half already
    concatenated on the batch-minor axis, and the device graph starts at
    the u8 affine. Byte-identical input, same merge semantics
    (lib/core/function.py:557-583) — bit-exact vs flip_test=True
    (tests/test_serving.py)."""
    if flip_test not in (False, True, "premirrored"):
        raise ValueError(
            f"flip_test must be False, True, or 'premirrored'; got "
            f"{flip_test!r} (a typo string would be truthy and silently "
            f"split/merge a non-doubled batch)")
    from posetpu.core.inference import (
        final_preds_packed,
        flip_test_merge_packed,
        fuse_routing_jns,
    )
    from posetpu.data.base import union_flip_pairs
    from posetpu.models import get_pose_net
    from posetpu.models.quant import (
        aggregation_int8_apply_jns_grouped,
        make_u8_quant,
        mirror_s2d_hwcn,
        permute_aggregation_packed,
        quantize_aggregation_grouped,
        quantize_pose_resnet,
    )
    from posetpu.ops.heatmap import phase_index_tables

    hm_h, hm_w = int(cfg.NETWORK.HEATMAP_SIZE[1]), int(cfg.NETWORK.HEATMAP_SIZE[0])
    resnet = get_pose_net(cfg, dtype=jnp.float32)
    res_vars = {
        "params": variables["params"]["resnet"],
        "batch_stats": variables["batch_stats"]["resnet"],
    }
    if act4 == "l12":
        act4 = tuple(f"layer1_{i}.out" for i in range(3)) + tuple(
            f"layer2_{i}.out" for i in range(4))
    qparams, qfwd = quantize_pose_resnet(
        resnet, res_vars, calib_batches,
        act4=act4 or (), act4_mode="s4",
        jns_head="phase",
        phase_kernel="interpret2" if interpret else 2,
        subpixel_deconvs=subpixel_deconvs,
        stem_s2d="pre",
    )
    tables = phase_index_tables((hm_h, hm_w), levels=2)

    qagg = None
    if bool(cfg.NETWORK.AGGRE) and "aggre_layer" in variables["params"]:
        bank = variables["params"]["aggre_layer"]["weight"]
        if agg_w4:
            # diag-split 4-bit residual bank: halves the aggregation
            # kernel's HBM weight stream (its floor); the identity-dominated
            # diagonal stays exact in the f32 epilogue. The bank ships as an
            # int8 carrier — call finalize_device_params(params) after
            # moving params to the target device to cast it to native s4
            # (the traffic win); the carrier itself is numerically
            # identical, just int8-traffic.
            from posetpu.models.quant import (
                permute_aggregation_packed_s4,
                quantize_aggregation_grouped_s4,
            )

            qagg = permute_aggregation_packed_s4(
                quantize_aggregation_grouped_s4(bank), tables)
        else:
            qagg = permute_aggregation_packed(
                quantize_aggregation_grouped(bank), tables)

    u8_quant, _ = make_u8_quant(qparams, cfg.DATASET.MEAN, cfg.DATASET.STD)
    pairs = tuple(tuple(p) for p in (flip_pairs or union_flip_pairs()))
    params = {"q": qparams, "qagg": qagg}

    @jax.jit
    def infer(params, x, center, scale, is_h36m):
        if flip_test is True:
            x = jnp.concatenate([x, mirror_s2d_hwcn(x)], axis=3)
        # premirrored: x arrives [H/2, W/2, 12, 2*N*V], mirror already done
        # on the host — no in-graph reverse/concat
        flat = jnp.transpose(x, (3, 0, 1, 2))  # layout-free: bytes already N-minor
        hm = qfwd(params["q"], u8_quant(flat))  # [J, N*V(*2), S] packed
        if flip_test:
            hm, hm_f = jnp.split(hm, 2, axis=1)
            hm = flip_test_merge_packed(hm, hm_f, pairs, (hm_h, hm_w),
                                        levels=tables["levels"])
        n = hm.shape[1] // views
        raw = hm.reshape(hm.shape[0], n, views, hm.shape[-1])
        if params["qagg"] is not None:
            if "wq4" in params["qagg"]:
                # s4 diag-split bank (agg_w4=True)
                if aggre_kernel:
                    from posetpu.ops.pallas.aggregation import (
                        aggregation_grouped_pallas_s4,
                    )

                    fused = aggregation_grouped_pallas_s4(
                        params["qagg"], raw, interpret=interpret)
                else:
                    from posetpu.models.quant import (
                        aggregation_int4_apply_jns_grouped,
                    )

                    fused = aggregation_int4_apply_jns_grouped(
                        params["qagg"], raw)
            elif aggre_kernel:
                # Pallas weight-streaming kernel: no gathered 3x-duplicated
                # operand, sources DMAd to VMEM once per target — measured
                # 3,224 -> 3,289 f/s same-session A/B (tools/ab_agg_kernel),
                # bit-exact vs the XLA grouped dot
                # (tests/test_aggregation_kernel.py)
                from posetpu.ops.pallas.aggregation import (
                    aggregation_grouped_pallas,
                )

                fused = aggregation_grouped_pallas(params["qagg"], raw,
                                                   interpret=interpret)
            else:
                fused = aggregation_int8_apply_jns_grouped(params["qagg"], raw)
            out = fuse_routing_jns(raw, fused, is_h36m)
        else:
            out = raw
        return final_preds_packed(out, center, scale, (hm_h, hm_w), tables)

    def prepare(images: np.ndarray) -> np.ndarray:
        n, v, h, w, c = images.shape
        packed = pack_hwcn(images.reshape(n * v, h, w, c))
        if flip_test == "premirrored":
            # numpy twin of the native loader's double-warp output: the
            # mirrored half rides in the upper batch-minor indices
            packed = np.concatenate([packed, np.asarray(
                mirror_s2d_hwcn(packed))], axis=3)
        return packed

    return ServingPipeline(infer=infer, params=params, prepare=prepare,
                           views=views, flip_test=flip_test)
