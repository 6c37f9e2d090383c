"""Benchmark: 4-view frames/s/chip for the flagship inference pipeline.

Pipeline per group of 4 camera views (BASELINE.json north star): ResNet-50
MultiViewPose forward in bf16 (+ cross-view aggregation fusion), heatmap
decode with quarter-pixel refinement, inverse-affine to image coords, and DLT
triangulation to 3D — all inside one jit.

Timing protocol: on this environment only a host transfer synchronises with
the device (``block_until_ready`` is a no-op through the remote tunnel), so
the jitted function returns a scalar that is fetched each step, and the
measured tunnel round-trip is subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 5000.0  # /root/repo/BASELINE.json north star
LOOP_INSIDE = 10  # pipeline steps per host fetch (amortises tunnel RTT)

# Wall-clock budget (s) for the SECONDARY variants: the headline is always
# measured and printed first (the driver kills the whole run at ~600 s, and
# backend init through the remote tunnel alone costs 60-340 s — measured
# 2026-08-20 — so a partial run must still leave a parsed headline line).
# 480: headline+flip+sustained+train fit a warm ~500 s run; bf16 (least
# informative) is the one that drops when the tunnel is slow.
BENCH_BUDGET_S = float(os.environ.get("POSETPU_BENCH_BUDGET", "480"))


def _enable_compile_cache():
    """Persistent XLA compilation cache, committed to the repo and prewarmed
    (round-2 failure: BENCH_r02.json rc=124 — three cold pipeline compiles
    through the tunnel exceed the driver's timeout; with the cache warm each
    compile is a ~0.2 s cache read, verified on the axon backend)."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _built_on_cpu(build, *args, **kwargs):
    """Run a pipeline BUILD on the host CPU backend, then move its params
    and example input to the TPU.

    The builds are dominated by eager work (Flax init, PTQ calibration
    sweeps) where every op is its own remote compile through the tunnel —
    measured: the serving build alone sat >10 min in eager dispatch. On the
    CPU backend the same work is seconds, and the only TPU compile left is
    the jitted pipeline itself (one cache entry, prewarmed). Calibration
    constants are deterministic (PRNGKey(0) input, CPU f32), so the
    resulting HLO — and its cache key — is stable across runs."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None:
        return build(*args, **kwargs)
    with jax.default_device(cpu):
        pipeline, params, x = build(*args, **kwargs)
    dev = jax.devices()[0]
    params, x = jax.device_put((params, x), dev)
    return pipeline, params, x


def _build_int8(batch, flip_test: bool = False, tail: str = "phase",
                stem_s2d: bool = False, subpixel_deconvs=False,
                phase_kernel: bool = False, grouped_aggre: bool = False,
                input_layout: str = "nhwc", act4=(), act4_mode="packed"):
    """int8 serving pipeline: PTQ ResNet-50 trunk -> bf16 aggregation fusion
    -> fuse routing -> decode -> triangulate (same stages as the bf16 path).

    ``flip_test`` adds the reference's flip-test protocol
    (function.py:557-583): the horizontally mirrored images run through the
    same trunk (folded into the batch) and the un-flipped heatmaps are
    averaged in — ~2x trunk work, reported as a separate metric.

    ``tail``: "jns" emits the head directly in [J, N, S] (S minor) so the
    aggregation/routing/decode chain never transposes a J-minor tensor;
    "phase" additionally runs the LAST deconv as four per-phase subpixel
    convs whose groups feed the head directly and emerge phase-PACKED (no
    dilated conv, no interleave, no gather; aggregation bank exactly
    permuted offline, decode via static index tables);
    "nhwc" is the [N, h, w, J] layout (all numerically identical —
    tests/test_tail_jns.py, tests/test_phase_tail.py)."""
    import jax
    import jax.numpy as jnp

    from posetpu.config import default_config
    from posetpu.core.inference import (
        final_preds,
        final_preds_jns,
        flip_test_merge,
        flip_test_merge_jns,
        fuse_routing,
        fuse_routing_jns,
    )
    from posetpu.data.base import union_flip_pairs
    from posetpu.data.synthetic import make_camera_ring, tile_cameras
    from posetpu.geometry.triangulate import triangulate_points
    from posetpu.models import get_pose_net
    from posetpu.models.multiview import Aggregation
    from posetpu.models.quant import (
        aggregation_int8_apply,
        aggregation_int8_apply_jns,
        make_u8_quant,
        quantize_aggregation,
        quantize_pose_resnet,
    )

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    model = get_pose_net(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
    variables = model.init(key, calib, train=False)
    jns = tail.startswith("jns") or tail == "phase"
    jns_head = {"jns_bf16": "bf16", "phase": "phase"}.get(tail, jns)
    qparams, qfwd = quantize_pose_resnet(
        model, variables, [np.asarray(calib)], jns_head=jns_head,
        stem_s2d=stem_s2d, subpixel_deconvs=subpixel_deconvs,
        phase_kernel=phase_kernel, act4=act4, act4_mode=act4_mode,
    )

    aggre = Aggregation(heatmap_size=64, dtype=jnp.bfloat16)
    aggre_vars = aggre.init(key, jnp.zeros((1, 4, 64, 64, 16)))
    if grouped_aggre == "pallas_s4":
        # diag-split 4-bit residual bank: halves the weight stream that
        # sets the aggregation kernel's floor (int8 carrier here; the
        # device-side s4 cast is the caller's finalize step — see
        # posetpu.serving.finalize_device_params)
        from posetpu.models.quant import quantize_aggregation_grouped_s4
        from posetpu.ops.pallas.aggregation import aggregation_grouped_pallas_s4

        qagg = quantize_aggregation_grouped_s4(aggre_vars["params"]["weight"])
        apply_jns = aggregation_grouped_pallas_s4
    elif grouped_aggre:
        # fused-mean aggregation: one dot_general, pair mean inside the MXU
        from posetpu.models.quant import (
            aggregation_int8_apply_jns_grouped,
            quantize_aggregation_grouped,
        )

        qagg = quantize_aggregation_grouped(aggre_vars["params"]["weight"])
        if grouped_aggre == "pallas":
            # weight-stream-floor Pallas kernel (no gathered operand);
            # bit-exact vs the XLA grouped dot (test_aggregation_kernel.py)
            from posetpu.ops.pallas.aggregation import (
                aggregation_grouped_pallas,
            )

            apply_jns = aggregation_grouped_pallas
        else:
            apply_jns = aggregation_int8_apply_jns_grouped
    else:
        qagg = quantize_aggregation(aggre_vars["params"]["weight"])
        apply_jns = aggregation_int8_apply_jns
    tables = None
    if tail == "phase":
        from posetpu.models.quant import permute_aggregation_packed
        from posetpu.ops.heatmap import phase_index_tables

        # the two-level fused tail (phase_kernel=2) emits the levels=2
        # packing; every packed consumer is table-driven
        tables = phase_index_tables(
            (64, 64), levels=2 if phase_kernel in (2, "interpret2") else 1)
        if "wq4" in qagg:
            from posetpu.models.quant import permute_aggregation_packed_s4

            qagg = permute_aggregation_packed_s4(qagg, tables)
        else:
            qagg = permute_aggregation_packed(qagg, tables)

    # serving input is raw uint8 camera frames: the (x/255-mean)/std
    # normalisation + input quantisation fold into one affine on the bytes
    # (make_u8_quant), so the pipeline reads 1 B/px instead of 4
    x = jax.random.randint(key, (batch, 4, 256, 256, 3), 0, 256, jnp.uint8)
    if stem_s2d == "pre":
        # s2d-packed serving input contract: the host loader writes warp
        # output pixels at space-to-depth addresses (free on the host), so
        # the device-side retile that sank the original s2d stem never
        # exists. Same bytes, different arrangement.
        xh = np.asarray(x).reshape(batch, 4, 128, 2, 128, 2, 3)
        x = jnp.asarray(
            np.ascontiguousarray(
                xh.transpose(0, 1, 2, 4, 3, 5, 6)
            ).reshape(batch, 4, 128, 128, 12)
        )
    if input_layout == "hwcn":
        # batch-minor serving input contract: physical byte order
        # (H, W, C, N). XLA's stem-conv emitter wants its int8 input in the
        # {0,3,2,1} (N-minor) layout; with the bytes ARRIVING in that order
        # the u8 affine emits it directly and the 0.22 ms input retile
        # (copy.809 in the round-2 device trace) never exists. The host
        # loader writes warp output pixels at strided addresses for free —
        # same bytes, different arrangement (cf. stem_s2d="pre").
        assert stem_s2d == "pre"
        x = jnp.asarray(np.ascontiguousarray(
            np.asarray(x).reshape((batch * 4,) + x.shape[2:])
            .transpose(1, 2, 3, 0)
        ))
    u8_quant, _ = make_u8_quant(
        qparams, cfg.DATASET.MEAN, cfg.DATASET.STD
    )
    cams = tile_cameras(make_camera_ring(), batch)
    center = jnp.full((batch, 4, 2), 500.0, jnp.float32)
    scale = jnp.full((batch, 4, 2), 2.5, jnp.float32)
    is_h36m = jnp.ones((batch,), jnp.float32)
    params = {"q": qparams, "qagg": qagg}

    flip_pairs = union_flip_pairs()

    def one(params, x):
        if input_layout == "hwcn":
            # x: [H, W2, C4, N*4] u8. The mirror is the packed W-reverse +
            # b-phase channel-group swap (quant.mirror_s2d's permutation on
            # the hwcn axes); the N-axis transpose to NHWC is layout-free
            # (the physical order already IS the conv's preferred layout).
            if flip_test:
                from posetpu.models.quant import mirror_s2d_hwcn

                x = jnp.concatenate([x, mirror_s2d_hwcn(x)], axis=3)
            flat = jnp.transpose(x, (3, 0, 1, 2))
            hm = qfwd(params["q"], u8_quant(flat))
        else:
            flat = x.reshape((batch * 4,) + x.shape[2:])
            if flip_test:
                if stem_s2d == "pre":
                    # packed W-mirror: reverse packed columns + swap b-phase
                    # channel groups (quant.mirror_s2d == mirror-then-pack)
                    from posetpu.models.quant import mirror_s2d

                    flat = jnp.concatenate([flat, mirror_s2d(flat)])
                else:
                    flat = jnp.concatenate([flat, flat[:, :, ::-1, :]])
            hm = qfwd(params["q"], u8_quant(flat))
        if tail == "phase":  # hm: [J, N*4(*2), S] phase-PACKED maps
            from posetpu.core.inference import (
                final_preds_packed,
                flip_test_merge_packed,
            )

            if flip_test:
                hm, hm_f = jnp.split(hm, 2, axis=1)
                hm = flip_test_merge_packed(hm, hm_f, flip_pairs, (64, 64),
                                            levels=tables["levels"])
            raw = hm.reshape(hm.shape[0], batch, 4, hm.shape[-1])
            fused = apply_jns(params["qagg"], raw)
            out = fuse_routing_jns(raw, fused, is_h36m)
            preds, maxvals = final_preds_packed(
                out, center, scale, (64, 64), tables
            )
        elif jns:  # hm: [J, N*4(*2), S], S minor end to end
            if flip_test:
                hm, hm_f = jnp.split(hm, 2, axis=1)
                hm = flip_test_merge_jns(hm, hm_f, flip_pairs, (64, 64))
            raw = hm.reshape(hm.shape[0], batch, 4, hm.shape[-1])
            fused = apply_jns(params["qagg"], raw)
            out = fuse_routing_jns(raw, fused, is_h36m)
            preds, maxvals = final_preds_jns(out, center, scale, (64, 64))
        else:  # hm: [N*4(*2), h, w, J]
            if flip_test:
                hm, hm_f = jnp.split(hm, 2)
                hm = flip_test_merge(hm, hm_f, flip_pairs)
            raw = hm.reshape((batch, 4) + hm.shape[1:])
            fused = aggregation_int8_apply(params["qagg"], raw)
            out = fuse_routing(raw, fused, is_h36m)
            preds, maxvals = final_preds(out, center, scale)
        pts3d = triangulate_points(preds, cams, maxvals > 0.0)
        return jnp.sum(pts3d) + jnp.sum(preds)

    @jax.jit
    def pipeline(params, x):
        # LOOP_INSIDE steps chained by a data dependence: one host fetch per
        # LOOP_INSIDE pipeline runs, so tunnel round-trip jitter is amortised.
        # The xor ties each iteration's input to the previous result (flips
        # at most the pixel LSB) so XLA cannot hoist the forward out.
        def body(i, acc):
            jit_bit = (acc.astype(jnp.int32) & 1).astype(jnp.uint8)
            return acc + one(params, jnp.bitwise_xor(x, jit_bit))

        return jax.lax.fori_loop(0, LOOP_INSIDE, body, jnp.float32(0.0))

    return pipeline, params, x


def _build_serving(batch, flip_test: bool = False):
    """The headline pipeline through the PUBLIC package API
    (posetpu.serving.build_serving_pipeline) — the same adopted config as
    _build_int8(subpixel_deconvs={'deconv0'}, phase_kernel=2,
    grouped_aggre='pallas', stem_s2d='pre', input_layout='hwcn',
    act4=l12/s4 — round-5 win #13), so the bench number measures what a
    framework user actually gets. _build_int8 stays as the ablation harness
    for tools/ab_*.py (measured identical: tools/ab_serving.py)."""
    import jax
    import jax.numpy as jnp

    from posetpu.config import default_config
    from posetpu.data.synthetic import make_camera_ring, tile_cameras
    from posetpu.geometry.triangulate import triangulate_points
    from posetpu.models import get_pose_net
    from posetpu.models.multiview import Aggregation
    from posetpu.serving import build_serving_pipeline

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    cfg.NETWORK.AGGRE = True
    model = get_pose_net(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
    rv = model.init(key, calib, train=False)
    aggre = Aggregation(heatmap_size=64, dtype=jnp.bfloat16)
    av = aggre.init(key, jnp.zeros((1, 4, 64, 64, 16)))
    variables = {
        "params": {"resnet": rv["params"],
                   "aggre_layer": {"weight": av["params"]["weight"]}},
        "batch_stats": {"resnet": rv["batch_stats"]},
    }
    pipe = build_serving_pipeline(cfg, variables, [np.asarray(calib)],
                                  flip_test=flip_test)

    images = np.random.RandomState(0).randint(
        0, 256, (batch, 4, 256, 256, 3)).astype(np.uint8)
    x = jnp.asarray(pipe.prepare(images))
    cams = tile_cameras(make_camera_ring(), batch)
    center = jnp.full((batch, 4, 2), 500.0, jnp.float32)
    scale = jnp.full((batch, 4, 2), 2.5, jnp.float32)
    is_h36m = jnp.ones((batch,), jnp.float32)

    def one(params, x):
        preds, maxvals = pipe.infer(params, x, center, scale, is_h36m)
        pts3d = triangulate_points(preds, cams, maxvals > 0.0)
        return jnp.sum(pts3d) + jnp.sum(preds)

    @jax.jit
    def pipeline(params, x):
        def body(i, acc):
            jit_bit = (acc.astype(jnp.int32) & 1).astype(jnp.uint8)
            return acc + one(params, jnp.bitwise_xor(x, jit_bit))

        return jax.lax.fori_loop(0, LOOP_INSIDE, body, jnp.float32(0.0))

    return pipeline, pipe.params, x


def _build(batch):
    import jax
    import jax.numpy as jnp

    from posetpu.config import default_config
    from posetpu.core.inference import final_preds, fuse_routing
    from posetpu.data.synthetic import make_camera_ring, tile_cameras
    from posetpu.geometry.triangulate import triangulate_points
    from posetpu.models import MultiViewPose, get_pose_net

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    model = MultiViewPose(
        resnet=get_pose_net(cfg, dtype=jnp.bfloat16), aggre=True, dtype=jnp.bfloat16
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 4, 256, 256, 3), jnp.float32)
    variables = model.init(key, x[:1], train=False)
    cams = tile_cameras(make_camera_ring(), batch)
    center = jnp.full((batch, 4, 2), 500.0, jnp.float32)
    scale = jnp.full((batch, 4, 2), 2.5, jnp.float32)
    is_h36m = jnp.ones((batch,), jnp.float32)

    def one(variables, x):
        raw, fused, _, _ = model.apply(variables, x, train=False)
        out = fuse_routing(raw, fused, is_h36m)
        preds, maxvals = final_preds(out, center, scale)
        pts3d = triangulate_points(preds, cams, maxvals > 0.0)
        # scalar forces full execution on fetch
        return jnp.sum(pts3d) + jnp.sum(preds)

    @jax.jit
    def pipeline(variables, x):
        def body(i, acc):
            return acc + one(variables, x + acc * 1e-30)

        return jax.lax.fori_loop(0, LOOP_INSIDE, body, jnp.float32(0.0))

    return pipeline, variables, x


def _build_serving_single(batch):
    """Single-step twin of :func:`_build_serving` for the SUSTAINED
    end-to-end protocol (round-3 VERDICT #1): each call consumes a NEW
    packed batch (no in-jit chaining — the input changes every step), so
    host decode/warp/pack + H2D can overlap device compute via async
    dispatch. Returns the same scalar as the chained pipeline."""
    import jax
    import jax.numpy as jnp

    from posetpu.config import default_config
    from posetpu.data.synthetic import make_camera_ring, tile_cameras
    from posetpu.geometry.triangulate import triangulate_points
    from posetpu.models import get_pose_net
    from posetpu.models.multiview import Aggregation
    from posetpu.serving import build_serving_pipeline

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    cfg.NETWORK.AGGRE = True
    model = get_pose_net(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
    rv = model.init(key, calib, train=False)
    aggre = Aggregation(heatmap_size=64, dtype=jnp.bfloat16)
    av = aggre.init(key, jnp.zeros((1, 4, 64, 64, 16)))
    variables = {
        "params": {"resnet": rv["params"],
                   "aggre_layer": {"weight": av["params"]["weight"]}},
        "batch_stats": {"resnet": rv["batch_stats"]},
    }
    pipe = build_serving_pipeline(cfg, variables, [np.asarray(calib)])

    images = np.random.RandomState(0).randint(
        0, 256, (batch, 4, 256, 256, 3)).astype(np.uint8)
    x = jnp.asarray(pipe.prepare(images))
    cams = tile_cameras(make_camera_ring(), batch)
    center = jnp.full((batch, 4, 2), 500.0, jnp.float32)
    scale = jnp.full((batch, 4, 2), 2.5, jnp.float32)
    is_h36m = jnp.ones((batch,), jnp.float32)

    @jax.jit
    def infer1(params, x):
        preds, maxvals = pipe.infer(params, x, center, scale, is_h36m)
        pts3d = triangulate_points(preds, cams, maxvals > 0.0)
        return jnp.sum(pts3d) + jnp.sum(preds)

    return infer1, pipe.params, x


def _measure_sustained(infer1, params, batch, n_batches: int = 12):
    """Sustained end-to-end serving: JPEG bytes -> native decode/warp/pack
    (hwcn s2d contract, flip composed into the warp geom) -> H2D -> infer,
    double-buffered: the infer dispatch is ASYNC, so the host decodes batch
    i+1 while the device runs batch i; one small scalar fetch per batch
    (kept 2 deep) is the only sync. Reports frames/s plus the host/put
    attribution. Returns None if the native loader is unavailable."""
    import shutil
    import tempfile

    import cv2
    import jax

    from posetpu import native

    if not native.available():
        return None

    n_img = batch * 4
    root = tempfile.mkdtemp(prefix="posetpu_sustained_")
    try:
        rs = np.random.RandomState(0)
        paths = []
        for i in range(64):
            # photo-like statistics: noise JPEGs decode pathologically
            img = cv2.GaussianBlur(
                rs.randint(0, 255, (1000, 1000, 3), np.uint8), (31, 31), 10)
            p = os.path.join(root, f"f{i:03d}.jpg")
            cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            paths.append(p)
        # crop geometry: 800 px person box -> 256 crop (H36M-like ratio)
        geoms = np.tile(np.array([500.0, 500.0, 800.0, 0.0, 0.0],
                                 np.float32), (n_img, 1))
        inners = [""] * n_img

        def load(i):
            batch_paths = [paths[(i * n_img + k) % len(paths)]
                           for k in range(n_img)]
            packed, _, fails = native.load_warp_batch_geom(
                batch_paths, inners, geoms, 256, 256, n_threads=8,
                s2d=True, hwcn=True)
            assert fails == 0
            return packed

        dev = jax.devices()[0]
        # warm: one full cycle (compile + libjpeg init + allocator warm)
        float(infer1(params, jax.device_put(load(0), dev)))

        host_s = put_s = 0.0
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_batches):
            th = time.perf_counter()
            packed = load(i)
            tp = time.perf_counter()
            host_s += tp - th
            x = jax.device_put(packed, dev)
            put_s += time.perf_counter() - tp
            inflight.append(infer1(params, x))  # async dispatch
            if len(inflight) > 2:
                float(inflight.pop(0))  # sync the oldest, keep 2 in flight
        for r in inflight:
            float(r)
        total = time.perf_counter() - t0

        # Second epoch over the SAME eval set from a decoded-crop cache
        # (round-4 weak #5): validation/trainset-inference sets are fixed,
        # and the reference's DataLoader re-decodes every epoch
        # (lib/dataset/joints_dataset_compatible.py:139-165). Caching the
        # packed uint8 crops (25 MB/batch) turns epochs >= 2 into
        # H2D + infer only — the deployment-realistic steady state for
        # the pipeline's repeated passes (validate -> pseudo -> retrain).
        cache = [load(i) for i in range(n_batches)]
        inflight = []
        t1 = time.perf_counter()
        for i in range(n_batches):
            x = jax.device_put(cache[i], dev)
            inflight.append(infer1(params, x))
            if len(inflight) > 2:
                float(inflight.pop(0))
        for r in inflight:
            float(r)
        total_cached = time.perf_counter() - t1

        return {
            "sustained_fps": batch * n_batches / total,
            "host_ms_per_batch": host_s / n_batches * 1e3,
            "h2d_ms_per_batch": put_s / n_batches * 1e3,
            "total_s": total,
            "n_batches": n_batches,
            "cached_epoch_fps": batch * n_batches / total_cached,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _build_train(batch):
    """Training-throughput variant (round-3 VERDICT #4): flagship ResNet-50
    MultiViewPose in bf16 with aggregation fusion, the deterministic loss
    set on (MSE + consistency + fundamental — the reference's fund recipe,
    lib/core/loss.py:89-133 / function.py:91-526), optax Adam, one jitted
    train step over [batch, 4, 256, 256, 3] groups. Same chained-fetch
    protocol as the serving variants: LOOP_INSIDE steps chained through the
    TrainState carry (each step's grads depend on the previous update, so
    XLA cannot hoist or parallelise them)."""
    import jax
    import jax.numpy as jnp
    import optax

    from posetpu.config import default_config
    from posetpu.data.synthetic import make_camera_ring
    from posetpu.geometry.fundamental import (
        bank_to_batch,
        build_fundamental_bank,
    )
    from posetpu.models import MultiViewPose, get_pose_net
    from posetpu.train.state import TrainState
    from posetpu.train.step import make_train_step

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    cfg.NETWORK.AGGRE = True
    cfg.LOSS.USE_CONSISTENT_LOSS = True
    cfg.LOSS.USE_FUNDAMENTAL_LOSS = True
    model = MultiViewPose(
        resnet=get_pose_net(cfg, dtype=jnp.bfloat16), aggre=True,
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 4, 256, 256, 3), jnp.float32)
    variables = model.init(key, x[:1], train=True)
    # TRAIN_MU_DTYPE: tools/ab_train_opt.py A/B knob — "mu_bf16" stores
    # Adam's first moment bf16 (the [12,4096,4096] aggregation bank's f32
    # p/m/v update is the train step's largest single op at 7.2 ms/iter,
    # TRACE_TABLE_train.json)
    mu = jnp.bfloat16 if globals().get("TRAIN_MU_DTYPE") == "mu_bf16" else None
    tx = optax.adam(1e-3, mu_dtype=mu)
    state = TrainState(variables["params"], variables["batch_stats"],
                       tx.init(variables["params"]), 0)

    cams = make_camera_ring()
    bank = build_fundamental_bank({0: cams})
    target = jax.random.uniform(key, (batch, 4, 64, 64, 16), jnp.float32)
    batch_dict = {
        "images": x,
        "target": target,
        "weight": jnp.ones((batch, 4, 16), jnp.float32),
        "is_h36m": jnp.ones((batch,), jnp.float32),
        "center": jnp.full((batch, 4, 2), 500.0, jnp.float32),
        "scale": jnp.full((batch, 4, 2), 2.5, jnp.float32),
        "fmats": bank_to_batch(bank, [0] * batch),
    }
    train_step = make_train_step(model, cfg, tx)

    @jax.jit
    def pipeline(state, batch_dict):
        def body(i, carry):
            st, acc = carry
            st, metrics = train_step(st, batch_dict)
            return st, acc + metrics["loss"].astype(jnp.float32)

        _, acc = jax.lax.fori_loop(
            0, LOOP_INSIDE, body, (state, jnp.float32(0.0)))
        return acc

    return pipeline, state, batch_dict


def _tunnel_rtt():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def nop(x):
        return x + 1.0

    float(nop(jnp.float32(0)))
    samples = []
    for i in range(10):
        t0 = time.perf_counter()
        float(nop(jnp.float32(i)))
        samples.append(time.perf_counter() - t0)
    # subtract the MINIMUM round-trip: conservative (never credits tunnel
    # jitter to the pipeline)
    return min(samples)


def _measure(pipeline, params, x, batch, rtt, reps=4):
    float(pipeline(params, x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(pipeline(params, x))
        times.append(time.perf_counter() - t0)
    net = max((min(times) - rtt) / LOOP_INSIDE, 1e-6)
    return batch / net


def main():
    t_start = time.time()
    _enable_compile_cache()
    rtt = _tunnel_rtt()
    batch = 32
    results = {}

    def emit():
        # Each emitted line is a COMPLETE record of everything measured so
        # far; the driver parses the LAST JSON line of the tail, so a run
        # killed after the first emit still leaves a valid headline.
        best_fps = max(results.get("int8", 0.0),
                       results.get("bf16_fused", 0.0))
        rec = {
            "metric": "4-view frames/s/chip (ResNet-50 heatmap+fusion+decode+triangulation, int8 serving path)",
            "value": round(best_fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(best_fps / BASELINE_FPS, 3),
            "batch": batch,
            "int8_fps": round(results.get("int8", 0.0), 1),
            "tunnel_rtt_ms": round(rtt * 1e3, 1),
            "elapsed_s": round(time.time() - t_start, 1),
        }
        if "int8_flip" in results:
            # Host-premirrored input contract: the mirrored half is prepared
            # on the host OUTSIDE the timed loop (the native loader composes
            # the flip into the warp for free), so the per-batch in-graph
            # mirror cost (0.316 ms in flip_test=True mode) is intentionally
            # not in this number — the key says so. Delta vs the in-graph
            # mirror protocol: tools/ab_flip_premirror.py (1,631 -> 1,697).
            rec["int8_flip_test_premirrored_fps"] = round(
                results["int8_flip"], 1)
        if "train" in results:
            rec["train_fps"] = round(results["train"], 1)
        if "sustained" in results:
            s = results["sustained"]
            rec["sustained_fps"] = round(s["sustained_fps"], 1)
            rec["sustained_host_ms_per_batch"] = round(
                s["host_ms_per_batch"], 1)
            rec["sustained_h2d_ms_per_batch"] = round(
                s["h2d_ms_per_batch"], 1)
            if "cached_epoch_fps" in s:
                rec["sustained_cached_epoch_fps"] = round(
                    s["cached_epoch_fps"], 1)
        if "bf16_fused" in results:
            rec["bf16_fused_fps"] = round(results["bf16_fused"], 1)
        print(json.dumps(rec), flush=True)

    # HEADLINE FIRST, through the PUBLIC package API
    # (posetpu.serving.build_serving_pipeline — the adopted config, PERF.md
    # wins #5-#10; _build_int8 stays as the ablation harness for
    # tools/ab_*.py, measured identical by tools/ab_serving.py).
    pipeline, params, x = _built_on_cpu(_build_serving, batch)
    results["int8"] = _measure(pipeline, params, x, batch, rtt)
    emit()

    # Secondary variants, time-boxed: flip-test protocol first (the
    # reference's validation protocol, host-premirrored input contract —
    # round-4 A/B receipt in PERF.md), then the train step, the sustained
    # end-to-end feed, bf16 last.
    if time.time() - t_start < BENCH_BUDGET_S:
        fpipe, fparams, fx = _built_on_cpu(_build_serving, batch,
                                           flip_test="premirrored")
        results["int8_flip"] = _measure(fpipe, fparams, fx, batch, rtt)
        emit()
    if time.time() - t_start < BENCH_BUDGET_S:
        try:
            infer1, sparams, _ = _built_on_cpu(_build_serving_single, batch)
            sustained = _measure_sustained(infer1, sparams, batch)
            if sustained is not None:
                results["sustained"] = sustained
        except Exception as e:  # variants must never kill the headline
            print(f'{{"sustained_error": "{type(e).__name__}"}}', flush=True)
        emit()
    if time.time() - t_start < BENCH_BUDGET_S:
        try:
            tpipe, tstate, tbatch = _built_on_cpu(_build_train, batch)
            results["train"] = _measure(tpipe, tstate, tbatch, batch, rtt,
                                        reps=3)
        except Exception as e:
            print(f'{{"train_error": "{type(e).__name__}"}}', flush=True)
        emit()
    if time.time() - t_start < BENCH_BUDGET_S:
        bpipe, bvars, bx = _built_on_cpu(_build, batch)
        results["bf16_fused"] = _measure(bpipe, bvars, bx, batch, rtt)
        emit()


if __name__ == "__main__":
    main()
