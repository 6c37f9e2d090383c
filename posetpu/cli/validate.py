"""Evaluation entry point — the run/pose2d/valid.py equivalent: forward the
TEST (or train) set, dump the heatmap/location H5 interchange file, print the
PCKh table.

    python -m posetpu.cli.validate --cfg <yaml> --state <ckpt> [--trainset]

``--state`` accepts a reference torch checkpoint (.pth.tar, converted on the
fly) or an Orbax directory. ``--trainset`` mirrors run/pose2d/
valid_trainset.py (inference over the unlabeled training set to mint the
pseudo-label inputs) without its stale-signature bug (valid_trainset.py:170).
"""

from __future__ import annotations

import numpy as np


def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("Validate multi-view pose network")
    p.add_argument("--state", default="", help="checkpoint path (torch or orbax)")
    p.add_argument("--flip-test", action="store_true")
    p.add_argument("--post-process", action="store_true")
    p.add_argument("--shift-heatmap", action="store_true")
    p.add_argument("--trainset", action="store_true",
                   help="run on the training subset (pseudo-label inference)")
    p.add_argument("--no-distortion", action="store_true")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ trunk (calibrated on the first batches)")
    p.add_argument("--calib-batches", type=int, default=2,
                   help="batches used for int8 activation calibration")
    p.add_argument("--qat-steps", type=int, default=0,
                   help="with --int8: distillation QAT fine-tune steps over "
                        "the eval images before quantizing (repairs the PTQ "
                        "accuracy delta; no labels needed)")
    p.add_argument("--qat-lr", type=float, default=3e-6)
    p.add_argument("--int8-act4", default="",
                   help="with --int8: sub-int8 activation boundaries — "
                        "'l12' (layer1+layer2 block outputs, the adopted "
                        "serving set, tools/ab_act4.py) or a comma-"
                        "separated list of boundary names; stored as "
                        "native int4 (s4)")
    p.add_argument("--int8-subpixel", default="",
                   help="with --int8: comma-separated deconv names to "
                        "quantize in per-phase subpixel form (finer weight "
                        "scales; bench's adopted serving config is deconv0)")
    return p.parse_args()


def main():
    args = parse_args()
    from posetpu.cli.common import build_model, load_cfg, load_model_variables
    from posetpu.data.loader import GroupLoader
    from posetpu.data.registry import get_dataset
    from posetpu.train.loop import validate
    from posetpu.train.step import make_eval_step
    from posetpu.utils.logging import create_logger

    cfg = load_cfg(args)
    # valid.py forces the MI/fundamental losses off at eval (valid.py:133-135)
    cfg.LOSS.USE_FUNDAMENTAL_LOSS = False
    cfg.LOSS.USE_LOCAL_MI_LOSS = False
    cfg.LOSS.USE_GLOBAL_MI_LOSS = False
    if args.flip_test:
        cfg.TEST.FLIP_TEST = True
    if args.post_process:
        cfg.TEST.POST_PROCESS = True
    if args.shift_heatmap:
        cfg.TEST.SHIFT_HEATMAP = True

    logger, output_dir, _ = create_logger(cfg, args.cfg, "valid")

    subset = "train" if args.trainset else cfg.DATASET.TEST_SUBSET
    # --trainset keeps is_train=True: the reference's valid_trainset.py:155
    # builds the TRAIN grouping (::5) so the heatmap dump's rows line up
    # with what cli.pseudo_labels / cli.triangulate expect (is_train only
    # changes grouping/meta for h36m — augmentation is mpii-only,
    # data/base.py:191). Round-3 fix: is_train=False here dumped the ::64
    # eval grouping and the documented validate->pseudo_labels flow crashed
    # on the row-count assert.
    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, subset, args.trainset,
        no_distortion=args.no_distortion or cfg.DATASET.NO_DISTORTION,
    )
    loader = GroupLoader(dataset, cfg.TEST.BATCH_SIZE, shuffle=False, drop_last=False)
    logger.info(f"groups: {len(dataset)}")

    model = build_model(cfg, bf16=not args.f32)
    state_path = args.state or cfg.TEST.STATE or cfg.TEST.MODEL_FILE
    assert state_path, "--state (or TEST.STATE) required"
    variables = load_model_variables(state_path, drop_aggre=not cfg.NETWORK.AGGRE)

    if args.int8:
        from posetpu.data.prepare import make_prepare_fn
        from posetpu.train.serve import build_quant_from_variables, make_quant_eval_step

        prep = make_prepare_fn(cfg)
        calib = []
        n_feed = max(1, args.calib_batches)
        for i, host_batch in enumerate(loader):
            dev = prep(host_batch)
            imgs = np.asarray(dev["images"])
            calib.append(imgs.reshape((-1,) + imgs.shape[2:]))
            if i + 1 >= n_feed:
                break
        qat_batches = None
        if args.qat_steps > 0:
            # cycle the calibration images for the requested step count:
            # distillation QAT needs no labels, just serving-like pixels
            qat_batches = [calib[i % len(calib)] for i in range(args.qat_steps)]
            logger.info(f"=> QAT fine-tune: {args.qat_steps} steps @ lr {args.qat_lr}")
        subpixel = set(filter(None, args.int8_subpixel.split(",")))
        if args.int8_act4 == "l12":
            act4 = tuple(f"layer1_{i}.out" for i in range(3)) + tuple(
                f"layer2_{i}.out" for i in range(4))
        else:
            act4 = tuple(filter(None, args.int8_act4.split(",")))
        if act4:
            logger.info(f"=> int4 activation boundaries: {act4}")
        qparams, qfwd, bank = build_quant_from_variables(
            cfg, variables, calib, qat_batches=qat_batches, qat_lr=args.qat_lr,
            subpixel_deconvs=subpixel or False, act4=act4,
        )
        eval_step = make_quant_eval_step(
            qfwd, cfg, flip_pairs=dataset.flip_pairs, has_aggre=bank is not None,
        )
        logger.info("=> serving the int8 PTQ trunk")
        perf, name_values, _, _ = validate(
            cfg, loader, dataset, eval_step, {"q": qparams, "bank": bank},
            output_dir=output_dir, logger=logger,
        )
        logger.info(f"perf indicator: {perf:.4f}")
        return perf

    # eval scale-out over every local device (the nn.DataParallel equivalent,
    # run/pose2d/valid.py:169-171): batches sharded over a 1-D data mesh,
    # outputs gathered replicated in-graph
    from posetpu.parallel.mesh import data_mesh, global_batch_from_full_host

    mesh = data_mesh()
    use_mesh = (
        mesh.devices.size > 1
        and cfg.TEST.BATCH_SIZE % mesh.devices.size == 0
    )
    eval_step = make_eval_step(
        model, cfg, flip_pairs=dataset.flip_pairs,
        mesh=mesh if use_mesh else None,
    )
    place = (lambda t: global_batch_from_full_host(t, mesh)) if use_mesh else None
    logger.info(f"eval devices: {mesh.devices.size if use_mesh else 1}")
    with mesh:
        perf, name_values, _, _ = validate(
            cfg, loader, dataset, eval_step, variables,
            output_dir=output_dir, logger=logger, place_fn=place,
        )
    logger.info(f"perf indicator: {perf:.4f}")
    return perf


if __name__ == "__main__":
    main()
