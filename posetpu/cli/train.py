"""Training entry point — the run/pose2d/train.py equivalent.

    python -m posetpu.cli.train --cfg experiments/mixed/resnet50/...yaml \
        [--pseudo-path X.h5] [--no-distortion] [--epochs N]

Differences from the reference by design: no mp.spawn/NCCL — the same
process drives every local device through a 1-D data mesh (multi-host via
``--coordinator``); checkpoints are Orbax; BatchNorm is global-batch.
"""

from __future__ import annotations

import os



def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("Train multi-view pose network")
    p.add_argument("--pseudo-path", default="", help="pseudo label h5")
    p.add_argument("--no-distortion", action="store_true")
    p.add_argument("--epochs", type=int, default=0, help="override END_EPOCH")
    p.add_argument("--batch", type=int, default=0, help="override batch size")
    p.add_argument("--coordinator", default="", help="multi-host coordinator addr")
    p.add_argument("--num-processes", type=int, default=0)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    return p.parse_args()


def build_fund_extra(cfg, dataset):
    """Per-batch fundamental-matrix gather: loads the reference pickle bank if
    present, otherwise builds the exact bank from the dataset's calibration
    (better than the reference's cv2-fitted F — no data needed)."""
    import os

    from posetpu.geometry.fundamental import (
        build_fundamental_bank,
        load_reference_bank,
    )
    from posetpu.geometry.cameras import CameraParams

    pkl = os.path.join(cfg.DATASET.ROOT, "testdata", "fundamental_matrix.pkl")
    if os.path.exists(pkl):
        bank = load_reference_bank(pkl)
    else:
        h36m = getattr(dataset, "h36m", dataset)
        cams_by_subject = {}
        for items in h36m.grouping:
            rec = h36m.db[items[0]]
            subj = rec["subject"]
            if subj not in cams_by_subject:
                cams = [
                    CameraParams.from_dict(h36m.db[i]["camera"]) for i in items
                ]
                cams_by_subject[subj] = CameraParams.stack(cams)
        bank = build_fundamental_bank(cams_by_subject)
    default_subj = next(iter(bank))[0]

    from posetpu.geometry.fundamental import bank_to_batch

    def extra(host_batch, device_batch):
        subjects = [s if s >= 0 else default_subj for s in host_batch["subject"]]
        device_batch["fmats"] = bank_to_batch(bank, subjects)
        return device_batch

    return extra


def main():
    args = parse_args()
    from posetpu.cli.common import build_model, load_cfg, load_model_variables
    from posetpu.data.loader import GroupLoader
    from posetpu.data.prepare import make_prepare_fn
    from posetpu.data.registry import get_dataset
    from posetpu.parallel.mesh import (
        data_mesh,
        global_batch_from_full_host,
        initialize_distributed,
        replicate,
        shard_host_batch,
    )
    from posetpu.train.checkpoint import CheckpointManager
    from posetpu.train.loop import train_epoch, validate
    from posetpu.train.optim import make_optimizer
    from posetpu.train.step import init_train_state, make_eval_step, make_train_step
    from posetpu.train.state import TrainState
    from posetpu.utils.logging import ScalarWriter, create_logger

    cfg = load_cfg(args)
    if args.epochs:
        cfg.TRAIN.END_EPOCH = args.epochs
    if args.batch:
        cfg.TRAIN.BATCH_SIZE = args.batch

    # cluster preemption: fail fast and rely on ON_SERVER_CLUSTER auto-resume
    # (the reference installs the same fatal SIGTERM handler, train.py:47-48)
    import signal
    import sys as _sys

    def _sigterm(_sig, _frm):
        print("SIGTERM received — exiting for cluster resume", file=_sys.stderr)
        raise SystemExit(143)

    signal.signal(signal.SIGTERM, _sigterm)

    initialize_distributed(
        args.coordinator or None, args.num_processes or None, args.process_id
    )
    import jax

    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "train")
    writer = ScalarWriter(tb_dir)
    logger.info(f"devices: {jax.devices()}")

    train_ds = get_dataset(cfg.DATASET.TRAIN_DATASET)(
        cfg, cfg.DATASET.TRAIN_SUBSET, True,
        pseudo_label_path=args.pseudo_path or cfg.DATASET.PSEUDO_LABEL_PATH,
        no_distortion=args.no_distortion or cfg.DATASET.NO_DISTORTION,
    )
    test_ds = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False,
        no_distortion=args.no_distortion or cfg.DATASET.NO_DISTORTION,
    )
    n_proc = jax.process_count()
    train_loader = GroupLoader(
        train_ds, cfg.TRAIN.BATCH_SIZE, shuffle=cfg.TRAIN.SHUFFLE,
        num_shards=n_proc, shard_index=jax.process_index(),
    )
    if cfg.DATASET.IF_SAMPLE and hasattr(train_ds, "group_weights"):
        train_loader.set_weights(train_ds.group_weights(cfg))
        logger.info(
            f"IF_SAMPLE balancing on: h36m={cfg.DATASET.H36M_WEIGHT} "
            f"mpii={cfg.DATASET.MPII_WEIGHT}"
        )
    test_loader = GroupLoader(
        test_ds, cfg.TEST.BATCH_SIZE, shuffle=False, drop_last=False
    )
    logger.info(f"train groups: {len(train_ds)}, test groups: {len(test_ds)}")

    # the 1-D data mesh over every device of every process (the DDP world,
    # train.py:129-225); batches are sharded on axis 0, params replicated
    mesh = data_mesh()
    logger.info(f"data mesh: {mesh.devices.size} devices, "
                f"{n_proc} process(es)")
    local_ndev = jax.local_device_count()
    assert cfg.TRAIN.BATCH_SIZE % local_ndev == 0, (
        f"TRAIN.BATCH_SIZE ({cfg.TRAIN.BATCH_SIZE}) must be a multiple of "
        f"the local device count ({local_ndev}) for even batch sharding"
    )
    assert cfg.TEST.BATCH_SIZE % mesh.devices.size == 0, (
        f"TEST.BATCH_SIZE ({cfg.TEST.BATCH_SIZE}) must be a multiple of the "
        f"total device count ({mesh.devices.size})"
    )

    model = build_model(cfg, bf16=not args.f32)
    tx = make_optimizer(cfg, steps_per_epoch=max(len(train_loader), 1))
    eval_step = make_eval_step(
        model, cfg, flip_pairs=train_ds.flip_pairs, mesh=mesh
    )
    prepare = make_prepare_fn(cfg)

    sample = prepare(next(iter(train_loader)))
    state = init_train_state(model, cfg, tx, sample)

    # adversarial path: any MI/GAN loss enabled switches to the D/G step
    from posetpu.models.discriminators import build_discriminators

    disc_models = build_discriminators(cfg)
    adversarial = bool(disc_models)
    if adversarial:
        from posetpu.train.gan import (
            init_discriminator_states,
            make_adversarial_train_step,
        )

        tx_disc = {
            n: make_optimizer(cfg, max(len(train_loader), 1), discriminator=True)
            for n in disc_models
        }
        gan_step = make_adversarial_train_step(model, disc_models, cfg, tx, tx_disc)
        run_ctx = {"key": jax.random.PRNGKey(cfg.SEED), "parity": 0}
        state = {
            "base_model": state,
            **init_discriminator_states(
                cfg, disc_models, tx_disc, sample, model, state.variables
            ),
        }

        def train_step(states, batch):
            run_ctx["key"], sub = jax.random.split(run_ctx["key"])
            return gan_step(states, batch, sub, epoch_parity=run_ctx["parity"])
    else:
        run_ctx = {}
        train_step = make_train_step(model, cfg, tx)

    # warm start / resume (train.py:250-286)
    def base_of(st):
        return st["base_model"] if adversarial else st

    def states_of(st):
        return st if adversarial else {"base_model": st}

    def with_base(st, new_base):
        if adversarial:
            return {**st, "base_model": new_base}
        return new_base

    # async saves overlap the checkpoint's disk write with the next epoch
    # (the device->host fetch stays on this thread — a second thread
    # fetching concurrently with dispatch deadlocks the TPU backend);
    # multi-process runs fall back to synchronous collective saves
    ckpt = CheckpointManager(output_dir, async_save=True)
    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    if cfg.TRAIN.RESUME and cfg.TRAIN.RESUME_PATH:
        variables = load_model_variables(
            cfg.TRAIN.RESUME_PATH, drop_aggre=not cfg.NETWORK.AGGRE
        )
        base = base_of(state)
        state = with_base(
            state,
            TrainState(variables["params"], variables["batch_stats"],
                       base.opt_state, 0),
        )
        logger.info(f"=> warm start from {cfg.TRAIN.RESUME_PATH}")
    if cfg.TRAIN.ON_SERVER_CLUSTER and ckpt.exists("checkpoint"):
        restored, meta = ckpt.restore("checkpoint", states_of(state))
        state = restored if adversarial else restored["base_model"]
        begin_epoch = int(meta.get("epoch", 0))
        logger.info(f"=> auto-resume at epoch {begin_epoch}")

    extra = build_fund_extra(cfg, train_ds) if cfg.LOSS.USE_FUNDAMENTAL_LOSS else None

    best_perf = -1.0
    is_primary = jax.process_index() == 0

    def train_place(tree):
        return shard_host_batch(tree, mesh)

    def eval_place(tree):
        return global_batch_from_full_host(tree, mesh)

    with mesh:
        state = replicate(state, mesh)
        for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
            if adversarial:
                run_ctx["parity"] = epoch % 2
            state = train_epoch(
                cfg, train_loader, prepare, train_step, state, epoch,
                logger=logger if is_primary else None,
                writer=writer if is_primary else None,
                extra_batch_fn=extra, place_fn=train_place,
                debug_dir=os.path.join(output_dir, "debug")
                if (cfg.DEBUG.DEBUG and is_primary) else None,
            )
            # every process runs the (collective) eval; validate() itself
            # writes outputs on process 0 only
            perf, _, _, _ = validate(
                cfg, test_loader, test_ds, eval_step, base_of(state).variables,
                output_dir=output_dir, logger=logger, place_fn=eval_place,
            )
            if is_primary:
                writer.add_scalar("valid_perf", perf, epoch)
            is_best = perf > best_perf
            best_perf = max(best_perf, perf)
            every = max(1, int(getattr(cfg.TRAIN, "CHECKPOINT_EVERY", 1)))
            if is_best or (epoch + 1) % every == 0:
                # orbax save is collective — all processes participate
                ckpt.save_epoch(epoch + 1, states_of(state), perf, is_best)
        ckpt.save_final(states_of(state))
    if is_primary:
        logger.info(f"done; best perf {best_perf:.4f}")


if __name__ == "__main__":
    main()
