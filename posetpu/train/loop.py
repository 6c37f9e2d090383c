"""Epoch-level train/validate orchestration.

Host-side equivalents of train()/validate() (lib/core/function.py:91-690)
around the jitted steps: the hot loop is one device call per batch; the host
only shuffles, prefetches, accumulates eval arrays and writes the H5 dump.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from posetpu.data.base import sorted_union_indices
from posetpu.data.h5io import save_heatmaps
from posetpu.data.loader import GroupLoader
from posetpu.data.prepare import make_prepare_fn
from posetpu.utils.logging import AverageMeter


def train_epoch(cfg, loader: GroupLoader, prepare, train_step, state,
                epoch: int, logger=None, writer=None, extra_batch_fn=None,
                debug_dir: str | None = None, place_fn=None):
    """One training epoch. ``extra_batch_fn(host_batch, device_batch)`` lets
    callers inject per-batch extras (e.g. per-sample fundamental matrices
    gathered by subject). With ``debug_dir`` set and DEBUG.DEBUG on, dumps
    GT-joint/heatmap grids every PRINT_FREQ like the reference
    (function.py:521-526).

    ``place_fn`` (from :func:`posetpu.parallel.mesh.shard_host_batch`) places
    the raw host batch onto the data mesh sharded on axis 0 BEFORE the jitted
    prepare, so the normalise/render frontend and the train step both run
    sharded — the DDP-equivalent scale-out of the reference's training entry
    (run/pose2d/train.py:129-225). Extras injected after prepare are placed
    with the same fn."""
    from posetpu.utils.profiling import StepTimer

    loader.set_epoch(epoch)
    meters: dict[str, AverageMeter] = {}
    timer = StepTimer()
    nviews = 4
    for i, host_batch in enumerate(loader):
        timer.data_ready()
        batch = prepare(place_fn(host_batch) if place_fn else host_batch)
        if extra_batch_fn is not None:
            known = set(batch)
            batch = extra_batch_fn(host_batch, batch)
            if place_fn is not None:
                for k in set(batch) - known:
                    batch[k] = place_fn(batch[k])
        state, metrics = train_step(state, batch)
        nimgs = host_batch["images"].shape[0] * nviews
        if logger is not None and i % cfg.PRINT_FREQ == 0:
            # scalar fetch here is also the device sync for the timing
            timer.step_done(metrics["loss"])
            from posetpu.utils.checks import check_finite_metrics

            check_finite_metrics(metrics, i)
            parts = []
            for k in sorted(metrics):
                v = float(metrics[k])
                meters.setdefault(k, AverageMeter()).update(v, nimgs)
                parts.append(f"{k} {meters[k].val:.5f} ({meters[k].avg:.5f})")
            perf = timer.summary(samples_per_step=nimgs)
            speed = perf.get("samples_per_s", 0.0)
            mem = perf.get("bytes_in_use", -1)
            h36m_pct = float(np.mean(host_batch["is_h36m"]))
            src_msg = f"h36m {h36m_pct:.1%} other {1 - h36m_pct:.1%}"
            logger.info(
                f"Epoch [{epoch}][{i}/{len(loader)}] "
                f"Speed {speed:.1f} samples/s\tData {perf.get('data_ms', 0):.1f}ms\t"
                f"Memory {mem}\t" + "\t".join(parts) + "\t" + src_msg
            )
            if writer is not None:
                base = state["base_model"] if isinstance(state, dict) else state
                for k, m in meters.items():
                    writer.add_scalar(f"train_{k}", m.val, int(base.step))
            if debug_dir is not None and cfg.DEBUG.DEBUG:
                from posetpu.parallel.mesh import local_data
                from posetpu.utils.vis import save_debug_images

                dv = batch  # device batch has normalised images + targets
                v0 = 0  # first view, like the reference's per-view loop
                # multi-controller: fetch only the process-local shard
                # (np.asarray on a global array raises); pair it with the
                # same count of host-local rows
                imgs = local_data(dv["images"])[:, v0]
                tgt = local_data(dv["target"])[:, v0]
                nloc = imgs.shape[0]
                prefix = os.path.join(debug_dir, f"train_view1_{i:08d}")
                save_debug_images(
                    cfg,
                    imgs,
                    np.asarray(host_batch["joints_crop"][:nloc, v0]),
                    np.asarray(host_batch["joints_vis"][:nloc, v0]),
                    np.asarray(host_batch["joints_crop"][:nloc, v0]),
                    tgt,
                    tgt,
                    prefix,
                )
        else:
            timer.step_done()
    return state


def validate(cfg, loader: GroupLoader, dataset, eval_step, variables,
             output_dir: str | None = None, logger=None, place_fn=None):
    """Full validation pass: per-batch jitted eval, host accumulation in the
    reference's ``k::nviews`` interleaved layout, H5 dump with the union-joint
    subset, then ``dataset.evaluate`` (function.py:529-690).

    Multi-chip: ``place_fn`` (from
    :func:`posetpu.parallel.mesh.global_batch_from_full_host`) shards each
    batch over the data mesh; EVERY process iterates the full (unsharded)
    test loader in lockstep so the eval collectives are safe, the eval step
    gathers its outputs replicated, and only process 0 writes the H5/eval
    outputs — the mesh equivalent of the reference's rank-0 accumulation
    (run/pose2d/train.py:361-391)."""
    import jax

    nviews = 4
    is_primary = jax.process_index() == 0
    loss_meter = AverageMeter()
    acc_meter = AverageMeter()
    all_preds: list[np.ndarray] = []
    all_heatmaps: list[np.ndarray] = []

    for host_batch in loader:
        n = host_batch["images"].shape[0]
        if place_fn is not None and n < loader.batch_size:
            # pad the ragged final batch up to the static batch size so its
            # leading axis stays shardable (and the jit doesn't recompile);
            # padded rows wrap around real ones and are sliced off below
            host_batch = _pad_host_batch(host_batch, loader.batch_size)
        batch = eval_prepare(cfg, host_batch, place_fn)
        out = eval_step(variables, batch)
        nimgs = n * nviews
        loss_meter.update(float(out["loss"]), nimgs)
        acc_meter.update(float(out["acc"]), nimgs)

        preds = np.asarray(out["preds"])[:n]  # [N, V, J, 2]
        maxv = np.asarray(out["maxvals"])[:n][..., None]  # [N, V, J, 1]
        pred3 = np.concatenate([preds, maxv], axis=-1)
        hm = np.moveaxis(np.asarray(out["heatmaps"])[:n], -1, 2)  # [N, V, J, h, w]
        # interleave views like the reference's preds[k::nviews] fill
        all_preds.append(pred3.reshape(nimgs, *pred3.shape[2:]))
        all_heatmaps.append(hm.reshape(nimgs, *hm.shape[2:]))

    all_preds = np.concatenate(all_preds) if all_preds else np.zeros((0, 16, 3))
    all_heatmaps = np.concatenate(all_heatmaps) if all_heatmaps else np.zeros((0, 16, 4, 4))

    u = sorted_union_indices(dataset.u2a_mapping)
    if output_dir and is_primary:
        path = os.path.join(
            output_dir,
            f"heatmaps_locations_{dataset.subset}_{dataset.dataset_type}.h5",
        )
        save_heatmaps(path, all_heatmaps[:, u], all_preds[:, u], u)
        if logger:
            logger.info(f"=> heatmap dump: {path}")

    preds_dir = (
        output_dir if (output_dir and cfg.DEBUG.SAVE_ALL_PREDS and is_primary)
        else None
    )
    name_values, perf = dataset.evaluate(all_preds[:, u, :], preds_dir)
    if logger and is_primary:
        names = list(name_values.keys())
        logger.info("| Arch " + " ".join(f"| {n}" for n in names) + " |")
        logger.info("|---" * (len(names) + 1) + "|")
        logger.info(
            "| posetpu "
            + " ".join(f"| {v:.3f}" for v in name_values.values())
            + " |"
        )
        logger.info(f"validate: loss {loss_meter.avg:.4f} acc {acc_meter.avg:.3f}")
    return perf, name_values, all_preds, all_heatmaps


def _pad_host_batch(host_batch: dict, to_n: int) -> dict:
    """Pad every leading axis to ``to_n`` rows by wrapping around the real
    rows (keeps batch statistics roughly unbiased; callers slice outputs back
    to the true count)."""
    n = next(iter(host_batch.values())).shape[0]
    idx = np.arange(to_n) % n
    return {k: np.asarray(v)[idx] for k, v in host_batch.items()}


_eval_prepare_cache: dict[int, Any] = {}


def eval_prepare(cfg, host_batch, place_fn=None):
    key = id(cfg)
    fn = _eval_prepare_cache.get(key)
    if fn is None:
        fn = make_prepare_fn(cfg)
        _eval_prepare_cache[key] = fn
    return fn(place_fn(host_batch) if place_fn else host_batch)
