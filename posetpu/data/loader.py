"""Batching group loader with distributed sharding and threaded prefetch.

The reference uses torch DataLoader + DistributedSampler (lib/utils/
utils.py:118-153): per-rank subsets, per-epoch reshuffling, worker processes.
Here: a plain-Python loader that shards groups across processes, reshuffles
with a per-epoch seed (``set_epoch`` semantics), collates groups into
``[N, V, ...]`` numpy batches, and overlaps host work with device steps via a
small thread pool — the host side of the TPU input pipeline (the device side
is posetpu.data.prepare).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

COLLATE_KEYS = (
    "image", "joints_crop", "joints_vis", "supervise", "center", "scale",
    "rotation", "joints_2d", "is_h36m", "subject",
)


def collate_groups(groups: list[list[dict]]) -> dict[str, np.ndarray]:
    """list of groups (each a list of V per-view record dicts) ->
    {key: [N, V, ...]} arrays; 'image' becomes 'images' uint8 NHWC."""
    out = {}
    for key in COLLATE_KEYS:
        rows = [np.stack([view[key] for view in g]) for g in groups]
        out[key] = np.stack(rows)
    out["images"] = out.pop("image")
    out["is_h36m"] = out["is_h36m"][:, 0]  # per-group flag
    out["subject"] = out["subject"][:, 0]
    out["supervise"] = out["supervise"][:, 0]
    return out


class GroupLoader:
    """Iterates dataset groups in shuffled, sharded, collated batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0
        # per-group sampling weights (the reference's unimplemented IF_SAMPLE
        # balancing, lib/utils/utils.py:119-126): when set, each epoch draws
        # len(dataset) groups with replacement proportionally
        self.weights = None

    def _run_native_jobs(self, groups: list[list[dict]]) -> None:
        """Resolve deferred records with ONE C++ threaded batch call.

        Records carrying a ``_native_job`` (see JointsDataset.load_record)
        are decoded+warped by ptpu_load_warp_batch_geom on pthreads (no GIL);
        per-record failures fall back to the Python path."""
        jobs = [v for g in groups for v in g if "_native_job" in v]
        if not jobs:
            return
        from posetpu import native

        paths = [v["_native_job"][0] for v in jobs]
        inners = [v["_native_job"][1] for v in jobs]
        geoms = np.stack([v["_native_job"][2] for v in jobs])
        h, w = (
            int(self.dataset.image_size[1]),
            int(self.dataset.image_size[0]),
        )
        res = native.load_warp_batch_geom(
            paths, inners, geoms, h, w, n_threads=self.num_threads
        )
        if res is None:  # lib vanished between eligibility check and call
            for v in jobs:
                self.dataset.fallback_record(v)
            return
        imgs, widths, _fails = res
        for v, img, width in zip(jobs, imgs, widths):
            if width < 0:
                self.dataset.fallback_record(v)
            else:
                self.dataset.finalize_record(v, img, int(width))

    def set_weights(self, weights) -> None:
        self.weights = None if weights is None else np.asarray(weights, np.float64)

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch reshuffle seed (DistributedSampler.set_epoch,
        train.py:361)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.weights is not None and self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            p = self.weights / self.weights.sum()
            idx = rs.choice(n, size=n, replace=True, p=p)
        else:
            idx = np.arange(n)
            if self.shuffle:
                rs = np.random.RandomState(self.seed + self.epoch)
                rs.shuffle(idx)
        # pad so every shard sees the same count (DistributedSampler semantics)
        if self.num_shards > 1:
            per = int(np.ceil(n / self.num_shards))
            idx = np.concatenate([idx, idx[: per * self.num_shards - n]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else int(np.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

        def load_batch(b, batch_ids):
            rs = np.random.RandomState(
                (self.seed + self.epoch) * 100003 + b * 1009 + self.shard_index
            )
            groups = [
                self.dataset.load_group(int(g), rs, defer_images=True)
                for g in batch_ids
            ]
            self._run_native_jobs(groups)
            return collate_groups(groups)

        if self.prefetch <= 0:
            for b, ids in enumerate(batches):
                yield load_batch(b, ids)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b, ids in enumerate(batches):
                    if stop.is_set():
                        return
                    q.put(load_batch(b, ids))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
