"""Mixed MPII + MultiviewH36M dataset.

Equivalent of lib/dataset/mixed_dataset_compatible.py:20-78: concatenates the
h36m db with the mpii db, reindexes mpii groups past the h36m records, and
keeps per-source augmentation parameters. (The reference's ``IF_SAMPLE``
weighted sampling is unimplemented there — utils.py:119-126 — and the batch
balancing lives in the loader here instead.)
"""

from __future__ import annotations

import numpy as np

from posetpu.data.base import JointsDataset
from posetpu.data.h36m import MultiViewH36M
from posetpu.data.mpii import MPIIDataset


class MixedDataset(JointsDataset):
    def __init__(self, cfg, subset: str, is_train: bool,
                 pseudo_label_path: str = "", no_distortion: bool = False):
        super().__init__(cfg, subset, is_train)
        self.h36m = MultiViewH36M(
            cfg, "train", is_train,
            pseudo_label_path=pseudo_label_path, no_distortion=no_distortion,
        )
        self.mpii = MPIIDataset(cfg, "train", is_train)

        self.db = self.h36m.db + self.mpii.db
        offset = len(self.h36m.db)
        self.grouping = self.h36m.grouping + [
            [i + offset for i in g] for g in self.mpii.grouping
        ]
        self.u2a_mapping = self.h36m.u2a_mapping
        self.pseudo_label = self.h36m.pseudo_label
        self.no_distortion = no_distortion
        self.dataset_type = "mixed"
        self.aug_param_dict = {
            **self.h36m.aug_param_dict,
            **self.mpii.aug_param_dict,
        }

    def load_record(self, idx: int, rs: np.random.RandomState,
                    defer_image: bool = False):
        # pseudo-label substitution applies only to the h36m span of the db
        self.pseudo_label = self.h36m.pseudo_label
        return super().load_record(idx, rs, defer_image=defer_image)

    def group_weights(self, cfg) -> np.ndarray:
        """Per-group sampling weights for batch balancing (H36M_WEIGHT /
        MPII_WEIGHT — the reference's IF_SAMPLE intent, utils.py:119-126)."""
        w = np.empty(len(self.grouping), np.float64)
        w[: len(self.h36m)] = float(cfg.DATASET.H36M_WEIGHT)
        w[len(self.h36m):] = float(cfg.DATASET.MPII_WEIGHT)
        return w

    def evaluate(self, pred, output_dir=None):
        raise NotImplementedError("evaluate per-source datasets instead")
