"""Dataset registry mirroring the reference's names
(lib/dataset/__init__.py:12-17)."""

from __future__ import annotations

from posetpu.data.coco import COCODataset, COCOMPIIDataset
from posetpu.data.h36m import MultiViewH36M
from posetpu.data.mixed import MixedDataset
from posetpu.data.mpii import MPIIDataset

DATASETS = {
    "mpii": MPIIDataset,
    "multiview_h36m": MultiViewH36M,
    "mixed": MixedDataset,
    "mixed_dataset": MixedDataset,
    "coco": COCODataset,
    "coco_mpii": COCOMPIIDataset,
}


def get_dataset(name: str):
    return DATASETS[name]
