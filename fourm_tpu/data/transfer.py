"""Transfer-learning data utilities (reference fourm/data/transfer_utils.py:16 and
unified_datasets.py:93-131, dataset_utils.py:18-88)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .datasets import MultiModalDatasetFolder
from .masking import TransferMasking
from .modality_info import MODALITY_INFO
from .transforms import UnifiedDataTransform


class SubsampleDatasetWrapper:
    """Deterministic subset of a map-style dataset (reference dataset_utils.py:50)."""

    def __init__(self, dataset, dataset_size: Optional[int] = None, seed: int = 0,
                 return_orig_idx: bool = False):
        self.dataset = dataset
        self.return_orig_idx = return_orig_idx
        n = len(dataset)
        size = min(dataset_size or n, n)
        rng = np.random.RandomState(seed)
        self.indices = rng.permutation(n)[:size]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        idx = int(self.indices[i])
        sample = self.dataset[idx]
        return (sample, idx) if self.return_orig_idx else sample


class RepeatedDatasetWrapper:
    """Repeat a map-style dataset n times (reference dataset_utils.py:18)."""

    def __init__(self, dataset, num_repeats: int):
        self.dataset = dataset
        self.num_repeats = num_repeats

    def __len__(self):
        return len(self.dataset) * self.num_repeats

    def __getitem__(self, i):
        return self.dataset[i % len(self.dataset)]


def convert_samples_to_mod_dict(samples, input_mod: str, target_mod: str) -> Dict:
    """Wrap plain (input, target) pairs into a transfer mod dict
    (reference transfer_utils.py:16)."""
    return {input_mod: samples[0], target_mod: samples[1]}


def build_fm_transfer_dataset(
    data_path: str,
    modality_info: Dict,
    transform,
    modality_transforms: Dict,
    modalities: Sequence[str],
    modality_paths: Optional[Dict[str, str]] = None,
    max_samples: Optional[int] = None,
):
    """Transfer dataset: fixed input/target modality split
    (reference unified_datasets.py:93-131)."""
    return MultiModalDatasetFolder(
        data_path, list(modalities), modality_transforms, transform=transform,
        modality_paths=modality_paths, max_samples=max_samples,
    )
