"""In-memory uint8 dataset cache.

The polyp corpus is tiny (788 train / 113 val / 225 test images — SURVEY §0),
so the whole dataset decoded at 224–256px fits comfortably in host RAM
(≤160 MB). `ArrayDataset` decodes/masks/resizes every image exactly once into
a contiguous uint8 [N,H,W,3] array; all later epochs are pure array slicing.
This replaces the reference's Dataset-object pickling cache
(classifier.py:57-101) with an npz file keyed on the table contents.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from polyp_tpu.data.io import load_preprocessed
from polyp_tpu.data.tables import Table


@dataclass
class ArrayDataset:
    images: np.ndarray  # uint8 [N, H, W, 3]
    labels: np.ndarray  # int32 [N]
    label2idx: dict[str, int]

    @property
    def idx2label(self) -> dict[int, str]:
        return {idx: label for label, idx in self.label2idx.items()}

    @property
    def num_classes(self) -> int:
        return len(set(self.label2idx.values()))

    def __len__(self) -> int:
        return len(self.labels)

    @staticmethod
    def from_table(table: Table, image_size: int,
                   cache_dir: str | Path | None = None) -> "ArrayDataset":
        """Materialize a Table; optionally persist/load an npz cache keyed on
        (paths, labels, size) so repeated runs skip decoding."""
        cache_path = None
        if cache_dir is not None:
            digest = hashlib.sha256(json.dumps(
                [table.image_paths, table.labels, table.mask_paths, image_size]
            ).encode()).hexdigest()[:16]
            cache_path = Path(cache_dir) / f"polyp_cache_{digest}.npz"
            if cache_path.exists():
                z = np.load(cache_path)
                return ArrayDataset(z["images"], z["labels"], dict(table.label2idx))

        n = len(table)
        images = np.empty((n, image_size, image_size, 3), dtype=np.uint8)
        for i, path in enumerate(table.image_paths):
            mask = table.mask_paths[i] if table.mask_paths is not None else None
            images[i] = load_preprocessed(path, image_size, mask)
        labels = np.asarray(table.labels, dtype=np.int32)

        if cache_path is not None:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(cache_path, images=images, labels=labels)
        return ArrayDataset(images, labels, dict(table.label2idx))

    @staticmethod
    def from_arrays(images: np.ndarray, labels: np.ndarray,
                    label2idx: dict[str, int]) -> "ArrayDataset":
        return ArrayDataset(np.asarray(images, dtype=np.uint8),
                            np.asarray(labels, dtype=np.int32), dict(label2idx))
