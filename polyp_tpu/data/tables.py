"""Dataset index tables: (image path, label, optional mask path) lists with
the reference's exact label semantics, decoupled from image IO.

Three flavors mirror the reference's three Dataset classes:

* `ClassificationTable`  ← classifier_model/PolypDataset.py:11-43
* `DiffusionTable`       ← generator_model/PolypDiffusionDataset.py:12-50
* `AugmentedTable`       ← generator_model/AugmentedPolypDataset.py:10-41
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import pandas as pd


@dataclass
class Table:
    image_paths: list[str]
    labels: list[int]
    label2idx: dict[str, int]
    mask_paths: list[str] | None = None
    transformations_list: list[str] = field(
        default_factory=lambda: ["resize", "randomHorizontalFlip", "normalize"])

    @property
    def idx2label(self) -> dict[int, str]:
        # Inverted in insertion order; for the classification map
        # {'AD':0,'ASS':1,'HP':1} the later duplicate wins, matching the
        # reference dict comprehension (PolypDataset.py:20).
        return {idx: label for label, idx in self.label2idx.items()}

    @property
    def num_classes(self) -> int:
        return len(set(self.label2idx.values()))

    def __len__(self) -> int:
        return len(self.image_paths)


class ClassificationTable:
    """CSV-labeled `.tif` directory with the fixed label map
    {'AD':0,'ASS':1,'HP': 1 if one_vs_rest else 2} (PolypDataset.py:19)."""

    @staticmethod
    def from_csv(image_dir: str | Path, csv_file: str | Path,
                 mask_dir: str | Path | None = None,
                 one_vs_rest: bool = False) -> Table:
        df = pd.read_csv(csv_file)
        label2idx = {"AD": 0, "ASS": 1, "HP": 1 if one_vs_rest else 2}
        image_paths, labels, mask_paths = [], [], []
        for _, row in df.iterrows():
            image_paths.append(os.path.join(str(image_dir), f"{row['image_id']}.tif"))
            labels.append(label2idx[row["cls"]])
            if mask_dir is not None:
                mask_paths.append(os.path.join(str(mask_dir), f"{row['image_id']}.tif"))
        return Table(image_paths, labels, label2idx,
                     mask_paths if mask_dir is not None else None)


class DiffusionTable:
    """Multi-directory dataset with per-class filtering and REST merging
    (PolypDiffusionDataset.py:26-50): `keep_one_class` restricts to a class
    list; with >1 kept classes, the first is primary and the rest collapse
    into "REST". Label indices are assigned dynamically in encounter order
    (:35-38)."""

    @staticmethod
    def from_dirs(image_dirs: Sequence[str | Path],
                  csv_files: Sequence[str | Path],
                  mask_dirs: Sequence[str | Path] | None = None,
                  keep_one_class: str | Sequence[str] | None = None) -> Table:
        if isinstance(keep_one_class, str):
            keep_one_class = [keep_one_class]
        label2idx: dict[str, int] = {}
        image_paths, labels, mask_paths = [], [], []
        for i, (img_dir, csv_file) in enumerate(zip(image_dirs, csv_files)):
            df = pd.read_csv(csv_file)
            if keep_one_class is not None:
                df = df[df["cls"].isin(keep_one_class)]
                if len(keep_one_class) > 1:
                    primary = keep_one_class[0]
                    df = df.assign(
                        cls=df["cls"].map(lambda x: primary if x == primary else "REST"))
            for cls_name in df["cls"].unique():
                if cls_name not in label2idx:
                    label2idx[cls_name] = len(label2idx)
            for _, row in df.iterrows():
                image_paths.append(os.path.join(str(img_dir), f"{row['image_id']}.tif"))
                labels.append(label2idx[row["cls"]])
                if mask_dirs is not None:
                    mask_paths.append(
                        os.path.join(str(mask_dirs[i]), f"{row['image_id']}.tif"))
        return Table(image_paths, labels, label2idx,
                     mask_paths if mask_dirs is not None else None)


def extract_label_from_dir(image_dir: str | Path, label2idx: dict[str, int]) -> str:
    """Synthetic-sample label from the directory basename; any non-AD dir
    maps to REST when a REST class exists (AugmentedPolypDataset.py:68-72)."""
    label = os.path.basename(str(image_dir).rstrip("/"))
    if label2idx.get("REST") is not None and label != "AD":
        return "REST"
    return label


class AugmentedTable:
    """Real CSV-labeled `.tif` dirs mixed with synthetic dirs whose labels
    come from the directory basename and whose files are `.png`
    (AugmentedPolypDataset.py:20-41)."""

    @staticmethod
    def from_dirs(dirs: Sequence[tuple[str | Path, str | Path | None]],
                  ad_vs_rest: bool = False) -> Table:
        label2idx = ({"AD": 0, "REST": 1} if ad_vs_rest
                     else {"AD": 0, "ASS": 1, "HP": 2})
        image_paths, labels = [], []
        for image_dir, csv_file in dirs:
            if csv_file is not None:
                df = pd.read_csv(csv_file)
                for _, row in df.iterrows():
                    label = row["cls"]
                    if ad_vs_rest:
                        label = "REST" if label != "AD" else "AD"
                    image_paths.append(
                        os.path.join(str(image_dir), f"{row['image_id']}.tif"))
                    labels.append(label2idx[label])
            else:
                label = extract_label_from_dir(image_dir, label2idx)
                for file in sorted(os.listdir(image_dir)):
                    if file.endswith(".png"):
                        image_paths.append(os.path.join(str(image_dir), file))
                        labels.append(label2idx[label])
        return Table(image_paths, labels, label2idx)
