# %% [markdown]
# # Polyp classifier walkthrough
#
# Cell-structured script twin of the reference's interactive notebook
# (classifier_model/classification_model.ipynb, SURVEY §2 C18): build the
# datasets, inspect a batch, train the EfficientNet-B0 classifier, and
# evaluate — step by step through the polyp_tpu public API. Run whole-file
# or cell-by-cell in any `# %%`-aware editor / jupytext.
#
# Expects the reference corpus layout under --data-root (see
# polyp_tpu.cli.common.DataLayout); falls back to a synthetic mini-corpus
# when the real data is absent so the walkthrough always runs.

# %%
import argparse
import sys
from pathlib import Path

import jax
import numpy as np

from polyp_tpu.configs import ClassificationConfig
from polyp_tpu.data import (
    ArrayDataset, ClassificationTable, Loader, weighted_sample_weights,
)
from polyp_tpu.eval.analysis import split_stats
from polyp_tpu.train.classifier import (
    create_classifier_state, evaluate_classifier, train_classifier,
)

parser = argparse.ArgumentParser()
parser.add_argument("--data-root", default="./data")
parser.add_argument("--image-size", type=int, default=224)
parser.add_argument("--epochs", type=int, default=5)
args, _ = parser.parse_known_args()

# %% Build (or fabricate) the corpus --------------------------------------
root = Path(args.data_root)
train_csv = root / "m_train2/m_train/train.csv"
if not train_csv.exists():
    print("real corpus absent — fabricating a synthetic mini-corpus")
    from PIL import Image
    rng = np.random.default_rng(0)
    for split, csv_name, classes in [
            ("m_train2/m_train", "train.csv", ["AD"] * 12 + ["HP"] * 5 + ["ASS"] * 5),
            ("m_valid/m_valid", "valid.csv", ["AD"] * 4 + ["HP"] * 2 + ["ASS"] * 2),
            ("m_test/m_test", "gt_test.csv", ["AD"] * 4 + ["HP"] * 2 + ["ASS"] * 2)]:
        img_dir = root / split / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        rows = []
        for i, cls in enumerate(classes):
            base = {"AD": 40, "HP": 130, "ASS": 210}[cls]
            arr = np.clip(base + rng.integers(0, 40, (48, 48, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(img_dir / f"s{i}.tif")
            rows.append(f"s{i},{cls}")
        (root / split / csv_name).write_text(
            "image_id,cls\n" + "\n".join(rows) + "\n")
    args.image_size = min(args.image_size, 48)

# %% Dataset statistics (the data_analysis.ipynb view) ---------------------
from polyp_tpu.cli.common import DataLayout

layout = DataLayout(root)
print(split_stats({"train": layout.train_csv, "valid": layout.val_csv,
                   "test": layout.test_csv}).to_string(index=False))

# %% Tables → cached arrays -------------------------------------------------
train = ArrayDataset.from_table(
    ClassificationTable.from_csv(layout.train_images, layout.train_csv),
    args.image_size)
val = ArrayDataset.from_table(
    ClassificationTable.from_csv(layout.val_images, layout.val_csv),
    args.image_size)
test = ArrayDataset.from_table(
    ClassificationTable.from_csv(layout.test_images, layout.test_csv),
    args.image_size)
print(f"label map: {train.label2idx}; splits "
      f"{len(train)}/{len(val)}/{len(test)}")

# %% Inspect a batch (the notebook's `inspect_batch` cell) ------------------
loader = Loader(train.images, train.labels, batch_size=8, seed=0,
                weights=weighted_sample_weights(train.labels))
images, labels, valid = next(iter(loader))
print("batch:", images.shape, images.dtype,
      "labels:", np.asarray(labels).tolist())

# %% Train ------------------------------------------------------------------
config = ClassificationConfig(image_size=args.image_size, batch_size=8,
                              num_epochs=args.epochs, hidden_features=64,
                              weighted_sampling=True)
state, _ = create_classifier_state(config, train.num_classes,
                                   jax.random.PRNGKey(0))
val_loader = Loader(val.images, val.labels, 8, shuffle=False)
state, result = train_classifier(
    config, state, loader, val_loader,
    log=lambda k, v, s: print(f"  epoch {s} {k}={v:.4f}"))
print("best val accuracy:", result.best_val_acc)

# %% Evaluate ---------------------------------------------------------------
best = state.replace(params=result.best_params,
                     batch_stats=result.best_batch_stats)
test_loader = Loader(test.images, test.labels, 8, shuffle=False)
metrics = evaluate_classifier(best, test_loader, test.idx2label,
                              config.mixed_precision)
print({k: round(metrics[k], 4)
       for k in ("accuracy", "precision", "recall", "f1_score")})
print("confusion matrix:\n", metrics["confusion_matrix"])
