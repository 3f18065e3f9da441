"""Downstream augmentation eval harness — the project's quality metric.

Re-implements test_diffusion_model.py (C14, SURVEY §3.4): retrain the
classifier on real train data + generated `samples/{cls}` directories and
score weighted F1 on the real test set, logging the metrics into the
*generator's* tracker run (run-linking) — closing the
generate → augment → retrain → F1 loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import numpy as np

from polyp_tpu.configs import ClassificationConfig
from polyp_tpu.data import ArrayDataset, AugmentedTable, Loader, weighted_sample_weights
from polyp_tpu.eval.metrics import balanced_class_weights
from polyp_tpu.track import Tracker
from polyp_tpu.train.classifier import (
    create_classifier_state,
    evaluate_classifier,
    train_classifier,
)


@dataclass
class AugmentedDataDirs:
    """Directory layout of a generation run (test_diffusion_model.py:28-70)."""

    train_images: str
    train_csv: str
    val_images: str
    val_csv: str
    test_images: str
    test_csv: str
    samples_root: str  # contains AD/ HP/ ASS/ or AD/ REST/

    def train_dirs(self, ad_vs_rest: bool) -> list[tuple[str, str | None]]:
        sample_classes = ["AD", "REST"] if ad_vs_rest else ["AD", "HP", "ASS"]
        dirs: list[tuple[str, str | None]] = [(self.train_images, self.train_csv)]
        for cls in sample_classes:
            d = Path(self.samples_root) / cls
            if d.exists():
                dirs.append((str(d), None))
        return dirs


def build_augmented_datasets(dirs: AugmentedDataDirs, image_size: int,
                             ad_vs_rest: bool = False,
                             cache_dir: str | None = None):
    train = ArrayDataset.from_table(
        AugmentedTable.from_dirs(dirs.train_dirs(ad_vs_rest), ad_vs_rest),
        image_size, cache_dir)
    val = ArrayDataset.from_table(
        AugmentedTable.from_dirs([(dirs.val_images, dirs.val_csv)], ad_vs_rest),
        image_size, cache_dir)
    test = ArrayDataset.from_table(
        AugmentedTable.from_dirs([(dirs.test_images, dirs.test_csv)], ad_vs_rest),
        image_size, cache_dir)
    return train, val, test


def run_augmentation_eval(
    config: ClassificationConfig,
    dirs: AugmentedDataDirs,
    tracker: Tracker | None = None,
    run_id: str | None = None,
    ad_vs_rest: bool = False,
    cache_dir: str | None = None,
    mesh=None,
) -> dict:
    """Train-on-augmented + evaluate-on-real; returns the metric dict and
    logs into the generator's run when (tracker, run_id) are given."""
    train, val, test = build_augmented_datasets(dirs, config.image_size,
                                                ad_vs_rest, cache_dir)
    weights = (weighted_sample_weights(train.labels)
               if config.weighted_sampling else None)
    class_weights = None
    if config.weighted_loss:
        cw = balanced_class_weights(train.labels)
        class_weights = np.asarray([cw[i] for i in sorted(cw)], np.float32)

    train_loader = Loader(train.images, train.labels, config.batch_size,
                          seed=config.seed, drop_last=True, weights=weights,
                          mesh=mesh, process_shard=mesh is not None)
    val_loader = Loader(val.images, val.labels, config.batch_size,
                        seed=config.seed, shuffle=False, mesh=mesh)
    test_loader = Loader(test.images, test.labels, config.batch_size,
                         seed=config.seed, shuffle=False, mesh=mesh)

    state, _ = create_classifier_state(config, train.num_classes,
                                       jax.random.PRNGKey(config.seed))
    if mesh is not None:
        from polyp_tpu.parallel import replicate_to
        state = replicate_to(state, mesh)
    log = None
    if tracker is not None and run_id is not None:
        def log(k, v, s):
            tracker.log_metric(k, v, s)

    # Per-class generated-sample fidelity: Fréchet distance between real
    # train images and samples/{cls} (eval/fid.py — uncalibrated random
    # backbone until ImageNet weights are supplied; `frechet["calibrated"]`
    # says which). The reference has no direct analogue — its only fidelity
    # signal is the downstream F1 itself (test_diffusion_model.py:250-253).
    frechet = None
    if Path(dirs.samples_root).exists():
        from polyp_tpu.eval.fid import class_frechet_distances
        frechet = class_frechet_distances(
            dirs.train_images, dirs.train_csv, dirs.samples_root,
            ad_vs_rest, config.image_size, cache_dir=cache_dir)

    if tracker is not None and run_id is not None:
        with tracker.start_run(run_id=run_id):
            state, result = train_classifier(config, state, train_loader,
                                             val_loader, class_weights, log)
            best = state.replace(params=result.best_params,
                                 batch_stats=result.best_batch_stats)
            metrics = evaluate_classifier(best, test_loader, test.idx2label,
                                          config.mixed_precision)
            for key in ("accuracy", "precision", "recall", "f1_score"):
                # reference logs 4-decimal strings (test_diffusion_model.py:250-253)
                tracker.log_metric(key if key != "accuracy" else "test_accuracy",
                                   round(metrics[key], 4))
            if frechet and frechet["per_class"]:
                tracker.log_param("frechet_extractor", frechet["extractor"])
                for cls, val in frechet["per_class"].items():
                    tracker.log_metric(f"frechet_{cls}", round(val, 4))
    else:
        state, result = train_classifier(config, state, train_loader,
                                         val_loader, class_weights, log)
        best = state.replace(params=result.best_params,
                             batch_stats=result.best_batch_stats)
        metrics = evaluate_classifier(best, test_loader, test.idx2label,
                                      config.mixed_precision)
    if frechet is not None:
        metrics["frechet"] = frechet
    metrics["train_size"] = len(train)
    return metrics
