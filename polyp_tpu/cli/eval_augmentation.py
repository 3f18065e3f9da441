"""Downstream augmentation eval CLI — mirrors
generator_model/test_diffusion_model.py: retrain the classifier on
real + generated samples and log test metrics into the generator's run.

Usage:
  polyp-eval-augmentation --path_model runs/lora --run_id <generator-run>
      [--ad_vs_rest]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from polyp_tpu.cli.common import (
    DataLayout,
    add_common_flags,
    get_mesh_from,
    get_tracker_from,
    print_banner,
)
from polyp_tpu.configs import ClassificationConfig
from polyp_tpu.eval.harness import AugmentedDataDirs, run_augmentation_eval
from polyp_tpu.utils.plotting import plot_confusion_matrix


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--path_model", type=str, required=True,
                        help="generation run folder containing samples/")
    parser.add_argument("--run_id", type=str, default=None,
                        help="generator run to log metrics into")
    parser.add_argument("--ad_vs_rest", action="store_true")
    parser.add_argument("--num_epochs", type=int, default=100)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args(argv)

    config = ClassificationConfig(
        image_size=args.image_size, batch_size=args.batch_size,
        num_epochs=args.num_epochs, weighted_sampling=True,
        one_vs_rest=args.ad_vs_rest)  # config_classification.py defaults
    layout = DataLayout(Path(args.data_root))
    dirs = AugmentedDataDirs(
        str(layout.train_images), str(layout.train_csv),
        str(layout.val_images), str(layout.val_csv),
        str(layout.test_images), str(layout.test_csv),
        str(Path(args.path_model) / "samples"))

    tracker = get_tracker_from(args)
    if args.experiment_name:
        tracker.set_experiment(args.experiment_name)

    # params.json dump next to the run artifacts (test_diffusion_model.py:358-360)
    params_path = Path(args.path_model) / "params.json"
    params_path.write_text(json.dumps({
        "image_size": config.image_size, "batch_size": config.batch_size,
        "num_epochs": config.num_epochs, "patience": config.patience,
        "learning_rate": config.learning_rate,
        "weight_decay": config.weight_decay,
        "hidden_features": config.hidden_features, "dropout": config.dropout,
        "weighted_sampling": config.weighted_sampling,
        "ad_vs_rest": args.ad_vs_rest,
    }, indent=2))

    print_banner("Augmented retrain + eval")
    metrics = run_augmentation_eval(config, dirs, tracker, args.run_id,
                                    args.ad_vs_rest, args.cache_dir,
                                    mesh=get_mesh_from(args))
    out = {k: round(metrics[k], 4)
           for k in ("accuracy", "precision", "recall", "f1_score")}
    if metrics.get("frechet") and metrics["frechet"]["per_class"]:
        out["frechet"] = {c: round(v, 4)
                          for c, v in metrics["frechet"]["per_class"].items()}
        out["frechet_extractor"] = metrics["frechet"]["extractor"]
    print(json.dumps(out))
    cm_path = Path(args.path_model) / "confusion_matrix_augmented.png"
    plot_confusion_matrix(metrics["confusion_matrix"], metrics["labels"],
                          str(cm_path))
    print(f"confusion matrix at {cm_path}")
    return metrics


if __name__ == "__main__":
    main()
