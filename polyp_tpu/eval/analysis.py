"""Dataset analysis — the data_analysis.ipynb equivalent (C17, SURVEY §2):
split sizes and class-distribution summaries/pies for the polyp corpus."""

from __future__ import annotations

from pathlib import Path

import pandas as pd


def split_stats(csv_paths: dict[str, str | Path]) -> pd.DataFrame:
    """Per-split sizes and class counts. For the reference corpus this
    reproduces 788/113/225 and AD 535 / HP 131 / ASS 122
    (data_analysis.ipynb cells 2 & 4)."""
    rows = []
    for split, csv_path in csv_paths.items():
        df = pd.read_csv(csv_path)
        counts = df["cls"].value_counts().to_dict()
        rows.append({"split": split, "total": len(df),
                     **{f"n_{k}": v for k, v in sorted(counts.items())}})
    return pd.DataFrame(rows).fillna(0)


def class_distribution(csv_path: str | Path) -> dict[str, float]:
    df = pd.read_csv(csv_path)
    counts = df["cls"].value_counts()
    return {str(k): float(v) / len(df) for k, v in counts.items()}


def imbalance_ratio(csv_path: str | Path) -> float:
    """majority/minority count ratio — the problem statement in one number."""
    df = pd.read_csv(csv_path)
    counts = df["cls"].value_counts()
    return float(counts.max() / counts.min())


def plot_distribution_pies(csv_paths: dict[str, str | Path],
                           filename: str) -> str:
    """Class-distribution pie per split (the notebook's visual)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(csv_paths), figsize=(5 * len(csv_paths), 5))
    if len(csv_paths) == 1:
        axes = [axes]
    for ax, (split, csv_path) in zip(axes, csv_paths.items()):
        df = pd.read_csv(csv_path)
        counts = df["cls"].value_counts()
        ax.pie(counts.values, labels=counts.index, autopct="%1.1f%%")
        ax.set_title(f"{split} (n={len(df)})")
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(filename)
    plt.close(fig)
    return filename


def main(argv=None):
    import argparse

    from polyp_tpu.cli.common import DataLayout

    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--out", type=str, default="results/class_distribution.png")
    args = parser.parse_args(argv)
    layout = DataLayout(Path(args.data_root))
    csvs = {"train": layout.train_csv, "valid": layout.val_csv,
            "test": layout.test_csv}
    stats = split_stats(csvs)
    print(stats.to_string(index=False))
    print(f"train imbalance ratio: {imbalance_ratio(layout.train_csv):.2f}")
    print(f"pies at {plot_distribution_pies(csvs, args.out)}")


if __name__ == "__main__":
    main()
