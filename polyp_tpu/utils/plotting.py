"""Plot utilities (loss curves, confusion matrix heatmap, image/mask
triples) — C16 parity (utils.py:3-48, classifier.py:208-223, 268-279).
matplotlib is an optional dependency; importing this module without it
raises only when a plot function is called."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_loss(train_losses, val_losses=None, filename="loss_history.png",
              title="Training and Validation Loss Curves") -> str:
    plt = _plt()
    plt.figure(figsize=(10, 6))
    plt.plot(range(1, len(train_losses) + 1), train_losses,
             label="Training Loss", color="blue", linestyle="-", marker="o")
    if val_losses is not None:
        plt.plot(range(1, len(val_losses) + 1), val_losses,
                 label="Validation Loss", color="red", linestyle="--",
                 marker="o")
    plt.title(title)
    plt.xlabel("Epochs")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid(True)
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(filename)
    plt.close()
    return str(filename)


def plot_confusion_matrix(cm: np.ndarray, labels, filename: str) -> str:
    """Annotated heatmap (classifier.py:268-279; seaborn optional)."""
    plt = _plt()
    plt.figure(figsize=(8, 6))
    try:
        import seaborn as sns
        sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                    xticklabels=labels, yticklabels=labels)
    except ImportError:
        plt.imshow(cm, cmap="Blues")
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                plt.text(j, i, str(cm[i, j]), ha="center", va="center")
        plt.xticks(range(len(labels)), labels)
        plt.yticks(range(len(labels)), labels)
    plt.xlabel("Predicted Label")
    plt.ylabel("True Label")
    plt.title("Confusion Matrix")
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(filename)
    plt.close()
    return str(filename)


def visualize_image(image, mask=None, masked_image=None, filename=None):
    """Image / mask / masked-image triple (utils.py:31-48)."""
    plt = _plt()
    if mask is not None and masked_image is not None:
        fig, ax = plt.subplots(1, 3, figsize=(15, 5))
        for a, (img, title, cmap) in zip(ax, [
                (image, "Original Image", None),
                (mask, "Mask (Polyp Region)", "gray"),
                (masked_image, "Masked Image (Polyp Extracted)", None)]):
            a.imshow(img, cmap=cmap)
            a.set_title(title)
            a.axis("off")
    else:
        fig, ax = plt.subplots(1, 1, figsize=(15, 5))
        ax.imshow(image)
        ax.set_title("Original Image")
        ax.axis("off")
    if filename:
        fig.savefig(filename)
        plt.close(fig)
        return filename
    return fig
