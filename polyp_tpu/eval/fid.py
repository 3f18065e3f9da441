"""Fréchet distance (FID-style) evaluation of generated samples.

BASELINE.json's north star names FID against the torch baseline as the
sample-fidelity check. Standard FID uses InceptionV3-pool3 features; that
checkpoint isn't shippable in this zero-egress image, so the machinery is
split TPU-natively:

* `frechet_distance(mu1, s1, mu2, s2)` — exact Fréchet/Wasserstein-2
  between Gaussians, via the eigendecomposition form
  d² = |μ₁−μ₂|² + tr(Σ₁+Σ₂−2·(Σ₁^{1/2}Σ₂Σ₁^{1/2})^{1/2});
* `feature_statistics(features)` — (μ, Σ) from an [N, D] feature matrix;
* `FeatureExtractor` — any callable image-batch→features; the default uses
  the EfficientNet backbone (ImageNet-pretrained when the torchvision
  weights file is supplied, else the randomly-init backbone gives a
  repeatable-but-uncalibrated embedding, clearly flagged);
* `fid_between_dirs(real_dir..., fake_dir...)` — end-to-end convenience.

When a true InceptionV3 checkpoint is available, wrap it as a
FeatureExtractor and the numbers become standard FID.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.data.io import load_preprocessed


def feature_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(μ, Σ) of an [N, D] feature matrix (rowvar=False covariance)."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigh (clipping tiny
    negative eigenvalues from numerical noise)."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """d²((μ₁,Σ₁), (μ₂,Σ₂)) — the FID formula."""
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    covmean = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    d2 = float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
               - 2.0 * np.trace(covmean))
    return max(d2, 0.0)  # sqrtm roundoff can leave a tiny negative


@dataclass
class FeatureExtractor:
    """Batched image→feature callable over uint8 NHWC arrays."""

    fn: Callable[[np.ndarray], np.ndarray]
    name: str = "custom"
    calibrated: bool = True  # False → distances comparable only to themselves

    def __call__(self, images_u8: np.ndarray, batch_size: int = 32) -> np.ndarray:
        outs = []
        for i in range(0, len(images_u8), batch_size):
            chunk = images_u8[i:i + batch_size]
            n = len(chunk)
            if n < batch_size:
                # pad the tail chunk to the fixed batch size so the jitted
                # extractor compiles ONE shape, then trim
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch_size - n, axis=0)])
            outs.append(np.asarray(self.fn(chunk))[:n])
        return np.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=4)
def efficientnet_extractor(image_size: int = 224,
                           torch_weights: str | None = None,
                           seed: int = 0) -> FeatureExtractor:
    """EfficientNet-B0 pooled features (1280-d). With `torch_weights` (a
    torchvision state_dict file) the embedding is ImageNet-calibrated;
    without, it is a fixed random projection — still a valid relative
    fidelity signal between runs, NOT comparable to published FID."""
    import jax.numpy as jnp

    from polyp_tpu.data.transforms import augment_classifier_batch
    from polyp_tpu.models.efficientnet import EfficientNet, import_torch_state_dict

    model = EfficientNet("b0")
    dummy = jnp.zeros((1, image_size, image_size, 3))
    variables = model.init({"params": jax.random.PRNGKey(seed)}, dummy,
                           train=False)
    calibrated = False
    if torch_weights is not None and Path(torch_weights).exists():
        import torch
        sd = torch.load(torch_weights, map_location="cpu", weights_only=True)
        wrapped = {"params": {"backbone": variables["params"]},
                   "batch_stats": {"backbone": variables["batch_stats"]}}
        imported = import_torch_state_dict(wrapped, sd)
        variables = {"params": imported["params"]["backbone"],
                     "batch_stats": imported["batch_stats"]["backbone"]}
        calibrated = True

    @jax.jit
    def features(images_u8):
        x = augment_classifier_batch(images_u8, jax.random.PRNGKey(0),
                                     train=False, dtype=jnp.float32)
        return model.apply(variables, x, train=False)

    return FeatureExtractor(features,
                            name="efficientnet_b0" + ("" if calibrated
                                                      else "_randominit"),
                            calibrated=calibrated)


def load_image_dir(d: str | Path, image_size: int,
                   exts: Sequence[str] = (".png", ".tif", ".jpg")) -> np.ndarray:
    paths = sorted(p for p in Path(d).iterdir() if p.suffix in exts)
    if not paths:
        raise ValueError(f"no images in {d}")
    return np.stack([load_preprocessed(p, image_size) for p in paths])


_load_dir = load_image_dir  # back-compat alias


def fid_between_dirs(real_dir: str | Path, fake_dir: str | Path,
                     extractor: FeatureExtractor | None = None,
                     image_size: int = 224) -> dict:
    """End-to-end Fréchet distance between two sample directories."""
    extractor = extractor or efficientnet_extractor(image_size)
    real = extractor(_load_dir(real_dir, image_size))
    fake = extractor(_load_dir(fake_dir, image_size))
    mu_r, s_r = feature_statistics(real)
    mu_f, s_f = feature_statistics(fake)
    return {
        "frechet_distance": frechet_distance(mu_r, s_r, mu_f, s_f),
        "extractor": extractor.name,
        "calibrated": extractor.calibrated,
        "n_real": len(real),
        "n_fake": len(fake),
    }


def frechet_from_arrays(real_u8: np.ndarray, fake_u8: np.ndarray,
                        extractor: FeatureExtractor) -> float:
    """Fréchet distance between two uint8 NHWC image stacks."""
    mu_r, s_r = feature_statistics(extractor(real_u8))
    mu_f, s_f = feature_statistics(extractor(fake_u8))
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def class_frechet_distances(train_images_dir: str | Path,
                            train_csv: str | Path,
                            samples_root: str | Path,
                            ad_vs_rest: bool = False,
                            image_size: int = 224,
                            extractor: FeatureExtractor | None = None,
                            cache_dir: str | None = None) -> dict:
    """Per-class fidelity of a generation run: Fréchet distance between the
    real training images of each class and the generated `samples/{cls}`
    directory — the logged per-run fidelity signal the reference approximates
    only indirectly through the downstream F1
    (test_diffusion_model.py:250-253). Uncalibrated (random-backbone
    features) unless the extractor carries ImageNet weights — the result
    dict says which."""
    from polyp_tpu.data.cache import ArrayDataset
    from polyp_tpu.data.tables import AugmentedTable

    extractor = extractor or efficientnet_extractor(image_size)
    real = ArrayDataset.from_table(
        AugmentedTable.from_dirs([(train_images_dir, train_csv)], ad_vs_rest),
        image_size, cache_dir)
    by_class = {name: real.images[real.labels == idx]
                for idx, name in real.idx2label.items()}

    per_class: dict[str, float] = {}
    for cls, real_imgs in sorted(by_class.items()):
        d = Path(samples_root) / cls
        if not d.exists() or len(real_imgs) < 2:
            continue
        try:
            fake = _load_dir(d, image_size)
        except ValueError:
            # an interrupted generation run can leave samples/{cls} empty
            # (mkdir before the first PNG write) — skip like the <2 case
            # instead of sinking the whole augmentation eval
            continue
        if len(fake) < 2:
            continue  # covariance needs ≥2 samples
        per_class[cls] = frechet_from_arrays(real_imgs, fake, extractor)
    return {
        "per_class": per_class,
        "extractor": extractor.name,
        "calibrated": extractor.calibrated,
    }
