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
            outs.append(np.asarray(self.fn(images_u8[i:i + batch_size])))
        return np.concatenate(outs, axis=0)


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


def _load_dir(d: str | Path, image_size: int,
              exts: Sequence[str] = (".png", ".tif", ".jpg")) -> np.ndarray:
    paths = sorted(p for p in Path(d).iterdir() if p.suffix in exts)
    if not paths:
        raise ValueError(f"no images in {d}")
    return np.stack([load_preprocessed(p, image_size) for p in paths])


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
