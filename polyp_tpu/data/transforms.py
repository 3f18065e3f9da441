"""Device-side batch augmentation as fused XLA ops.

The reference applies per-sample torchvision transforms on CPU workers
(resize → RandomHorizontalFlip → ToTensor → Normalize; PolypDataset.py:32-40,
PolypDiffusionDataset.py:54-59). Resize happens once at cache build; the
per-step randomness (horizontal flip) and normalization run on device over
the whole batch, fusing into one elementwise XLA kernel ahead of the model.

Layout is NHWC (TPU-native); outputs are bf16 by default to feed the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# torchvision ImageNet constants (PolypDataset.py:38-39)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def random_hflip(images: jax.Array, key: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample random horizontal flip of an NHWC batch."""
    flip = jax.random.bernoulli(key, p, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


@partial(jax.jit, static_argnames=("train", "dtype"))
def augment_classifier_batch(images_u8: jax.Array, key: jax.Array,
                             train: bool = True,
                             dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """uint8 NHWC → normalized model input: flip (train only) → /255 →
    ImageNet normalize → cast."""
    x = images_u8.astype(jnp.float32) / 255.0
    if train:
        x = random_hflip(x, key)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("train", "dtype"))
def augment_diffusion_batch(images_u8: jax.Array, key: jax.Array,
                            train: bool = True,
                            dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """uint8 NHWC → [-1, 1] (Normalize([0.5],[0.5]),
    PolypDiffusionDataset.py:58) with train-time flip."""
    x = images_u8.astype(jnp.float32) / 255.0
    if train:
        x = random_hflip(x, key)
    return ((x - 0.5) / 0.5).astype(dtype)
