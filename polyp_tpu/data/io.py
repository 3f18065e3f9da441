"""Host-side image IO: decode, mask-multiply, resize.

Per-sample PIL work (tif decode, mask multiply — reference
classifier_model/PolypDataset.py:52-61) runs exactly once per image at cache
build time (see cache.py); the steady-state input path on TPU is a uint8
slice + H2D copy. Resize matches torchvision's `transforms.Resize`
(PIL bilinear with antialias).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


def decode_image(path: str | Path) -> np.ndarray:
    """Decode any supported image (.tif/.png/...) to uint8 RGB HWC. PNGs use
    the native libpng path when POLYP_NATIVE_PREPROCESS=1 and the library is
    built (sample read-back in the eval harness is thousands of PNGs)."""
    if os.environ.get("POLYP_NATIVE_PREPROCESS", "0") == "1":
        from polyp_tpu.data import native
        name = str(path)
        if name.endswith(".png") and native.png_available():
            return native.decode_png(path)
        if name.endswith((".tif", ".tiff")) and native.tiff_available():
            try:
                return native.decode_tiff(path)
            except ValueError:
                pass  # outside the native profile — PIL handles it below
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def decode_mask(path: str | Path) -> np.ndarray:
    """Decode a binary mask to bool HW (mask>0, PolypDataset.py:57-58)."""
    with Image.open(path) as im:
        return np.asarray(im.convert("L")) > 0


def apply_mask(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero out non-polyp pixels (PolypDataset.py:55-60)."""
    return image * mask[..., None].astype(image.dtype)


def _use_native() -> bool:
    """Native C++ resize path (half-pixel bilinear, cv2-convention) is
    opt-in: PIL's BILINEAR applies a triangle filter on downscale, so the
    two differ slightly and PIL stays the parity default."""
    if os.environ.get("POLYP_NATIVE_PREPROCESS", "0") != "1":
        return False
    from polyp_tpu.data import native
    return native.available()


def resize_image(image: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize to (size, size), torchvision/PIL-parity (or the
    native C++ kernel when POLYP_NATIVE_PREPROCESS=1)."""
    if image.shape[0] == size and image.shape[1] == size:
        return image
    if _use_native():
        from polyp_tpu.data import native
        return native.resize_bilinear(image, size)
    im = Image.fromarray(image)
    return np.asarray(im.resize((size, size), Image.BILINEAR))


def load_preprocessed(path: str | Path, size: int,
                      mask_path: str | Path | None = None) -> np.ndarray:
    """decode → optional mask multiply → resize; returns uint8 [size,size,3]."""
    image = decode_image(path)
    if mask_path is not None:
        image = apply_mask(image, decode_mask(mask_path))
    return resize_image(image, size)
