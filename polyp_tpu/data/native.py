"""ctypes bindings for the native preprocessing library
(native/libpolyp_preprocess.so), with transparent PIL fallback.

The cache-build hot path (decode → mask multiply → bilinear resize,
io.load_preprocessed) switches to the C++ implementation when the library
has been built (`make -C native`); behavior is identical within uint8
rounding (guarded by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_SEARCHED = False
# decoder libraries, keyed by kind: {kind: lib | None}; searched lazily
_DECODERS: dict[str, object] = {}


def _find_decoder(kind: str):
    """Lazy-load a decode library (native/libpolyp_{kind}.so) exposing
    `polyp_{kind}_decode(path, dst, cap, *h, *w) -> int` (the shared C ABI
    of png_decode.cpp / tiff_decode.cpp)."""
    if kind in _DECODERS:
        return _DECODERS[kind]
    lib = None
    path = Path(__file__).resolve().parents[2] / "native" / f"libpolyp_{kind}.so"
    if path.exists():
        lib = ctypes.CDLL(str(path))
        fn = getattr(lib, f"polyp_{kind}_decode")
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        fn.restype = ctypes.c_int
        if kind == "png" and hasattr(lib, "polyp_png_encode"):
            enc = lib.polyp_png_encode
            enc.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            enc.restype = ctypes.c_int
    _DECODERS[kind] = lib
    return lib


def _decode(kind: str, path) -> np.ndarray:
    lib = _find_decoder(kind)
    if lib is None:
        raise RuntimeError(
            f"native {kind} library not built; run `make -C native`")
    fn = getattr(lib, f"polyp_{kind}_decode")
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    encoded = str(path).encode()
    rc = fn(encoded, None, 0, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"{kind} decode failed ({rc}): {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = fn(encoded, out.ctypes.data, out.nbytes,
            ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"{kind} decode failed ({rc}): {path}")
    return out


def png_available() -> bool:
    return _find_decoder("png") is not None


def tiff_available() -> bool:
    return _find_decoder("tiff") is not None


def decode_png(path) -> np.ndarray:
    """Native libpng decode → uint8 RGB HWC (eval-harness sample read-back)."""
    return _decode("png", path)


def png_encode_available() -> bool:
    lib = _find_decoder("png")
    return lib is not None and hasattr(lib, "polyp_png_encode")


def encode_png(image: np.ndarray, level: int = 1) -> bytes:
    """Native libpng encode of uint8 RGB HWC → PNG bytes.

    The serving response path (serve.py) base64-encodes every generated
    sample; PIL's default encode (zlib 6 + adaptive filtering) was measured
    host-binding the 16-client scenario on this 1-core image. `level` is the
    zlib level — the serving default 1 skips row filtering for speed (files
    are ~15-30% larger; the payload is transient). Lossless either way
    (round-trip asserted in tests/test_native.py)."""
    lib = _find_decoder("png")
    if lib is None or not hasattr(lib, "polyp_png_encode"):
        raise RuntimeError(
            "native png library not built (or stale); run `make -C native`")
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(f"expected HWC RGB uint8, got shape {image.shape}")
    h, w = image.shape[:2]
    # IDAT worst case: stored deflate blocks ≈ raw + raw/16k·5; 1 KiB covers
    # headers/IHDR/IEND with wide margin (mirrors the C-side contract).
    cap = h * (3 * w + 1) + 1024
    dst = np.empty(cap, np.uint8)
    size = ctypes.c_int64()
    rc = lib.polyp_png_encode(image.ctypes.data, h, w, int(level),
                              dst.ctypes.data, cap, ctypes.byref(size))
    if rc != 0:
        raise ValueError(f"png encode failed ({rc}) for shape {image.shape}")
    return dst[:size.value].tobytes()


def encode_png_or_pil(image: np.ndarray, level: int = 1) -> bytes:
    """encode_png with transparent PIL fallback when the library isn't built
    (same policy as the decode paths — behavior identical, PNGs differ only
    in compression settings). POLYP_PNG_ENCODE=pil forces the fallback
    (the A/B knob for tools/bench_serve.py host-bound scenarios)."""
    if png_encode_available() and os.environ.get(
            "POLYP_PNG_ENCODE", "native") != "pil":
        return encode_png(image, level=level)
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.ascontiguousarray(image, np.uint8)).save(
        buf, format="PNG", compress_level=level)
    return buf.getvalue()


def decode_tiff(path) -> np.ndarray:
    """Native baseline-TIFF decode → uint8 RGB HWC (corpus ingestion,
    native/tiff_decode.cpp). Raises ValueError outside the supported
    profile — callers fall back to PIL (io.decode_image)."""
    return _decode("tiff", path)


def _find_lib():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    candidates = [
        Path(__file__).resolve().parents[2] / "native" / "libpolyp_preprocess.so",
        Path(os.environ.get("POLYP_NATIVE_LIB", "/nonexistent")),
    ]
    for path in candidates:
        if path.exists():
            lib = ctypes.CDLL(str(path))
            lib.polyp_resize_bilinear.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.polyp_mask_multiply.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.polyp_batch_preprocess.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def resize_bilinear(image: np.ndarray, size: int) -> np.ndarray:
    """Native bilinear resize of uint8 HWC to (size, size)."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native preprocess library not built; "
                           "run `make -C native`")
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    out = np.empty((size, size, c), np.uint8)
    lib.polyp_resize_bilinear(image.ctypes.data, h, w, c,
                              out.ctypes.data, size, size)
    return out


def mask_multiply(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native preprocess library not built")
    image = np.ascontiguousarray(image, np.uint8).copy()
    mask_u8 = np.ascontiguousarray(mask, np.uint8)
    h, w, c = image.shape
    lib.polyp_mask_multiply(image.ctypes.data, mask_u8.ctypes.data, h, w, c)
    return image


def batch_preprocess(images: list[np.ndarray], size: int,
                     masks: list[np.ndarray] | None = None,
                     num_threads: int | None = None) -> np.ndarray:
    """Resize (+ optional mask multiply) a list of decoded uint8 HWC images
    to [N, size, size, C] on the native thread pool."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native preprocess library not built")
    n = len(images)
    c = images[0].shape[2]
    shapes = np.empty(2 * n, np.int32)
    offsets = np.empty(n, np.int64)
    total = 0
    for i, img in enumerate(images):
        shapes[2 * i], shapes[2 * i + 1] = img.shape[:2]
        offsets[i] = total
        total += img.shape[0] * img.shape[1] * c
    packed = np.empty(total, np.uint8)
    for i, img in enumerate(images):
        flat = np.ascontiguousarray(img, np.uint8).reshape(-1)
        packed[offsets[i]:offsets[i] + flat.size] = flat

    mask_buf = None
    mask_offsets = None
    if masks is not None:
        mask_offsets = np.empty(n, np.int64)
        mtotal = 0
        for i, m in enumerate(masks):
            mask_offsets[i] = mtotal
            mtotal += m.size
        mask_buf = np.empty(mtotal, np.uint8)
        for i, m in enumerate(masks):
            flat = np.ascontiguousarray(m, np.uint8).reshape(-1)
            mask_buf[mask_offsets[i]:mask_offsets[i] + flat.size] = flat

    out = np.empty((n, size, size, c), np.uint8)
    threads = num_threads or min(os.cpu_count() or 1, 8)
    lib.polyp_batch_preprocess(
        packed.ctypes.data, offsets.ctypes.data, shapes.ctypes.data, n, c,
        mask_buf.ctypes.data if mask_buf is not None else None,
        mask_offsets.ctypes.data if mask_offsets is not None else None,
        out.ctypes.data, size, size, threads)
    return out
