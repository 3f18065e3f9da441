"""Native C++ preprocessing kernels vs reference implementations."""

import numpy as np
import pytest

from polyp_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (make -C native)")


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def test_resize_matches_cv2_half_pixel_convention():
    cv2 = pytest.importorskip("cv2")
    img = _img(37, 53)
    ours = native.resize_bilinear(img, 64)
    ref = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()  # rounding only


def test_resize_identity_when_same_size():
    img = _img(32, 32)
    out = native.resize_bilinear(img, 32)
    np.testing.assert_array_equal(out, img)


def test_mask_multiply_exact():
    img = _img(16, 16)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 255
    out = native.mask_multiply(img, mask)
    assert (out[:4] == 0).all()
    np.testing.assert_array_equal(out[4:12, 4:12], img[4:12, 4:12])


def test_batch_preprocess_variable_shapes():
    imgs = [_img(20, 30, 1), _img(50, 40, 2), _img(33, 33, 3)]
    out = native.batch_preprocess(imgs, 24)
    assert out.shape == (3, 24, 24, 3)
    # each output equals the single-image kernel
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(out[i], native.resize_bilinear(img, 24))


def test_batch_preprocess_with_masks():
    imgs = [_img(16, 16, 4)]
    mask = np.zeros((16, 16), np.uint8)
    mask[:8] = 1
    out = native.batch_preprocess(imgs, 16, masks=[mask])
    assert (out[0, 8:] == 0).all()
    np.testing.assert_array_equal(out[0, :8], imgs[0][:8])


def test_deterministic_across_thread_counts():
    imgs = [_img(40, 40, i) for i in range(6)]
    a = native.batch_preprocess(imgs, 32, num_threads=1)
    b = native.batch_preprocess(imgs, 32, num_threads=4)
    np.testing.assert_array_equal(a, b)


class TestNativePNG:
    @pytest.fixture(autouse=True)
    def _skip_without_png(self):
        if not native.png_available():
            pytest.skip("native png lib not built")

    # (16-bit is excluded: PIL's I;16→RGB conversion clips instead of
    # rescaling, diverging from libpng's strip_16; polyp data is 8-bit)
    @pytest.mark.parametrize("mode", ["RGB", "L", "P", "RGBA"])
    def test_decode_matches_pil(self, tmp_path, mode):
        from PIL import Image
        rng = np.random.default_rng(7)
        base = rng.integers(0, 255, (13, 17, 3), np.uint8)
        im = Image.fromarray(base).convert(mode)
        p = tmp_path / f"{mode.replace(';','_')}.png"
        im.save(p)
        ours = native.decode_png(p)
        ref = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(ours, ref)

    def test_decode_missing_file_raises(self, tmp_path):
        with pytest.raises(ValueError, match="png decode failed"):
            native.decode_png(tmp_path / "nope.png")


class TestNativePNGEncode:
    """polyp_png_encode (serving response path, serve.py; sample writer,
    pipeline.generate_to_dir) — losslessness and fallback parity."""

    @pytest.fixture(autouse=True)
    def _skip_without_encode(self):
        if not native.png_encode_available():
            pytest.skip("native png encode not built")

    @pytest.mark.parametrize("level", [0, 1, 4, 9])
    def test_roundtrip_lossless_vs_pil(self, level):
        import io
        from PIL import Image
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (37, 23, 3), np.uint8)
        data = native.encode_png(img, level=level)
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, img)

    def test_roundtrip_via_native_decode(self, tmp_path):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (64, 64, 3), np.uint8)
        p = tmp_path / "rt.png"
        p.write_bytes(native.encode_png(img))
        np.testing.assert_array_equal(native.decode_png(p), img)

    def test_compressible_content_shrinks(self):
        img = np.zeros((128, 128, 3), np.uint8)
        assert len(native.encode_png(img, level=1)) < img.nbytes // 10

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError, match="HWC RGB"):
            native.encode_png(np.zeros((8, 8), np.uint8))

    def test_fallback_matches_when_forced(self, monkeypatch):
        # encode_png_or_pil must stay lossless through the PIL branch too
        import io
        from PIL import Image
        monkeypatch.setattr(native, "png_encode_available", lambda: False)
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        data = native.encode_png_or_pil(img)
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, img)


class TestNativeTIFF:
    """native/tiff_decode.cpp vs PIL over the corpus-relevant TIFF profile
    (the reference corpus is CSV-listed .tif files — PolypDataset.py:48-53)."""

    @pytest.fixture(autouse=True)
    def _need_lib(self):
        from polyp_tpu.data import native

        if not native.tiff_available():
            pytest.skip("native tiff library not built")

    @pytest.mark.parametrize("mode,compression", [
        ("RGB", None),            # uncompressed strips (PIL default)
        ("RGB", "tiff_lzw"),      # LZW + horizontal predictor path
        ("RGB", "packbits"),
        ("L", None),              # grayscale → expanded
        ("RGBA", None),           # alpha dropped
        ("RGB", "tiff_deflate"),  # OUTSIDE profile → ValueError (PIL fallback)
    ])
    def test_decode_matches_pil(self, tmp_path, mode, compression):
        from PIL import Image

        from polyp_tpu.data import native

        rng = np.random.default_rng(hash(mode) % 2**31)
        arr = rng.integers(0, 255, (37, 53, len(mode)), np.uint8).squeeze()
        p = tmp_path / "x.tif"
        kw = {"compression": compression} if compression else {}
        Image.fromarray(arr, mode).save(p, **kw)
        want = np.asarray(Image.open(p).convert("RGB"))
        if compression == "tiff_deflate":
            with pytest.raises(ValueError):
                native.decode_tiff(p)
            return
        got = native.decode_tiff(p)
        np.testing.assert_array_equal(got, want)

    def test_decode_multi_strip(self, tmp_path):
        """RowsPerStrip < height exercises the strip loop; PIL writes
        multi-strip files for tall images."""
        from PIL import Image, TiffImagePlugin

        from polyp_tpu.data import native

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (200, 31, 3), np.uint8)
        p = tmp_path / "tall.tif"
        with TiffImagePlugin.AppendingTiffWriter(str(p), True) as tf:
            Image.fromarray(arr).save(tf)
        got = native.decode_tiff(p)
        np.testing.assert_array_equal(got,
                                      np.asarray(Image.open(p).convert("RGB")))

    def test_io_dispatch_uses_native(self, tmp_path, monkeypatch):
        from PIL import Image

        from polyp_tpu.data import io

        arr = np.full((8, 9, 3), 77, np.uint8)
        p = tmp_path / "d.tif"
        Image.fromarray(arr).save(p)
        monkeypatch.setenv("POLYP_NATIVE_PREPROCESS", "1")
        np.testing.assert_array_equal(io.decode_image(p), arr)

    def test_missing_file_raises(self, tmp_path):
        from polyp_tpu.data import native

        with pytest.raises(ValueError):
            native.decode_tiff(tmp_path / "nope.tif")

    def test_default_rows_per_strip(self, tmp_path):
        """Tag 278 absent (spec default 2^32-1 = one strip): must decode,
        not overflow the strip-count arithmetic."""
        import struct

        from polyp_tpu.data import native

        h, w = 5, 7
        pixels = bytes((i * 7) % 256 for i in range(h * w * 3))
        # classic little-endian TIFF: header, pixel strip, then the IFD
        strip_off = 8
        ifd_off = strip_off + len(pixels)
        ntags = 7
        header = struct.pack("<2sHI", b"II", 42, ifd_off)

        def tag(t, typ, cnt, val):
            return struct.pack("<HHII", t, typ, cnt, val)

        bits_off = ifd_off + 2 + ntags * 12 + 4
        ifd = struct.pack("<H", ntags)
        ifd += tag(256, 4, 1, w)           # width
        ifd += tag(257, 4, 1, h)           # height
        ifd += tag(258, 3, 3, bits_off)    # bits per sample → offset
        ifd += tag(262, 3, 1, 2)           # photometric RGB
        ifd += tag(273, 4, 1, strip_off)   # strip offsets
        ifd += tag(277, 3, 1, 3)           # samples/pixel
        ifd += tag(279, 4, 1, len(pixels))  # strip byte counts
        ifd += struct.pack("<I", 0)        # next IFD
        ifd += struct.pack("<HHH", 8, 8, 8)
        p = tmp_path / "nostrip.tif"
        p.write_bytes(header + pixels + ifd)

        got = native.decode_tiff(p)
        want = np.frombuffer(pixels, np.uint8).reshape(h, w, 3)
        np.testing.assert_array_equal(got, want)


class TestDecoderRobustness:
    """Corrupt/truncated inputs must raise (→ PIL fallback in data/native.py),
    never return garbage that passes shape validation — the ADVICE round-2
    TIFF hardening contract."""

    def _roundtrip_bytes(self, tmp_path, payload: bytes, name: str):
        from polyp_tpu.data import native

        p = tmp_path / name
        p.write_bytes(payload)
        return native.decode_image(str(p))

    @pytest.mark.parametrize("name", ["x.tif", "x.png"])
    def test_random_bytes_raise(self, tmp_path, name):
        from polyp_tpu.data import native

        rng = np.random.default_rng(0)
        for i in range(20):
            payload = rng.integers(0, 256, rng.integers(8, 4096),
                                   dtype=np.uint8).tobytes()
            with pytest.raises(Exception):
                self._roundtrip_bytes(tmp_path, payload, name)

    @pytest.mark.parametrize("cut", [0.25, 0.5, 0.9])
    def test_truncated_valid_files_raise_or_decode(self, tmp_path, cut):
        """A prefix of a real file either raises cleanly or (for some strip
        layouts) decodes — it must never crash the process or hang."""
        from PIL import Image

        from polyp_tpu.data import native

        src = tmp_path / "full.tif"
        Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(src)
        payload = src.read_bytes()
        trunc = payload[: int(len(payload) * cut)]
        try:
            out = self._roundtrip_bytes(tmp_path, trunc, "t.tif")
            assert out.dtype == np.uint8 and out.ndim == 3
        except Exception:
            pass  # clean failure is the expected path
