"""C++ imgcodec shim tests (skipped when the toolchain is unavailable)."""

import hashlib
import io

import numpy as np
import pytest
from PIL import Image

from ics_tpu.native import imgcodec

pytestmark = pytest.mark.skipif(
    not imgcodec.available(), reason="native imgcodec not built"
)


def _jpeg(img, quality=95):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _png(img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(0).integers(0, 256, (60, 80, 3), np.uint8)


class TestDecode:
    def test_jpeg_matches_pil_exactly(self, img):
        data = _jpeg(img)
        out = imgcodec.decode(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(out, ref)

    def test_png_lossless(self, img):
        assert np.array_equal(imgcodec.decode(_png(img)), img)

    def test_gray_and_palette_png_normalized_to_rgb(self, img):
        gray = imgcodec.decode(_png(img[:, :, 0]))
        assert gray.shape == (60, 80, 3)
        pal_buf = io.BytesIO()
        Image.fromarray(img).convert("P").save(pal_buf, "PNG")
        pal = imgcodec.decode(pal_buf.getvalue())
        assert pal.shape == (60, 80, 3)

    def test_probe(self, img):
        assert imgcodec.probe(_jpeg(img)) == "jpeg"
        assert imgcodec.probe(_png(img)) == "png"
        assert imgcodec.probe(b"nope") is None

    def test_garbage_returns_none(self):
        assert imgcodec.decode(b"not an image") is None
        assert imgcodec.decode(b"") is None
        # truncated JPEG must not crash the process
        assert imgcodec.decode(b"\xff\xd8\xff\xe0trunc") is None


class TestSha256:
    @pytest.mark.parametrize(
        "data",
        [b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 64, b"a" * 119, b"a" * 120,
         bytes(range(256)) * 100],
    )
    def test_matches_hashlib(self, data):
        assert imgcodec.sha256_hex(data) == hashlib.sha256(data).hexdigest()


class TestRuntimeIntegration:
    def test_decode_image_uses_native(self, img):
        from ics_tpu.runtime.decode import decode_image

        out = decode_image(_png(img))
        assert np.array_equal(out, img)
