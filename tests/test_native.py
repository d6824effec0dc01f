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


class TestParallelEntropyDecode:
    """Restart-marker parallel coefficient extraction (native/jpeg_mt.cpp)
    must be byte-identical to the serial libjpeg path."""

    @pytest.fixture(autouse=True)
    def _force_mt(self, monkeypatch):
        # production declines the MT path for small files (fixed-overhead
        # amortization); parity tests use small files and must exercise it
        monkeypatch.setattr(imgcodec, "MT_MIN_BYTES", 0)

    @staticmethod
    def _rst_jpeg(rng, w, h, sampling, quality=88, rows=1, gray=False):
        if gray:
            arr = rng.integers(0, 256, (h, w), np.uint8)
            im = Image.fromarray(arr, "L")
        else:
            arr = rng.integers(0, 256, (h, w, 3), np.uint8)
            im = Image.fromarray(arr, "RGB")
        buf = io.BytesIO()
        kwargs = dict(quality=quality, restart_marker_rows=rows)
        if not gray:
            kwargs["subsampling"] = sampling
        im.save(buf, "JPEG", **kwargs)
        return buf.getvalue()

    @staticmethod
    def _assert_same(a, b):
        assert a is not None and b is not None
        assert (a.width, a.height) == (b.width, b.height)
        assert len(a.components) == len(b.components)
        for ca, cb in zip(a.components, b.components):
            assert (ca["h_samp"], ca["v_samp"]) == (cb["h_samp"], cb["v_samp"])
            np.testing.assert_array_equal(ca["quant"], cb["quant"])
            np.testing.assert_array_equal(ca["coeffs"], cb["coeffs"])

    @pytest.mark.parametrize("sampling", [2, 1, 0])  # 4:2:0, 4:2:2, 4:4:4
    @pytest.mark.parametrize("size", [(96, 64), (97, 61), (250, 173)])
    def test_mt_matches_serial(self, sampling, size):
        rng = np.random.default_rng(hash((sampling, size)) % 2**32)
        w, h = size
        data = self._rst_jpeg(rng, w, h, sampling)
        serial = imgcodec.jpeg_coefficients(data, threads=1)
        mt = imgcodec.jpeg_coefficients(data, threads=4)
        self._assert_same(mt, serial)

    def test_grayscale_non_interleaved_scan(self):
        rng = np.random.default_rng(7)
        data = self._rst_jpeg(rng, 97, 61, 0, gray=True)
        self._assert_same(
            imgcodec.jpeg_coefficients(data, threads=4),
            imgcodec.jpeg_coefficients(data, threads=1),
        )

    def test_multiple_restart_rows(self):
        rng = np.random.default_rng(8)
        data = self._rst_jpeg(rng, 320, 240, 2, rows=3)
        self._assert_same(
            imgcodec.jpeg_coefficients(data, threads=8),
            imgcodec.jpeg_coefficients(data, threads=1),
        )

    def test_no_restart_markers_falls_back_serial(self):
        """rc=1 path: the MT entry point declines, the wrapper silently
        serves the serial result."""
        import ctypes

        rng = np.random.default_rng(9)
        arr = rng.integers(0, 256, (64, 96, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)  # no DRI
        data = buf.getvalue()
        lib = imgcodec._load()
        out = ctypes.POINTER(ctypes.c_ubyte)()
        out_len = ctypes.c_size_t()
        rc = lib.icstpu_jpeg_coeffs_mt(
            data, len(data), ctypes.byref(out), ctypes.byref(out_len), 4
        )
        assert rc == 1
        self._assert_same(
            imgcodec.jpeg_coefficients(data, threads=4),
            imgcodec.jpeg_coefficients(data, threads=1),
        )

    def test_progressive_falls_back_serial(self):
        rng = np.random.default_rng(10)
        arr = rng.integers(0, 256, (64, 96, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(
            buf, "JPEG", quality=90, progressive=True, restart_marker_rows=1
        )
        data = buf.getvalue()
        self._assert_same(
            imgcodec.jpeg_coefficients(data, threads=4),
            imgcodec.jpeg_coefficients(data, threads=1),
        )

    def test_corrupt_input_is_safe(self):
        rng = np.random.default_rng(11)
        data = self._rst_jpeg(rng, 96, 64, 2)
        # truncate mid-scan and flip bytes: must not crash; serial libjpeg
        # is the arbiter of recoverability
        for mutilated in (data[: len(data) // 2], data[:200],
                          data[:300] + b"\xff\xd5" + data[300:]):
            mt = imgcodec.jpeg_coefficients(mutilated, threads=4)
            serial = imgcodec.jpeg_coefficients(mutilated, threads=1)
            if serial is None:
                assert mt is None


class TestDecompressionBombGuard:
    """A ~1KB crafted JPEG declaring 65535x65535 (12.9 GB RGB) must be
    REJECTED by the native decoder, not malloc'd under overcommit and
    scanline-filled into an OOM kill (self-review r3). The PIL fallback
    then applies its own MAX_IMAGE_PIXELS guard."""

    @staticmethod
    def _bomb_jpeg() -> bytes:
        # take a real tiny JPEG and patch its SOF0 dimensions to 65535^2
        base = make_jpeg_bytes((32, 32))
        idx = base.find(b"\xff\xc0")
        assert idx > 0
        # SOF0: marker(2) len(2) precision(1) height(2) width(2)
        patched = bytearray(base)
        patched[idx + 5:idx + 9] = (65535).to_bytes(2, "big") * 2
        return bytes(patched)

    def test_native_decode_rejects(self):
        from ics_tpu.native import imgcodec

        if not imgcodec.available():
            pytest.skip("native lib unavailable")
        assert imgcodec.decode(self._bomb_jpeg()) is None

    def test_native_coeffs_reject(self):
        from ics_tpu.native import imgcodec

        if not imgcodec.available():
            pytest.skip("native lib unavailable")
        assert imgcodec.jpeg_coefficients(self._bomb_jpeg()) is None

    def test_corrupt_image_error_path_does_not_leak_wildly(self):
        """setjmp/longjmp error path: volatile buffers free correctly —
        hammer the corrupt-decode path and assert RSS stays bounded
        (each 4096x4096 declared bomb would leak ~50 MB unfreed)."""
        import resource

        from ics_tpu.native import imgcodec

        if not imgcodec.available():
            pytest.skip("native lib unavailable")
        base = make_jpeg_bytes((64, 64))
        idx = base.find(b"\xff\xc0")
        patched = bytearray(base)
        # declared 4096x4096 (within the pixel cap) but truncated scan
        patched[idx + 5:idx + 9] = (4096).to_bytes(2, "big") * 2
        corrupt = bytes(patched[:len(patched) // 2])
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        for _ in range(40):  # would leak ~2 GB if the error path dropped
            imgcodec.decode(corrupt)
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert (rss1 - rss0) < 500_000  # KiB: well under one leak's worth


class TestDecompressionBombGuard:
    """A ~1KB crafted JPEG declaring 65535x65535 (12.9 GB RGB) must be
    REJECTED by the native decoder, not malloc'd under overcommit and
    scanline-filled into an OOM kill (self-review r3). The PIL fallback
    then applies its own MAX_IMAGE_PIXELS guard."""

    @staticmethod
    def _patched_sof(size: int, truncate: bool = False) -> bytes:
        rng = np.random.default_rng(0)
        base = _jpeg(rng.integers(0, 256, (32, 32, 3), np.uint8))
        idx = base.find(b"\xff\xc0")
        assert idx > 0
        # SOF0: marker(2) len(2) precision(1) height(2) width(2)
        patched = bytearray(base)
        patched[idx + 5:idx + 9] = size.to_bytes(2, "big") * 2
        if truncate:
            patched = patched[: len(patched) // 2]
        return bytes(patched)

    def test_native_decode_rejects_bomb(self):
        assert imgcodec.decode(self._patched_sof(65535)) is None

    def test_native_coeffs_reject_bomb(self):
        assert imgcodec.jpeg_coefficients(self._patched_sof(65535)) is None

    def test_corrupt_error_path_frees_buffers(self):
        """setjmp/longjmp error path with volatile buffers: hammer the
        corrupt-decode path (declared 4096x4096, truncated scan) and
        assert RSS stays bounded — each iteration would leak ~50 MB if
        the error path dropped the allocation (self-review r3)."""
        import resource

        corrupt = self._patched_sof(4096, truncate=True)
        # warm one decode first so allocator pools don't count
        imgcodec.decode(corrupt)
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        for _ in range(40):  # ~2 GB leaked if the fix regressed
            imgcodec.decode(corrupt)
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert (rss1 - rss0) < 500_000, f"RSS grew {rss1 - rss0} KiB"
