"""On-device JPEG decode: golden tests vs PIL + fused pipeline test."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageFilter

from ics_tpu.native import imgcodec

pytestmark = pytest.mark.skipif(
    not imgcodec.available(), reason="native imgcodec not built"
)


def smooth_image(seed, h=120, w=160):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 256, (h, w, 3), np.uint8)
    ).filter(ImageFilter.GaussianBlur(2))


def encode(img, subsampling=2, quality=90):
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality, subsampling=subsampling)
    return buf.getvalue()


class TestDeviceDecode:
    @pytest.mark.parametrize("subsampling,label",
                             [(0, "444"), (1, "422"), (2, "420")])
    def test_matches_pil(self, subsampling, label):
        from ics_tpu.ops.jpeg_decode import decode_jpeg_device

        data = encode(smooth_image(1), subsampling)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        out = np.asarray(decode_jpeg_device(data))
        err = np.abs(out.astype(int) - ref.astype(int))
        assert err.mean() < 1.0, (label, err.mean())
        assert err.max() <= 6, (label, err.max())

    def test_progressive_jpeg(self):
        from ics_tpu.ops.jpeg_decode import decode_jpeg_device

        buf = io.BytesIO()
        smooth_image(4).save(buf, "JPEG", quality=90, subsampling=2,
                             progressive=True)
        data = buf.getvalue()
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        out = np.asarray(decode_jpeg_device(data))
        err = np.abs(out.astype(int) - ref.astype(int))
        assert err.mean() < 1.0 and err.max() <= 6

    def test_grayscale(self):
        from ics_tpu.ops.jpeg_decode import decode_jpeg_device

        buf = io.BytesIO()
        smooth_image(2).convert("L").save(buf, "JPEG", quality=90)
        data = buf.getvalue()
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        out = np.asarray(decode_jpeg_device(data))
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2

    def test_garbage_returns_none(self):
        from ics_tpu.ops.jpeg_decode import decode_jpeg_device

        assert decode_jpeg_device(b"not a jpeg") is None


class TestBatchedFusedPipeline:
    def test_staged_batch_decodes(self):
        from ics_tpu.runtime.device_decode import (
            decode_batch_to_canvas,
            stage_coefficient_batch,
        )

        blobs = [encode(smooth_image(i, 100 + 8 * i, 140)) for i in range(3)]
        coeffs = [imgcodec.jpeg_coefficients(b) for b in blobs]
        staged = stage_coefficient_batch(coeffs, luma_blocks=32)
        assert staged is not None
        canvas = np.asarray(decode_batch_to_canvas(staged))
        assert canvas.shape == (3, 256, 256, 3)
        for i, blob in enumerate(blobs):
            ref = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
            h, w = staged["sizes"][i]
            err = np.abs(canvas[i, :h, :w].astype(int) - ref.astype(int))
            assert err.mean() < 1.0, err.mean()

    def test_non_420_rejected(self):
        from ics_tpu.runtime.device_decode import stage_coefficient_batch

        blob444 = encode(smooth_image(9), subsampling=0)
        coeffs = [imgcodec.jpeg_coefficients(blob444)]
        assert stage_coefficient_batch(coeffs) is None

    def test_fused_decode_infer_step(self):
        from ics_tpu.models.resnet import ResNet
        from ics_tpu.models.registry import ModelSpec
        from ics_tpu.runtime.device_decode import (
            make_fused_decode_infer_step,
            stage_coefficient_batch,
        )

        model = ResNet((1, 1, 1, 1), num_classes=8)
        variables = model.init(jax.random.PRNGKey(0))
        folded = model.fold(variables)
        spec = ModelSpec("tiny", lambda **k: model, image_size=64,
                         resize_short=72)
        step = make_fused_decode_infer_step(model, folded, spec,
                                            dtype=jnp.float32)
        blobs = [encode(smooth_image(i)) for i in range(2)]
        staged = stage_coefficient_batch(
            [imgcodec.jpeg_coefficients(b) for b in blobs], luma_blocks=32
        )
        idx, scores = step(
            staged["y"], staged["yq"], staged["cb"], staged["cq"],
            staged["cr"], staged["rq"], staged["sizes"],
        )
        assert idx.shape == (2, 5)
        assert np.all(np.isfinite(np.asarray(scores)))
