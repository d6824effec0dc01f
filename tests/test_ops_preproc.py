"""Golden-output tests: device preproc vs PIL (reference semantics)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from ics_tpu.ops.preproc import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_only,
    preprocess_batch,
)
from ics_tpu.ops.pallas_preproc import pallas_normalize


def pil_reference(img_u8: np.ndarray, out_size=224, resize_short=256) -> np.ndarray:
    """resize shorter side -> center crop -> normalize, via PIL (fp path)."""
    im = Image.fromarray(img_u8)
    w, h = im.size
    short = min(w, h)
    rw, rh = round(w * resize_short / short), round(h * resize_short / short)
    im = im.resize((rw, rh), Image.BILINEAR)
    left = (rw - out_size) // 2
    top = (rh - out_size) // 2
    im = im.crop((left, top, left + out_size, top + out_size))
    x = np.asarray(im).astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def stage_canvas(images: list[np.ndarray], canvas=512):
    batch = np.zeros((len(images), canvas, canvas, 3), np.uint8)
    sizes = np.zeros((len(images), 2), np.int32)
    for i, img in enumerate(images):
        h, w, _ = img.shape
        batch[i, :h, :w] = img
        sizes[i] = (h, w)
    return batch, sizes


class TestPreprocVsPIL:
    @pytest.mark.parametrize(
        "shape", [(256, 256), (480, 320), (320, 480), (300, 300), (512, 512)]
    )
    def test_matches_pil(self, shape):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, (*shape, 3), np.uint8)
        canvas, sizes = stage_canvas([img])
        out = np.asarray(
            preprocess_batch(canvas, sizes, dtype=jnp.float32)
        )[0]
        ref = pil_reference(img)
        # PIL uses 8-bit intermediates + int16 fixed-point filter coeffs;
        # tolerance is a few LSB of the 8-bit image in normalized units.
        err = np.abs(out - ref)
        assert err.mean() < 0.02, err.mean()
        assert np.quantile(err, 0.99) < 0.06

    def test_batch_of_mixed_sizes(self):
        rng = np.random.default_rng(0)
        imgs = [
            rng.integers(0, 256, (h, w, 3), np.uint8)
            for h, w in [(256, 256), (400, 300), (333, 450)]
        ]
        canvas, sizes = stage_canvas(imgs)
        out = np.asarray(preprocess_batch(canvas, sizes, dtype=jnp.float32))
        assert out.shape == (3, 224, 224, 3)
        for i, img in enumerate(imgs):
            ref = pil_reference(img)
            assert np.abs(out[i] - ref).mean() < 0.02

    def test_bf16_output(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (256, 256, 3), np.uint8)
        canvas, sizes = stage_canvas([img])
        out = preprocess_batch(canvas, sizes)
        assert out.dtype == jnp.bfloat16


class TestPallasNormalize:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(7)
        x = rng.integers(0, 256, (2, 224, 224, 3), np.uint8)
        out = np.asarray(pallas_normalize(x, dtype=jnp.float32))
        ref = np.asarray(normalize_only(x, dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_odd_total_padding(self):
        rng = np.random.default_rng(8)
        x = rng.integers(0, 256, (1, 7, 13, 3), np.uint8)
        out = np.asarray(pallas_normalize(x, dtype=jnp.float32))
        ref = np.asarray(normalize_only(x, dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=1e-5)
