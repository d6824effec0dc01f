"""Test-time augmentation (flip-averaged classification).

Net-new serving-quality knob (`classificar-tpu?tta=true`): probabilities
averaged over the image and its horizontal flip in ONE fused device step.
"""

import asyncio
import io

import numpy as np
import pytest
from PIL import Image

from ics_tpu.runtime.engine import InferenceEngine


def _full_probs(engine, canvas, sizes):
    """Reconstruct the full probability row from top-k (num_classes <= k
    so the 'top-k' IS the full distribution)."""
    idx, scores = engine.predict_staged(canvas, sizes)
    probs = np.zeros((canvas.shape[0], engine.num_classes), np.float64)
    for r in range(canvas.shape[0]):
        probs[r, idx[r]] = scores[r]
    return probs


class TestEngineTTA:
    @pytest.fixture(scope="class")
    def engine(self):
        return InferenceEngine(
            "resnet_tiny", num_classes=5, precision="fp32",
            buckets=(1,), canvas=64,
        )

    def test_tta_equals_manual_flip_average(self, engine):
        # image fills the canvas exactly, so preproc is flip-equivariant
        # and the manual average is computable from the plain path
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        sizes = np.full((1, 2), 64, np.int32)
        p = _full_probs(engine, canvas, sizes)
        p_flip = _full_probs(engine, canvas[:, :, ::-1, :].copy(), sizes)
        expected = 0.5 * (p + p_flip)

        idx_t, scores_t = engine.predict_staged_tta(canvas, sizes)
        got = np.zeros_like(p)
        got[0, idx_t[0]] = scores_t[0]
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_symmetric_image_is_invariant(self, engine):
        rng = np.random.default_rng(1)
        half = rng.integers(0, 255, (1, 64, 32, 3)).astype(np.uint8)
        canvas = np.concatenate([half, half[:, :, ::-1, :]], axis=2)
        sizes = np.full((1, 2), 64, np.int32)
        p = _full_probs(engine, canvas, sizes)
        idx_t, scores_t = engine.predict_staged_tta(canvas, sizes)
        got = np.zeros_like(p)
        got[0, idx_t[0]] = scores_t[0]
        np.testing.assert_allclose(got, p, rtol=1e-4, atol=1e-5)

    def test_scores_are_probabilities(self, engine):
        rng = np.random.default_rng(2)
        canvas = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        sizes = np.full((1, 2), 64, np.int32)
        _, scores = engine.predict_staged_tta(canvas, sizes)
        assert scores.sum() == pytest.approx(1.0, abs=1e-4)
        assert (scores >= 0).all()


class TestServiceTTA:
    def test_classify_bytes_tta(self):
        from ics_tpu.runtime.service import InferenceService

        engine = InferenceEngine(
            "resnet_tiny", num_classes=5, precision="fp32",
            buckets=(1,), canvas=64,
        )
        service = InferenceService(
            engine, deadline_us=1000, device_decode=False
        )
        rng = np.random.default_rng(3)
        im = Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), np.uint8), "RGB"
        )
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=90)

        async def run():
            await service.start()
            try:
                return await service.classify_bytes_tta(buf.getvalue())
            finally:
                await service.stop()

        result = asyncio.run(run())
        assert result["tta"] is True
        assert result["model"] == "resnet_tiny"
        assert sum(result["scores"]) == pytest.approx(1.0, abs=1e-4)
