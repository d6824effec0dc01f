"""Saliency explainability: engine step equivalence + normalization.

Net-new tier (the reference classifies but never explains). The engine
test proves the fused explain step computes EXACTLY
|d logit_c / d x| -> channel max-abs -> bilinear 16x16 -> min-max, by
recomputing the whole chain manually with jax.grad on the same folded
params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.ops.preproc import preprocess_batch
from ics_tpu.runtime.engine import EXPLAIN_GRID, InferenceEngine


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine(
        "resnet_tiny", num_classes=4, precision="fp32",
        buckets=(1,), canvas=64,
    )


@pytest.fixture(scope="module")
def staged():
    rng = np.random.default_rng(7)
    canvas = rng.integers(0, 256, (1, 64, 64, 3), np.uint8)
    sizes = np.asarray([[48, 48]], np.int32)
    return canvas, sizes


class TestExplainStep:
    def test_shape_and_normalization(self, engine, staged):
        canvas, sizes = staged
        idx, scores, heat = engine.explain_staged(canvas, sizes)
        assert heat.shape == (EXPLAIN_GRID, EXPLAIN_GRID)
        assert float(heat.min()) == pytest.approx(0.0, abs=1e-6)
        assert float(heat.max()) == pytest.approx(1.0, abs=1e-6)
        assert len(idx) == len(scores) == min(5, 4)
        # scores are softmax probabilities, descending
        assert all(s1 >= s2 for s1, s2 in zip(scores, scores[1:]))
        assert sum(scores) <= 1.0 + 1e-5

    def test_matches_manual_gradient(self, engine, staged):
        """The fused step == hand-built jax.grad chain on the same params."""
        canvas, sizes = staged
        idx, _, _ = engine.explain_staged(canvas, sizes)
        c = int(idx[0])
        _, _, heat = engine.explain_staged(canvas, sizes, class_idx=c)

        spec, model = engine.spec, engine.model
        x = preprocess_batch(
            canvas, sizes, out_size=spec.image_size,
            resize_short=spec.resize_short, dtype=engine.dtype,
        )

        def f(xin):
            return model.apply_folded(
                engine.folded, xin
            ).astype(jnp.float32)[0, c]

        g = jax.grad(f)(x)
        manual = jnp.max(jnp.abs(g[0].astype(jnp.float32)), axis=-1)
        manual = jax.image.resize(
            manual, (EXPLAIN_GRID, EXPLAIN_GRID), "linear"
        )
        lo, hi = jnp.min(manual), jnp.max(manual)
        manual = (manual - lo) / jnp.maximum(hi - lo, 1e-12)
        np.testing.assert_allclose(
            heat, np.asarray(manual), rtol=1e-4, atol=1e-5
        )

    def test_default_explains_top_class(self, engine, staged):
        """class_idx=-1 must produce the SAME map as pinning the argmax
        class explicitly (grad of max flows only through the argmax)."""
        canvas, sizes = staged
        idx, _, heat_default = engine.explain_staged(canvas, sizes)
        _, _, heat_top = engine.explain_staged(
            canvas, sizes, class_idx=int(idx[0])
        )
        np.testing.assert_allclose(heat_default, heat_top,
                                   rtol=1e-5, atol=1e-6)

    def test_different_classes_differ(self, engine, staged):
        canvas, sizes = staged
        _, _, h0 = engine.explain_staged(canvas, sizes, class_idx=0)
        _, _, h1 = engine.explain_staged(canvas, sizes, class_idx=1)
        assert not np.allclose(h0, h1)

    def test_out_of_range_class_clipped(self, engine, staged):
        """A class index past num_classes clips to the last class instead
        of crashing the compiled step (defensive; routes validate first)."""
        canvas, sizes = staged
        _, _, h_hi = engine.explain_staged(canvas, sizes, class_idx=99)
        _, _, h_last = engine.explain_staged(canvas, sizes, class_idx=3)
        np.testing.assert_allclose(h_hi, h_last, rtol=1e-5, atol=1e-6)


class TestSmoothGrad:
    def test_smooth_matches_topk_and_differs_from_vanilla(self, engine,
                                                          staged):
        """SmoothGrad: the clean copy drives top-k (identical to vanilla);
        the averaged map differs from the single-sample map but stays
        normalized."""
        canvas, sizes = staged
        idx_v, scores_v, heat_v = engine.explain_staged(canvas, sizes)
        idx_s, scores_s, heat_s = engine.explain_staged(
            canvas, sizes, smooth_samples=4
        )
        np.testing.assert_array_equal(idx_v, idx_s)
        np.testing.assert_allclose(scores_v, scores_s, rtol=1e-5)
        assert heat_s.shape == (EXPLAIN_GRID, EXPLAIN_GRID)
        assert float(heat_s.min()) == pytest.approx(0.0, abs=1e-6)
        assert float(heat_s.max()) == pytest.approx(1.0, abs=1e-6)
        assert not np.allclose(heat_v, heat_s)

    def test_deterministic_given_seed(self, engine, staged):
        canvas, sizes = staged
        _, _, h1 = engine.explain_staged(canvas, sizes, smooth_samples=8,
                                         seed=5)
        _, _, h2 = engine.explain_staged(canvas, sizes, smooth_samples=8,
                                         seed=5)
        np.testing.assert_array_equal(h1, h2)
        _, _, h3 = engine.explain_staged(canvas, sizes, smooth_samples=8,
                                         seed=6)
        assert not np.allclose(h1, h3)

    def test_sample_count_quantizes_up(self, engine, staged):
        """3 -> 4, 9 -> 16: one compiled graph per bucket value."""
        canvas, sizes = staged
        engine.explain_staged(canvas, sizes, smooth_samples=3)
        assert 4 in engine._explain_steps
        engine.explain_staged(canvas, sizes, smooth_samples=9)
        assert 16 in engine._explain_steps
        assert 3 not in engine._explain_steps
        assert 9 not in engine._explain_steps
