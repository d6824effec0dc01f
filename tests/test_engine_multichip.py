"""Multi-chip serving: engine DP-sharded over an 8-device virtual mesh."""

import numpy as np
import pytest

from ics_tpu.parallel.mesh import make_mesh
from ics_tpu.runtime.engine import InferenceEngine


class TestMeshServing:
    def test_sharded_engine_predicts(self):
        mesh = make_mesh(shape=(8,), axes=("data",))
        engine = InferenceEngine(
            "resnet50", num_classes=16, precision="fp32",
            buckets=(8,), canvas=64, mesh=mesh,
        )
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
        sizes = np.full((8, 2), 64, np.int32)
        idx, scores = engine.predict_staged(canvas, sizes)
        assert idx.shape == (8, 5)
        assert np.all(np.isfinite(scores))

    def test_sharded_matches_single_device(self):
        mesh = make_mesh(shape=(8,), axes=("data",))
        kwargs = dict(
            model_name="resnet50", num_classes=16, precision="fp32",
            buckets=(8,), canvas=64, seed=3,
        )
        sharded = InferenceEngine(**kwargs, mesh=mesh)
        single = InferenceEngine(**kwargs)
        rng = np.random.default_rng(1)
        canvas = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
        sizes = np.full((8, 2), 64, np.int32)
        idx_s, scores_s = sharded.predict_staged(canvas.copy(), sizes.copy())
        idx_1, scores_1 = single.predict_staged(canvas, sizes)
        np.testing.assert_array_equal(idx_s, idx_1)
        np.testing.assert_allclose(scores_s, scores_1, rtol=1e-4, atol=1e-5)
