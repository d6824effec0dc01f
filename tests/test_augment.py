"""On-device training augmentation (ops/augment.py).

The crop/flip geometry is folded into the SAME interpolation weight
matrices the serving preproc uses, so the identity configuration must
reproduce the deterministic resize bit-for-bit-within-fp, and a flip must
equal a column reversal of the unflipped output. No reference counterpart
(the reference has no training tier — SURVEY §2.2); serves BASELINE
config 5 quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.ops.augment import (
    AugmentConfig,
    augment_batch,
    augment_image,
    mixup,
    smooth_labels,
)
from ics_tpu.ops.preproc import preprocess_batch

CANVAS = 64


def _canvas_batch(n=2, h=48, w=40, seed=0):
    rng = np.random.default_rng(seed)
    canvas = np.zeros((n, CANVAS, CANVAS, 3), np.uint8)
    canvas[:, :h, :w] = rng.integers(0, 256, (n, h, w, 3), np.uint8)
    sizes = np.tile(np.asarray([[h, w]], np.int32), (n, 1))
    return jnp.asarray(canvas), jnp.asarray(sizes)


IDENTITY = AugmentConfig(scale_range=(1.0, 1.0), ratio_range=(1.0, 1.0),
                         flip_prob=0.0)


class TestGeometry:
    def test_identity_config_matches_deterministic_resize(self):
        # scale=(1,1) + ratio=(1,1) clamps the crop to the full true extent
        # of a SQUARE image; resize_short=out_size makes the deterministic
        # path the same full-extent resize
        canvas, sizes = _canvas_batch(h=48, w=48)
        out = augment_batch(canvas, sizes, jax.random.PRNGKey(0),
                            out_size=32, cfg=IDENTITY, dtype=jnp.float32)
        ref = preprocess_batch(canvas, sizes, out_size=32, resize_short=32,
                               dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_flip_is_column_reversal(self):
        canvas, sizes = _canvas_batch()
        cfg_flip = AugmentConfig(scale_range=(1.0, 1.0),
                                 ratio_range=(1.0, 1.0), flip_prob=1.0)
        key = jax.random.PRNGKey(1)
        plain = augment_batch(canvas, sizes, key, out_size=32, cfg=IDENTITY,
                              dtype=jnp.float32)
        flipped = augment_batch(canvas, sizes, key, out_size=32,
                                cfg=cfg_flip, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(flipped), np.asarray(plain)[:, :, ::-1, :], atol=1e-4
        )

    def test_same_key_is_deterministic(self):
        canvas, sizes = _canvas_batch()
        cfg = AugmentConfig()
        a = augment_batch(canvas, sizes, jax.random.PRNGKey(7), out_size=32,
                          cfg=cfg, dtype=jnp.float32)
        b = augment_batch(canvas, sizes, jax.random.PRNGKey(7), out_size=32,
                          cfg=cfg, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_different_keys_draw_different_crops(self):
        canvas, sizes = _canvas_batch()
        cfg = AugmentConfig(scale_range=(0.35, 0.6), flip_prob=0.0)
        a = augment_batch(canvas, sizes, jax.random.PRNGKey(0), out_size=32,
                          cfg=cfg, dtype=jnp.float32)
        b = augment_batch(canvas, sizes, jax.random.PRNGKey(1), out_size=32,
                          cfg=cfg, dtype=jnp.float32)
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_images_in_one_batch_get_distinct_crops(self):
        # identical pixels, one key: per-image fold_in(global index) must
        # still give each image its own geometry
        canvas, sizes = _canvas_batch(n=2, seed=3)
        canvas = canvas.at[1].set(canvas[0])
        cfg = AugmentConfig(scale_range=(0.35, 0.6), flip_prob=0.0)
        out = np.asarray(
            augment_batch(canvas, sizes, jax.random.PRNGKey(0), out_size=32,
                          cfg=cfg, dtype=jnp.float32)
        )
        assert not np.allclose(out[0], out[1], atol=1e-3)

    def test_crop_never_reads_canvas_padding(self):
        # canvas padding beyond the true extent is zeros == black; with a
        # WHITE image every augmented pixel must stay white (weights beyond
        # the true extent are zeroed + renormalized)
        h = w = 40
        canvas = np.zeros((1, CANVAS, CANVAS, 3), np.uint8)
        canvas[0, :h, :w] = 255
        sizes = jnp.asarray([[h, w]], np.int32)
        cfg = AugmentConfig(scale_range=(0.9, 1.0), flip_prob=0.5)
        for s in range(4):
            out = augment_image(
                jnp.asarray(canvas[0]), h, w, jax.random.PRNGKey(s), 32,
                cfg, mean=(0.0, 0.0, 0.0), std=(1.0 / 255.0,) * 3,
                dtype=jnp.float32,
            )
            np.testing.assert_allclose(np.asarray(out), 255.0, atol=0.5)

    def test_rectangular_extent_and_extreme_ratio_stay_finite(self):
        canvas, sizes = _canvas_batch(n=1, h=12, w=60)
        cfg = AugmentConfig(scale_range=(0.35, 1.0),
                            ratio_range=(0.5, 2.0))
        out = augment_batch(canvas, sizes, jax.random.PRNGKey(2),
                            out_size=32, cfg=cfg, dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()


class TestColorJitter:
    def test_zero_jitter_is_identity(self):
        canvas, sizes = _canvas_batch()
        base = AugmentConfig(scale_range=(1.0, 1.0), ratio_range=(1.0, 1.0),
                             flip_prob=0.0)
        jit_off = augment_batch(canvas, sizes, jax.random.PRNGKey(0),
                                out_size=32, cfg=base, dtype=jnp.float32)
        # zero-jitter config takes the no-jitter code path entirely
        again = augment_batch(canvas, sizes, jax.random.PRNGKey(0),
                              out_size=32, cfg=base, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(jit_off), np.asarray(again))

    def test_jitter_changes_pixels_but_stays_finite(self):
        canvas, sizes = _canvas_batch()
        base = AugmentConfig(scale_range=(1.0, 1.0), ratio_range=(1.0, 1.0),
                             flip_prob=0.0)
        jit = AugmentConfig(scale_range=(1.0, 1.0), ratio_range=(1.0, 1.0),
                            flip_prob=0.0, brightness=0.4, contrast=0.4,
                            saturation=0.4)
        a = augment_batch(canvas, sizes, jax.random.PRNGKey(5), out_size=32,
                          cfg=base, dtype=jnp.float32)
        b = augment_batch(canvas, sizes, jax.random.PRNGKey(5), out_size=32,
                          cfg=jit, dtype=jnp.float32)
        assert np.isfinite(np.asarray(b)).all()
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestTargets:
    def test_smooth_labels(self):
        t = np.asarray(smooth_labels(jnp.asarray([1, 0]), 4, 0.2))
        np.testing.assert_allclose(t[0], [0.05, 0.85, 0.05, 0.05], atol=1e-6)
        np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-6)

    def test_smooth_labels_zero_is_onehot(self):
        t = np.asarray(smooth_labels(jnp.asarray([2]), 3, 0.0))
        np.testing.assert_array_equal(t, [[0.0, 0.0, 1.0]])

    def test_mixup_blends_with_roll_neighbor(self):
        images = jnp.stack([jnp.zeros((4, 4, 3)), jnp.ones((4, 4, 3))])
        targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        mixed, mt = mixup(jax.random.PRNGKey(0), images, targets, alpha=0.4)
        mt = np.asarray(mt)
        lam = float(mt[0, 0])
        # lambda folded to >= .5: own label dominates; rows stay simplex
        assert 0.5 <= lam <= 1.0
        np.testing.assert_allclose(mt.sum(axis=1), 1.0, atol=1e-6)
        np.testing.assert_allclose(mt[1, 1], lam, atol=1e-6)
        # image 0 mixes toward its neighbor (image 1) with weight 1-lam
        np.testing.assert_allclose(
            np.asarray(mixed)[0], 1.0 - lam, atol=1e-5
        )

    def test_cutmix_box_paste_and_area_label(self):
        """Inside the box the mixed image IS the roll neighbor, outside it
        is untouched, and the label lambda equals the ACTUAL kept-area
        fraction of the clipped box."""
        from ics_tpu.ops.augment import cutmix

        images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
        targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        mixed, mt = cutmix(jax.random.PRNGKey(3), images, targets, alpha=1.0)
        mixed = np.asarray(mixed)
        mt = np.asarray(mt)
        # image 0's pixels are 0 outside the box, 1 (neighbor) inside
        box = mixed[0, :, :, 0]
        assert set(np.unique(box)) <= {0.0, 1.0}
        area = box.mean()
        assert 0.0 < area <= 0.5  # lambda folded to >= .5
        # label mixes by the actual box area: target row 0 keeps 1-area
        np.testing.assert_allclose(mt[0, 0], 1.0 - area, atol=1e-6)
        np.testing.assert_allclose(mt[0, 1], area, atol=1e-6)
        np.testing.assert_allclose(mt.sum(axis=1), 1.0, atol=1e-6)
        # the box is a contiguous rectangle: row/col supports are intervals
        rows = np.where(box.any(axis=1))[0]
        cols = np.where(box.any(axis=0))[0]
        assert (rows == np.arange(rows[0], rows[-1] + 1)).all()
        assert (cols == np.arange(cols[0], cols[-1] + 1)).all()

    def test_mix_batch_dispatch(self):
        from ics_tpu.ops.augment import mix_batch

        images = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
        targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        key = jax.random.PRNGKey(0)
        # neither -> identity
        out, ot = mix_batch(key, images, targets, AugmentConfig())
        np.testing.assert_array_equal(np.asarray(out), np.asarray(images))
        # cutmix-only -> binary pixels (pure paste, no blending)
        out, _ = mix_batch(
            key, images, targets, AugmentConfig(cutmix_alpha=1.0)
        )
        assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
        # both -> one of the two applied, targets stay simplex rows
        out, ot = mix_batch(
            key, images, targets,
            AugmentConfig(mixup_alpha=0.2, cutmix_alpha=1.0),
        )
        np.testing.assert_allclose(np.asarray(ot).sum(axis=1), 1.0,
                                   atol=1e-6)

    def test_config_validation_is_loud(self):
        with pytest.raises(ValueError, match="scale_range"):
            AugmentConfig(scale_range=(0.0, 1.0))
        with pytest.raises(ValueError, match="mixup_alpha"):
            AugmentConfig(mixup_alpha=-1.0)
        with pytest.raises(ValueError, match="cutmix_alpha"):
            AugmentConfig(cutmix_alpha=-0.5)
        with pytest.raises(ValueError, match="label_smoothing"):
            AugmentConfig(label_smoothing=1.0)
        with pytest.raises(ValueError, match="flip_prob"):
            AugmentConfig(flip_prob=1.5)


class TestTrainStep:
    def _setup(self, augment, batch=4):
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import (
            make_augmented_train_step,
            make_optimizer,
        )

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(lr=0.05)
        step = make_augmented_train_step(model, opt, augment, image_size=32)
        opt_state = opt.init(variables["params"])
        canvas, sizes = _canvas_batch(n=batch, seed=1)
        labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
        return step, variables, opt_state, canvas, sizes, labels

    def test_augmented_step_trains(self):
        cfg = AugmentConfig(mixup_alpha=0.2, label_smoothing=0.1)
        step, variables, opt_state, canvas, sizes, labels = self._setup(cfg)
        before = np.asarray(
            jax.tree_util.tree_leaves(variables["params"])[0]
        ).copy()
        for i in range(3):
            variables, opt_state, metrics = step(
                variables, opt_state, canvas, sizes, labels,
                jax.random.PRNGKey(i),
            )
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["accuracy"]) <= 1.0
        after = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0])
        assert not np.allclose(before, after)

    def test_finetuner_threads_keys(self):
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import FineTuner

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(model, image_size=32,
                          augment=AugmentConfig(label_smoothing=0.1))
        canvas, sizes = _canvas_batch(n=4, seed=2)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        batches = [(np.asarray(canvas), np.asarray(sizes), labels)] * 3
        _, _, history = tuner.run(variables, iter(batches))
        assert len(history) == 3
        assert all(np.isfinite(h["loss"]) for h in history)


class TestShardedAugmentedStep:
    def test_runs_on_8_device_mesh(self):
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.parallel.mesh import make_mesh
        from ics_tpu.train.finetune import (
            make_optimizer,
            make_sharded_augmented_train_step,
        )

        mesh = make_mesh((4, 2), ("data", "model"))
        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(lr=0.05)
        cfg = AugmentConfig(mixup_alpha=0.2, label_smoothing=0.1)
        jit_step, shard_variables = make_sharded_augmented_train_step(
            model, opt, mesh, cfg, image_size=32,
        )
        opt_state = opt.init(variables["params"])
        variables, opt_state, _ = shard_variables(variables, opt_state)
        step = jit_step(variables, opt_state)
        canvas, sizes = _canvas_batch(n=8, seed=4)
        labels = jnp.asarray(np.arange(8) % 2, jnp.int32)
        variables, opt_state, metrics = step(
            variables, opt_state, canvas, sizes, labels, jax.random.PRNGKey(0)
        )
        assert np.isfinite(float(metrics["loss"]))
        # params stay sharded/replicated on the mesh after the step
        leaf = jax.tree_util.tree_leaves(variables["params"])[0]
        assert len(leaf.sharding.device_set) == 8
