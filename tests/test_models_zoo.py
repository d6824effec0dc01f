import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.ops.attention import attention_reference, flash_attention


def param_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


class TestFlashAttention:
    @pytest.mark.parametrize("shape", [(1, 2, 64, 32), (2, 3, 130, 64)])
    def test_matches_reference(self, shape):
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(keys[0], shape)
        k = jax.random.normal(keys[1], shape)
        v = jax.random.normal(keys[2], shape)
        out = flash_attention(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_long_sequence_online_softmax_path(self):
        # seq > SINGLE_PASS_MAX exercises the multi-block online kernel
        keys = jax.random.split(jax.random.PRNGKey(5), 3)
        shape = (1, 1, 1100, 64)
        q = jax.random.normal(keys[0], shape)
        k = jax.random.normal(keys[1], shape)
        v = jax.random.normal(keys[2], shape)
        out = flash_attention(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_padding_masked(self):
        # identical valid prefix, different garbage tail -> same output
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(keys[0], (1, 2, 100, 32))
        k = jax.random.normal(keys[1], (1, 2, 100, 32))
        v = jax.random.normal(keys[2], (1, 2, 100, 32))
        out_full = flash_attention(q, k, v, seq_len=80)
        k2 = k.at[:, :, 80:].set(999.0)
        v2 = v.at[:, :, 80:].set(-999.0)
        out_masked = flash_attention(q, k2, v2, seq_len=80)
        np.testing.assert_allclose(
            np.asarray(out_full[:, :, :80]),
            np.asarray(out_masked[:, :, :80]),
            rtol=2e-3, atol=2e-3,
        )

    @pytest.mark.parametrize("seq", [100, 1100])
    def test_fully_masked_rows_are_zero(self, seq):
        """seq_len=0: every score is NEG_INF, the running max equals
        NEG_INF, and exp(NEG_INF - NEG_INF) gave every masked position
        weight 1 — returning the MEAN of pad garbage instead of nothing
        (review r5). Both the single-pass (seq<=1024) and online
        (seq>1024) kernels must return exact zeros."""
        keys = jax.random.split(jax.random.PRNGKey(2), 3)
        shape = (1, 1, seq, 32)
        q = jax.random.normal(keys[0], shape)
        k = jax.random.normal(keys[1], shape) + 100.0  # conspicuous garbage
        v = jax.random.normal(keys[2], shape) - 100.0
        out = np.asarray(flash_attention(q, k, v, seq_len=0))
        assert np.all(np.isfinite(out))
        np.testing.assert_array_equal(out, np.zeros_like(out))


class TestViT:
    @pytest.fixture(scope="class")
    def tiny_vit(self):
        from ics_tpu.models.vit import ViT

        model = ViT(image_size=32, patch_size=8, dim=64, depth=2,
                    num_heads=2, num_classes=10)
        return model, model.init(jax.random.PRNGKey(0))

    def test_forward_shapes(self, tiny_vit):
        model, variables = tiny_vit
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        logits, _ = model.apply(variables, x, training=True)
        assert logits.shape == (2, 10)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_flash_inference_matches_training_path(self, tiny_vit):
        model, variables = tiny_vit
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        train_logits, _ = model.apply(variables, x, training=True)   # XLA attn
        infer_logits = model.apply_folded(model.fold(variables), x)  # flash
        np.testing.assert_allclose(
            np.asarray(train_logits), np.asarray(infer_logits),
            rtol=5e-3, atol=5e-3,
        )

    def test_vit_b16_param_count(self):
        from ics_tpu.models.vit import vit_b16

        model = vit_b16(num_classes=1000, image_size=384)
        variables = model.init(jax.random.PRNGKey(0))
        n = param_count(variables["params"])
        # ViT-B/16 @384: 86.86M (torchvision vit_b_16 has 86.57M @224;
        # the 384 pos-embed adds (577-197)*768)
        assert 85_000_000 < n < 89_000_000, n


class TestMobileNetV3:
    def test_forward_and_fold(self):
        from ics_tpu.models.mobilenetv3 import mobilenetv3_small

        model = mobilenetv3_small(num_classes=10)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.1
        logits, _ = model.apply(variables, x, training=False)
        assert logits.shape == (1, 10)
        folded = model.fold(variables)
        logits_f = model.apply_folded(folded, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_f), rtol=1e-3, atol=1e-3
        )

    def test_param_count(self):
        from ics_tpu.models.mobilenetv3 import mobilenetv3_small

        model = mobilenetv3_small(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        # torchvision mobilenet_v3_small: 2.54M
        assert 2_000_000 < n < 3_200_000, n


class TestEfficientNet:
    def test_b0_forward(self):
        from ics_tpu.models.efficientnet import efficientnet_b0

        model = efficientnet_b0(num_classes=10)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.1
        logits, _ = model.apply(variables, x, training=False)
        assert logits.shape == (1, 10)
        folded = model.fold(variables)
        logits_f = model.apply_folded(folded, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_f), rtol=1e-3, atol=1e-3
        )

    def test_b4_param_count(self):
        from ics_tpu.models.efficientnet import efficientnet_b4

        model = efficientnet_b4(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        # torchvision efficientnet_b4: 19.34M
        assert 17_000_000 < n < 21_500_000, n

    def test_v2_s_param_count_exact(self):
        from ics_tpu.models.efficientnet import efficientnet_v2_s

        model = efficientnet_v2_s(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        assert n == 21_458_488  # torchvision efficientnet_v2_s, exact

    def test_v2_uses_torchvision_bn_eps(self):
        """torchvision builds every V2 variant with BatchNorm eps=1e-3
        (the V1 family keeps the 1e-5 default); folding imported V2
        weights with 1e-5 mis-scales channels with tiny running_var —
        same convention as mobilenetv3._BN_EPS (review r5)."""
        from ics_tpu.models.efficientnet import (
            FusedMBConv,
            efficientnet_b0,
            efficientnet_v2_s,
        )

        v2 = efficientnet_v2_s(num_classes=10)
        assert v2.stem.bn.eps == 1e-3
        assert v2.conv_head.bn.eps == 1e-3
        for blk in v2.blocks:
            assert blk.project.bn.eps == 1e-3
            if blk.expand is not None:
                assert blk.expand.bn.eps == 1e-3
            if not isinstance(blk, FusedMBConv):
                assert blk.depthwise.bn.eps == 1e-3
        # V1 keeps torchvision's 1e-5 default
        b0 = efficientnet_b0(num_classes=10)
        assert b0.stem.bn.eps == 1e-5
        assert b0.blocks[0].depthwise.bn.eps == 1e-5

    def test_v2_tiny_forward_and_fold(self):
        from ics_tpu.models.efficientnet import EfficientNetV2

        # one fused (no-expand), one fused (expand), one MBConv stage
        spec = [
            ("fused", 1, 16, 3, 1, 1),
            ("fused", 4, 24, 3, 2, 1),
            ("mb", 4, 32, 3, 2, 1),
        ]
        model = EfficientNetV2(spec=spec, stem_ch=16, head_ch=64,
                               num_classes=7)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.1
        logits, _ = model.apply(variables, x, training=False)
        assert logits.shape == (2, 7)
        folded = model.fold(variables)
        logits_f = model.apply_folded(folded, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_f), rtol=1e-3, atol=1e-3
        )
        # training mode updates BN state and grads flow through both kinds
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "state": variables["state"]}, x,
                training=True,
            )
            return jnp.sum(out ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        assert float(
            jnp.abs(grads["blocks"][0]["proj"]["conv"]["w"]).sum()
        ) > 0


class TestRegistryComplete:
    def test_all_baseline_models_registered(self):
        from ics_tpu.models.registry import list_models

        models = list_models()
        for name in (
            "resnet50", "vit_b16", "mobilenetv3_small", "efficientnet_b4"
        ):
            assert name in models, models

    def test_population_failure_is_retried_not_cached(self, monkeypatch):
        """_populated was set BEFORE registration: a non-ImportError
        raised mid-way left the registry permanently half-populated for
        the process, with later lookups reporting confusing 'unknown
        model' instead of the real failure (review r5). The flag is now
        set only on success; register_model is idempotent, so the next
        call retries from scratch."""
        from ics_tpu.models import registry

        saved_reg = dict(registry._REGISTRY)
        saved_pop = registry._populated
        try:
            registry._REGISTRY.clear()
            registry._populated = False
            real_register = registry.register_model
            calls = {"n": 0}

            def flaky_register(name, *a, **kw):
                calls["n"] += 1
                if calls["n"] == 3:  # fail mid-population, once
                    raise RuntimeError("boom during registration")
                return real_register(name, *a, **kw)

            monkeypatch.setattr(registry, "register_model", flaky_register)
            with pytest.raises(RuntimeError, match="boom"):
                registry.list_models()
            monkeypatch.setattr(registry, "register_model", real_register)
            # next call retries and completes — no permanent half-registry
            models = registry.list_models()
            assert "resnet50" in models and "efficientnet_v2_m" in models
        finally:
            registry._REGISTRY.clear()
            registry._REGISTRY.update(saved_reg)
            registry._populated = saved_pop


class TestConvNeXt:
    def test_forward_and_fold(self):
        from ics_tpu.models.convnext import ConvNeXt

        # tiny config for CPU: 1 block/stage, narrow dims
        model = ConvNeXt(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                         num_classes=10)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.1
        logits, _ = model.apply(variables, x, training=False)
        assert logits.shape == (2, 10)
        assert bool(jnp.all(jnp.isfinite(logits)))
        folded = model.fold(variables)
        logits_f = model.apply_folded(folded, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_f), rtol=1e-3, atol=1e-3
        )

    def test_gradients_flow(self):
        from ics_tpu.models.convnext import ConvNeXt

        model = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                         num_classes=4)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.1
        labels = jnp.array([0, 3])

        def loss_fn(params):
            logits, _ = model.apply({"params": params, "state": {}}, x,
                                    training=True)
            onehot = jax.nn.one_hot(labels, 4)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1)
            )

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # depthwise + layer-scale params receive gradient
        g_dw = grads["stages"][0][0]["dwconv"]["w"]
        g_gamma = grads["stages"][0][0]["gamma"]
        assert float(jnp.abs(g_dw).sum()) > 0
        assert float(jnp.abs(g_gamma).sum()) > 0

    def test_tiny_param_count(self):
        from ics_tpu.models.convnext import convnext_tiny

        model = convnext_tiny(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        # torchvision convnext_tiny: 28.59M
        assert 27_000_000 < n < 30_000_000, n


class TestSwin:
    @pytest.fixture(scope="class")
    def micro(self):
        from ics_tpu.models.swin import swin_micro

        model = swin_micro(num_classes=10)
        return model, model.init(jax.random.PRNGKey(0))

    def test_forward_and_fold(self, micro):
        model, variables = micro
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.1
        logits, _ = model.apply(variables, x, training=True)
        assert logits.shape == (2, 10)
        assert bool(jnp.all(jnp.isfinite(logits)))
        logits_f = model.apply_folded(model.fold(variables), x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_f), rtol=1e-3, atol=1e-3
        )

    def test_window_partition_roundtrip(self):
        from ics_tpu.models.swin import _window_merge, _window_partition

        x = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 8, 5))
        wins = _window_partition(x, 4)
        assert wins.shape == (3 * 4, 16, 5)
        back = _window_merge(wins, 4, 8, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        from ics_tpu.models.swin import _relative_position_index

        idx = _relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
        # zero offset (i == j) maps to the table's center entry
        center = (7 - 1) * (2 * 7 - 1) + (7 - 1)
        assert (np.diag(idx) == center).all()
        # same relative offset -> same index (translation invariance):
        # (0,0)->(1,1) and (2,3)->(3,4) are both offset (+1,+1)
        assert idx[0, 8] == idx[2 * 7 + 3, 3 * 7 + 4]

    def test_shift_mask_structure(self):
        from ics_tpu.models.swin import _shift_attn_mask

        mask = _shift_attn_mask(grid=4, window=2, shift=1)
        assert mask.shape == (4, 4, 4)
        # attention to self is never masked
        assert (np.diagonal(mask, axis1=1, axis2=2) == 0).all()
        # window 0 (top-left) lies inside one contiguous region: no mask
        assert (mask[0] == 0).all()
        # the bottom-right window mixes shifted regions: some pairs masked
        assert (mask[-1] < 0).any()
        # masking is symmetric (i sees j <=> j sees i)
        np.testing.assert_array_equal(mask, np.transpose(mask, (0, 2, 1)))

    def test_gradients_flow(self, micro):
        model, variables = micro
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3)) * 0.1
        labels = jnp.array([0, 7])

        def loss_fn(params):
            logits, _ = model.apply({"params": params, "state": {}}, x,
                                    training=True)
            onehot = jax.nn.one_hot(labels, 10)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1)
            )

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # the swin-specific params learn: relative bias table + merge
        g_bias = grads["stages"][0][0]["attn"]["rel_bias"]
        g_merge = grads["merges"][0]["reduction"]["w"]
        assert float(jnp.abs(g_bias).sum()) > 0
        assert float(jnp.abs(g_merge).sum()) > 0

    def test_swin_tiny_param_count(self):
        from ics_tpu.models.swin import swin_tiny

        model = swin_tiny(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        # timm swin_tiny_patch4_window7_224: 28.29M
        assert 27_500_000 < n < 29_000_000, n

    def test_engine_serving_and_embedding(self):
        from ics_tpu.runtime.engine import InferenceEngine

        engine = InferenceEngine(
            "swin_micro", num_classes=10, precision="fp32",
            buckets=(2,), canvas=64,
        )
        canvas = np.random.default_rng(0).integers(
            0, 255, (2, 64, 64, 3)
        ).astype(np.uint8)
        sizes = np.full((2, 2), 64, np.int32)
        idx, scores = engine.predict_staged(canvas, sizes)
        assert idx.shape == (2, 5) and scores.shape == (2, 5)
        feats = engine.embed_staged(canvas, sizes)
        assert feats.shape == (2, engine.embed_dim)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=-1), 1.0, atol=1e-4
        )


class TestLargeVariantsRegistered:
    def test_registry_has_round3_additions(self):
        from ics_tpu.models.registry import list_models

        models = list_models()
        for name in ("convnext_tiny", "convnext_small", "vit_l16",
                     "resnet152", "vit_b16_h6d128", "vit_l16_h8d128",
                     "swin_tiny", "swin_small"):
            assert name in models, models

    def test_vit_l16_shape(self):
        from ics_tpu.models.vit import ViT

        # scaled-down L-geometry smoke (dim/head ratio of the real L/16)
        model = ViT(image_size=32, patch_size=8, dim=128, depth=2,
                    num_heads=2, num_classes=10)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        logits = model.apply_folded(model.fold(variables), x)
        assert logits.shape == (1, 10)


class TestResNetVariants:
    def test_registry_has_resnext_and_wide(self):
        from ics_tpu.models.registry import list_models

        models = list_models()
        for name in ("resnext50_32x4d", "wide_resnet50_2"):
            assert name in models, models

    def test_resnext50_32x4d_param_count_exact(self):
        from ics_tpu.models.resnet import resnext50_32x4d

        model = resnext50_32x4d(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        assert n == 25_028_904  # torchvision resnext50_32x4d, exact

    def test_wide_resnet50_2_param_count_exact(self):
        from ics_tpu.models.resnet import wide_resnet50_2

        model = wide_resnet50_2(num_classes=1000)
        n = param_count(model.init(jax.random.PRNGKey(0))["params"])
        assert n == 68_883_240  # torchvision wide_resnet50_2, exact

    def test_grouped_forward_fold_smoke(self):
        from ics_tpu.models.resnet import ResNet

        # tiny grouped/wide config (same inner-width formula as the real
        # variants) — folded path must match training-mode inference
        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5,
                       groups=4, base_width=16)
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        ref, _ = model.apply(variables, x, training=False)
        got = model.apply_folded(model.fold(variables), x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4
        )

    def test_grouped_rejects_pallas_chains(self):
        from ics_tpu.models.resnet import ResNet

        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5,
                       groups=4, base_width=16)
        variables = model.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="grouped/wide"):
            model.fold(variables, pallas_chains=True)


class TestDenseNet:
    def test_registry_and_exact_param_counts(self):
        from ics_tpu.models.densenet import densenet121, densenet169
        from ics_tpu.models.registry import list_models

        models = list_models()
        assert "densenet121" in models and "densenet169" in models


        # torchvision-published exact counts at 1000 classes
        v121 = densenet121(num_classes=1000).init(jax.random.PRNGKey(0))
        assert param_count(v121["params"]) == 7_978_856
        v169 = densenet169(num_classes=1000).init(jax.random.PRNGKey(0))
        assert param_count(v169["params"]) == 14_149_480

    def test_micro_forward_fold_and_train_state(self):
        """Pre-activation family: fold turns each BN into (scale, bias);
        folded forward must equal eval-mode apply exactly, and training
        must move the running stats."""
        import numpy as np

        from ics_tpu.models.densenet import densenet_micro

        model = densenet_micro(num_classes=5)
        variables = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
            jnp.float32,
        )
        logits, _ = model.apply(variables, x, training=False)
        assert logits.shape == (2, 5)
        folded = model.fold(variables)
        lf = model.apply_folded(folded, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(lf), atol=1e-5, rtol=1e-5
        )
        _, new_state = model.apply(variables, x, training=True)
        assert not np.allclose(
            np.asarray(new_state["final_bn"]["mean"]),
            np.asarray(variables["state"]["final_bn"]["mean"]),
        )

    def test_channel_growth_and_transitions(self):
        """Dense connectivity bookkeeping: block i multiplies channels by
        concat growth, transitions halve them — densenet121's documented
        256/512/1024/1024 progression."""
        from ics_tpu.models.densenet import densenet121

        m = densenet121(num_classes=10)
        assert [len(st) for st in m.stages] == [6, 12, 24, 16]
        assert m.out_ch == 1024
        # transition input channels: 64+6*32=256, 128+12*32=512,
        # 256+24*32=1024
        assert [t.bn.num_features for t in m.down] == [256, 512, 1024]


class TestRegNet:
    def test_registry_and_exact_param_counts(self):
        from ics_tpu.models.regnet import regnet_y_1_6gf, regnet_y_400mf
        from ics_tpu.models.registry import list_models

        models = list_models()
        assert "regnet_y_400mf" in models and "regnet_y_1_6gf" in models


        # torchvision-published exact counts at 1000 classes
        v = regnet_y_400mf(num_classes=1000).init(jax.random.PRNGKey(0))
        assert param_count(v["params"]) == 4_344_144
        v = regnet_y_1_6gf(num_classes=1000).init(jax.random.PRNGKey(0))
        assert param_count(v["params"]) == 11_202_430

    def test_micro_forward_fold_and_train_state(self):
        import numpy as np

        from ics_tpu.models.regnet import regnet_micro

        model = regnet_micro(num_classes=5)
        variables = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
            jnp.float32,
        )
        logits, _ = model.apply(variables, x, training=False)
        assert logits.shape == (2, 5)
        lf = model.apply_folded(model.fold(variables), x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(lf), atol=1e-5, rtol=1e-5
        )
        _, st = model.apply(variables, x, training=True)
        assert not np.allclose(
            np.asarray(st["stem"]["bn"]["mean"]),
            np.asarray(variables["state"]["stem"]["bn"]["mean"]),
        )

    def test_every_stage_opens_at_stride_2(self):
        """RegNet has no maxpool: the stem is /2 and each stage halves
        again — 64px in, 64/2/2/2 = 8px feature map for the 2-stage micro."""
        from ics_tpu.models.regnet import regnet_micro

        m = regnet_micro(num_classes=3)
        v = m.init(jax.random.PRNGKey(0))
        folded = m.fold(v)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        y = jax.nn.relu(m.stem.apply_folded(folded["stem"], x))
        assert y.shape == (1, 32, 32, 32)  # stem is ALWAYS 32-wide
        for blocks, bf in zip(m.stages, folded["stages"]):
            for blk, f in zip(blocks, bf):
                y = blk.apply_folded(f, y)
        assert y.shape[1:3] == (8, 8)


class TestEfficientNetV2M:
    def test_registry_and_exact_param_count(self):
        from ics_tpu.models.efficientnet import efficientnet_v2_m
        from ics_tpu.models.registry import get_model, list_models

        assert "efficientnet_v2_m" in list_models()
        assert get_model("efficientnet_v2_m").image_size == 480


        v = efficientnet_v2_m(num_classes=1000).init(jax.random.PRNGKey(0))
        assert param_count(v["params"]) == 54_139_356  # torchvision-published


class TestSwinBase:
    def test_registry_and_exact_param_count(self):
        from ics_tpu.models.registry import list_models
        from ics_tpu.models.swin import swin_base

        assert "swin_base" in list_models()


        # timm swin_base_patch4_window7_224, exact
        v = swin_base(num_classes=1000).init(jax.random.PRNGKey(0))
        assert param_count(v["params"]) == 87_768_224
