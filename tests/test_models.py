import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.models.registry import get_model, list_models
from ics_tpu.models.resnet import ResNet


@pytest.fixture(scope="module")
def tiny_resnet():
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=10)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


class TestResNet:
    def test_registry(self):
        assert "resnet50" in list_models()
        spec = get_model("resnet50")
        assert spec.image_size == 224

    def test_forward_shape(self, tiny_resnet):
        model, variables = tiny_resnet
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        logits, state = model.apply(variables, x, training=False)
        assert logits.shape == (2, 10)
        assert jnp.all(jnp.isfinite(logits))

    def test_folded_matches_unfolded(self, tiny_resnet):
        model, variables = tiny_resnet
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        logits, _ = model.apply(variables, x, training=False)
        folded = model.fold(variables)
        logits_folded = model.apply_folded(folded, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_folded), rtol=1e-4, atol=1e-4
        )

    def test_training_updates_bn_state(self, tiny_resnet):
        model, variables = tiny_resnet
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 3)) * 3 + 1
        _, new_state = model.apply(variables, x, training=True)
        old = variables["state"]["stem"]["bn"]["mean"]
        new = new_state["stem"]["bn"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_resnet50_param_count(self):
        model = ResNet((3, 4, 6, 3), num_classes=1000)
        variables = model.init(jax.random.PRNGKey(0))
        n = sum(
            x.size for x in jax.tree_util.tree_leaves(variables["params"])
        )
        # torchvision resnet50: 25,557,032 params (incl. BN)
        assert abs(n - 25_557_032) < 10_000, n

    def test_bf16_forward(self, tiny_resnet):
        model, variables = tiny_resnet
        folded = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            model.fold(variables),
        )
        x = jnp.zeros((2, 64, 64, 3), jnp.bfloat16)
        out = model.apply_folded(folded, x)
        assert out.dtype == jnp.bfloat16


class TestTrainStep:
    def test_loss_decreases(self, tiny_resnet):
        from ics_tpu.train.finetune import make_optimizer, make_train_step

        model, variables = tiny_resnet
        optimizer = make_optimizer(lr=0.05)
        opt_state = optimizer.init(variables["params"])
        step = jax.jit(make_train_step(model, optimizer, jnp.float32))
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 64, 64, 3))
        y = jnp.arange(8) % 10
        losses = []
        for _ in range(4):
            variables, opt_state, metrics = step(variables, opt_state, x, y)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
