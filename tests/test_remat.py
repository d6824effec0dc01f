"""Per-block rematerialization: numerics identical, wiring reaches models.

jax.checkpoint must not change the math — loss and gradients are
bit-compatible with the stored-activation path (same ops, same order);
only the backward's memory/recompute schedule differs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.models.resnet import resnet_tiny
from ics_tpu.models.vit import ViT
from ics_tpu.train.finetune import FineTuner, cross_entropy_loss


def _loss_and_grads(model, variables, x, labels):
    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "state": variables["state"]}, x, training=True
        )
        return cross_entropy_loss(logits, labels)

    return jax.value_and_grad(loss_fn)(variables["params"])


def test_resnet_remat_matches_plain():
    model = resnet_tiny(num_classes=7)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    labels = jnp.array([1, 4])

    model.remat = False
    loss_a, grads_a = _loss_and_grads(model, variables, x, labels)
    model.remat = True
    loss_b, grads_b = _loss_and_grads(model, variables, x, labels)

    assert float(loss_a) == float(loss_b)
    flat_a = jax.tree_util.tree_leaves(grads_a)
    flat_b = jax.tree_util.tree_leaves(grads_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_vit_remat_matches_plain():
    model = ViT(image_size=32, patch_size=8, dim=64, depth=2, num_heads=2,
                num_classes=5)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jnp.array([0, 3])

    model.remat = False
    loss_a, grads_a = _loss_and_grads(model, variables, x, labels)
    model.remat = True
    loss_b, grads_b = _loss_and_grads(model, variables, x, labels)

    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree_util.tree_leaves(grads_a),
                    jax.tree_util.tree_leaves(grads_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_convnext_remat_matches_plain():
    from ics_tpu.models.convnext import ConvNeXt

    model = ConvNeXt(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                     num_classes=4)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    labels = jnp.array([2, 0])

    model.remat = False
    loss_a, grads_a = _loss_and_grads(model, variables, x, labels)
    model.remat = True
    loss_b, grads_b = _loss_and_grads(model, variables, x, labels)

    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree_util.tree_leaves(grads_a),
                    jax.tree_util.tree_leaves(grads_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_finetuner_remat_flag_reaches_model():
    model = resnet_tiny(num_classes=3)
    FineTuner(model, image_size=64, resize_short=64, remat=True)
    assert model.remat is True
    # default (None) leaves a caller-set flag untouched
    FineTuner(model, image_size=64, resize_short=64)
    assert model.remat is True
    FineTuner(model, image_size=64, resize_short=64, remat=False)
    assert model.remat is False
