"""Pipeline parallelism (parallel/pipeline.py): GPipe fill-drain over a
``pp`` mesh axis must be numerically IDENTICAL to the sequential trunk.

SURVEY §2.3 upgrade: PP was previously documented out of scope; these
tests validate the real schedule (microbatch rotation via ppermute,
per-stage lax.scan block slices) on virtual CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.models.vit import ViT
from ics_tpu.parallel.mesh import make_mesh
from ics_tpu.parallel.pipeline import (
    pipeline_blocks,
    pipeline_vit_forward,
    stack_block_params,
)


@pytest.fixture(scope="module")
def vit_setup():
    model = ViT(image_size=32, patch_size=8, dim=32, depth=8,
                num_heads=2, num_classes=5)
    variables = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)),
        jnp.float32,
    )
    # reference = the plain sequential forward (XLA attention path)
    ref, _ = model.apply(variables, x, training=True)
    return model, model.fold(variables), x, np.asarray(ref)


class TestPipelineForward:
    @pytest.mark.parametrize("stages,microbatches", [
        (2, 2), (2, 8), (4, 4), (4, 8), (8, 4),
    ])
    def test_matches_sequential(self, vit_setup, stages, microbatches):
        model, folded, x, ref = vit_setup
        mesh = make_mesh((stages,), ("pp",),
                         devices=jax.devices()[:stages])
        out = pipeline_vit_forward(
            model, folded, x, mesh,
            microbatches=microbatches, use_flash=False,
        )
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=1e-5, rtol=1e-5
        )

    def test_single_microbatch_degenerate(self, vit_setup):
        """M=1: pure fill-drain, every tick has exactly one busy stage."""
        model, folded, x, ref = vit_setup
        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        out = pipeline_vit_forward(model, folded, x, mesh,
                                   microbatches=1, use_flash=False)
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=1e-5, rtol=1e-5
        )

    def test_indivisible_depth_is_loud(self, vit_setup):
        model, folded, x, _ = vit_setup
        mesh = make_mesh((3,), ("pp",), devices=jax.devices()[:3])
        stacked = stack_block_params(folded["blocks"])
        tokens = jnp.zeros((4, 17, 32), jnp.float32)
        with pytest.raises(ValueError, match="estágios"):
            pipeline_blocks(model.blocks[0], stacked, tokens, mesh,
                            microbatches=2)

    def test_indivisible_batch_is_loud(self, vit_setup):
        model, folded, x, _ = vit_setup
        mesh = make_mesh((2,), ("pp",), devices=jax.devices()[:2])
        stacked = stack_block_params(folded["blocks"])
        tokens = jnp.zeros((5, 17, 32), jnp.float32)
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_blocks(model.blocks[0], stacked, tokens, mesh,
                            microbatches=3)

    def test_pre_staged_blocks_match_list_form(self, vit_setup):
        """blocks_staged ([S, per, ...], pre-computed once at engine init)
        must produce identical results to the on-the-fly stacked list form
        — the serving engine uses the pre-staged path so the compiled step
        stops re-copying the whole trunk every call (review r5)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ics_tpu.parallel.pipeline import stage_block_params

        model, folded, x, ref = vit_setup
        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        staged = stage_block_params(folded["blocks"], 4)
        staged = jax.device_put(
            staged,
            jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P("pp")), staged
            ),
        )
        pp_folded = {k: v for k, v in folded.items() if k != "blocks"}
        pp_folded["blocks_staged"] = staged
        out = pipeline_vit_forward(
            model, pp_folded, x, mesh, microbatches=4, use_flash=False
        )
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=1e-5, rtol=1e-5
        )

    def test_stage_params_mismatch_is_loud(self, vit_setup):
        from ics_tpu.parallel.pipeline import stage_block_params

        model, folded, x, _ = vit_setup
        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        staged2 = stage_block_params(folded["blocks"], 2)  # wrong stages
        tokens = jnp.zeros((4, 17, 32), jnp.float32)
        with pytest.raises(ValueError, match="estagiados"):
            pipeline_blocks(model.blocks[0], staged2, tokens, mesh,
                            microbatches=2, staged=True)

    def test_stage_params_actually_distributed(self, vit_setup):
        """The stacked stage tree shards its leading dim over 'pp': each
        device must hold only depth/stages blocks' worth of weights."""
        model, folded, x, _ = vit_setup
        stacked = stack_block_params(folded["blocks"])
        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        from jax.sharding import NamedSharding, PartitionSpec as P

        staged = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a.reshape((4, 2) + a.shape[1:]),
                NamedSharding(mesh, P("pp")),
            ),
            stacked,
        )
        leaf = jax.tree_util.tree_leaves(staged)[0]
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[0] == 1  # one stage per device


class TestPipelineTraining:
    def test_grad_through_pipeline_matches_sequential(self, vit_setup):
        """The GPipe forward is DIFFERENTIABLE: jax.grad through
        shard_map + the fori_loop schedule + ppermute produces gradients
        for EVERY param (including blocks living on other stages, whose
        grads return through the transposed permutation) identical to
        the sequential model's — the pipeline is training-capable, not
        inference-only."""
        model, folded, x, _ = vit_setup
        labels = jnp.asarray(np.arange(x.shape[0]) % 5)
        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])

        def loss_pp(params):
            logits = pipeline_vit_forward(
                model, params, x, mesh, microbatches=4, use_flash=False
            )
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(x.shape[0]), labels])

        def loss_seq(params):
            logits, _ = model.apply(
                {"params": params, "state": {}}, x, training=True
            )
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(x.shape[0]), labels])

        g_pp = jax.grad(loss_pp)(folded)
        g_seq = jax.grad(loss_seq)(folded)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
            ),
            g_pp, g_seq,
        )
