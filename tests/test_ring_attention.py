"""Ring attention (parallel/ring_attention.py): token-sharded exact
attention must be numerically IDENTICAL to the full-sequence reference.

SURVEY §2.3 SP row: the blockwise kernel was the seam; this is the
cross-device realization (K/V rotating over ppermute with online-softmax
accumulation) validated on virtual CPU rings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.ops.attention import attention_reference
from ics_tpu.parallel.mesh import make_mesh
from ics_tpu.parallel.ring_attention import (
    ring_attention,
    ring_attention_padded,
)


def _qkv(rng, b=2, h=3, s=32, d=16):
    def one():
        return jnp.asarray(
            rng.standard_normal((b, h, s, d)), jnp.float32
        )

    return one(), one(), one()


class TestRingAttention:
    @pytest.mark.parametrize("ring", [2, 4, 8])
    def test_matches_reference(self, ring):
        rng = np.random.default_rng(ring)
        q, k, v = _qkv(rng)
        mesh = make_mesh((ring,), ("sp",), devices=jax.devices()[:ring])
        out = ring_attention(q, k, v, mesh)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_extreme_logits_stay_stable(self):
        """The online-softmax rescaling must survive score magnitudes that
        would overflow a naive exp (the whole point of the recurrence)."""
        rng = np.random.default_rng(0)
        q, k, v = _qkv(rng, s=16, d=8)
        q = q * 30.0  # scores ~ +-100 after scaling
        mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        out = ring_attention(q, k, v, mesh)
        ref = attention_reference(q, k, v)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_indivisible_sequence_is_loud(self):
        rng = np.random.default_rng(1)
        q, k, v = _qkv(rng, s=30)
        mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="anel"):
            ring_attention(q, k, v, mesh)

    def test_memory_is_actually_sharded(self):
        """Each device's addressable K shard holds S/R tokens — the
        memory win SP exists for."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = np.random.default_rng(2)
        q, k, v = _qkv(rng, s=32)
        mesh = make_mesh((8,), ("sp",), devices=jax.devices()[:8])
        sharding = NamedSharding(mesh, P(None, None, "sp", None))
        k_sharded = jax.device_put(k, sharding)
        assert k_sharded.addressable_shards[0].data.shape[2] == 4  # 32/8
        out = ring_attention(
            jax.device_put(q, sharding), k_sharded,
            jax.device_put(v, sharding), mesh,
        )
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )


class TestRingAttentionTraining:
    def test_grad_matches_reference(self):
        """Ring attention is DIFFERENTIABLE: jax.grad through the
        fixed-trip fori_loop + ppermute rotation matches full-attention
        gradients for Q, K and V — the SP seam covers training (where
        long-context memory pressure actually bites), not just
        inference."""
        rng = np.random.default_rng(0)
        q, k, v = _qkv(rng)
        mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])

        def loss_ring(q_, k_, v_):
            return jnp.sum(ring_attention(q_, k_, v_, mesh) ** 2)

        def loss_ref(q_, k_, v_):
            return jnp.sum(attention_reference(q_, k_, v_) ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )


class TestRingAttentionPadded:
    def test_padded_matches_reference(self):
        """Sequences that don't divide the ring (ViT's P+1 tokens): pad,
        mask key positions past valid_len, slice back — must equal full
        attention on the unpadded sequence."""
        rng = np.random.default_rng(3)
        mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        for s in (17, 65, 31):  # none divide 4
            q, k, v = (
                jnp.asarray(rng.standard_normal((2, 2, s, 8)), jnp.float32)
                for _ in range(3)
            )
            out = ring_attention_padded(q, k, v, mesh)
            ref = attention_reference(q, k, v)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
            )

    def test_padded_grads_match_reference(self):
        rng = np.random.default_rng(4)
        mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        q, k, v = (
            jnp.asarray(rng.standard_normal((1, 2, 13, 8)), jnp.float32)
            for _ in range(3)
        )

        def loss_ring(q_, k_, v_):
            return jnp.sum(ring_attention_padded(q_, k_, v_, mesh) ** 2)

        def loss_ref(q_, k_, v_):
            return jnp.sum(attention_reference(q_, k_, v_) ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )

    def test_all_masked_chunk_is_finite(self):
        """valid_len smaller than one chunk: the last ring devices hold
        ENTIRELY padded key chunks — the online softmax must not count
        ghost keys or emit NaN."""
        rng = np.random.default_rng(5)
        mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        s = 16  # chunk=4; valid_len=3 masks chunks 1-3 completely
        q, k, v = (
            jnp.asarray(rng.standard_normal((1, 1, s, 8)), jnp.float32)
            for _ in range(3)
        )
        out = ring_attention(q, k, v, mesh, valid_len=3)
        ref = attention_reference(q[:, :, :3], k[:, :, :3], v[:, :, :3])
        np.testing.assert_allclose(
            np.asarray(out[:, :, :3]), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        assert np.isfinite(np.asarray(out)).all()


class TestFineTunerSP:
    def test_sp_training_loss_matches_unsharded(self):
        """VERDICT r3 next-step #8 done-condition: FineTuner on a pure-SP
        mesh (attention ringed over 'sp', batch replicated) produces the
        SAME loss trajectory as the unsharded run — sequence parallelism
        as a product configuration, not just a library function."""
        from ics_tpu.models.vit import vit_tiny
        from ics_tpu.train.finetune import FineTuner, make_optimizer

        rng = np.random.default_rng(0)
        batches = [
            (
                rng.integers(0, 256, (4, 64, 64, 3), np.uint8),
                np.full((4, 2), 64, np.int32),
                (np.arange(4) % 8).astype(np.int32),
            )
            for _ in range(2)
        ]

        def run(mesh):
            model = vit_tiny(num_classes=8)
            variables = model.init(jax.random.PRNGKey(1))
            tuner = FineTuner(
                model, optimizer=make_optimizer(lr=0.05),
                image_size=64, resize_short=64,
                compute_dtype=jnp.float32, mesh=mesh,
            )
            _, _, hist = tuner.run(variables, iter(list(batches)))
            return [h["loss"] for h in hist]

        plain = run(None)
        sp_mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        ringed = run(sp_mesh)
        np.testing.assert_allclose(ringed, plain, atol=1e-4, rtol=1e-4)

    def test_sp_rejects_mixed_mesh_and_non_vit(self):
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import FineTuner

        mixed = make_mesh((2, 2), ("data", "sp"), devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="puro-SP"):
            FineTuner(resnet_tiny(num_classes=8), mesh=mixed)
        sp_mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="ViT"):
            FineTuner(resnet_tiny(num_classes=8), mesh=sp_mesh)
