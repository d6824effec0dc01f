"""Fused bottleneck-chain kernel (opt-in experiment; see docs/benchmarks.md
round-2 notes — numerics exact, measured slower than XLA convs on v5e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.models.resnet import Bottleneck
from ics_tpu.ops.pallas_bottleneck import (
    fused_bottleneck_chain,
    pack_chain_weights,
)


def _chain(n_blocks=2, c=256, cm=64, seed=0):
    key = jax.random.PRNGKey(seed)
    blocks = [Bottleneck(c, cm, 1) for _ in range(n_blocks)]
    folded = [
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32),
            blk.fold(blk.init(jax.random.fold_in(key, i)), blk.init_state()),
        )
        for i, blk in enumerate(blocks)
    ]
    return blocks, folded


@pytest.mark.parametrize("tile_rows", [4, 8])
def test_chain_matches_xla_blocks(tile_rows):
    blocks, folded = _chain()
    x = jax.random.normal(
        jax.random.PRNGKey(9), (2, 8, 8, 256), jnp.float32
    ).astype(jnp.bfloat16)
    ref = x
    for blk, f in zip(blocks, folded):
        ref = blk.apply_folded(
            jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), f), ref
        )
    out = fused_bottleneck_chain(
        x, pack_chain_weights(folded), tile_rows=tile_rows, interpret=True
    )
    diff = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32))
    assert diff.max() < 0.1, diff.max()  # bf16 accumulation-order noise


def test_chain_unaligned_width_pads_and_masks():
    """W not a multiple of 8 (stages 2-4: 28/14/7) — the kernel pads the
    sublane dim and masks the extra columns; SAME-conv semantics must be
    preserved at the true right edge."""
    blocks, folded = _chain(n_blocks=2, c=256, cm=64)
    x = jax.random.normal(
        jax.random.PRNGKey(3), (2, 7, 7, 256), jnp.float32
    ).astype(jnp.bfloat16)
    ref = x
    for blk, f in zip(blocks, folded):
        ref = blk.apply_folded(
            jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), f), ref
        )
    out = fused_bottleneck_chain(
        x, pack_chain_weights(folded), tile_rows=7, interpret=True
    )
    assert out.shape == (2, 7, 7, 256)
    diff = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32))
    assert diff.max() < 0.1, diff.max()


def test_pack_rejects_projection_blocks():
    blk = Bottleneck(64, 64, 1)  # 64 -> 256: has a downsample projection
    folded = blk.fold(blk.init(jax.random.PRNGKey(0)), blk.init_state())
    with pytest.raises(AssertionError):
        pack_chain_weights([folded])


def test_fold_optin_packs_chains():
    from ics_tpu.models.resnet import ResNet

    model = ResNet(block_counts=(2, 2, 1, 1), num_classes=8)
    variables = model.init(jax.random.PRNGKey(0))
    folded = model.fold(variables, pallas_chains=True)
    assert "chains" in folded and "0" in folded["chains"]
    assert "chains" not in model.fold(variables)  # default: off (slower)


def test_fold_bounds_chains_by_packed_weight_bytes():
    """The chain cap is VMEM bytes, not block count (ADVICE r2): late
    stages' C=2048 blocks are ~8.7 MB each in bf16 — even a 2-block chain
    exceeds the 8 MB weight budget — while early stages fit easily."""
    from ics_tpu.models.resnet import ResNet

    model = ResNet(block_counts=(3, 4, 6, 3), num_classes=8)  # resnet50
    variables = model.init(jax.random.PRNGKey(1))
    folded = model.fold(variables, pallas_chains=True)
    chains = folded["chains"]
    # stage0 (C=256, 2 identity blocks ~0.3 MB) and stage1 (C=512, 3 blocks
    # ~1.7 MB) fit; stage2 (C=1024, 5 blocks ~11 MB) and stage3 (C=2048,
    # 2 blocks ~17 MB) must be excluded
    assert set(chains) == {"0", "1"}
