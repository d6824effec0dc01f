"""Pipeline parallelism (GPipe-style) for the transformer trunk.

SURVEY §2.3 lists PP as a seam the reference never needed (no model big
enough); this implements the real thing the TPU way: stages are devices
along a ``pp`` mesh axis, microbatches flow stage-to-stage over ICI via
``lax.ppermute`` inside one ``shard_map``-compiled program — no host
round-trips, no per-step dispatch. The schedule is the classic GPipe
fill-drain: at tick ``t`` stage ``s`` processes microbatch ``t - s``;
``M + S - 1`` ticks move ``M`` microbatches through ``S`` stages (bubble
fraction ``(S-1)/(M+S-1)``).

Each stage applies its slice of the homogeneous block stack with
``lax.scan`` over the stacked per-block params — one compiled block body
per stage regardless of depth. Built for the ViT family (uniform
TransformerBlocks); any residual-trunk model with stackable blocks fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_block_params(blocks: list) -> dict:
    """List of identical per-block param trees -> one tree with a leading
    block dimension (scan-ready)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def stage_block_params(blocks: list, n_stages: int) -> dict:
    """List of per-block param trees -> one tree with leading [S, per, ...]
    dims, ready to shard one stage per device along dim 0.

    Serving engines call this ONCE at init (and ``device_put`` the result
    with a ``P('pp')`` sharding): stacking inside the compiled step would
    re-copy the entire trunk's parameters on every inference batch
    (review r5)."""
    depth = len(blocks)
    if depth % n_stages:
        raise ValueError(
            f"profundidade {depth} não divide pelos {n_stages} estágios"
        )
    per_stage = depth // n_stages
    stacked = stack_block_params(blocks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per_stage) + x.shape[1:]), stacked
    )


def pipeline_blocks(block, stacked_params, tokens, mesh: Mesh,
                    microbatches: int, axis: str = "pp",
                    use_flash: bool = False, staged: bool = False):
    """Run a homogeneous block stack over ``tokens`` [B, T, D] with the
    blocks SPLIT ACROSS the mesh's ``axis`` devices (depth % stages == 0,
    B % microbatches == 0). Returns [B, T, D] — numerically identical to
    applying the blocks sequentially on one device.

    ``block`` is the module whose ``apply(params, x, use_flash)`` runs one
    block; ``stacked_params`` is :func:`stack_block_params` output
    ([depth, ...]), or — with ``staged=True`` — :func:`stage_block_params`
    output ([S, per, ...], typically pre-placed with a ``P(axis)``
    sharding so the restage below is skipped and no per-call copy or
    collective runs).
    """
    n_stages = int(mesh.shape[axis])
    b, t, d = tokens.shape
    if b % microbatches:
        raise ValueError(
            f"batch {b} não divide por {microbatches} microbatches"
        )
    if staged:
        lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[:2]
        if lead[0] != n_stages:
            raise ValueError(
                f"parâmetros estagiados para {lead[0]} estágios, mesh tem "
                f"{n_stages}"
            )
        per_stage = lead[1]
        staged_params = stacked_params
    else:
        depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
        if depth % n_stages:
            raise ValueError(
                f"profundidade {depth} não divide pelos {n_stages} estágios"
            )
        per_stage = depth // n_stages
        # [S, per, ...]: leading dim shards one stage per device
        staged_params = jax.tree_util.tree_map(
            lambda x: x.reshape((n_stages, per_stage) + x.shape[1:]),
            stacked_params,
        )
    mb = b // microbatches
    m = microbatches
    xs = tokens.reshape(m, mb, t, d)

    def stage_apply(stage_params, x):
        def body(xc, bp):
            return block.apply(bp, xc, use_flash), None

        y, _ = jax.lax.scan(body, x, stage_params)
        return y

    def body(stage_params, xs_local):
        # shard_map gives [1, per, ...] per device: drop the stage dim
        stage_params = jax.tree_util.tree_map(
            lambda p: p[0], stage_params
        )
        sidx = jax.lax.axis_index(axis)
        is_last = sidx == n_stages - 1
        # no wrap edge: stage 0 reads `inject`, never `cur`, so shipping
        # the last stage's activation back around would be a wasted
        # per-tick ICI transfer (ppermute zero-fills non-targets)
        perm = [(i, i + 1) for i in range(n_stages - 1)]
        # pvary: the carries become device-varying inside the loop (they
        # depend on axis_index/ppermute), so the initial values must be
        # marked varying too or shard_map rejects the fori_loop typing
        cur = jax.lax.pcast(
            jnp.zeros((mb, t, d), xs_local.dtype), (axis,), to="varying"
        )
        out = jax.lax.pcast(
            jnp.zeros((m, mb, t, d), xs_local.dtype), (axis,), to="varying"
        )

        def tick(step, carry):
            cur, out = carry
            # stage 0 ingests microbatch `step` (clamped; inactive ticks
            # compute masked garbage that no one consumes)
            inject = xs_local[jnp.clip(step, 0, m - 1)]
            x_in = jnp.where(sidx == 0, inject, cur)
            y = stage_apply(stage_params, x_in)
            # the last stage finished microbatch step-(S-1) this tick
            slot = jnp.clip(step - (n_stages - 1), 0, m - 1)
            active_out = is_last & (step - (n_stages - 1) >= 0)
            out = jnp.where(active_out, out.at[slot].set(y), out)
            # rotate activations to the next stage over ICI
            cur = jax.lax.ppermute(y, axis, perm)
            return cur, out

        _, out = jax.lax.fori_loop(
            0, m + n_stages - 1, tick, (cur, out)
        )
        # only the last stage ever writes `out` (active_out includes
        # is_last), so it is all-zeros elsewhere and the psum broadcasts
        # the real result — out_specs can be replicated
        return jax.lax.psum(out, axis)

    # the Pallas flash kernel can't declare vma on its out ShapeDtypeStruct,
    # so shard_map's varying-mesh-axes checker must be off when the stages
    # run flash attention (the pcast annotations above still execute)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=not use_flash,
    )(staged_params, xs)
    return out.reshape(b, t, d)


def pipeline_vit_forward(model, folded, x, mesh: Mesh,
                         microbatches: int = 4, axis: str = "pp",
                         use_flash: bool = False):
    """Full ViT inference with the transformer trunk pipelined over the
    mesh's ``axis`` devices: patch-embed/cls/pos and ln/head run
    replicated (tiny next to the trunk), the blocks flow as microbatches.

    Numerically identical to ``model.apply_folded`` modulo the attention
    variant selected by ``use_flash``.
    """
    b = x.shape[0]
    y = model.patch_embed.apply(folded["patch_embed"], x)
    y = y.reshape(b, -1, model.dim)
    cls = jnp.broadcast_to(
        folded["cls_token"].astype(y.dtype), (b, 1, model.dim)
    )
    y = jnp.concatenate([cls, y], axis=1)
    y = y + folded["pos_embed"].astype(y.dtype)
    # "blocks_staged" ([S, per, ...], pre-placed P(axis) at engine init)
    # avoids re-stacking the whole trunk inside the compiled step on every
    # call; the "blocks" list form stays supported for direct callers
    staged_blocks = folded.get("blocks_staged")
    if staged_blocks is None:
        y = pipeline_blocks(
            model.blocks[0], stack_block_params(folded["blocks"]), y, mesh,
            microbatches=microbatches, axis=axis, use_flash=use_flash,
        )
    else:
        y = pipeline_blocks(
            model.blocks[0], staged_blocks, y, mesh,
            microbatches=microbatches, axis=axis, use_flash=use_flash,
            staged=True,
        )
    y = model.ln.apply(folded["ln"], y)
    return model.head.apply(folded["head"], y[:, 0])
