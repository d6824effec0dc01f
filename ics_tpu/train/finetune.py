"""Fine-tune loop (BASELINE.json config 5): conv fwd+bwd + SGD.

Pure-functional train step, jit-able single-chip or sharded over a mesh
(DP on batch + TP on the classifier head). Checkpointing via orbax in
:mod:`ics_tpu.train.checkpoint`.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ics_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
    shard_head_for_tp,
)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
    return jnp.mean(nll)


def make_optimizer(lr: float = 0.01, momentum: float = 0.9,
                   weight_decay: float = 1e-4):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )


def make_train_step(model, optimizer, compute_dtype=jnp.bfloat16):
    """Returns ``step(variables, opt_state, images, labels) ->
    (variables, opt_state, metrics)``.

    ``images`` are already-preprocessed [B, H, W, 3]; BN runs in training
    mode and its running stats flow through ``variables['state']``.
    """

    def loss_fn(params, state, images, labels):
        logits, new_state = model.apply(
            {"params": params, "state": state},
            images.astype(compute_dtype),
            training=True,
        )
        loss = cross_entropy_loss(logits, labels)
        return loss, (logits, new_state)

    def step(variables, opt_state, images, labels):
        params, state = variables["params"], variables["state"]
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        )
        return (
            {"params": params, "state": new_state},
            opt_state,
            {"loss": loss, "accuracy": acc},
        )

    return step


def make_sharded_train_step(model, optimizer, mesh: Mesh,
                            compute_dtype=jnp.bfloat16):
    """DP over 'data' (batch) + TP of the classifier head over 'model'.

    Returns ``(jitted_step, shard_variables)`` where ``shard_variables``
    places an initialized (variables, opt_state) onto the mesh.
    """
    step = make_train_step(model, optimizer, compute_dtype)

    rep = replicated_sharding(mesh)

    def _variable_shardings(variables):
        params_sh = shard_head_for_tp(mesh, variables["params"])
        state_sh = jax.tree_util.tree_map(lambda _: rep, variables["state"])
        return {"params": params_sh, "state": state_sh}

    def shard_variables(variables, opt_state):
        var_sh = _variable_shardings(variables)
        variables = jax.tree_util.tree_map(jax.device_put, variables, var_sh)
        # optimizer state mirrors the param tree's sharding where shapes
        # match; otherwise replicate (scalar counts etc.)
        def place_opt(x):
            return jax.device_put(x, rep)

        opt_state = jax.tree_util.tree_map(place_opt, opt_state)
        return variables, opt_state, var_sh

    def jit_step(variables, opt_state):
        var_sh = _variable_shardings(variables)
        opt_sh = jax.tree_util.tree_map(lambda _: rep, opt_state)
        data_sh = batch_sharding(mesh, 4)
        label_sh = batch_sharding(mesh, 1)
        return jax.jit(
            step,
            in_shardings=(var_sh, opt_sh, data_sh, label_sh),
            out_shardings=(var_sh, opt_sh, rep),
        )

    return jit_step, shard_variables
