"""Fine-tune loop (BASELINE.json config 5): conv fwd+bwd + SGD.

Pure-functional train step, jit-able single-chip or sharded over a mesh
(DP on batch + TP on the classifier head). Checkpointing via orbax in
:mod:`ics_tpu.train.checkpoint`.
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def soft_cross_entropy_loss(logits, target_probs):
    """CE against probability rows [B, C] — the mixup/label-smoothing form
    (reduces to :func:`cross_entropy_loss` on one-hot targets)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(-jnp.sum(target_probs * logp, axis=-1))


def sigmoid_bce_loss(logits, targets):
    """Multi-label objective (``multipla_escolha`` ambientes): independent
    per-class sigmoid BCE against [B, C] target probabilities, summed over
    classes and averaged over the batch — the class-sum keeps the gradient
    scale comparable to softmax CE, so the same LR recipe transfers."""
    per = optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), targets
    )
    return jnp.mean(jnp.sum(per, axis=-1))


def multilabel_exact_match(logits, targets):
    """Fraction of rows whose 0.5-thresholded prediction equals the
    (thresholded) target set — the strict multi-label accuracy."""
    pred = logits >= 0.0  # sigmoid(x) >= 0.5  <=>  x >= 0
    true = targets >= 0.5
    return jnp.mean(jnp.all(pred == true, axis=-1).astype(jnp.float32))


def make_optimizer(lr=0.01, momentum: float = 0.9,
                   weight_decay: Optional[float] = None,
                   kind: str = "sgd"):
    """``lr`` may be a float or an optax schedule (callable step -> lr).

    ``kind`` selects the update rule: ``"sgd"`` (momentum SGD, the conv
    recipe) or ``"adamw"`` (decoupled-decay Adam — the standard recipe for
    the transformer families: ViT/Swin/ConvNeXt). ``weight_decay=None``
    picks the per-kind default (1e-4 SGD, 0.05 AdamW).

    Standard recipe either way: no weight decay on norm scales/shifts or
    biases (1-D params) — decaying them degrades accuracy."""
    def wd_mask(params):
        return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)

    if kind == "sgd":
        wd = 1e-4 if weight_decay is None else float(weight_decay)
        return optax.chain(
            optax.add_decayed_weights(wd, mask=wd_mask),
            optax.sgd(lr, momentum=momentum),
        )
    if kind == "adamw":
        wd = 0.05 if weight_decay is None else float(weight_decay)
        return optax.adamw(lr, weight_decay=wd, mask=wd_mask)
    raise ValueError(
        f"otimizador desconhecido: {kind!r} (esperado 'sgd' ou 'adamw')"
    )


# layer-wise LR decay: param subtrees that sit BEFORE the first block
# (depth 0 — the most-generic features, smallest LR under LLRD)
_LLRD_STEM_KEYS = {"stem", "stem_ln", "patch_embed", "patch_norm",
                   "cls_token", "pos_embed"}
# stage-boundary modules (convnext down[s] precedes stage s+1; swin
# merges[s] follows stage s) — pinned between the adjacent stages
_LLRD_BOUNDARY_KEYS = {"down", "merges"}


def llrd_multipliers(params, decay: float):
    """Per-leaf LR multiplier tree for layer-wise LR decay (Howard &
    Ruder ULMFiT; the standard BERT/ViT fine-tune recipe): the head gets
    the full LR, each block going TOWARD the input gets ``decay``× less —
    pretrained early layers hold generic features and should move least.

    Depth assignment is zoo-generic, driven by the shared param-tree
    conventions (every family keeps its repeated units in a ``blocks``
    list or a ``stages`` list-of-lists):

    - stem/patch-embed/cls/pos subtrees -> depth 0
    - ``blocks[i]`` -> depth i+1; ``stages[s][b]`` -> global block ordinal
    - ``down[s]``/``merges[s]`` -> pinned at the stage boundary
    - everything else (head, final norms, classifier convs) -> depth L+1
      (multiplier 1.0)

    multiplier(leaf) = decay ** (L + 1 - depth), L = total block count.
    """
    if not (0.0 < decay <= 1.0):
        raise ValueError(f"llrd fora de (0, 1]: {decay!r}")
    jtu = jax.tree_util
    stages = params.get("stages") if isinstance(params, dict) else None
    offs = [0]
    if isinstance(stages, list):
        for st in stages:
            offs.append(offs[-1] + (len(st) if isinstance(st, list) else 1))
    blocks = params.get("blocks") if isinstance(params, dict) else None
    total = (offs[-1] if isinstance(stages, list)
             else len(blocks) if isinstance(blocks, list) else 0)

    def depth_of(path) -> int:
        k0 = path[0].key if isinstance(path[0], jtu.DictKey) else None
        if k0 in _LLRD_STEM_KEYS:
            return 0
        if k0 == "blocks" and len(path) > 1 \
                and isinstance(path[1], jtu.SequenceKey):
            return path[1].idx + 1
        if k0 == "stages" and len(path) > 2 \
                and isinstance(path[1], jtu.SequenceKey) \
                and isinstance(path[2], jtu.SequenceKey):
            return offs[path[1].idx] + path[2].idx + 1
        if k0 in _LLRD_BOUNDARY_KEYS and len(path) > 1 \
                and isinstance(path[1], jtu.SequenceKey):
            s = path[1].idx
            # down[s] precedes stage s+1, merges[s] follows stage s:
            # both sit just before that next stage's first block
            return offs[min(s + 1, len(offs) - 1)]
        return total + 1  # head / final norms: full LR

    return jtu.tree_map_with_path(
        lambda path, p: float(decay) ** (total + 1 - depth_of(path)),
        params,
    )


class LlrdState(NamedTuple):
    """State of :func:`llrd_transform` — the static multiplier tree."""

    mult: Any


def llrd_transform(decay: float):
    """Optax transform scaling each leaf's UPDATE by its LLRD multiplier.

    Must compose AFTER the base optimizer (Adam normalizes away any
    gradient pre-scaling — post-update scaling is the only placement that
    works for both SGD and AdamW) and BEFORE the EMA transform (the
    shadow must average the actually-applied params). The multiplier
    tree is built from the params structure at ``init`` and rides in
    ``opt_state`` (checkpoint/resume/sharding work unchanged; NOTE:
    toggling LLRD changes the opt_state tree — ``retomar_de`` cannot
    cross that boundary, same rule as probe/EMA/accum)."""

    def init_fn(params):
        return LlrdState(mult=jax.tree_util.tree_map(
            jnp.asarray,
            llrd_multipliers(params, decay),
        ))

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u, m: u * m.astype(u.dtype), updates, state.mult
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


class EmaState(NamedTuple):
    """State of :func:`ema_params_transform` — the shadow parameter tree."""

    ema: Any


def ema_params_transform(decay: float):
    """Terminal optax transform maintaining an exponential moving average of
    the POST-update parameters inside the optimizer state.

    Carrying the shadow tree in ``opt_state`` (instead of threading an
    extra argument through every step variant) means checkpointing, resume
    (``retomar_de``), the sharded DP path (opt_state replicates) and every
    jitted step signature work unchanged. The EMA initializes AT the
    initial params (for fine-tunes those are pretrained weights — a good
    anchor), so no bias correction is needed. Passes ``updates`` through
    untouched; compose LAST in the chain."""
    if not (0.0 < decay < 1.0):
        raise ValueError(
            f"ema_decay fora de (0, 1): {decay!r}"
        )

    def init_fn(params):
        # jnp.array, NOT asarray: the shadow must own its buffers — the
        # train steps donate (variables, opt_state) and an aliased shadow
        # makes XLA see the same buffer donated twice (runtime abort)
        return EmaState(ema=jax.tree_util.tree_map(jnp.array, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_params_transform requer params no update")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            state.ema, new_params,
        )
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def make_grad_accum(optimizer, every: int):
    """Wrap ``optimizer`` so updates apply once every ``every`` micro-steps
    with the accumulated-average gradient (``optax.MultiSteps``) — the
    standard recipe for effective batches larger than HBM allows.

    The accumulator rides inside ``opt_state`` (same design as
    :func:`ema_params_transform`): every jitted step variant, orbax
    checkpointing, ``retomar_de`` and the sharded DP path work unchanged.
    Non-apply micro-steps emit zero updates (params hold still); inner
    transforms — LR-schedule counters, EMA — advance only on apply steps,
    so wrap the FULL chain (EMA included) in this, last."""
    every = int(every)
    if every < 1:
        raise ValueError(
            f"acumular_gradientes deve ser >= 1: {every!r}"
        )
    if every == 1:
        return optimizer
    ms = optax.MultiSteps(optimizer, every_k_schedule=every)
    return optax.GradientTransformation(ms.init, ms.update)


def find_ema_params(opt_state):
    """Extract the EMA shadow tree from a (possibly nested) optimizer state;
    ``None`` when the optimizer carries no :class:`EmaState`."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = find_ema_params(sub)
            if found is not None:
                return found
    elif isinstance(opt_state, dict):
        for sub in opt_state.values():
            found = find_ema_params(sub)
            if found is not None:
                return found
    return None


def replace_ema_params(opt_state, new_ema):
    """Rebuild ``opt_state`` with its :class:`EmaState` shadow replaced by
    ``new_ema`` (same tree structure as the params). No-op (returns the
    state unchanged) when no EmaState is present.

    Used when an early-stopped job writes its BEST snapshot as the latest
    checkpoint: the final step's shadow corresponds to the *discarded*
    final weights — restoring it alongside best-step params would bias a
    ``retomar_de`` resume's first EMA updates toward abandoned weights
    (ADVICE r3). Re-anchoring the shadow on the snapshot params keeps the
    restore template shape-identical while making resume self-consistent."""
    if isinstance(opt_state, EmaState):
        # jnp.array, NOT asarray: the shadow must own its buffers or the
        # donated train step sees the same buffer twice (see init_fn)
        return EmaState(ema=jax.tree_util.tree_map(jnp.array, new_ema))
    if isinstance(opt_state, tuple):
        rebuilt = tuple(replace_ema_params(sub, new_ema) for sub in opt_state)
        # NamedTuples (optax states) need _make, plain tuples don't
        if hasattr(opt_state, "_make"):
            return type(opt_state)._make(rebuilt)
        return rebuilt
    if isinstance(opt_state, list):
        return [replace_ema_params(sub, new_ema) for sub in opt_state]
    if isinstance(opt_state, dict):
        return {k: replace_ema_params(v, new_ema) for k, v in opt_state.items()}
    return opt_state


def make_lr_schedule(lr: float, total_steps: int, kind: str = "cosseno",
                     warmup_frac: float = 0.1):
    """Fine-tune LR schedule: linear warmup over ~10% of the run, cosine
    decay to 1% of peak (the standard transfer recipe). ``constante``
    returns the float unchanged. The schedule's step count lives in the
    optimizer state, so ``retomar_de`` resumes mid-curve, not at the peak.
    """
    if kind == "constante":
        return lr
    if kind != "cosseno":
        raise ValueError(f"agenda_lr desconhecida: {kind!r} "
                         "(esperado 'cosseno' ou 'constante')")
    total = max(int(total_steps), 2)
    warmup = min(max(1, int(total * warmup_frac)), total - 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup,
        decay_steps=total, end_value=lr * 0.01,
    )


def make_probe_optimizer(optimizer):
    """Linear-probe wrapper: only the top-level ``head`` params update;
    every backbone subtree is ``set_to_zero`` (every model family in the
    zoo names its classifier ``head``). Pairs with the step builders'
    ``train_backbone=False`` (BN in eval mode, running stats untouched) —
    together they make probing equivalent to logistic regression on the
    frozen pretrained features."""

    def label(params):
        return {k: ("head" if k == "head" else "frozen") for k in params}

    return optax.multi_transform(
        {"head": optimizer, "frozen": optax.set_to_zero()}, label
    )


def make_train_step(model, optimizer, compute_dtype=jnp.bfloat16,
                    train_backbone: bool = True, multi_label: bool = False):
    """Returns ``step(variables, opt_state, images, labels) ->
    (variables, opt_state, metrics)``.

    ``images`` are already-preprocessed [B, H, W, 3]; BN runs in training
    mode and its running stats flow through ``variables['state']``.
    ``train_backbone=False`` (linear probe) runs the forward in eval mode
    instead — BN uses the frozen running stats and the state is unchanged.
    ``multi_label=True`` (``multipla_escolha`` ambientes) takes ``labels``
    as multi-hot [B, C] float rows, trains with per-class sigmoid BCE, and
    reports exact-match accuracy.
    """

    def loss_fn(params, state, images, labels):
        logits, new_state = model.apply(
            {"params": params, "state": state},
            images.astype(compute_dtype),
            training=train_backbone,
        )
        if multi_label:
            loss = sigmoid_bce_loss(logits, labels)
        else:
            loss = cross_entropy_loss(logits, labels)
        return loss, (logits, new_state)

    def step(variables, opt_state, images, labels):
        params, state = variables["params"], variables["state"]
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if multi_label:
            acc = multilabel_exact_match(logits, labels)
        else:
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
            )
        return (
            {"params": params, "state": new_state},
            opt_state,
            {"loss": loss, "accuracy": acc},
        )

    return step


def make_preproc_train_step(model, optimizer, image_size: int = 224,
                            resize_short: int = 256,
                            compute_dtype=jnp.bfloat16,
                            train_backbone: bool = True,
                            multi_label: bool = False,
                            donate: bool = True):
    """Fused step: uint8 canvas -> on-device preproc -> fwd+bwd -> SGD.

    One compiled graph per batch shape; decode stays on host
    (``ics_tpu.train.data``).

    ``donate=False`` exists ONLY for A/B measurement
    (``scripts/bench_donation.py``); product callers keep the default.
    """
    from ics_tpu.ops.preproc import preprocess_batch

    base_step = make_train_step(model, optimizer, compute_dtype,
                                train_backbone, multi_label)

    # donate params + opt_state (SURVEY §7 step 8): the step's outputs are
    # shape-identical updates of its inputs, so XLA writes them in place —
    # without donation every step holds params AND new-params live
    # (ResNet-50 + Adam: ~300 MB of avoidable churn). Callers must not
    # reuse the trees they passed in (FineTuner.run reassigns; loud
    # "donated buffer" error otherwise, never silent corruption).
    def step(variables, opt_state, canvas_u8, sizes, labels):
        images = preprocess_batch(
            canvas_u8, sizes, out_size=image_size, resize_short=resize_short,
            dtype=compute_dtype,
        )
        return base_step(variables, opt_state, images, labels)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def _augmented_step_fn(model, optimizer, augment, image_size: int,
                       compute_dtype, train_backbone: bool = True,
                       multi_label: bool = False):
    """Raw (un-jitted) augmented train step shared by the single-chip and
    sharded builders below.

    ``multi_label=True`` takes ``labels`` as multi-hot [B, C] float rows:
    smoothing is the binary form (:func:`ops.augment.smooth_multilabel`),
    mixup blends the rows like any soft target, and the loss is per-class
    sigmoid BCE."""
    from ics_tpu.ops.augment import (
        augment_batch,
        mix_batch,
        smooth_labels,
        smooth_multilabel,
    )

    num_classes = model.num_classes

    def loss_fn(params, state, images, target_probs):
        logits, new_state = model.apply(
            {"params": params, "state": state},
            images.astype(compute_dtype),
            training=train_backbone,
        )
        if multi_label:
            loss = sigmoid_bce_loss(logits, target_probs)
        else:
            loss = soft_cross_entropy_loss(logits, target_probs)
        return loss, (logits, new_state)

    def step(variables, opt_state, canvas_u8, sizes, labels, key):
        k_aug, k_mix = jax.random.split(key)
        images = augment_batch(
            canvas_u8, sizes, k_aug, out_size=image_size, cfg=augment,
            dtype=compute_dtype,
        )
        if multi_label:
            targets = smooth_multilabel(labels, augment.label_smoothing)
        else:
            targets = smooth_labels(labels, num_classes,
                                    augment.label_smoothing)
        if augment.mixup_alpha > 0.0 or augment.cutmix_alpha > 0.0:
            images, targets = mix_batch(k_mix, images, targets, augment)
        params, state = variables["params"], variables["state"]
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, images, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if multi_label:
            acc = multilabel_exact_match(logits, labels)
        else:
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
            )
        return (
            {"params": params, "state": new_state},
            opt_state,
            {"loss": loss, "accuracy": acc},
        )

    return step


def make_augmented_train_step(model, optimizer, augment,
                              image_size: int = 224,
                              compute_dtype=jnp.bfloat16,
                              train_backbone: bool = True,
                              multi_label: bool = False,
                              donate: bool = True):
    """Fused AUGMENTED step: uint8 canvas -> on-device RandomResizedCrop/
    flip/jitter (inside the same resize matmuls, :mod:`ics_tpu.ops.augment`)
    -> optional mixup -> fwd+bwd -> SGD.

    Signature gains a PRNG ``key`` after ``labels``; ``resize_short`` does
    not apply (the crop box is sampled from the full true extent). Reported
    ``accuracy`` is against the ORIGINAL hard labels — with mixup the lambda
    is folded to >= 0.5, so each row's own label stays the argmax target.
    """
    # donate params + opt_state (see make_preproc_train_step note);
    # donate=False only for A/B measurement
    return jax.jit(
        _augmented_step_fn(model, optimizer, augment, image_size,
                           compute_dtype, train_backbone, multi_label),
        donate_argnums=(0, 1) if donate else (),
    )


def make_sharded_augmented_train_step(model, optimizer, mesh: Mesh, augment,
                                      image_size: int = 224,
                                      compute_dtype=jnp.bfloat16,
                                      train_backbone: bool = True,
                                      multi_label: bool = False):
    """Sharded twin of :func:`make_augmented_train_step`: canvas/sizes/labels
    shard over 'data', the PRNG key replicates (per-image keys fold in the
    GLOBAL batch index, so shards draw distinct crops); mixup's roll-by-one
    crosses the shard boundary as a single-row ppermute over ICI."""
    step = _augmented_step_fn(model, optimizer, augment, image_size,
                              compute_dtype, train_backbone, multi_label)
    return _sharded_builders(
        step, mesh,
        (batch_sharding(mesh, 4), batch_sharding(mesh, 2),
         # multi-hot [B, C] labels vs int [B] — batch dim shards either way
         batch_sharding(mesh, 2 if multi_label else 1),
         replicated_sharding(mesh)),
    )


class FineTuner:
    """End-to-end fine-tune driver (BASELINE config 5): synced dataset +
    human labels -> SGD loop -> orbax checkpoints."""

    def __init__(self, model, optimizer=None, image_size: int = 224,
                 resize_short: int = 256, compute_dtype=jnp.bfloat16,
                 checkpoint_dir: Optional[str] = None,
                 remat: Optional[bool] = None, mesh: Optional[Mesh] = None,
                 augment: Optional[Any] = None, seed: int = 0,
                 linear_probe: bool = False, multi_label: bool = False,
                 ema_decay: float = 0.0, grad_accum: int = 1,
                 llrd: float = 0.0):
        self.model = model
        # per-block rematerialization: backward recomputes block internals
        # instead of storing them — enables deeper models / larger batches
        # at ~1/3 extra forward FLOPs (jax.checkpoint; SURVEY design note).
        # None (default) leaves a caller-set model.remat untouched.
        if remat is not None:
            model.remat = bool(remat)
        self.optimizer = optimizer or make_optimizer()
        # layer-wise LR decay (llrd in (0,1); 0/1 disables): scales each
        # leaf's update by decay^(distance from the head) — composed right
        # after the base rule (post-Adam; see llrd_transform) and inside
        # probe/EMA/accum wrappers. NOTE: toggling changes the opt_state
        # tree — retomar_de cannot cross the LLRD boundary.
        self._llrd = float(llrd)
        if self._llrd and self._llrd != 1.0:
            self.optimizer = optax.chain(
                self.optimizer, llrd_transform(self._llrd)
            )
        # linear probe: head-only updates + eval-mode backbone (frozen BN
        # stats) — logistic regression on pretrained features, the right
        # recipe when the labeled set is tiny. NOTE: changes the opt_state
        # tree, so retomar_de cannot cross the probe/full boundary.
        self._linear_probe = bool(linear_probe)
        if linear_probe:
            self.optimizer = make_probe_optimizer(self.optimizer)
        # EMA of the post-update params, carried inside opt_state (see
        # ema_params_transform). Wrapped OUTSIDE the probe wrapper so the
        # shadow tree always covers the FULL params tree (frozen subtrees
        # stay fixed at their init values — decay-mixing equal values is a
        # no-op). NOTE: enabling/disabling EMA changes the opt_state tree,
        # so retomar_de cannot cross the EMA on/off boundary (same caveat
        # as the probe boundary above).
        self._ema_decay = float(ema_decay)
        if self._ema_decay:
            self.optimizer = optax.chain(
                self.optimizer, ema_params_transform(self._ema_decay)
            )
        # gradient accumulation wraps LAST (outside probe AND EMA): the
        # inner chain then runs only on apply steps, so schedule counters
        # advance per EFFECTIVE step and the EMA shadow moves at apply
        # cadence. NOTE: grad_accum > 1 changes the opt_state tree, so
        # retomar_de cannot cross an accumulation-factor change (same
        # caveat as the probe/EMA boundaries above).
        self._grad_accum = int(grad_accum)
        if self._grad_accum != 1:
            self.optimizer = make_grad_accum(self.optimizer,
                                             self._grad_accum)
        # multi-label (multipla_escolha): multi-hot [B, C] targets +
        # sigmoid BCE in every step variant; serving must mirror with
        # sigmoid scores (runtime/engine.py multi_label flag)
        self._multi_label = bool(multi_label)
        # mesh: shard the step over a device group (DP on batch; also pins
        # training OFF serving's chips — parallel/mesh.py
        # ::train_mesh_from_settings). Without one, plain jit.
        #
        # A mesh with an 'sp' axis is SEQUENCE parallelism instead (VERDICT
        # r3 next-step #8): the ViT trunk's attention rings the token dim
        # over the axis (parallel/ring_attention.py) while batch stays
        # replicated — the long-sequence configuration path. Pure-SP only:
        # DPxSP in one mesh would make the ring shard_map force a batch
        # all-gather across 'data' every block; compose DP via grad_accum.
        self._sp = False
        if mesh is not None and "sp" in getattr(mesh, "axis_names", ()):
            if set(mesh.axis_names) != {"sp"}:
                raise ValueError(
                    "mesh de treino com 'sp' deve ser puro-SP (eixos "
                    f"{mesh.axis_names}) — DPxSP não é suportado"
                )
            blocks = getattr(model, "blocks", None)
            if not blocks or not hasattr(blocks[0], "attn") \
                    or not hasattr(blocks[0].attn, "ring"):
                raise ValueError(
                    "sequence parallelism requer um tronco transformer "
                    "com atenção ring-capaz (família ViT)"
                )
            for blk in blocks:
                blk.attn.ring = (mesh, "sp")
            self._sp = True
            # the step itself runs plain jit (batch replicated); the ring
            # shard_map inside the blocks carries the mesh
            mesh = None
        self.mesh = mesh
        self._image_size = image_size
        self._resize_short = resize_short
        self._compute_dtype = compute_dtype
        # augment: an ops.augment.AugmentConfig enables the fused on-device
        # augmentation step (crop/flip inside the resize matmuls + optional
        # mixup/label smoothing); the step then takes a PRNG key derived
        # from ``seed`` and the ABSOLUTE step number, so resumed jobs draw
        # the same crop sequence they would have un-interrupted
        self._augment = augment
        self._base_key = jax.random.PRNGKey(seed)
        if mesh is None:
            if augment is not None:
                self.step_fn = make_augmented_train_step(
                    model, self.optimizer, augment, image_size, compute_dtype,
                    train_backbone=not self._linear_probe,
                    multi_label=self._multi_label,
                )
            else:
                self.step_fn = make_preproc_train_step(
                    model, self.optimizer, image_size, resize_short,
                    compute_dtype, train_backbone=not self._linear_probe,
                    multi_label=self._multi_label,
                )
        else:
            self.step_fn = None  # built in run() from the actual trees
        self.checkpoint = None
        if checkpoint_dir:
            from ics_tpu.train.checkpoint import CheckpointManager

            self.checkpoint = CheckpointManager(checkpoint_dir)

    def run(self, variables, batches, max_steps: Optional[int] = None,
            checkpoint_every: int = 100, start_step: int = 0,
            on_step: Optional[Any] = None,
            should_stop: Optional[Any] = None,
            eval_every: Optional[int] = None,
            eval_fn: Optional[Any] = None, patience: int = 0):
        """``eval_fn(variables, opt_state, step) -> (metric, eval_variables)``
        runs every ``eval_every`` steps (higher metric = better). The best
        eval's variables are snapshotted to host in ``self.best``; with
        ``patience > 0`` the loop stops after that many consecutive
        non-improving evals (``self.stopped_early``). ``eval_variables``
        lets the caller evaluate/snapshot a derived tree (e.g. the EMA
        shadow) instead of the raw params."""
        self.best: Optional[dict] = None
        self.stopped_early = False
        evals_since_best = 0
        opt_state = self.optimizer.init(variables["params"])
        if self.checkpoint is not None and self.checkpoint.latest_step() is not None:
            restored = self.checkpoint.restore(
                template={"variables": variables, "opt_state": opt_state,
                          "metadata": {"step": 0}}
            )
            variables = restored["variables"]
            opt_state = restored["opt_state"]
            start_step = int(restored.get("metadata", {}).get("step", 0))
        step_fn = self.step_fn
        if self.mesh is not None:
            if self._augment is not None:
                jit_step, shard_variables = make_sharded_augmented_train_step(
                    self.model, self.optimizer, self.mesh, self._augment,
                    self._image_size, self._compute_dtype,
                    train_backbone=not self._linear_probe,
                    multi_label=self._multi_label,
                )
            else:
                jit_step, shard_variables = make_sharded_preproc_train_step(
                    self.model, self.optimizer, self.mesh, self._image_size,
                    self._resize_short, self._compute_dtype,
                    train_backbone=not self._linear_probe,
                    multi_label=self._multi_label,
                )
            variables, opt_state, _ = shard_variables(variables, opt_state)
            step_fn = jit_step(variables, opt_state)
        history = []
        step_num = start_step
        for canvas, sizes, labels in batches:
            if self._augment is not None:
                key = jax.random.fold_in(self._base_key, step_num)
                variables, opt_state, metrics = step_fn(
                    variables, opt_state, canvas, sizes, labels, key
                )
            else:
                variables, opt_state, metrics = step_fn(
                    variables, opt_state, canvas, sizes, labels
                )
            step_num += 1
            record = {"step": step_num, "loss": float(metrics["loss"]),
                      "accuracy": float(metrics["accuracy"])}
            early_exhausted = False
            if (eval_fn is not None and eval_every
                    and step_num % eval_every == 0):
                metric, eval_vars = eval_fn(variables, opt_state, step_num)
                if metric is not None:
                    record["eval"] = float(metric)
                    if (self.best is None
                            or float(metric) > self.best["metric"]):
                        self.best = {
                            "metric": float(metric), "step": step_num,
                            # host snapshot with an EXPLICIT copy: on the
                            # CPU backend np.asarray can be a zero-copy
                            # VIEW of the device buffer, and the next
                            # step DONATES that buffer (XLA writes the
                            # new params into it in place) — a view would
                            # silently mutate or abort the runtime
                            "variables": jax.tree_util.tree_map(
                                lambda x: np.array(x), eval_vars
                            ),
                        }
                        evals_since_best = 0
                    else:
                        evals_since_best += 1
                        early_exhausted = (patience > 0
                                           and evals_since_best >= patience)
            history.append(record)
            if on_step is not None:
                on_step(record)
            if self.checkpoint is not None and step_num % checkpoint_every == 0:
                self.checkpoint.save(
                    step_num, variables, opt_state, {"step": step_num}
                )
            if early_exhausted:
                self.stopped_early = True
                break
            if max_steps is not None and step_num - start_step >= max_steps:
                break
            if should_stop is not None and should_stop():
                # cooperative cancellation between steps; the final
                # checkpoint below still runs, so the work is resumable
                break
        if self.checkpoint is not None and history:
            self.checkpoint.save(step_num, variables, opt_state, {"step": step_num})
        return variables, opt_state, history


def make_preproc_eval_step(model, image_size: int = 224,
                           resize_short: int = 256,
                           compute_dtype=jnp.bfloat16):
    """Fused eval step: uint8 canvas -> preproc -> forward (training=False)
    -> (n_correct, n) for accuracy over held-out labels."""
    from ics_tpu.ops.preproc import preprocess_batch

    @jax.jit
    def step(variables, canvas_u8, sizes, labels, valid):
        images = preprocess_batch(
            canvas_u8, sizes, out_size=image_size, resize_short=resize_short,
            dtype=compute_dtype,
        )
        logits, _ = model.apply(variables, images, training=False)
        correct = (jnp.argmax(logits, axis=-1) == labels) & valid
        return jnp.sum(correct.astype(jnp.int32)), jnp.sum(
            valid.astype(jnp.int32)
        )

    return step


def evaluate(model, variables, batches, image_size: int = 224,
             resize_short: int = 256, compute_dtype=jnp.bfloat16):
    """Accuracy over an eval iterator yielding (canvas, sizes, labels,
    n_real) — i.e. ``batch_iterator(..., with_counts=True)``. Padded rows
    (tail repeats AND fetch/decode failures) are masked per batch."""
    step = make_preproc_eval_step(model, image_size, resize_short,
                                  compute_dtype)
    correct = total = 0
    for canvas, sizes, labels, n_real in batches:
        valid = jnp.arange(labels.shape[0]) < n_real
        c, t = step(variables, canvas, sizes, labels, valid)
        correct += int(c)
        total += int(t)
    return (correct / total) if total else None, total


def make_multilabel_eval_step(model, image_size: int = 224,
                              resize_short: int = 256,
                              compute_dtype=jnp.bfloat16):
    """Multi-label eval step: batch -> sigmoid probabilities [B, C]
    (float32). Thresholding/aggregation happen on host so one forward
    pass serves both the fixed-0.5 metrics and threshold calibration."""
    from ics_tpu.ops.preproc import preprocess_batch

    @jax.jit
    def step(variables, canvas_u8, sizes):
        images = preprocess_batch(
            canvas_u8, sizes, out_size=image_size, resize_short=resize_short,
            dtype=compute_dtype,
        )
        logits, _ = model.apply(variables, images, training=False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return step


def collect_multilabel_scores(model, variables, batches,
                              image_size: int = 224,
                              resize_short: int = 256,
                              compute_dtype=jnp.bfloat16):
    """Run the eval iterator (yielding ``(canvas, sizes, multi_hot,
    n_real)``) once and return ``(probs [N, C], targets [N, C])`` float32
    numpy arrays over the valid (non-padded) rows — ``(None, None)`` when
    the iterator is empty."""
    step = make_multilabel_eval_step(model, image_size, resize_short,
                                     compute_dtype)
    probs_parts, target_parts = [], []
    for canvas, sizes, targets, n_real in batches:
        n = int(n_real)
        if n <= 0:
            continue
        p = np.asarray(step(variables, canvas, sizes))
        probs_parts.append(p[:n])
        target_parts.append(np.asarray(targets, np.float32)[:n])
    if not probs_parts:
        return None, None
    return np.concatenate(probs_parts), np.concatenate(target_parts)


def multilabel_metrics(probs, targets, threshold: float = 0.5) -> dict:
    """Micro-averaged multi-label metrics of ``probs >= threshold``
    against multi-hot ``targets`` (both [N, C] numpy)."""
    pred = np.asarray(probs) >= threshold
    true = np.asarray(targets) >= 0.5
    tp = int(np.sum(pred & true))
    fp = int(np.sum(pred & ~true))
    fn = int(np.sum(~pred & true))
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) else 0.0)
    return {
        "f1_micro": f1,
        "exact_match": float(np.mean(np.all(pred == true, axis=-1))),
        "precision": precision,
        "recall": recall,
    }


# calibration needs enough positive labels to generalize: below this the
# sweep just memorizes the eval split and 0.5 is the safer serving choice
MIN_POSITIVES_FOR_CALIBRATION = 8


def make_logits_eval_step(model, image_size: int = 224,
                          resize_short: int = 256,
                          compute_dtype=jnp.bfloat16):
    """Single-label eval step: batch -> raw logits [B, C] (float32).

    One forward pass serves accuracy AND temperature calibration — the
    softmax/argmax happen on host over the collected logits."""
    from ics_tpu.ops.preproc import preprocess_batch

    @jax.jit
    def step(variables, canvas_u8, sizes):
        images = preprocess_batch(
            canvas_u8, sizes, out_size=image_size, resize_short=resize_short,
            dtype=compute_dtype,
        )
        logits, _ = model.apply(variables, images, training=False)
        return logits.astype(jnp.float32)

    return step


def collect_logits(model, variables, batches, image_size: int = 224,
                   resize_short: int = 256, compute_dtype=jnp.bfloat16):
    """Run the eval iterator (yielding ``(canvas, sizes, labels, n_real)``)
    once and return ``(logits [N, C] float32, labels [N] int64)`` numpy
    arrays over the valid rows — ``(None, None)`` when empty."""
    step = make_logits_eval_step(model, image_size, resize_short,
                                 compute_dtype)
    logit_parts, label_parts = [], []
    for canvas, sizes, labels, n_real in batches:
        n = int(n_real)
        if n <= 0:
            continue
        z = np.asarray(step(variables, canvas, sizes))
        logit_parts.append(z[:n])
        label_parts.append(np.asarray(labels, np.int64)[:n])
    if not logit_parts:
        return None, None
    return np.concatenate(logit_parts), np.concatenate(label_parts)


def _log_softmax_np(logits):
    z = logits - logits.max(axis=-1, keepdims=True)
    return z - np.log(np.sum(np.exp(z), axis=-1, keepdims=True))


def nll_np(logits, labels, temperature: float = 1.0) -> float:
    """Mean negative log-likelihood of ``labels`` under
    ``softmax(logits / temperature)`` (numpy, numerically stable)."""
    logp = _log_softmax_np(np.asarray(logits, np.float64) / float(temperature))
    return float(-np.mean(logp[np.arange(len(labels)), labels]))


def per_class_metrics(logits, labels, num_classes: int) -> dict:
    """Confusion matrix + per-class precision/recall/F1/support from
    single-label eval logits (net-new diagnostics — the reference has no
    training tier; SURVEY.md §0). Rows of ``matriz_confusao`` are TRUE
    classes, columns are PREDICTED (sklearn orientation). ``por_classe``
    is ordered by class index so the caller can zip it with the inverse
    class_map. f1_macro averages over classes WITH eval support only —
    averaging in 0-support classes would punish datasets whose tiny eval
    split missed a class."""
    pred = np.asarray(logits).argmax(-1)
    true = np.asarray(labels)
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (true, pred), 1)
    tp = np.diag(cm).astype(np.float64)
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        precision = np.where(predicted > 0, tp / np.maximum(predicted, 1), 0.0)
        recall = np.where(support > 0, tp / np.maximum(support, 1), 0.0)
        denom = precision + recall
        f1 = np.where(denom > 0, 2 * precision * recall / np.maximum(denom, 1e-12), 0.0)
    seen = support > 0
    por_classe = [
        {"classe": i, "precisao": float(precision[i]),
         "revocacao": float(recall[i]), "f1": float(f1[i]),
         "suporte": int(support[i])}
        for i in range(num_classes)
    ]
    return {
        "matriz_confusao": cm.tolist(),
        "por_classe": por_classe,
        "f1_macro": float(f1[seen].mean()) if seen.any() else 0.0,
    }


def multilabel_per_class_metrics(probs, targets,
                                 threshold: float = 0.5) -> list[dict]:
    """Per-class precision/recall/F1/support for multi-label eval at the
    serving threshold (complements ``multilabel_metrics``' micro view —
    micro-F1 hides a class the model never predicts)."""
    pred = np.asarray(probs) >= threshold
    true = np.asarray(targets) >= 0.5
    tp = (pred & true).sum(axis=0).astype(np.float64)
    fp = (pred & ~true).sum(axis=0).astype(np.float64)
    fn = (~pred & true).sum(axis=0).astype(np.float64)
    out = []
    for i in range(pred.shape[1]):
        p = tp[i] / (tp[i] + fp[i]) if (tp[i] + fp[i]) else 0.0
        r = tp[i] / (tp[i] + fn[i]) if (tp[i] + fn[i]) else 0.0
        f1 = 2 * p * r / (p + r) if (p + r) else 0.0
        out.append({"classe": i, "precisao": float(p), "revocacao": float(r),
                    "f1": float(f1), "suporte": int(tp[i] + fn[i])})
    return out


def expected_calibration_error(probs, labels, bins: int = 10) -> float:
    """ECE: confidence-binned |accuracy - mean confidence| weighted by bin
    occupancy — the standard top-1 calibration metric (Guo et al. form)."""
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    conf = probs.max(axis=-1)
    correct = (probs.argmax(axis=-1) == labels).astype(np.float64)
    edges = np.linspace(0.0, 1.0, bins + 1)
    n = len(labels)
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        mask = (conf > lo) & (conf <= hi) if lo > 0 else (conf <= hi)
        k = int(mask.sum())
        if k == 0:
            continue
        ece += (k / n) * abs(correct[mask].mean() - conf[mask].mean())
    return float(ece)


def calibrate_temperature(
    logits, labels, min_examples: int = MIN_POSITIVES_FOR_CALIBRATION,
) -> tuple[float, dict]:
    """Fit the softmax temperature T minimizing eval-split NLL
    (Guo et al. temperature scaling — the single-parameter, accuracy-
    preserving calibration; argmax is invariant under T).

    NLL is convex in the inverse temperature s = 1/T (log-sum-exp of
    s-scaled logits), so a golden-section search over s converges to the
    global optimum. Returns ``(T, metrics)`` with before/after NLL + ECE;
    falls back to T=1 when the split is smaller than ``min_examples``
    (fitting a parameter to a handful of rows is memorization) or when the
    fit doesn't actually improve NLL."""
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels)
    nll_t1 = nll_np(logits, labels, 1.0)
    probs_t1 = np.exp(_log_softmax_np(logits))
    ece_t1 = expected_calibration_error(probs_t1, labels)
    metrics = {
        "nll_sem_calibracao": nll_t1,
        "ece_sem_calibracao": ece_t1,
        "nll": nll_t1,
        "ece": ece_t1,
        "exemplos": int(len(labels)),
    }
    if len(labels) < min_examples:
        return 1.0, metrics

    def f(s: float) -> float:  # NLL over inverse temperature
        return nll_np(logits, labels, 1.0 / s)

    lo, hi = 0.05, 20.0  # T in [0.05, 20]
    phi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - phi * (b - a), a + phi * (b - a)
    fc, fd = f(c), f(d)
    for _ in range(80):  # interval shrinks ~1e-9x: far below fp noise
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - phi * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + phi * (b - a)
            fd = f(d)
    s = (a + b) / 2.0
    temperature = 1.0 / s
    nll_t = nll_np(logits, labels, temperature)
    if nll_t >= nll_t1 - 1e-9:  # no real improvement: keep the identity
        return 1.0, metrics
    probs_t = np.exp(_log_softmax_np(logits / temperature))
    metrics["nll"] = nll_t
    metrics["ece"] = expected_calibration_error(probs_t, labels)
    return float(temperature), metrics


def fold_temperature(variables: dict, temperature) -> dict:
    """Fold a fitted softmax temperature into the classifier head:
    ``softmax(logits / T) == softmax((W/T) x + b/T)`` exactly, so calibrated
    serving costs zero extra FLOPs. No-op for T None/1. Returns a new
    variables tree (inputs untouched — orbax-restored arrays are shared)."""
    if not temperature or abs(float(temperature) - 1.0) < 1e-9:
        return variables
    inv = 1.0 / float(temperature)
    head = {
        k: (v * inv if k in ("w", "b") else v)
        for k, v in variables["params"]["head"].items()
    }
    params = dict(variables["params"])
    params["head"] = head
    out = dict(variables)
    out["params"] = params
    return out


def calibrate_multilabel_threshold(
    probs, targets, grid=None,
    min_positives: int = MIN_POSITIVES_FOR_CALIBRATION,
) -> tuple[float, dict]:
    """Pick the global decision threshold maximizing micro-F1 on the eval
    split (0.05..0.95 grid; ties break toward 0.5 for stability). Returns
    ``(threshold, metrics_at_threshold)``. Falls back to 0.5 when the
    split carries fewer than ``min_positives`` positive labels — a sweep
    over a handful of labels is memorization, not calibration."""
    probs = np.asarray(probs)
    targets = np.asarray(targets)
    if int(np.sum(targets >= 0.5)) < min_positives:
        return 0.5, multilabel_metrics(probs, targets, 0.5)
    if grid is None:
        grid = np.round(np.arange(0.05, 0.951, 0.05), 2)
    best_t, best_m = 0.5, multilabel_metrics(probs, targets, 0.5)
    for t in grid:
        m = multilabel_metrics(probs, targets, float(t))
        better = m["f1_micro"] > best_m["f1_micro"] + 1e-12
        tie = abs(m["f1_micro"] - best_m["f1_micro"]) <= 1e-12
        if better or (tie and abs(t - 0.5) < abs(best_t - 0.5)):
            best_t, best_m = float(t), m
    return best_t, best_m


def evaluate_multilabel(model, variables, batches, image_size: int = 224,
                        resize_short: int = 256,
                        compute_dtype=jnp.bfloat16):
    """Multi-label metrics at the 0.5 threshold over an eval iterator
    yielding (canvas, sizes, multi_hot_targets, n_real). Returns
    ``({"f1_micro", "exact_match", "precision", "recall"}, total)`` —
    ``(None, 0)`` when empty."""
    probs, targets = collect_multilabel_scores(
        model, variables, batches, image_size, resize_short, compute_dtype
    )
    if probs is None:
        return None, 0
    return multilabel_metrics(probs, targets, 0.5), probs.shape[0]


def _sharded_builders(step, mesh: Mesh, data_shardings: tuple):
    """Shared plumbing for sharded train steps: variables get head-TP +
    replication, optimizer state replicates, batch args shard over 'data'.

    Returns ``(jit_step, shard_variables)``; ``jit_step(variables,
    opt_state)`` derives shardings from the actual trees and returns the
    jitted step, ``shard_variables`` places initialized trees on the mesh.
    """
    rep = replicated_sharding(mesh)

    def _variable_shardings(variables):
        params_sh = shard_head_for_tp(mesh, variables["params"])
        state_sh = jax.tree_util.tree_map(lambda _: rep, variables["state"])
        return {"params": params_sh, "state": state_sh}

    def shard_variables(variables, opt_state):
        var_sh = _variable_shardings(variables)
        variables = jax.tree_util.tree_map(jax.device_put, variables, var_sh)
        # optimizer state replicates (momentum mirrors params in shape but
        # DP needs it identical on every device anyway; scalars included)
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), opt_state
        )
        return variables, opt_state, var_sh

    def jit_step(variables, opt_state):
        var_sh = _variable_shardings(variables)
        opt_sh = jax.tree_util.tree_map(lambda _: rep, opt_state)
        return jax.jit(
            step,
            in_shardings=(var_sh, opt_sh, *data_shardings),
            out_shardings=(var_sh, opt_sh, rep),
            # donate params + opt_state (see make_preproc_train_step note);
            # shardings of in/out match, so in-place reuse is layout-exact
            donate_argnums=(0, 1),
        )

    return jit_step, shard_variables


def make_sharded_train_step(model, optimizer, mesh: Mesh,
                            compute_dtype=jnp.bfloat16):
    """DP over 'data' (batch) + TP of the classifier head over 'model'.

    Returns ``(jitted_step, shard_variables)`` where ``shard_variables``
    places an initialized (variables, opt_state) onto the mesh.
    """
    step = make_train_step(model, optimizer, compute_dtype)
    return _sharded_builders(
        step, mesh, (batch_sharding(mesh, 4), batch_sharding(mesh, 1))
    )


def make_sharded_preproc_train_step(model, optimizer, mesh: Mesh,
                                    image_size: int = 224,
                                    resize_short: int = 256,
                                    compute_dtype=jnp.bfloat16,
                                    train_backbone: bool = True,
                                    multi_label: bool = False):
    """Sharded twin of ``make_preproc_train_step``: uint8 canvas batches
    shard over 'data', preproc + fwd+bwd + SGD run on the mesh. This is
    what background fine-tune jobs use when ``TPU_TRAIN_DEVICES`` pins
    training to a dedicated device group (serving isolation)."""
    from ics_tpu.ops.preproc import preprocess_batch

    base_step = make_train_step(model, optimizer, compute_dtype,
                                train_backbone, multi_label)

    def step(variables, opt_state, canvas_u8, sizes, labels):
        images = preprocess_batch(
            canvas_u8, sizes, out_size=image_size, resize_short=resize_short,
            dtype=compute_dtype,
        )
        return base_step(variables, opt_state, images, labels)

    return _sharded_builders(
        step, mesh,
        (batch_sharding(mesh, 4), batch_sharding(mesh, 2),
         batch_sharding(mesh, 2 if multi_label else 1)),
    )
