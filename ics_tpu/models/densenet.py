"""DenseNet (121/169) — densely-connected conv family (Huang et al.,
arXiv:1608.06993; torchvision ``densenet*`` layout and naming).

The reference performs no inference (labels are human-typed,
/root/reference/app/api/routes/classificacoes.py); the zoo exists for the
TPU tier's north star. DenseNet rounds out the zoo with the concat-reuse
architecture: every layer consumes ALL previous feature maps of its block.

TPU notes:
- DenseNet is PRE-activation (BN -> ReLU -> conv): the BN cannot fold
  INTO the following conv across the ReLU, so ``fold`` turns each BN into
  a precomputed (scale, bias) pair — one fused multiply-add XLA melts
  into the neighboring conv/concat (``fold_batchnorm``); inference still
  runs the folded path in bf16 like the rest of the zoo (CLAUDE.md).
- The 1x1 bottleneck convs ([B·H·W, C_in] x [C_in, 128]) are MXU GEMMs
  and carry most FLOPs; the 3x3s emit only growth_rate=32 channels —
  narrow on the MXU, so expect throughput below resnet50 at equal FLOPs.
- Concats grow channels +32 per layer; XLA keeps them as HBM layout ops.
  The per-layer input is re-materialized from one running tensor instead
  of a list-of-tensors concat pyramid (same math, simpler aliasing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ics_tpu.nn.blocks import ConvBN as _ConvBN
from ics_tpu.nn.layers import (
    BatchNorm,
    Conv2D,
    Dense,
    avg_pool,
    fold_batchnorm,
    global_avg_pool,
    max_pool,
)


class DenseLayer:
    """torchvision ``_DenseLayer``: BN -> ReLU -> 1x1 (bn_size*k) -> BN ->
    ReLU -> 3x3 (k); output is CONCATENATED onto the running features."""

    def __init__(self, in_ch: int, growth: int = 32, bn_size: int = 4):
        inner = bn_size * growth
        self.bn1 = BatchNorm(in_ch)
        self.conv1 = Conv2D(in_ch, inner, 1, 1, padding="VALID")
        self.bn2 = BatchNorm(inner)
        self.conv2 = Conv2D(inner, growth, 3, 1, padding=1)
        self.growth = growth

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "bn1": self.bn1.init(), "conv1": self.conv1.init(k1),
            "bn2": self.bn2.init(), "conv2": self.conv2.init(k2),
        }

    def init_state(self):
        return {"bn1": self.bn1.init_state(), "bn2": self.bn2.init_state()}

    def apply(self, params, state, x, training):
        y, s1 = self.bn1.apply(params["bn1"], state["bn1"], x, training)
        y = self.conv1.apply(params["conv1"], jax.nn.relu(y))
        y, s2 = self.bn2.apply(params["bn2"], state["bn2"], y, training)
        y = self.conv2.apply(params["conv2"], jax.nn.relu(y))
        return jnp.concatenate([x, y], axis=-1), {"bn1": s1, "bn2": s2}

    def fold(self, params, state):
        return {
            "bn1": fold_batchnorm(params["bn1"], state["bn1"]),
            "conv1": params["conv1"],
            "bn2": fold_batchnorm(params["bn2"], state["bn2"]),
            "conv2": params["conv2"],
        }

    @staticmethod
    def _fma(x, f):
        return x * f["scale"].astype(x.dtype) + f["bias"].astype(x.dtype)

    def apply_folded(self, folded, x):
        y = jax.nn.relu(self._fma(x, folded["bn1"]))
        y = self.conv1.apply(folded["conv1"], y)
        y = jax.nn.relu(self._fma(y, folded["bn2"]))
        y = self.conv2.apply(folded["conv2"], y)
        return jnp.concatenate([x, y], axis=-1)


class Transition:
    """torchvision ``_Transition``: BN -> ReLU -> 1x1 (halve channels) ->
    2x2 average pool."""

    def __init__(self, in_ch: int, out_ch: int):
        self.bn = BatchNorm(in_ch)
        self.conv = Conv2D(in_ch, out_ch, 1, 1, padding="VALID")

    def init(self, key):
        return {"bn": self.bn.init(), "conv": self.conv.init(key)}

    def init_state(self):
        return {"bn": self.bn.init_state()}

    def apply(self, params, state, x, training):
        y, s = self.bn.apply(params["bn"], state["bn"], x, training)
        y = self.conv.apply(params["conv"], jax.nn.relu(y))
        return avg_pool(y, 2, 2), {"bn": s}

    def fold(self, params, state):
        return {"bn": fold_batchnorm(params["bn"], state["bn"]),
                "conv": params["conv"]}

    def apply_folded(self, folded, x):
        y = jax.nn.relu(DenseLayer._fma(x, folded["bn"]))
        y = self.conv.apply(folded["conv"], y)
        return avg_pool(y, 2, 2)


class DenseNet:
    """Param-tree conventions follow the zoo (and LLRD's depth map —
    train/finetune.py::llrd_multipliers): repeated units in ``stages``
    (list of lists), stage-boundary transitions in ``down``, the stem at
    depth 0, ``final_bn``/``head`` at full LR."""

    def __init__(self, block_config=(6, 12, 24, 16), growth: int = 32,
                 init_features: int = 64, num_classes: int = 1000):
        self.block_config = block_config
        # stem reuses ConvBN (conv THEN bn — foldable into the conv)
        self.stem = _ConvBN(3, init_features, 7, 2, padding=3)
        self.stages: list[list[DenseLayer]] = []
        self.down: list[Transition] = []
        ch = init_features
        for i, count in enumerate(block_config):
            layers = []
            for _ in range(count):
                layers.append(DenseLayer(ch, growth))
                ch += growth
            self.stages.append(layers)
            if i < len(block_config) - 1:
                self.down.append(Transition(ch, ch // 2))
                ch //= 2
        self.final_bn = BatchNorm(ch)
        self.head = Dense(ch, num_classes, init="kaiming")
        self.num_classes = num_classes
        self.out_ch = ch

    def init(self, key):
        n = 1 + sum(self.block_config) + len(self.down) + 1
        keys = iter(jax.random.split(key, n))
        params = {
            "stem": self.stem.init(next(keys)),
            "stages": [[l.init(next(keys)) for l in st]
                       for st in self.stages],
            "down": [t.init(next(keys)) for t in self.down],
            "final_bn": self.final_bn.init(),
            "head": self.head.init(next(keys)),
        }
        state = {
            "stem": self.stem.init_state(),
            "stages": [[l.init_state() for l in st] for st in self.stages],
            "down": [t.init_state() for t in self.down],
            "final_bn": self.final_bn.init_state(),
        }
        return {"params": params, "state": state}

    def apply(self, variables, x, training: bool = False):
        params, state = variables["params"], variables["state"]
        y, stem_s = self.stem.apply(
            params["stem"], state["stem"], x, training
        )
        y = jax.nn.relu(y)
        y = max_pool(y, 3, 2, 1)
        new_stages, new_down = [], []
        for i, layers in enumerate(self.stages):
            new_ls = []
            for layer, p, s in zip(
                layers, params["stages"][i], state["stages"][i]
            ):
                if getattr(self, "remat", False):
                    y, ns = jax.checkpoint(
                        lambda p_, s_, y_, l=layer: l.apply(
                            p_, s_, y_, training
                        )
                    )(p, s, y)
                else:
                    y, ns = layer.apply(p, s, y, training)
                new_ls.append(ns)
            new_stages.append(new_ls)
            if i < len(self.down):
                y, ds = self.down[i].apply(
                    params["down"][i], state["down"][i], y, training
                )
                new_down.append(ds)
        y, fbn_s = self.final_bn.apply(
            params["final_bn"], state["final_bn"], y, training
        )
        y = global_avg_pool(jax.nn.relu(y))
        logits = self.head.apply(params["head"], y)
        return logits, {"stem": stem_s, "stages": new_stages,
                        "down": new_down, "final_bn": fbn_s}

    def fold(self, variables):
        params, state = variables["params"], variables["state"]
        return {
            "stem": self.stem.fold(params["stem"], state["stem"]),
            "stages": [
                [l.fold(p, s) for l, p, s in zip(layers, ps, ss)]
                for layers, ps, ss in zip(
                    self.stages, params["stages"], state["stages"]
                )
            ],
            "down": [
                t.fold(p, s) for t, p, s in zip(
                    self.down, params["down"], state["down"]
                )
            ],
            "final_bn": fold_batchnorm(
                params["final_bn"], state["final_bn"]
            ),
            "head": params["head"],
        }

    def apply_folded(self, folded, x):
        y = jax.nn.relu(self.stem.apply_folded(folded["stem"], x))
        y = max_pool(y, 3, 2, 1)
        for i, layers in enumerate(self.stages):
            for layer, f in zip(layers, folded["stages"][i]):
                y = layer.apply_folded(f, y)
            if i < len(self.down):
                y = self.down[i].apply_folded(folded["down"][i], y)
        y = jax.nn.relu(DenseLayer._fma(y, folded["final_bn"]))
        y = global_avg_pool(y)
        return self.head.apply(folded["head"], y)


def densenet121(num_classes: int = 1000) -> DenseNet:
    """torchvision-compatible (7,978,856 params exactly at 1000 classes)."""
    return DenseNet((6, 12, 24, 16), num_classes=num_classes)


def densenet169(num_classes: int = 1000) -> DenseNet:
    """torchvision-compatible (14,149,480 params exactly at 1000 classes)."""
    return DenseNet((6, 12, 32, 32), num_classes=num_classes)


def densenet_micro(num_classes: int = 1000) -> DenseNet:
    """Two tiny blocks — dev/CI model for exercising the family (pre-act
    BN folding, concat growth, transitions) cheaply on CPU. Not a zoo
    model for serving."""
    return DenseNet((2, 2), growth=8, init_features=16,
                    num_classes=num_classes)
