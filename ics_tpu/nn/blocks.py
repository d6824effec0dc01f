"""Shared composite blocks: Conv+BN (with inference folding) and
Squeeze-Excitation."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ics_tpu.nn.layers import (
    BatchNorm,
    Conv2D,
    Dense,
    fold_batchnorm,
    hard_sigmoid,
)


class ConvBN:
    def __init__(self, in_ch, out_ch, kernel, stride=1, groups=1,
                 padding="SAME", eps: float = 1e-5):
        self.conv = Conv2D(in_ch, out_ch, kernel, stride, padding=padding,
                           groups=groups)
        self.bn = BatchNorm(out_ch, eps=eps)

    def init(self, key):
        return {"conv": self.conv.init(key), "bn": self.bn.init()}

    def init_state(self):
        return {"bn": self.bn.init_state()}

    def apply(self, params, state, x, training):
        y = self.conv.apply(params["conv"], x)
        y, bn_state = self.bn.apply(params["bn"], state["bn"], y, training)
        return y, {"bn": bn_state}

    def fold(self, params, state):
        return {
            "conv": params["conv"],
            "bnf": fold_batchnorm(params["bn"], state["bn"], eps=self.bn.eps),
        }

    def apply_folded(self, folded, x):
        y = self.conv.apply(folded["conv"], x)
        f = folded["bnf"]
        return y * f["scale"].astype(y.dtype) + f["bias"].astype(y.dtype)


class SEBlock:
    """Squeeze-excitation with configurable gate (hard-sigmoid for MBv3,
    sigmoid for EfficientNet)."""

    def __init__(self, channels: int, reduced: int, gate: str = "sigmoid"):
        self.fc1 = Dense(channels, reduced)
        self.fc2 = Dense(reduced, channels)
        self.gate = gate

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"fc1": self.fc1.init(k1), "fc2": self.fc2.init(k2)}

    def apply(self, params, x):
        pooled = jnp.mean(x, axis=(1, 2))                  # [B, C]
        y = jax.nn.relu(self.fc1.apply(params["fc1"], pooled))
        y = self.fc2.apply(params["fc2"], y)
        y = hard_sigmoid(y) if self.gate == "hard" else jax.nn.sigmoid(y)
        return x * y[:, None, None, :].astype(x.dtype)
