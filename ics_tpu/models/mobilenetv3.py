"""MobileNetV3-Small — BASELINE config 1 (single-image latency path).

Inverted residual (expand -> depthwise -> SE -> project) with hard-swish,
per the MobileNetV3 paper's Small table. NHWC; depthwise conv expressed via
``feature_group_count`` so XLA lowers it to the TPU's native depthwise path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ics_tpu.nn.blocks import ConvBN, SEBlock
from ics_tpu.nn.layers import Dense, global_avg_pool, hard_swish

# kernel, expansion, out_ch, use_se, activation, stride
SMALL_SPEC = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hs", 2),
    (5, 240, 40, True, "hs", 1),
    (5, 240, 40, True, "hs", 1),
    (5, 120, 48, True, "hs", 1),
    (5, 144, 48, True, "hs", 1),
    (5, 288, 96, True, "hs", 2),
    (5, 576, 96, True, "hs", 1),
    (5, 576, 96, True, "hs", 1),
]


def _act(kind: str):
    return hard_swish if kind == "hs" else jax.nn.relu


# torchvision pretrained-weight conventions (train/pretrained.py): BN eps
# 1e-3 (torchvision mobilenetv3 norm_layer), symmetric k//2 depthwise
# padding (not SAME — differs at stride 2), and SE squeeze width rounded
# to a multiple of 8 (the paper's/_make_divisible rule; plain exp//4 gives
# e.g. 60 instead of 64 for exp=240, which is checkpoint-incompatible)
_BN_EPS = 1e-3


def _divisible(v: int, divisor: int = 8) -> int:
    new = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new < 0.9 * v:
        new += divisor
    return new


class InvertedResidual:
    def __init__(self, in_ch, kernel, exp, out_ch, use_se, act, stride):
        self.expand = ConvBN(in_ch, exp, 1, eps=_BN_EPS) if exp != in_ch else None
        self.depthwise = ConvBN(exp, exp, kernel, stride, groups=exp,
                                padding=kernel // 2, eps=_BN_EPS)
        self.se = (
            SEBlock(exp, _divisible(exp // 4), gate="hard") if use_se else None
        )
        self.project = ConvBN(exp, out_ch, 1, eps=_BN_EPS)
        self.act = _act(act)
        self.use_residual = stride == 1 and in_ch == out_ch

    def init(self, key):
        keys = jax.random.split(key, 4)
        p = {
            "dw": self.depthwise.init(keys[1]),
            "proj": self.project.init(keys[2]),
        }
        if self.expand:
            p["exp"] = self.expand.init(keys[0])
        if self.se:
            p["se"] = self.se.init(keys[3])
        return p

    def init_state(self):
        s = {"dw": self.depthwise.init_state(), "proj": self.project.init_state()}
        if self.expand:
            s["exp"] = self.expand.init_state()
        return s

    def apply(self, params, state, x, training):
        new_state = {}
        y = x
        if self.expand:
            y, new_state["exp"] = self.expand.apply(
                params["exp"], state["exp"], y, training
            )
            y = self.act(y)
        y, new_state["dw"] = self.depthwise.apply(
            params["dw"], state["dw"], y, training
        )
        y = self.act(y)
        if self.se:
            y = self.se.apply(params["se"], y)
        y, new_state["proj"] = self.project.apply(
            params["proj"], state["proj"], y, training
        )
        if self.use_residual:
            y = y + x
        return y, new_state

    def fold(self, params, state):
        f = {
            "dw": self.depthwise.fold(params["dw"], state["dw"]),
            "proj": self.project.fold(params["proj"], state["proj"]),
        }
        if self.expand:
            f["exp"] = self.expand.fold(params["exp"], state["exp"])
        if self.se:
            f["se"] = params["se"]
        return f

    def apply_folded(self, folded, x):
        y = x
        if self.expand:
            y = self.act(self.expand.apply_folded(folded["exp"], y))
        y = self.act(self.depthwise.apply_folded(folded["dw"], y))
        if self.se:
            y = self.se.apply(folded["se"], y)
        y = self.project.apply_folded(folded["proj"], y)
        return y + x if self.use_residual else y


class MobileNetV3Small:
    def __init__(self, num_classes: int = 1000):
        self.stem = ConvBN(3, 16, 3, 2, padding=1, eps=_BN_EPS)
        self.blocks = []
        in_ch = 16
        for kernel, exp, out_ch, use_se, act, stride in SMALL_SPEC:
            self.blocks.append(
                InvertedResidual(in_ch, kernel, exp, out_ch, use_se, act, stride)
            )
            in_ch = out_ch
        self.conv_last = ConvBN(in_ch, 576, 1, eps=_BN_EPS)
        self.fc1 = Dense(576, 1024)
        self.head = Dense(1024, num_classes)
        self.num_classes = num_classes

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks) + 4)
        params = {
            "stem": self.stem.init(keys[0]),
            "blocks": [b.init(k) for b, k in zip(self.blocks, keys[1:-3])],
            "conv_last": self.conv_last.init(keys[-3]),
            "fc1": self.fc1.init(keys[-2]),
            "head": self.head.init(keys[-1]),
        }
        state = {
            "stem": self.stem.init_state(),
            "blocks": [b.init_state() for b in self.blocks],
            "conv_last": self.conv_last.init_state(),
        }
        return {"params": params, "state": state}

    def apply(self, variables, x, training: bool = False):
        params, state = variables["params"], variables["state"]
        y, stem_s = self.stem.apply(params["stem"], state["stem"], x, training)
        y = hard_swish(y)
        block_states = []
        for blk, bp, bs in zip(self.blocks, params["blocks"], state["blocks"]):
            y, ns = blk.apply(bp, bs, y, training)
            block_states.append(ns)
        y, last_s = self.conv_last.apply(
            params["conv_last"], state["conv_last"], y, training
        )
        y = hard_swish(y)
        y = global_avg_pool(y)
        y = hard_swish(self.fc1.apply(params["fc1"], y))
        logits = self.head.apply(params["head"], y)
        return logits, {"stem": stem_s, "blocks": block_states, "conv_last": last_s}

    def fold(self, variables):
        params, state = variables["params"], variables["state"]
        return {
            "stem": self.stem.fold(params["stem"], state["stem"]),
            "blocks": [
                b.fold(p, s)
                for b, p, s in zip(self.blocks, params["blocks"], state["blocks"])
            ],
            "conv_last": self.conv_last.fold(
                params["conv_last"], state["conv_last"]
            ),
            "fc1": params["fc1"],
            "head": params["head"],
        }

    def apply_folded(self, folded, x):
        y = hard_swish(self.stem.apply_folded(folded["stem"], x))
        for blk, f in zip(self.blocks, folded["blocks"]):
            y = blk.apply_folded(f, y)
        y = hard_swish(self.conv_last.apply_folded(folded["conv_last"], y))
        y = global_avg_pool(y)
        y = hard_swish(self.fc1.apply(folded["fc1"], y))
        return self.head.apply(folded["head"], y)


def mobilenetv3_small(num_classes: int = 1000) -> MobileNetV3Small:
    return MobileNetV3Small(num_classes)
