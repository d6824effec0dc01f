"""EfficientNet-B4 — BASELINE config 4 (mixed-resolution stream).

Compound-scaled MBConv stack (width x1.4, depth x1.8, native res 380). The
serving path handles variable input sizes via padded bucketing in the
runtime (``ics_tpu.runtime.buckets``) — each resolution bucket gets its own
compiled graph; inputs are resized on-device to the nearest bucket.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ics_tpu.nn.blocks import ConvBN, SEBlock
from ics_tpu.nn.layers import Dense, global_avg_pool

# EfficientNet-B0 base: expand, out_ch, kernel, stride, repeats
BASE_SPEC = [
    (1, 16, 3, 1, 1),
    (6, 24, 3, 2, 2),
    (6, 40, 5, 2, 2),
    (6, 80, 3, 2, 3),
    (6, 112, 5, 1, 3),
    (6, 192, 5, 2, 4),
    (6, 320, 3, 1, 1),
]


def round_filters(filters: float, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class MBConv:
    def __init__(self, in_ch, out_ch, kernel, stride, expand,
                 bn_eps: float = 1e-5):
        mid = in_ch * expand
        self.expand = (ConvBN(in_ch, mid, 1, eps=bn_eps)
                       if expand != 1 else None)
        # symmetric k//2 padding (torch convention) — SAME differs at
        # stride 2, which would break imported torchvision checkpoints
        # (train/pretrained.py)
        self.depthwise = ConvBN(mid, mid, kernel, stride, groups=mid,
                                padding=kernel // 2, eps=bn_eps)
        self.se = SEBlock(mid, max(1, in_ch // 4), gate="sigmoid")
        self.project = ConvBN(mid, out_ch, 1, eps=bn_eps)
        self.use_residual = stride == 1 and in_ch == out_ch

    def init(self, key):
        keys = jax.random.split(key, 4)
        p = {
            "dw": self.depthwise.init(keys[1]),
            "se": self.se.init(keys[2]),
            "proj": self.project.init(keys[3]),
        }
        if self.expand:
            p["exp"] = self.expand.init(keys[0])
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
            y = jax.nn.silu(y)
        y, new_state["dw"] = self.depthwise.apply(
            params["dw"], state["dw"], y, training
        )
        y = jax.nn.silu(y)
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
            "se": params["se"],
            "proj": self.project.fold(params["proj"], state["proj"]),
        }
        if self.expand:
            f["exp"] = self.expand.fold(params["exp"], state["exp"])
        return f

    def apply_folded(self, folded, x):
        y = x
        if self.expand:
            y = jax.nn.silu(self.expand.apply_folded(folded["exp"], y))
        y = jax.nn.silu(self.depthwise.apply_folded(folded["dw"], y))
        y = self.se.apply(folded["se"], y)
        y = self.project.apply_folded(folded["proj"], y)
        return y + x if self.use_residual else y


class EfficientNet:
    def __init__(self, width_mult: float, depth_mult: float,
                 num_classes: int = 1000):
        self.width_mult = width_mult
        self.depth_mult = depth_mult  # train/pretrained.py stage mapping
        stem_ch = round_filters(32, width_mult)
        self.stem = ConvBN(3, stem_ch, 3, 2, padding=1)
        self.blocks: list[MBConv] = []
        in_ch = stem_ch
        for expand, out_base, kernel, stride, repeats in BASE_SPEC:
            out_ch = round_filters(out_base, width_mult)
            for r in range(round_repeats(repeats, depth_mult)):
                self.blocks.append(
                    MBConv(in_ch, out_ch, kernel, stride if r == 0 else 1, expand)
                )
                in_ch = out_ch
        head_ch = round_filters(1280, width_mult)
        self.conv_head = ConvBN(in_ch, head_ch, 1)
        self.head = Dense(head_ch, num_classes)
        self.num_classes = num_classes

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks) + 3)
        params = {
            "stem": self.stem.init(keys[0]),
            "blocks": [b.init(k) for b, k in zip(self.blocks, keys[1:-2])],
            "conv_head": self.conv_head.init(keys[-2]),
            "head": self.head.init(keys[-1]),
        }
        state = {
            "stem": self.stem.init_state(),
            "blocks": [b.init_state() for b in self.blocks],
            "conv_head": self.conv_head.init_state(),
        }
        return {"params": params, "state": state}

    def apply(self, variables, x, training: bool = False):
        params, state = variables["params"], variables["state"]
        y, stem_s = self.stem.apply(params["stem"], state["stem"], x, training)
        y = jax.nn.silu(y)
        block_states = []
        for blk, bp, bs in zip(self.blocks, params["blocks"], state["blocks"]):
            y, ns = blk.apply(bp, bs, y, training)
            block_states.append(ns)
        y, head_s = self.conv_head.apply(
            params["conv_head"], state["conv_head"], y, training
        )
        y = jax.nn.silu(y)
        y = global_avg_pool(y)
        logits = self.head.apply(params["head"], y)
        return logits, {"stem": stem_s, "blocks": block_states, "conv_head": head_s}

    def fold(self, variables):
        params, state = variables["params"], variables["state"]
        return {
            "stem": self.stem.fold(params["stem"], state["stem"]),
            "blocks": [
                b.fold(p, s)
                for b, p, s in zip(self.blocks, params["blocks"], state["blocks"])
            ],
            "conv_head": self.conv_head.fold(
                params["conv_head"], state["conv_head"]
            ),
            "head": params["head"],
        }

    def apply_folded(self, folded, x):
        y = jax.nn.silu(self.stem.apply_folded(folded["stem"], x))
        for blk, f in zip(self.blocks, folded["blocks"]):
            y = blk.apply_folded(f, y)
        y = jax.nn.silu(self.conv_head.apply_folded(folded["conv_head"], y))
        y = global_avg_pool(y)
        return self.head.apply(folded["head"], y)


def efficientnet_b4(num_classes: int = 1000) -> EfficientNet:
    return EfficientNet(width_mult=1.4, depth_mult=1.8, num_classes=num_classes)


def efficientnet_b0(num_classes: int = 1000) -> EfficientNet:
    return EfficientNet(width_mult=1.0, depth_mult=1.0, num_classes=num_classes)


# --------------------------------------------------------------------------
# EfficientNetV2 (Tan & Le 2021): fused-MBConv early stages — the k3
# full conv replaces expand-1x1 + depthwise-k3, trading parameters for
# MXU-friendly dense convs exactly where depthwise is most bandwidth-bound
# (large spatial extents). torchvision ``efficientnet_v2_s`` layout.
# --------------------------------------------------------------------------

# block kind, expand, out_ch, kernel, stride, repeats (v2-S)
V2_S_SPEC = [
    ("fused", 1, 24, 3, 1, 2),
    ("fused", 4, 48, 3, 2, 4),
    ("fused", 4, 64, 3, 2, 4),
    ("mb", 4, 128, 3, 2, 6),
    ("mb", 6, 160, 3, 1, 9),
    ("mb", 6, 256, 3, 2, 15),
]

# torchvision efficientnet_v2_m (same stage grammar, one extra stage)
V2_M_SPEC = [
    ("fused", 1, 24, 3, 1, 3),
    ("fused", 4, 48, 3, 2, 5),
    ("fused", 4, 80, 3, 2, 5),
    ("mb", 4, 160, 3, 2, 7),
    ("mb", 6, 176, 3, 1, 14),
    ("mb", 6, 304, 3, 2, 18),
    ("mb", 6, 512, 3, 1, 5),
]


class FusedMBConv:
    """Fused MBConv: k3 dense conv does expand+spatial in one MXU op.

    torchvision naming: ``block.0`` = (conv, bn, silu); with expansion a
    ``block.1`` = (1x1 project conv, bn, NO activation) follows."""

    def __init__(self, in_ch, out_ch, kernel, stride, expand,
                 bn_eps: float = 1e-5):
        mid = in_ch * expand
        if expand != 1:
            self.expand = ConvBN(in_ch, mid, kernel, stride,
                                 padding=kernel // 2, eps=bn_eps)
            self.project = ConvBN(mid, out_ch, 1, eps=bn_eps)
        else:
            self.expand = None
            self.project = ConvBN(in_ch, out_ch, kernel, stride,
                                  padding=kernel // 2, eps=bn_eps)
        self._act_on_project = expand == 1
        self.use_residual = stride == 1 and in_ch == out_ch

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"proj": self.project.init(k2)}
        if self.expand:
            p["exp"] = self.expand.init(k1)
        return p

    def init_state(self):
        s = {"proj": self.project.init_state()}
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
            y = jax.nn.silu(y)
        y, new_state["proj"] = self.project.apply(
            params["proj"], state["proj"], y, training
        )
        if self._act_on_project:
            y = jax.nn.silu(y)
        if self.use_residual:
            y = y + x
        return y, new_state

    def fold(self, params, state):
        f = {"proj": self.project.fold(params["proj"], state["proj"])}
        if self.expand:
            f["exp"] = self.expand.fold(params["exp"], state["exp"])
        return f

    def apply_folded(self, folded, x):
        y = x
        if self.expand:
            y = jax.nn.silu(self.expand.apply_folded(folded["exp"], y))
        y = self.project.apply_folded(folded["proj"], y)
        if self._act_on_project:
            y = jax.nn.silu(y)
        return y + x if self.use_residual else y


# torchvision builds every V2 variant with norm_layer=BatchNorm2d(eps=1e-3)
# (the V1 family keeps the 1e-5 default) — folding imported V2 checkpoints
# with the wrong eps mis-scales any channel whose running_var is near eps
# (same convention note as mobilenetv3._BN_EPS; review r5)
_V2_BN_EPS = 1e-3


class EfficientNetV2:
    def __init__(self, spec=None, stem_ch: int = 24, head_ch: int = 1280,
                 num_classes: int = 1000):
        self.spec = spec or V2_S_SPEC
        self.stem = ConvBN(3, stem_ch, 3, 2, padding=1, eps=_V2_BN_EPS)
        self.blocks: list = []
        in_ch = stem_ch
        for kind, expand, out_ch, kernel, stride, repeats in self.spec:
            for r in range(repeats):
                s = stride if r == 0 else 1
                if kind == "fused":
                    blk = FusedMBConv(in_ch, out_ch, kernel, s, expand,
                                      bn_eps=_V2_BN_EPS)
                else:
                    blk = MBConv(in_ch, out_ch, kernel, s, expand,
                                 bn_eps=_V2_BN_EPS)
                self.blocks.append(blk)
                in_ch = out_ch
        self.conv_head = ConvBN(in_ch, head_ch, 1, eps=_V2_BN_EPS)
        self.head = Dense(head_ch, num_classes)
        self.num_classes = num_classes

    # init/apply/fold are structurally identical to EfficientNet's
    init = EfficientNet.init
    apply = EfficientNet.apply
    fold = EfficientNet.fold
    apply_folded = EfficientNet.apply_folded


def efficientnet_v2_s(num_classes: int = 1000) -> EfficientNetV2:
    """EfficientNetV2-S (21.5M params; torchvision-weight-compatible)."""
    return EfficientNetV2(num_classes=num_classes)


def efficientnet_v2_m(num_classes: int = 1000) -> EfficientNetV2:
    """EfficientNetV2-M (54,139,356 params exactly at 1000 classes;
    torchvision-weight-compatible — same stage grammar as V2-S with one
    extra stride-1 MBConv stage)."""
    return EfficientNetV2(spec=V2_M_SPEC, num_classes=num_classes)
