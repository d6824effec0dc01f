"""RegNet-Y (400MF / 1.6GF) — NAS-designed conv family (Radosavovic et
al., "Designing Network Design Spaces", arXiv:2003.13678; torchvision
``regnet_y_*`` layout and naming).

The reference performs no inference (labels are human-typed,
/root/reference/app/api/routes/classificacoes.py); the zoo exists for the
TPU tier's north star. RegNet rounds out the conv families with the
quantized-linear-width design: every stage starts at stride 2 (no
maxpool), blocks are SE-gated grouped bottlenecks with a FIXED group
width (8/24 channels per group).

TPU notes:
- Like ResNeXt, XLA lowers the grouped 3x3s as batched narrow dots —
  group width 8 is even narrower on the MXU than ResNeXt's 4-wide
  groups at 32 groups, so expect throughput well below resnet50 at
  equal FLOPs; the 1x1s and SE matmuls are dense MXU work.
- Conv->BN ordering throughout: the whole family folds to conv+FMA for
  inference (nn/blocks.py ConvBN), bf16 folded serving like the zoo.
"""

from __future__ import annotations

import jax

from ics_tpu.nn.blocks import ConvBN as _ConvBN
from ics_tpu.nn.blocks import SEBlock
from ics_tpu.nn.layers import Dense, global_avg_pool


class RegNetBlock:
    """torchvision ``ResBottleneckBlock`` (bottleneck_multiplier=1):
    1x1 -> grouped 3x3 (stride) -> SE (squeeze = round(0.25 * w_in)) ->
    1x1, residual with a projected shortcut on shape change."""

    def __init__(self, w_in: int, w_out: int, stride: int,
                 group_width: int, se_ratio: float = 0.25):
        w_b = w_out  # bottleneck_multiplier 1.0 for the whole Y family
        self.a = _ConvBN(w_in, w_b, 1)
        self.b = _ConvBN(w_b, w_b, 3, stride, groups=w_b // group_width,
                         padding=1)
        self.se = SEBlock(w_b, max(1, int(round(se_ratio * w_in))))
        self.c = _ConvBN(w_b, w_out, 1)
        self.proj = (
            _ConvBN(w_in, w_out, 1, stride)
            if (w_in != w_out or stride != 1) else None
        )

    def init(self, key):
        keys = jax.random.split(key, 5)
        p = {
            "a": self.a.init(keys[0]),
            "b": self.b.init(keys[1]),
            "se": self.se.init(keys[2]),
            "c": self.c.init(keys[3]),
        }
        if self.proj:
            p["proj"] = self.proj.init(keys[4])
        return p

    def init_state(self):
        s = {"a": self.a.init_state(), "b": self.b.init_state(),
             "c": self.c.init_state()}
        if self.proj:
            s["proj"] = self.proj.init_state()
        return s

    def apply(self, params, state, x, training):
        y, sa = self.a.apply(params["a"], state["a"], x, training)
        y = jax.nn.relu(y)
        y, sb = self.b.apply(params["b"], state["b"], y, training)
        y = jax.nn.relu(y)
        y = self.se.apply(params["se"], y)
        y, sc = self.c.apply(params["c"], state["c"], y, training)
        if self.proj:
            shortcut, sp = self.proj.apply(
                params["proj"], state["proj"], x, training
            )
        else:
            shortcut, sp = x, None
        out = jax.nn.relu(y + shortcut)
        new_state = {"a": sa, "b": sb, "c": sc}
        if sp is not None:
            new_state["proj"] = sp
        return out, new_state

    def fold(self, params, state):
        f = {
            "a": self.a.fold(params["a"], state["a"]),
            "b": self.b.fold(params["b"], state["b"]),
            "se": params["se"],
            "c": self.c.fold(params["c"], state["c"]),
        }
        if self.proj:
            f["proj"] = self.proj.fold(params["proj"], state["proj"])
        return f

    def apply_folded(self, folded, x):
        y = jax.nn.relu(self.a.apply_folded(folded["a"], x))
        y = jax.nn.relu(self.b.apply_folded(folded["b"], y))
        y = self.se.apply(folded["se"], y)
        y = self.c.apply_folded(folded["c"], y)
        shortcut = (
            self.proj.apply_folded(folded["proj"], x) if self.proj else x
        )
        return jax.nn.relu(y + shortcut)


class RegNet:
    """Param-tree conventions follow the zoo/LLRD: ``stem`` at depth 0,
    repeated units in ``stages`` (list of lists), ``head`` at full LR."""

    STEM_WIDTH = 32

    def __init__(self, depths, widths, group_width: int,
                 num_classes: int = 1000):
        self.stem = _ConvBN(3, self.STEM_WIDTH, 3, 2, padding=1)
        self.stages: list[list[RegNetBlock]] = []
        w_in = self.STEM_WIDTH
        for depth, w_out in zip(depths, widths):
            blocks = []
            for b in range(depth):
                # EVERY stage opens at stride 2 (the stem is only /2 and
                # there is no maxpool — torchvision AnyStage)
                blocks.append(RegNetBlock(
                    w_in, w_out, 2 if b == 0 else 1, group_width
                ))
                w_in = w_out
            self.stages.append(blocks)
        self.head = Dense(w_in, num_classes, init="kaiming")
        self.num_classes = num_classes
        self.out_ch = w_in

    def init(self, key):
        keys = iter(jax.random.split(
            key, 2 + sum(len(s) for s in self.stages)
        ))
        params = {
            "stem": self.stem.init(next(keys)),
            "stages": [[blk.init(next(keys)) for blk in st]
                       for st in self.stages],
            "head": None,
        }
        state = {
            "stem": self.stem.init_state(),
            "stages": [[blk.init_state() for blk in st]
                       for st in self.stages],
        }
        params["head"] = self.head.init(next(keys))
        return {"params": params, "state": state}

    def apply(self, variables, x, training: bool = False):
        params, state = variables["params"], variables["state"]
        y, stem_s = self.stem.apply(
            params["stem"], state["stem"], x, training
        )
        y = jax.nn.relu(y)
        new_stages = []
        for blocks, bp, bs in zip(
            self.stages, params["stages"], state["stages"]
        ):
            new_bs = []
            for blk, p, s in zip(blocks, bp, bs):
                if getattr(self, "remat", False):
                    y, ns = jax.checkpoint(
                        lambda p_, s_, y_, blk=blk: blk.apply(
                            p_, s_, y_, training
                        )
                    )(p, s, y)
                else:
                    y, ns = blk.apply(p, s, y, training)
                new_bs.append(ns)
            new_stages.append(new_bs)
        y = global_avg_pool(y)
        logits = self.head.apply(params["head"], y)
        return logits, {"stem": stem_s, "stages": new_stages}

    def fold(self, variables):
        params, state = variables["params"], variables["state"]
        return {
            "stem": self.stem.fold(params["stem"], state["stem"]),
            "stages": [
                [blk.fold(p, s) for blk, p, s in zip(blocks, bp, bs)]
                for blocks, bp, bs in zip(
                    self.stages, params["stages"], state["stages"]
                )
            ],
            "head": params["head"],
        }

    def apply_folded(self, folded, x):
        y = jax.nn.relu(self.stem.apply_folded(folded["stem"], x))
        for blocks, bf in zip(self.stages, folded["stages"]):
            for blk, f in zip(blocks, bf):
                y = blk.apply_folded(f, y)
        y = global_avg_pool(y)
        return self.head.apply(folded["head"], y)


def regnet_y_400mf(num_classes: int = 1000) -> RegNet:
    """torchvision-compatible (4,344,144 params exactly at 1000 classes)."""
    return RegNet((1, 3, 6, 6), (48, 104, 208, 440), 8, num_classes)


def regnet_y_1_6gf(num_classes: int = 1000) -> RegNet:
    """torchvision-compatible (11,202,430 params exactly at 1000 classes)."""
    return RegNet((2, 6, 17, 2), (48, 120, 336, 888), 24, num_classes)


def regnet_micro(num_classes: int = 1000) -> RegNet:
    """Two tiny stages — dev/CI model for the family's machinery (SE-gated
    grouped bottlenecks, stride-2 stage openings). Not a serving model."""
    return RegNet((1, 1), (16, 32), 8, num_classes)
