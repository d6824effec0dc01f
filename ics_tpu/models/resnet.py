"""ResNet v1.5 (50/101/152) — pure-JAX, NHWC, bf16-ready.

The flagship inference model (BASELINE.json config 2: batched inference,
fused preproc + conv forward, target >=5k img/s/chip on v5e).

TPU notes:
- NHWC + HWIO so XLA lowers convs straight onto the MXU.
- BN folded to scale+bias for inference (``make_inference_fn``): each
  residual branch becomes conv -> fused multiply-add -> relu, which XLA
  fuses into the conv epilogue (HBM-bandwidth bound otherwise).
- stride-2 in the 3x3 (v1.5) — better accuracy, same FLOPs as v1.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.nn.blocks import ConvBN as _ConvBN
from ics_tpu.nn.layers import Dense, global_avg_pool, max_pool


class Bottleneck:
    expansion = 4

    def __init__(self, in_ch, width, stride=1, groups=1, base_width=64):
        out_ch = width * self.expansion
        # torchvision convention: the 1x1/3x3 inner width scales with
        # base_width and groups — ResNeXt-50 32x4d (groups=32, base 4) and
        # Wide-ResNet-50-2 (base 128) reuse this block unchanged
        # (torchvision models/resnet.py Bottleneck).
        inner = int(width * (base_width / 64.0)) * groups
        self.cbr1 = _ConvBN(in_ch, inner, 1)
        # v1.5: stride on the 3x3. Explicit symmetric padding (=k//2, the
        # torch convention) instead of SAME: at stride 2 XLA's SAME pads
        # (1,2) while torch-trained checkpoints (torchvision resnet50
        # layer*.0.conv2) assume (1,1) — same output shape, different
        # alignment. Explicit padding keeps imported pretrained weights
        # numerically faithful (train/pretrained.py).
        self.cbr2 = _ConvBN(inner, inner, 3, stride, padding=1, groups=groups)
        self.cbr3 = _ConvBN(inner, out_ch, 1)
        self.downsample = (
            _ConvBN(in_ch, out_ch, 1, stride)
            if stride != 1 or in_ch != out_ch
            else None
        )
        self.out_ch = out_ch

    def init(self, key):
        keys = jax.random.split(key, 4)
        p = {
            "cbr1": self.cbr1.init(keys[0]),
            "cbr2": self.cbr2.init(keys[1]),
            "cbr3": self.cbr3.init(keys[2]),
        }
        if self.downsample:
            p["down"] = self.downsample.init(keys[3])
        return p

    def init_state(self):
        s = {
            "cbr1": self.cbr1.init_state(),
            "cbr2": self.cbr2.init_state(),
            "cbr3": self.cbr3.init_state(),
        }
        if self.downsample:
            s["down"] = self.downsample.init_state()
        return s

    def apply(self, params, state, x, training):
        y, s1 = self.cbr1.apply(params["cbr1"], state["cbr1"], x, training)
        y = jax.nn.relu(y)
        y, s2 = self.cbr2.apply(params["cbr2"], state["cbr2"], y, training)
        y = jax.nn.relu(y)
        y, s3 = self.cbr3.apply(params["cbr3"], state["cbr3"], y, training)
        if self.downsample:
            shortcut, sd = self.downsample.apply(
                params["down"], state["down"], x, training
            )
        else:
            shortcut, sd = x, None
        out = jax.nn.relu(y + shortcut)
        new_state = {"cbr1": s1, "cbr2": s2, "cbr3": s3}
        if sd is not None:
            new_state["down"] = sd
        return out, new_state

    def fold(self, params, state):
        f = {
            "cbr1": self.cbr1.fold(params["cbr1"], state["cbr1"]),
            "cbr2": self.cbr2.fold(params["cbr2"], state["cbr2"]),
            "cbr3": self.cbr3.fold(params["cbr3"], state["cbr3"]),
        }
        if self.downsample:
            f["down"] = self.downsample.fold(params["down"], state["down"])
        return f

    def apply_folded(self, folded, x):
        y = jax.nn.relu(self.cbr1.apply_folded(folded["cbr1"], x))
        y = jax.nn.relu(self.cbr2.apply_folded(folded["cbr2"], y))
        y = self.cbr3.apply_folded(folded["cbr3"], y)
        shortcut = (
            self.downsample.apply_folded(folded["down"], x) if self.downsample else x
        )
        return jax.nn.relu(y + shortcut)


class BasicBlock:
    """Two-3x3 residual block (ResNet-18/34; torchvision BasicBlock).

    Same padding/stride conventions as :class:`Bottleneck` (symmetric k//2
    — pretrained-import fidelity); stride sits on the FIRST 3x3, matching
    ``torchvision/models/resnet.py`` (v1.5 only moves the stride within
    bottlenecks — basic blocks have no 1x1 to move it from)."""

    expansion = 1

    def __init__(self, in_ch, width, stride=1):
        self.cbr1 = _ConvBN(in_ch, width, 3, stride, padding=1)
        self.cbr2 = _ConvBN(width, width, 3, padding=1)
        self.downsample = (
            _ConvBN(in_ch, width, 1, stride)
            if stride != 1 or in_ch != width
            else None
        )
        self.out_ch = width

    def init(self, key):
        keys = jax.random.split(key, 3)
        p = {"cbr1": self.cbr1.init(keys[0]), "cbr2": self.cbr2.init(keys[1])}
        if self.downsample:
            p["down"] = self.downsample.init(keys[2])
        return p

    def init_state(self):
        s = {"cbr1": self.cbr1.init_state(), "cbr2": self.cbr2.init_state()}
        if self.downsample:
            s["down"] = self.downsample.init_state()
        return s

    def apply(self, params, state, x, training):
        y, s1 = self.cbr1.apply(params["cbr1"], state["cbr1"], x, training)
        y = jax.nn.relu(y)
        y, s2 = self.cbr2.apply(params["cbr2"], state["cbr2"], y, training)
        if self.downsample:
            shortcut, sd = self.downsample.apply(
                params["down"], state["down"], x, training
            )
        else:
            shortcut, sd = x, None
        out = jax.nn.relu(y + shortcut)
        new_state = {"cbr1": s1, "cbr2": s2}
        if sd is not None:
            new_state["down"] = sd
        return out, new_state

    def fold(self, params, state):
        f = {
            "cbr1": self.cbr1.fold(params["cbr1"], state["cbr1"]),
            "cbr2": self.cbr2.fold(params["cbr2"], state["cbr2"]),
        }
        if self.downsample:
            f["down"] = self.downsample.fold(params["down"], state["down"])
        return f

    def apply_folded(self, folded, x):
        y = jax.nn.relu(self.cbr1.apply_folded(folded["cbr1"], x))
        y = self.cbr2.apply_folded(folded["cbr2"], y)
        shortcut = (
            self.downsample.apply_folded(folded["down"], x)
            if self.downsample else x
        )
        return jax.nn.relu(y + shortcut)


class ResNet:
    def __init__(self, block_counts=(3, 4, 6, 3), num_classes=1000, in_ch=3,
                 use_s2d_stem: bool = False, block_cls=Bottleneck,
                 groups: int = 1, base_width: int = 64):
        self.use_s2d_stem = use_s2d_stem
        self.block_cls = block_cls
        self.groups = groups
        self.base_width = base_width
        if block_cls is BasicBlock and (groups != 1 or base_width != 64):
            raise ValueError(
                "basic blocks only support groups=1, base_width=64 "
                "(torchvision convention)"
            )
        # padding=3 (torch convention) not SAME — see Bottleneck.cbr2 note
        self.stem = _ConvBN(in_ch, 64, 7, 2, padding=3)
        self.stages: list[list] = []
        ch = 64
        for stage_idx, count in enumerate(block_counts):
            width = 64 * (2**stage_idx)
            stride = 1 if stage_idx == 0 else 2
            blocks = []
            for b in range(count):
                if block_cls is Bottleneck:
                    blocks.append(block_cls(
                        ch, width, stride if b == 0 else 1,
                        groups=groups, base_width=base_width,
                    ))
                else:
                    blocks.append(
                        block_cls(ch, width, stride if b == 0 else 1)
                    )
                ch = width * block_cls.expansion
            self.stages.append(blocks)
        self.head = Dense(ch, num_classes, init="kaiming")
        self.num_classes = num_classes

    # -- parameters -----------------------------------------------------
    def init(self, key) -> dict[str, Any]:
        keys = iter(jax.random.split(key, 2 + sum(len(s) for s in self.stages)))
        params = {"stem": self.stem.init(next(keys)), "stages": [], "head": None}
        state = {"stem": self.stem.init_state(), "stages": []}
        for blocks in self.stages:
            params["stages"].append([blk.init(next(keys)) for blk in blocks])
            state["stages"].append([blk.init_state() for blk in blocks])
        params["head"] = self.head.init(next(keys))
        return {"params": params, "state": state}

    # -- forward ----------------------------------------------------------
    def apply(self, variables, x, training: bool = False):
        params, state = variables["params"], variables["state"]
        y, stem_state = self.stem.apply(params["stem"], state["stem"], x, training)
        y = jax.nn.relu(y)
        y = max_pool(y, 3, 2, 1)  # torch-style symmetric padding (pretrained compat)
        new_stages = []
        for blocks, bparams, bstates in zip(
            self.stages, params["stages"], state["stages"]
        ):
            new_bstates = []
            for blk, p, s in zip(blocks, bparams, bstates):
                if getattr(self, "remat", False):
                    # per-block remat: trade recompute for activation HBM
                    # (fine-tune memory lever; see FineTuner(remat=True))
                    y, ns = jax.checkpoint(
                        lambda p_, s_, y_, blk=blk: blk.apply(
                            p_, s_, y_, training
                        )
                    )(p, s, y)
                else:
                    y, ns = blk.apply(p, s, y, training)
                new_bstates.append(ns)
            new_stages.append(new_bstates)
        y = global_avg_pool(y)
        logits = self.head.apply(params["head"], y)
        return logits, {"stem": stem_state, "stages": new_stages}

    # -- folded inference --------------------------------------------------
    @staticmethod
    def _stem_s2d_kernel(k7):
        """7x7/s2 stem kernel -> exact-equivalent 4x4/s1 kernel over a 2x2
        space-to-depth input (MLPerf ResNet trick: the 3-channel 7x7 stem
        utilizes a sliver of the MXU; the transformed conv runs on 12
        channels at 1/4 the spatial size — identical outputs, big speedup).

        k7 [7,7,3,64] -> k8 zero-padded at top-left -> k4 [4,4,12,64] with
        k4[p,q,(dy*2+dx)*3+c] = k8[2p+dy, 2q+dx, c].
        """
        k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        # [4,2,4,2,3,64]: split each spatial dim into (block, offset)
        k = k8.reshape(4, 2, 4, 2, k7.shape[2], k7.shape[3])
        k = jnp.transpose(k, (0, 2, 1, 3, 4, 5))  # [4,4,dy,dx,3,64]
        return k.reshape(4, 4, 4 * k7.shape[2], k7.shape[3])

    @staticmethod
    def _space_to_depth(x):
        """x [B,H,W,C] (H,W even) -> [B,H/2,W/2,4C], channel (dy,dx,c)."""
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, h // 2, w // 2, 4 * c)

    def fold(self, variables, pallas_chains: bool | None = None) -> dict:
        params, state = variables["params"], variables["state"]
        stem_folded = self.stem.fold(params["stem"], state["stem"])
        folded = {
            "stem": stem_folded,
            "stages": [
                [blk.fold(p, s) for blk, p, s in zip(blocks, bp, bs)]
                for blocks, bp, bs in zip(
                    self.stages, params["stages"], state["stages"]
                )
            ],
            "head": params["head"],
        }
        if pallas_chains and self.block_cls is not Bottleneck:
            raise ValueError(
                "pallas_chains packs bottleneck (cbr1/2/3) weights; "
                "basic-block ResNets have no fused-chain path"
            )
        if pallas_chains and (self.groups != 1 or self.base_width != 64):
            raise ValueError(
                "pallas_chains assumes dense 3x3 convs; grouped/wide "
                "bottlenecks (ResNeXt/Wide-ResNet) have no fused-chain path"
            )
        if pallas_chains:
            # OPT-IN fused stride-1 bottleneck chains (ops/pallas_bottleneck)
            # — measured SLOWER than XLA convs on v5e b128 (stage1 blocks
            # 1-2: 6.3ms fused vs 2.5ms XLA): the theoretical ~5x HBM-traffic
            # cut is consumed by MXU inefficiency at Cm=64 (N=64 half-width;
            # Mosaic can't concat shifted views into one deep-K matmul) and
            # XLA's conv pipeline already runs stage1 at the HBM roof.
            # Kept for experimentation; negative result documented in
            # docs/benchmarks.md.
            from ics_tpu.ops.pallas_bottleneck import pack_chain_weights

            chains = {}
            # every block's packed weights map into VMEM at once, so the
            # bound must be BYTES, not block count: a late stage's C=2048
            # blocks are ~8.7 MB each in bf16 (two of them already exceed
            # the ~16 MB v5e VMEM), while stage-1's are ~0.5 MB. Budget
            # half of VMEM for weights; the rest is activations/accumulators.
            vmem_weight_budget = 8 * 1024 * 1024
            for si in range(len(self.stages)):
                blocks = folded["stages"][si][1:]
                if not blocks:
                    continue
                # .shape only — np.asarray here would D2H-transfer every
                # conv weight just to count bytes
                packed_bytes = 2 * sum(
                    int(np.prod(f[k]["conv"]["w"].shape))
                    for f in blocks
                    for k in ("cbr1", "cbr2", "cbr3")
                )
                if packed_bytes <= vmem_weight_budget:
                    chains[str(si)] = pack_chain_weights(blocks)
            if chains:
                folded["chains"] = chains
        if self.use_s2d_stem:
            # opt-in: bit-exact but MEASURED SLOWER than the plain 7x7 at
            # b128 on v5e (1.86ms vs 0.96ms, scripts/profile_micro.log) —
            # XLA's implicit-gemm conv handles C=3 better than the manual
            # pad+space-to-depth reshuffle here
            folded["stem_s2d_w"] = self._stem_s2d_kernel(
                stem_folded["conv"]["w"]
            )
        return folded

    def _stem_folded(self, folded, x):
        h, w = x.shape[1], x.shape[2]
        if "stem_s2d_w" in folded and h % 2 == 0 and w % 2 == 0:
            # (4,2) spatial padding keeps the s2d path bit-exact with the
            # plain stem's torch-style (3,3) padding: the s2d input offset
            # must be even, so the extra left column is absorbed by the
            # zero row/col prepended to the kernel in _stem_s2d_kernel
            xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
            xs = self._space_to_depth(xp)
            y = jax.lax.conv_general_dilated(
                xs,
                folded["stem_s2d_w"].astype(x.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            f = folded["stem"]["bnf"]
            return y * f["scale"].astype(y.dtype) + f["bias"].astype(y.dtype)
        return self.stem.apply_folded(folded["stem"], x)

    def apply_folded(self, folded, x):
        from ics_tpu.ops.pallas_bottleneck import fused_bottleneck_chain

        y = jax.nn.relu(self._stem_folded(folded, x))
        # NOTE: a Pallas replacement for this reduce_window was tried
        # (r2): wrong results AND 7x slower compiled — Mosaic relayouts
        # dominate at C=64 with sublane-splitting reshapes. XLA's
        # reduce_window (1.2ms/b128, ~210GB/s) stays.
        y = max_pool(y, 3, 2, 1)  # torch-style symmetric padding (pretrained compat)
        chains = folded.get("chains", {})
        for si, (blocks, bfolded) in enumerate(
            zip(self.stages, folded["stages"])
        ):
            chain = chains.get(str(si))
            if chain is not None:
                y = blocks[0].apply_folded(bfolded[0], y)
                y = fused_bottleneck_chain(y, chain)
            else:
                for blk, f in zip(blocks, bfolded):
                    y = blk.apply_folded(f, y)
        y = global_avg_pool(y)
        return self.head.apply(folded["head"], y)


def resnet18(num_classes: int = 1000) -> ResNet:
    return ResNet((2, 2, 2, 2), num_classes, block_cls=BasicBlock)


def resnet34(num_classes: int = 1000) -> ResNet:
    return ResNet((3, 4, 6, 3), num_classes, block_cls=BasicBlock)


def resnet50(num_classes: int = 1000) -> ResNet:
    return ResNet((3, 4, 6, 3), num_classes)


def resnet_tiny(num_classes: int = 1000) -> ResNet:
    """One bottleneck per stage — dev/CI model for exercising the full
    serving stack (engine/batcher/mesh) cheaply on CPU. Not a zoo model."""
    return ResNet(block_counts=(1, 1, 1, 1), num_classes=num_classes)


def resnext50_32x4d(num_classes: int = 1000) -> ResNet:
    """ResNeXt-50 32x4d: 32-group 3x3s at 2x inner width — same FLOP class
    as ResNet-50, higher accuracy (torchvision-weight-compatible). TPU
    note: XLA lowers grouped convs as batched dense dots; each group is a
    [H·W, 4]x[9·4, 4]-class matmul, narrower on the MXU than ResNet-50's
    dense 3x3 — expect throughput below resnet50 despite equal FLOPs."""
    return ResNet((3, 4, 6, 3), num_classes, groups=32, base_width=4)


def wide_resnet50_2(num_classes: int = 1000) -> ResNet:
    """Wide-ResNet-50-2: 2x inner bottleneck width (base_width=128), dense
    convs — MXU-friendly width scaling (torchvision-weight-compatible)."""
    return ResNet((3, 4, 6, 3), num_classes, base_width=128)


def resnet101(num_classes: int = 1000) -> ResNet:
    return ResNet((3, 4, 23, 3), num_classes)


def resnet152(num_classes: int = 1000) -> ResNet:
    return ResNet((3, 8, 36, 3), num_classes)
