"""ConvNeXt (Tiny/Small) — modern conv family rounding out the zoo.

The reference performs no inference (labels are human-typed,
/root/reference/app/api/routes/classificacoes.py); the zoo exists for the
TPU tier's north star. ConvNeXt is the TPU-friendly modern CNN: channels-
last everywhere, LayerNorm instead of BN (no folding needed), 7x7 depthwise
+ two pointwise matmuls per block — the pointwise pair is >90% of FLOPs and
lands straight on the MXU as [B*H*W, C] x [C, 4C] GEMMs; the depthwise 7x7
is VPU work XLA overlaps with them.

Liu et al., "A ConvNet for the 2020s" (arXiv:2201.03545). Same
init/apply(training)/fold/apply_folded surface as the rest of the zoo
(CLAUDE.md design invariants); fold is identity modulo dtype like ViT —
there is no BN to fold, inference runs the same params in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ics_tpu.nn.layers import Conv2D, Dense, LayerNorm, gelu, truncated_normal


class ConvNeXtBlock:
    def __init__(self, dim: int, layer_scale_init: float = 1e-6):
        self.dim = dim
        self.dwconv = Conv2D(dim, dim, 7, 1, padding="SAME", groups=dim,
                             use_bias=True)
        self.ln = LayerNorm(dim)
        self.fc1 = Dense(dim, 4 * dim)
        self.fc2 = Dense(4 * dim, dim)
        self.layer_scale_init = layer_scale_init

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "dwconv": self.dwconv.init(k1),
            "ln": self.ln.init(),
            "fc1": self.fc1.init(k2),
            "fc2": self.fc2.init(k3),
            "gamma": jnp.full((self.dim,), self.layer_scale_init, jnp.float32),
        }

    def apply(self, params, x):
        y = self.dwconv.apply(params["dwconv"], x)        # [B,H,W,C] VPU
        y = self.ln.apply(params["ln"], y)
        y = self.fc1.apply(params["fc1"], y)              # MXU GEMM C->4C
        # dtype-aware GELU: exact erf under fp32 (torchvision-checkpoint
        # fidelity), tanh approx under bf16 where its error is below
        # rounding noise and erf costs 46% whole-model (nn/layers.py::gelu)
        y = gelu(y)
        y = self.fc2.apply(params["fc2"], y)              # MXU GEMM 4C->C
        y = y * params["gamma"].astype(y.dtype)
        return x + y


class ConvNeXt:
    def __init__(self, depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                 num_classes: int = 1000):
        self.depths = depths
        self.dims = dims
        self.num_classes = num_classes
        self.stem = Conv2D(3, dims[0], 4, 4, padding="VALID", use_bias=True)
        self.stem_ln = LayerNorm(dims[0])
        self.down_ln = [LayerNorm(dims[i]) for i in range(3)]
        self.down_conv = [
            Conv2D(dims[i], dims[i + 1], 2, 2, padding="VALID", use_bias=True)
            for i in range(3)
        ]
        self.stages = [
            [ConvNeXtBlock(dims[i]) for _ in range(depths[i])]
            for i in range(4)
        ]
        self.final_ln = LayerNorm(dims[-1])
        self.head = Dense(dims[-1], num_classes, init="trunc_normal")

    def init(self, key):
        n_keys = 2 + 3 + sum(self.depths)
        keys = iter(jax.random.split(key, n_keys))
        params = {
            "stem": self.stem.init(next(keys)),
            "stem_ln": self.stem_ln.init(),
            "down": [
                {"ln": ln.init(), "conv": conv.init(next(keys))}
                for ln, conv in zip(self.down_ln, self.down_conv)
            ],
            "stages": [
                [blk.init(next(keys)) for blk in blocks]
                for blocks in self.stages
            ],
            "final_ln": self.final_ln.init(),
            "head": self.head.init(next(keys)),
        }
        return {"params": params, "state": {}}

    def _forward(self, params, x):
        y = self.stem.apply(params["stem"], x)
        y = self.stem_ln.apply(params["stem_ln"], y)
        for i in range(4):
            if i > 0:
                d = params["down"][i - 1]
                y = self.down_ln[i - 1].apply(d["ln"], y)
                y = self.down_conv[i - 1].apply(d["conv"], y)
            for blk, bp in zip(self.stages[i], params["stages"][i]):
                if getattr(self, "remat", False):
                    # per-block remat (see FineTuner(remat=True))
                    y = jax.checkpoint(
                        lambda bp_, y_, blk=blk: blk.apply(bp_, y_)
                    )(bp, y)
                else:
                    y = blk.apply(bp, y)
        y = jnp.mean(y, axis=(1, 2))                      # global avg pool
        y = self.final_ln.apply(params["final_ln"], y)
        return self.head.apply(params["head"], y)

    def apply(self, variables, x, training: bool = False):
        return self._forward(variables["params"], x), variables.get("state", {})

    def fold(self, variables):
        # LayerNorm has no running stats to fold; inference runs the same
        # params (engine casts to bf16)
        return variables["params"]

    def apply_folded(self, folded, x):
        return self._forward(folded, x)


def convnext_tiny(num_classes: int = 1000) -> ConvNeXt:
    return ConvNeXt((3, 3, 9, 3), (96, 192, 384, 768), num_classes)


def convnext_small(num_classes: int = 1000) -> ConvNeXt:
    return ConvNeXt((3, 3, 27, 3), (96, 192, 384, 768), num_classes)
