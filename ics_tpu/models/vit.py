"""Vision Transformer (ViT-B/16) — BASELINE config 3 (384 px eval).

TPU-first: patchify as a strided conv (MXU), attention via the Pallas
blockwise flash kernel (``ics_tpu.ops.attention``) for inference; the plain
XLA path is used when training (flash kernel bwd not needed at this scale).
577 tokens (24x24 patches + cls) are padded to 640 inside the kernel with
valid-length masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ics_tpu.nn.layers import Conv2D, Dense, LayerNorm, gelu, truncated_normal
from ics_tpu.ops.attention import attention_reference, flash_attention


class MultiHeadAttention:
    def __init__(self, dim: int, num_heads: int):
        assert dim % num_heads == 0
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = Dense(dim, dim * 3)
        self.proj = Dense(dim, dim)
        # sequence parallelism seam (FineTuner sp mesh): when set to
        # (mesh, axis), the TRAINING path (use_flash=False) rings the
        # token dim over that axis instead of running full attention —
        # exact online softmax, K/V chunks rotating over ICI
        # (parallel/ring_attention.py; padding handles ViT's P+1 tokens)
        self.ring = None

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"qkv": self.qkv.init(k1), "proj": self.proj.init(k2)}

    def apply(self, params, x, use_flash: bool):
        b, s, _ = x.shape
        qkv = self.qkv.apply(params["qkv"], x)             # [B, S, 3*D]
        qkv = qkv.reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )                                                  # [B, H, S, hd]
        if self.ring is not None and not use_flash:
            from ics_tpu.parallel.ring_attention import ring_attention_padded

            mesh, axis = self.ring
            attn = ring_attention_padded(q, k, v, mesh, axis=axis)
        elif use_flash:
            attn = flash_attention(q, k, v)
        else:
            attn = attention_reference(q, k, v)
        out = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, s, self.dim)
        return self.proj.apply(params["proj"], out)


class TransformerBlock:
    def __init__(self, dim: int, num_heads: int, mlp_ratio: int = 4,
                 gelu_exact: bool = True):
        self.ln1 = LayerNorm(dim)
        self.attn = MultiHeadAttention(dim, num_heads)
        self.ln2 = LayerNorm(dim)
        self.fc1 = Dense(dim, dim * mlp_ratio)
        self.fc2 = Dense(dim * mlp_ratio, dim)
        self.gelu_exact = gelu_exact

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "ln1": self.ln1.init(), "attn": self.attn.init(k1),
            "ln2": self.ln2.init(), "fc1": self.fc1.init(k2),
            "fc2": self.fc2.init(k3),
        }

    def apply(self, params, x, use_flash: bool):
        y = self.ln1.apply(params["ln1"], x)
        x = x + self.attn.apply(params["attn"], y, use_flash)
        y = self.ln2.apply(params["ln2"], x)
        y = self.fc1.apply(params["fc1"], y)
        # dtype-aware GELU: exact erf under fp32 (import fidelity), tanh
        # approximation under bf16 where its error is sub-rounding-noise
        # and erf costs 22% whole-model (nn/layers.py::gelu, measured)
        y = gelu(y, exact=self.gelu_exact)
        y = self.fc2.apply(params["fc2"], y)
        return x + y


class ViT:
    def __init__(
        self,
        image_size: int = 384,
        patch_size: int = 16,
        dim: int = 768,
        depth: int = 12,
        num_heads: int = 12,
        num_classes: int = 1000,
        gelu_exact: bool = True,
    ):
        self.image_size = image_size
        self.patch_size = patch_size
        self.dim = dim
        self.num_patches = (image_size // patch_size) ** 2
        self.patch_embed = Conv2D(3, dim, patch_size, patch_size, padding="VALID",
                                  use_bias=True)
        self.blocks = [
            TransformerBlock(dim, num_heads, gelu_exact=gelu_exact)
            for _ in range(depth)
        ]
        self.ln = LayerNorm(dim)
        self.head = Dense(dim, num_classes, init="trunc_normal")
        self.num_classes = num_classes

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks) + 4)
        params = {
            "patch_embed": self.patch_embed.init(keys[0]),
            "cls_token": truncated_normal(keys[1], (1, 1, self.dim)),
            "pos_embed": truncated_normal(
                keys[2], (1, self.num_patches + 1, self.dim)
            ),
            "blocks": [
                blk.init(k) for blk, k in zip(self.blocks, keys[3:-1])
            ],
            "ln": self.ln.init(),
            "head": self.head.init(keys[-1]),
        }
        return {"params": params, "state": {}}

    def _forward(self, params, x, use_flash: bool):
        b = x.shape[0]
        y = self.patch_embed.apply(params["patch_embed"], x)   # [B, gh, gw, D]
        y = y.reshape(b, -1, self.dim)                          # [B, P, D]
        cls = jnp.broadcast_to(
            params["cls_token"].astype(y.dtype), (b, 1, self.dim)
        )
        y = jnp.concatenate([cls, y], axis=1)
        y = y + params["pos_embed"].astype(y.dtype)
        for blk, bp in zip(self.blocks, params["blocks"]):
            if getattr(self, "remat", False):
                # per-block rematerialization: backward recomputes the
                # block instead of storing its internals — activation
                # memory drops from O(depth x block internals) to
                # O(depth x boundary), the standard TPU trade of FLOPs
                # for HBM (SURVEY design note; enable via FineTuner)
                y = jax.checkpoint(
                    lambda bp_, y_, blk=blk: blk.apply(bp_, y_, use_flash)
                )(bp, y)
            else:
                y = blk.apply(bp, y, use_flash)
        y = self.ln.apply(params["ln"], y)
        return self.head.apply(params["head"], y[:, 0])

    def apply(self, variables, x, training: bool = False):
        # training path keeps the XLA attention (differentiable end-to-end)
        logits = self._forward(variables["params"], x, use_flash=not training)
        return logits, variables.get("state", {})

    # inference uses the same params; "folding" is identity for ViT
    def fold(self, variables):
        return variables["params"]

    def apply_folded(self, folded, x):
        return self._forward(folded, x, use_flash=True)


def vit_b16(num_classes: int = 1000, image_size: int = 384) -> ViT:
    return ViT(image_size=image_size, num_classes=num_classes)


def vit_b16_h6d128(num_classes: int = 1000, image_size: int = 384) -> ViT:
    """ViT-B/16 with 6 heads of d=128 instead of 12 of d=64.

    Same width/depth/params as vit_b16 but the QK/PV contractions fill the
    MXU's 128 lanes — the measured escape from the d=64 padded-matmul
    attention floor (docs/benchmarks.md ViT analysis). NOT weight-
    compatible with standard ViT-B/16 checkpoints; intended for training
    from scratch / fine-tuning where attention throughput matters — which
    is also why it keeps the tanh-approx GELU (erf costs 22% whole-model,
    and there are no imported weights to stay faithful to).
    """
    return ViT(image_size=image_size, num_classes=num_classes, num_heads=6,
               gelu_exact=False)


def vit_s16(num_classes: int = 1000, image_size: int = 224) -> ViT:
    """ViT-S/16 (timm ``vit_small_patch16_*``): dim 384, 12 layers, 6
    heads of d=64. The small-dataset-friendly standard ViT — the usual
    fine-tune pick for ambiente-scale corpora; weight-compatible with
    timm's widely-available S/16 checkpoints (224px pos_embed grids
    interpolate on import, train/pretrained.py)."""
    return ViT(image_size=image_size, dim=384, depth=12, num_heads=6,
               num_classes=num_classes)


def vit_l16(num_classes: int = 1000, image_size: int = 384) -> ViT:
    return ViT(image_size=image_size, dim=1024, depth=24, num_heads=16,
               num_classes=num_classes)


def vit_tiny(num_classes: int = 1000) -> ViT:
    """Dev/CI ViT (resnet_tiny's transformer twin): exercises the full
    patch-embed/blocks/PP/ring machinery cheaply on CPU. depth=8 divides
    2/4/8 pipeline stages. Not a zoo model."""
    return ViT(image_size=64, patch_size=8, dim=32, depth=8, num_heads=2,
               num_classes=num_classes)


def vit_l16_h8d128(num_classes: int = 1000, image_size: int = 384) -> ViT:
    """ViT-L/16 with 8 heads of d=128 (see vit_b16_h6d128)."""
    return ViT(image_size=image_size, dim=1024, depth=24, num_heads=8,
               num_classes=num_classes, gelu_exact=False)
