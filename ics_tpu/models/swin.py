"""Swin Transformer (v1) — hierarchical windowed attention family.

Net-new model breadth for the TPU tier (the reference has no models at
all, SURVEY.md §0); weight-layout-compatible with timm's
``swin_tiny_patch4_window7_224`` line so pretrained imports follow the
same path as the ViT/ResNet families.

TPU-first choices:
- Window partition/shift are pure reshapes/transposes + ``jnp.roll`` on
  STATIC shapes — everything XLA can fuse and lay out; no gathers.
- Window attention runs as plain batched matmuls ([B·nW, heads, 49, d]):
  windows are 49 tokens, far below the Pallas flash kernel's block sizes
  — full attention inside a window is already memory-local, so the flash
  kernel would only add padding waste (documented negative result class,
  docs/benchmarks.md).
- The shifted-window attention mask and the relative-position-bias index
  are precomputed with numpy at build time per stage (grids are static)
  and enter the graph as constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.nn.layers import Conv2D, Dense, LayerNorm, gelu, truncated_normal


def _relative_position_index(window: int) -> np.ndarray:
    """[ww, ww] index into the (2w-1)^2 relative-position-bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)                                   # [2, ww]
    rel = coords[:, :, None] - coords[:, None, :]      # [2, ww, ww]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def _shift_attn_mask(grid: int, window: int, shift: int) -> np.ndarray:
    """[nW, ww, ww] additive mask (0 / -1e4) separating tokens that were
    not neighbours before the cyclic shift (Swin v1 SW-MSA mask)."""
    img = np.zeros((grid, grid), np.int32)
    cnt = 0
    bounds = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in bounds:
        for ws in bounds:
            img[hs, ws] = cnt
            cnt += 1
    n = grid // window
    wins = img.reshape(n, window, n, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, window * window)           # [nW, ww]
    diff = wins[:, :, None] - wins[:, None, :]
    return np.where(diff == 0, 0.0, -1e4).astype(np.float32)


def _window_partition(x, window: int):
    """[B, H, W, C] -> [B*nH*nW, ww, C] (static reshapes only)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def _window_merge(x, window: int, grid: int, batch: int):
    """Inverse of :func:`_window_partition`."""
    n = grid // window
    c = x.shape[-1]
    x = x.reshape(batch, n, n, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(batch, grid, grid, c)


class WindowAttention:
    def __init__(self, dim: int, num_heads: int, window: int):
        assert dim % num_heads == 0
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.window = window
        self.qkv = Dense(dim, dim * 3)
        self.proj = Dense(dim, dim)
        self._rel_index = jnp.asarray(_relative_position_index(window))

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "qkv": self.qkv.init(k1),
            "proj": self.proj.init(k2),
            # timm: trunc-normal(0.02) table [(2w-1)^2, heads]
            "rel_bias": truncated_normal(
                k3, ((2 * self.window - 1) ** 2, self.num_heads)
            ),
        }

    def apply(self, params, x, mask=None, scores_in_dtype: bool = False):
        """x [Bn, ww, C]; mask [nW, ww, ww] additive or None.

        ``scores_in_dtype=True`` (inference path) keeps the materialized
        [Bn, H, ww, ww] score/softmax tensor in the COMPUTE dtype instead
        of f32 — that tensor's HBM traffic dominates Swin's step time
        (measured: 87% of swin_tiny is attention; bf16 scores are +40%
        whole-model, scripts/profile_swin.log) and a 49-term softmax in
        bf16 deviates below weight-rounding noise (docs/benchmarks.md).
        Training keeps f32 scores: gradients through the softmax are the
        numerically delicate part of attention."""
        bn, ww, _ = x.shape
        qkv = self.qkv.apply(params["qkv"], x)
        qkv = qkv.reshape(bn, ww, 3, self.num_heads, self.head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )                                               # [Bn, H, ww, hd]
        scale = self.head_dim ** -0.5
        score_dtype = x.dtype if scores_in_dtype else jnp.float32
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k,
            preferred_element_type=score_dtype,
        )
        bias = params["rel_bias"].astype(score_dtype)[self._rel_index]
        attn = attn + bias.transpose(2, 0, 1)[None]     # [1, H, ww, ww]
        if mask is not None:
            n_windows = mask.shape[0]
            attn = attn.reshape(
                bn // n_windows, n_windows, self.num_heads, ww, ww
            )
            attn = attn + mask.astype(score_dtype)[None, :, None]
            attn = attn.reshape(bn, self.num_heads, ww, ww)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bn, ww, self.dim)
        return self.proj.apply(params["proj"], out)


class SwinBlock:
    def __init__(self, dim: int, num_heads: int, window: int, shift: int,
                 grid: int, mlp_ratio: int = 4, gelu_exact: bool = True):
        assert grid % window == 0, (
            f"grid {grid} não divide pela janela {window}"
        )
        self.dim = dim
        self.window = window
        self.shift = shift
        self.grid = grid
        self.ln1 = LayerNorm(dim, eps=1e-5)
        self.attn = WindowAttention(dim, num_heads, window)
        self.ln2 = LayerNorm(dim, eps=1e-5)
        self.fc1 = Dense(dim, dim * mlp_ratio)
        self.fc2 = Dense(dim * mlp_ratio, dim)
        self.gelu_exact = gelu_exact
        self._mask = (
            jnp.asarray(_shift_attn_mask(grid, window, shift))
            if shift > 0 else None
        )

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "ln1": self.ln1.init(), "attn": self.attn.init(k1),
            "ln2": self.ln2.init(), "fc1": self.fc1.init(k2),
            "fc2": self.fc2.init(k3),
        }

    def apply(self, params, x, scores_in_dtype: bool = False):
        """x [B, H, W, C] -> same shape."""
        b = x.shape[0]
        shortcut = x
        y = self.ln1.apply(params["ln1"], x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        windows = _window_partition(y, self.window)
        windows = self.attn.apply(params["attn"], windows, self._mask,
                                  scores_in_dtype=scores_in_dtype)
        y = _window_merge(windows, self.window, self.grid, b)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        y = self.ln2.apply(params["ln2"], x)
        y = self.fc1.apply(params["fc1"], y)
        y = gelu(y, exact=self.gelu_exact)
        y = self.fc2.apply(params["fc2"], y)
        return x + y


class PatchMerging:
    """2x2 neighbourhood concat (4C) -> LN -> Linear 4C->2C (no bias)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.norm = LayerNorm(4 * dim, eps=1e-5)
        self.reduction = Dense(4 * dim, 2 * dim, use_bias=False)

    def init(self, key):
        return {"norm": self.norm.init(), "reduction": self.reduction.init(key)}

    def apply(self, params, x):
        b, h, w, c = x.shape
        # timm quadrant order: (0,0), (1,0), (0,1), (1,1)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
             x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = self.norm.apply(params["norm"], x)
        return self.reduction.apply(params["reduction"], x)


class SwinTransformer:
    def __init__(
        self,
        image_size: int = 224,
        patch_size: int = 4,
        embed_dim: int = 96,
        depths: tuple = (2, 2, 6, 2),
        num_heads: tuple = (3, 6, 12, 24),
        window: int = 7,
        num_classes: int = 1000,
        gelu_exact: bool = True,
    ):
        self.image_size = image_size
        self.num_classes = num_classes
        self.patch_embed = Conv2D(
            3, embed_dim, patch_size, patch_size, padding="VALID",
            use_bias=True,
        )
        self.patch_norm = LayerNorm(embed_dim, eps=1e-5)
        grid = image_size // patch_size
        self.stages: list[list[SwinBlock]] = []
        self.merges: list[PatchMerging] = []
        dim = embed_dim
        for si, (depth, heads) in enumerate(zip(depths, num_heads)):
            blocks = [
                SwinBlock(
                    dim, heads, window,
                    # alternate W-MSA / SW-MSA; when the whole grid fits
                    # one window the shift is pointless (timm does the same)
                    shift=0 if (i % 2 == 0 or grid <= window) else window // 2,
                    grid=grid, gelu_exact=gelu_exact,
                )
                for i in range(depth)
            ]
            self.stages.append(blocks)
            if si < len(depths) - 1:
                self.merges.append(PatchMerging(dim))
                dim *= 2
                grid //= 2
        self.ln = LayerNorm(dim, eps=1e-5)
        self.head = Dense(dim, num_classes, init="trunc_normal")

    def init(self, key):
        n_blocks = sum(len(s) for s in self.stages)
        keys = iter(jax.random.split(key, n_blocks + len(self.merges) + 2))
        params = {
            "patch_embed": self.patch_embed.init(next(keys)),
            "patch_norm": self.patch_norm.init(),
            "stages": [
                [blk.init(next(keys)) for blk in stage]
                for stage in self.stages
            ],
            "merges": [m.init(next(keys)) for m in self.merges],
            "ln": self.ln.init(),
            "head": self.head.init(next(keys)),
        }
        return {"params": params, "state": {}}

    def _forward(self, params, x, scores_in_dtype: bool = False):
        y = self.patch_embed.apply(params["patch_embed"], x)  # [B,g,g,C]
        y = self.patch_norm.apply(params["patch_norm"], y)
        for si, (stage, sp) in enumerate(zip(self.stages, params["stages"])):
            for blk, bp in zip(stage, sp):
                if getattr(self, "remat", False):
                    y = jax.checkpoint(
                        lambda bp_, y_, blk=blk: blk.apply(
                            bp_, y_, scores_in_dtype
                        )
                    )(bp, y)
                else:
                    y = blk.apply(bp, y, scores_in_dtype)
            if si < len(self.merges):
                y = self.merges[si].apply(params["merges"][si], y)
        y = self.ln.apply(params["ln"], y)
        y = jnp.mean(y, axis=(1, 2))                    # token avg pool
        return self.head.apply(params["head"], y)

    def apply(self, variables, x, training: bool = False):
        # training keeps f32 scores (gradient numerics); pure-eval apply
        # could follow the dtype too, but eval shares the train graph
        return self._forward(variables["params"], x), variables.get("state", {})

    def fold(self, variables):
        return variables["params"]

    def apply_folded(self, folded, x):
        # inference: score/softmax tensor in the compute dtype (bf16
        # serving) — the measured +40% (see WindowAttention.apply)
        return self._forward(folded, x, scores_in_dtype=True)


def swin_tiny(num_classes: int = 1000, image_size: int = 224) -> SwinTransformer:
    """Swin-T (timm ``swin_tiny_patch4_window7_224``): 28M params,
    (2,2,6,2) depths, windows of 7 on 56/28/14/7 grids."""
    return SwinTransformer(image_size=image_size, num_classes=num_classes)


def swin_small(num_classes: int = 1000, image_size: int = 224) -> SwinTransformer:
    """Swin-S: (2,2,18,2) depths, same widths as Swin-T."""
    return SwinTransformer(
        image_size=image_size, num_classes=num_classes,
        depths=(2, 2, 18, 2),
    )


def swin_base(num_classes: int = 1000, image_size: int = 224) -> SwinTransformer:
    """Swin-B (timm ``swin_base_patch4_window7_224``): 87,768,224 params
    exactly at 1000 classes — embed 128, heads (4,8,16,32), Swin-S
    depths."""
    return SwinTransformer(
        image_size=image_size, num_classes=num_classes,
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
    )


def swin_micro(num_classes: int = 1000) -> SwinTransformer:
    """1-block stages at 64px / window 4 — dev/CI model (CPU tests)."""
    return SwinTransformer(
        image_size=64, patch_size=4, embed_dim=32,
        depths=(1, 2), num_heads=(2, 4), window=4,
        num_classes=num_classes,
    )
