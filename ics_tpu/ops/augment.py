"""On-device training augmentation, fused into the resize matmuls.

TPU-first: RandomResizedCrop and horizontal flip are expressed through the
SAME two interpolation matmuls the serving preproc uses
(:mod:`ics_tpu.ops.preproc`) — the crop geometry and the flip only change
the ``[out, canvas]`` weight matrices (built from traced scalars), so
augmentation costs zero extra matmuls and uses no gathers (which TPUs do
poorly). Color jitter is a per-image affine in pixel space (VPU, fused by
XLA into the surrounding graph). Mixup pairs each image with its
roll-by-one neighbor: under DP batch sharding that is a single-row
``ppermute`` over ICI, where a random permutation would need a cross-device
all-gather.

The reference has no training tier at all (SURVEY §2.2, §4 — labels are
typed by humans); this module serves BASELINE config 5 (fine-tune loop)
quality: ambientes have small specialist-labeled datasets, where crop/flip/
mixup regularization is the difference between a usable suggestion model
and an overfit one.

Geometry notes (differences vs torchvision's RandomResizedCrop, by design):
- torchvision rejection-samples the crop box up to 10x then falls back to
  center-crop; data-dependent loops don't trace, so here the sampled box is
  deterministically CLAMPED to fit the true extent instead.
- torchvision crops then resizes, so the triangle filter clamps at crop
  edges; here the filter window may read a few real pixels just outside the
  crop box (still inside the image) — equivalent up to edge filtering.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ics_tpu.ops.preproc import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _triangle_weights,
    apply_resize_weights,
    normalize_pixels,
)

# Rec. 601 luma — the same weighting PIL's convert("L") uses, so saturation
# jitter desaturates toward the grayscale the rest of the pipeline would see
_LUMA = (0.299, 0.587, 0.114)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Hashable (usable as a jit static arg) augmentation recipe.

    Defaults are the standard ImageNet fine-tune recipe: area-scale crop in
    [0.35, 1] (small-dataset-friendly; 0.08 is for million-image pretrains),
    3:4..4:3 aspect jitter, 50% horizontal flip, no color jitter, no mixup,
    no label smoothing.
    """

    scale_range: Tuple[float, float] = (0.35, 1.0)
    ratio_range: Tuple[float, float] = (0.75, 4.0 / 3.0)
    flip_prob: float = 0.5
    brightness: float = 0.0   # factor jitter: b ~ U[1-x, 1+x]
    contrast: float = 0.0
    saturation: float = 0.0
    mixup_alpha: float = 0.0  # 0 disables; 0.2 is the standard setting
    cutmix_alpha: float = 0.0  # 0 disables; 1.0 is the standard setting
    label_smoothing: float = 0.0

    def __post_init__(self):
        lo, hi = self.scale_range
        if not (0.0 < lo <= hi <= 1.0):
            raise ValueError(f"scale_range inválido: {self.scale_range}")
        rlo, rhi = self.ratio_range
        if not (0.0 < rlo <= rhi):
            raise ValueError(f"ratio_range inválido: {self.ratio_range}")
        if not (0.0 <= self.flip_prob <= 1.0):
            raise ValueError(f"flip_prob inválido: {self.flip_prob}")
        for name in ("brightness", "contrast", "saturation"):
            v = getattr(self, name)
            if not (0.0 <= v < 1.0):
                raise ValueError(f"{name} inválido: {v} (esperado [0, 1))")
        if self.mixup_alpha < 0.0:
            raise ValueError(f"mixup_alpha inválido: {self.mixup_alpha}")
        if self.cutmix_alpha < 0.0:
            raise ValueError(f"cutmix_alpha inválido: {self.cutmix_alpha}")
        if not (0.0 <= self.label_smoothing < 1.0):
            raise ValueError(
                f"label_smoothing inválido: {self.label_smoothing}"
            )


def _crop_flip_plan(key, h, w, out_size: int, cfg: AugmentConfig):
    """Sample a RandomResizedCrop box + flip for one image.

    Returns per-axis ``(scale, offset)`` in the exact parameterization
    :func:`ics_tpu.ops.preproc._triangle_weights` expects — source center of
    output pixel i is ``(i + offset + 0.5) * scale`` — plus a flip bool.
    For a crop of ``ch`` source rows starting at ``y0`` mapped onto
    ``out_size`` output rows: ``scale = ch / out_size``,
    ``offset = y0 / scale``.
    """
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    k_area, k_ratio, k_y, k_x, k_flip = jax.random.split(key, 5)
    area_frac = jax.random.uniform(
        k_area, (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio, (),
        minval=math.log(cfg.ratio_range[0]),
        maxval=math.log(cfg.ratio_range[1]),
    )
    ratio = jnp.exp(log_ratio)  # crop aspect w/h
    area = area_frac * h * w
    crop_h = jnp.clip(jnp.sqrt(area / ratio), 1.0, h)
    crop_w = jnp.clip(jnp.sqrt(area * ratio), 1.0, w)
    y0 = jax.random.uniform(k_y, ()) * (h - crop_h)
    x0 = jax.random.uniform(k_x, ()) * (w - crop_w)
    flip = jax.random.bernoulli(k_flip, cfg.flip_prob)
    scale_y = crop_h / out_size
    scale_x = crop_w / out_size
    return (scale_y, y0 / scale_y), (scale_x, x0 / scale_x), flip


def _color_jitter(y, key, cfg: AugmentConfig):
    """Brightness -> contrast -> saturation, each a per-image affine in
    [0, 255] pixel space (fixed order; torchvision shuffles it — the extra
    randomness is negligible against the factor jitter itself)."""
    k_b, k_c, k_s = jax.random.split(key, 3)
    if cfg.brightness > 0.0:
        b = jax.random.uniform(
            k_b, (), minval=1.0 - cfg.brightness, maxval=1.0 + cfg.brightness
        )
        y = y * b
    if cfg.contrast > 0.0:
        c = jax.random.uniform(
            k_c, (), minval=1.0 - cfg.contrast, maxval=1.0 + cfg.contrast
        )
        luma = jnp.tensordot(y, jnp.asarray(_LUMA, jnp.float32), axes=[[2], [0]])
        y = (y - jnp.mean(luma)) * c + jnp.mean(luma)
    if cfg.saturation > 0.0:
        s = jax.random.uniform(
            k_s, (), minval=1.0 - cfg.saturation, maxval=1.0 + cfg.saturation
        )
        gray = jnp.tensordot(
            y, jnp.asarray(_LUMA, jnp.float32), axes=[[2], [0]]
        )[..., None]
        y = gray + (y - gray) * s
    return jnp.clip(y, 0.0, 255.0)


def augment_image(canvas_img, h, w, key, out_size: int,
                  cfg: AugmentConfig, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                  dtype=jnp.bfloat16):
    """One image: canvas uint8 [CH, CW, 3] + true (h, w) + PRNG key ->
    augmented, normalized [out, out, 3]."""
    ch, cw, _ = canvas_img.shape
    k_geom, k_color = jax.random.split(key)
    (sy, oy), (sx, ox), flip = _crop_flip_plan(k_geom, h, w, out_size, cfg)
    ry = _triangle_weights(ch, out_size, h, sy, oy)             # [out, CH]
    rx = _triangle_weights(cw, out_size, w, sx, ox)             # [out, CW]
    # horizontal flip = output column i samples where column out-1-i would:
    # reverse the ROWS of the column-weight matrix — the matmul cost is
    # identical, no second pass over the pixels
    rx = jnp.where(flip, rx[::-1, :], rx)
    y = apply_resize_weights(canvas_img, ry, rx)
    if cfg.brightness > 0.0 or cfg.contrast > 0.0 or cfg.saturation > 0.0:
        y = _color_jitter(y, k_color, cfg)
    return normalize_pixels(y, mean, std, dtype)


@functools.partial(jax.jit, static_argnames=("out_size", "cfg", "dtype"))
def augment_batch(canvas, sizes, key, out_size: int = 224,
                  cfg: AugmentConfig = AugmentConfig(), dtype=jnp.bfloat16):
    """Batch: canvas uint8 [B, CH, CW, 3], sizes int32 [B, 2], PRNG key ->
    [B, out, out, 3]. Per-image keys derive from the GLOBAL batch index, so
    under DP sharding every shard draws distinct crops."""
    n = canvas.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    return jax.vmap(
        lambda img, hw, k: augment_image(
            img, hw[0], hw[1], k, out_size, cfg, dtype=dtype
        )
    )(canvas, sizes, keys)


def smooth_labels(labels, num_classes: int, smoothing: float = 0.0):
    """int labels [B] -> target distribution [B, num_classes] with uniform
    label smoothing (the smoothed target keeps 1-s on the true class)."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if smoothing <= 0.0:
        return onehot
    return onehot * (1.0 - smoothing) + smoothing / num_classes


def smooth_multilabel(targets, smoothing: float = 0.0):
    """Multi-hot [B, C] float targets -> binary-smoothed targets: each
    class's probability moves ``smoothing/2`` toward 0.5 (the multi-label
    analogue of uniform smoothing — every class is its own 2-way problem,
    so the uniform distribution is 1/2, not 1/num_classes)."""
    if smoothing <= 0.0:
        return targets
    return targets * (1.0 - smoothing) + smoothing / 2.0


def cutmix(key, images, targets, alpha: float):
    """Roll-pairing CutMix (Yun et al., arXiv:1905.04899): paste a random
    box from the batch neighbor; labels mix by the box's ACTUAL area
    fraction (the sampled box clips at image borders, so lambda is
    recomputed from the clipped mask — the paper's adjustment).

    TPU-first: the box is a [H, W] 0/1 mask built from two iota
    comparisons (traced scalars — static shapes, no dynamic_slice, no
    gathers), and the partner is ``jnp.roll`` by one row, the same
    single-row ppermute-under-DP pairing as :func:`mixup`. One box per
    batch, like mixup's single lambda."""
    _, h, w, _ = images.shape
    k_lam, k_y, k_x = jax.random.split(key, 3)
    lam = jax.random.beta(k_lam, alpha, alpha).astype(jnp.float32)
    lam = jnp.maximum(lam, 1.0 - lam)  # own image dominates (like mixup)
    cut_frac = jnp.sqrt(1.0 - lam)    # box area fraction = 1 - lambda
    cut_h = cut_frac * h
    cut_w = cut_frac * w
    cy = jax.random.uniform(k_y, ()) * h
    cx = jax.random.uniform(k_x, ()) * w
    y0 = jnp.clip(cy - cut_h / 2.0, 0.0, float(h))
    y1 = jnp.clip(cy + cut_h / 2.0, 0.0, float(h))
    x0 = jnp.clip(cx - cut_w / 2.0, 0.0, float(w))
    x1 = jnp.clip(cx + cut_w / 2.0, 0.0, float(w))
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    in_y = (rows >= y0) & (rows < y1)
    in_x = (cols >= x0) & (cols < x1)
    box = (in_y[:, None] & in_x[None, :]).astype(jnp.float32)  # [H, W]
    lam_adj = 1.0 - jnp.mean(box)  # true kept-area fraction after clipping
    mask = box[None, :, :, None].astype(images.dtype)
    mixed_images = images * (1.0 - mask) + jnp.roll(images, 1, axis=0) * mask
    mixed_targets = (
        lam_adj * targets + (1.0 - lam_adj) * jnp.roll(targets, 1, axis=0)
    )
    return mixed_images, mixed_targets


def mix_batch(key, images, targets, cfg: AugmentConfig):
    """Apply the configured mixing: mixup, cutmix, or — with both alphas
    set — a 50/50 per-batch switch between them (the timm recipe).
    ``lax.cond`` keeps both branches in one compiled graph."""
    use_mixup = cfg.mixup_alpha > 0.0
    use_cutmix = cfg.cutmix_alpha > 0.0
    if use_mixup and use_cutmix:
        k_pick, k_mix = jax.random.split(key)
        return jax.lax.cond(
            jax.random.bernoulli(k_pick),
            lambda: mixup(k_mix, images, targets, cfg.mixup_alpha),
            lambda: cutmix(k_mix, images, targets, cfg.cutmix_alpha),
        )
    if use_cutmix:
        return cutmix(key, images, targets, cfg.cutmix_alpha)
    if use_mixup:
        return mixup(key, images, targets, cfg.mixup_alpha)
    return images, targets


def mixup(key, images, targets, alpha: float):
    """Roll-pairing mixup: blend each example with its batch neighbor.

    ``targets`` are probability rows [B, C] (already smoothed); one lambda
    per batch (standard practice — per-example lambdas measurably don't
    help). ``jnp.roll`` by one row keeps the pairing local under DP
    sharding: XLA lowers it to a single-row ppermute between neighbor
    devices instead of the all-gather a random permutation would force.
    """
    lam = jax.random.beta(key, alpha, alpha).astype(jnp.float32)
    # fold toward 0.5..1 so "this" image always dominates its own label —
    # keeps per-example accuracy metrics meaningful
    lam = jnp.maximum(lam, 1.0 - lam)
    mixed_images = (
        lam.astype(images.dtype) * images
        + (1.0 - lam).astype(images.dtype) * jnp.roll(images, 1, axis=0)
    )
    mixed_targets = lam * targets + (1.0 - lam) * jnp.roll(targets, 1, axis=0)
    return mixed_images, mixed_targets
