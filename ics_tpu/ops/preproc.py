"""On-device image preprocessing: resize + center-crop + normalize.

TPU-first design: bilinear/antialiased resize is expressed as two small
matrix multiplies (row-interp matrix @ image @ col-interp matrix), which XLA
maps onto the MXU — instead of per-pixel gathers, which TPUs do poorly. The
interpolation matrices implement PIL's convolution-based BILINEAR filter
(triangle kernel, scaled support when downscaling => antialiasing), so
outputs match the reference's PIL pipeline (``webdav_sync.py:94`` used PIL
for decode/metadata; the classify pipeline normalizes ImageNet-style) within
fp tolerance.

Variable input sizes with static XLA shapes: images are staged into a fixed
canvas [CANVAS_H, CANVAS_W, 3] (top-left aligned) and their true (h, w)
travel as scalars; the weight matrices zero out canvas padding because the
triangle window never reads past the true extent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# ImageNet normalization (fp32 for precision; cast at the end)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _triangle_weights(canvas: int, out_size: int, src_size, scale, offset):
    """Interpolation matrix [out_size, canvas] for PIL-style triangle filter.

    src coordinate of output pixel i: center = (i + offset + 0.5) * scale.
    ``src_size`` and ``scale``/``offset`` may be traced scalars; ``canvas``
    and ``out_size`` are static.
    """
    src_size = jnp.asarray(src_size, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    filterscale = jnp.maximum(scale, 1.0)  # antialias when downscaling
    i = jnp.arange(out_size, dtype=jnp.float32)[:, None]        # [out, 1]
    j = jnp.arange(canvas, dtype=jnp.float32)[None, :]          # [1, canvas]
    center = (i + offset + 0.5) * scale
    x = (j + 0.5 - center) / filterscale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x))
    # zero weights beyond the true source extent, then renormalize (PIL
    # clamps the window to the image; renormalizing reproduces its edge
    # handling)
    w = jnp.where(j < src_size, w, 0.0)
    norm = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.maximum(norm, 1e-8)


def _resize_plan(h, w, out_size: int, resize_short: int):
    """Compose resize-shorter-side + center-crop into per-axis (scale, offset).

    In resized space the image is (rh, rw) with min(rh, rw) == resize_short;
    the crop takes ``out_size`` pixels from the center. Mapping output pixel
    i (of the crop) back to source: center_src = (i + crop_off + 0.5) * (src/resized).
    """
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    short = jnp.minimum(h, w)
    # PIL quantizes the resized size to integers and crops at integer
    # offsets; matching that grid exactly is what keeps outputs within
    # filter-precision tolerance of the reference pipeline.
    rh = jnp.round(h * resize_short / short)
    rw = jnp.round(w * resize_short / short)
    crop_y = jnp.floor((rh - out_size) / 2.0)
    crop_x = jnp.floor((rw - out_size) / 2.0)
    scale_y = h / rh
    scale_x = w / rw
    return (scale_y, crop_y), (scale_x, crop_x)


def apply_resize_weights(canvas_img, ry, rx):
    """Resize via the two interpolation matmuls: uint8 [CH, CW, 3] ->
    float32 [out, out, 3] in [0, 255] pixel space.

    Shared core of the serving preproc and the training augmentation
    (:mod:`ics_tpu.ops.augment`) — the two differ ONLY in how the weight
    matrices ``ry``/``rx`` are built."""
    # channels as the BATCH dim of the matmuls: [out,CH] @ [c,CH,CW] keeps
    # the 128-lane dim fully utilized (channels-last layout would put c=3
    # in the lanes — measured 40x slower at 512 canvases)
    img = jnp.transpose(canvas_img, (2, 0, 1)).astype(jnp.float32)  # [c,CH,CW]
    y = jnp.einsum("oH,cHW->coW", ry, img, preferred_element_type=jnp.float32)
    y = jnp.einsum("oW,chW->cho", rx, y, preferred_element_type=jnp.float32)
    return jnp.transpose(y, (1, 2, 0))                          # [out,out,c]


def normalize_pixels(y, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                     dtype=jnp.bfloat16):
    """ImageNet-normalize a float32 [0,255]-space image and cast."""
    mean_arr = jnp.asarray(mean, jnp.float32) * 255.0
    std_arr = jnp.asarray(std, jnp.float32) * 255.0
    return ((y - mean_arr) / std_arr).astype(dtype)


def preprocess_image(canvas_img, h, w, out_size: int = 224,
                     resize_short: int = 256,
                     mean=IMAGENET_MEAN, std=IMAGENET_STD,
                     dtype=jnp.bfloat16):
    """One image: canvas uint8 [CH, CW, 3] + true (h, w) -> [out, out, 3]."""
    ch, cw, _ = canvas_img.shape
    (sy, oy), (sx, ox) = _resize_plan(h, w, out_size, resize_short)
    ry = _triangle_weights(ch, out_size, h, sy, oy)             # [out, CH]
    rx = _triangle_weights(cw, out_size, w, sx, ox)             # [out, CW]
    y = apply_resize_weights(canvas_img, ry, rx)
    return normalize_pixels(y, mean, std, dtype)


@functools.partial(
    jax.jit, static_argnames=("out_size", "resize_short", "dtype")
)
def preprocess_batch(canvas, sizes, out_size: int = 224, resize_short: int = 256,
                     dtype=jnp.bfloat16):
    """Batch: canvas uint8 [B, CH, CW, 3], sizes int32 [B, 2] -> [B, out, out, 3]."""
    return jax.vmap(
        lambda img, hw: preprocess_image(
            img, hw[0], hw[1], out_size, resize_short, dtype=dtype
        )
    )(canvas, sizes)


def normalize_only(x_u8, mean=IMAGENET_MEAN, std=IMAGENET_STD, dtype=jnp.bfloat16):
    """Fixed-size path (image already out_size x out_size): dequant+normalize
    — same math as :func:`normalize_pixels` (one definition, not two)."""
    return normalize_pixels(x_u8.astype(jnp.float32), mean, std, dtype)
