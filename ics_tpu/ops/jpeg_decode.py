"""On-device JPEG decode back end (SURVEY §7.2 hard-part 1).

The host performs only the irreducibly serial Huffman entropy decode
(``ics_tpu.native.imgcodec.jpeg_coefficients``); everything after runs on
the TPU as one compiled graph:

  dequant (elementwise) -> 8x8 iDCT as two MXU matmuls per block
  -> block reassembly -> fancy (triangular) chroma upsampling
  -> YCbCr -> RGB

iDCT-as-matmul is the TPU-shaped formulation: for a block F,
f = Bᵀ F B with the orthonormal DCT-II basis B — batched over all blocks
of a plane it is two large matmuls, exactly what the MXU wants.

Supports baseline/progressive JPEGs with 4:4:4, 4:2:2 and 4:2:0 sampling
(the overwhelming majority in the wild) and grayscale.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _dct_basis() -> np.ndarray:
    """B[u, x] = alpha(u) cos((2x+1) u pi / 16), shape [8, 8]."""
    B = np.zeros((8, 8), np.float32)
    for u in range(8):
        alpha = math.sqrt(0.125) if u == 0 else math.sqrt(0.25)
        for x in range(8):
            B[u, x] = alpha * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return B


def idct_plane(coeffs, quant):
    """coeffs int16/float [bh, bw, 64] (natural order) + quant [64]
    -> pixel plane [bh*8, bw*8] float32 (level-shifted, unclipped)."""
    bh, bw = coeffs.shape[0], coeffs.shape[1]
    F = (coeffs.astype(jnp.float32) * quant.astype(jnp.float32)).reshape(
        bh, bw, 8, 8
    )
    B = jnp.asarray(_dct_basis())
    # f = B^T F B, batched over blocks — two MXU matmuls
    f = jnp.einsum("ux,hwuv,vy->hwxy", B, F, B,
                   preferred_element_type=jnp.float32)
    plane = f.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return plane + 128.0


def _fancy_upsample_axis(x, axis: int):
    """libjpeg 'fancy' (triangular) 2x upsampling along one axis:
    out[2i] = (3*x[i] + x[i-1]) / 4, out[2i+1] = (3*x[i] + x[i+1]) / 4,
    edges clamped."""
    prev = jnp.roll(x, 1, axis=axis)
    nxt = jnp.roll(x, -1, axis=axis)
    # clamp edges (roll wraps; overwrite the wrapped slices)
    idx_first = [slice(None)] * x.ndim
    idx_first[axis] = slice(0, 1)
    idx_last = [slice(None)] * x.ndim
    idx_last[axis] = slice(-1, None)
    prev = prev.at[tuple(idx_first)].set(x[tuple(idx_first)])
    nxt = nxt.at[tuple(idx_last)].set(x[tuple(idx_last)])
    even = (3.0 * x + prev) * 0.25
    odd = (3.0 * x + nxt) * 0.25
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return out.reshape(new_shape)


def upsample_chroma(plane, h_factor: int, v_factor: int):
    """Upsample by 2x per requested axis using the triangular filter
    (matches libjpeg/PIL 'fancy' upsampling within rounding)."""
    out = plane
    if v_factor == 2:
        out = _fancy_upsample_axis(out, 0)
    if h_factor == 2:
        out = _fancy_upsample_axis(out, 1)
    return out


def ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "samp", "out_dtype"),
)
def decode_from_coefficients(
    y_coeffs, y_quant, cb_coeffs, cb_quant, cr_coeffs, cr_quant,
    width: int, height: int, samp: tuple = (2, 2), out_dtype=jnp.uint8,
):
    """Device-side JPEG back end for one YCbCr image.

    ``samp`` is the luma (h_samp, v_samp) relative to chroma: (1,1)=4:4:4,
    (2,1)=4:2:2, (2,2)=4:2:0. Coefficient arrays are [bh, bw, 64].
    Returns RGB [height, width, 3] in ``out_dtype``.
    """
    y = idct_plane(y_coeffs, y_quant)
    cb = idct_plane(cb_coeffs, cb_quant)
    cr = idct_plane(cr_coeffs, cr_quant)
    cb = upsample_chroma(cb, samp[0], samp[1])
    cr = upsample_chroma(cr, samp[0], samp[1])
    # all planes now on the (padded) luma grid; crop to true size
    y = y[:height, :width]
    cb = cb[:height, :width]
    cr = cr[:height, :width]
    return ycbcr_to_rgb(y, cb, cr).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("width", "height", "out_dtype"))
def decode_grayscale_from_coefficients(
    y_coeffs, y_quant, width: int, height: int, out_dtype=jnp.uint8
):
    y = idct_plane(y_coeffs, y_quant)[:height, :width]
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    return jnp.broadcast_to(y[..., None], (height, width, 3)).astype(out_dtype)


def decode_jpeg_device(data: bytes, out_dtype=jnp.uint8):
    """bytes -> RGB on device, or None when unsupported (caller falls back
    to full host decode)."""
    from ics_tpu.native import imgcodec

    co = imgcodec.jpeg_coefficients(data)
    if co is None:
        return None
    if co.width < 1 or co.height < 1:
        return None
    if len(co.components) == 1:
        c = co.components[0]
        return decode_grayscale_from_coefficients(
            c["coeffs"], c["quant"], co.width, co.height, out_dtype
        )
    if len(co.components) != 3:
        return None
    yc, cbc, crc = co.components
    # divisibility FIRST: libjpeg allows samp factors 1-4, so 3/2 floor-
    # divides to 1 and would masquerade as 4:4:4 with undersized chroma
    # planes — a shape error inside jit instead of the documented None
    # fallback (classify_coefficients does the same check; self-review r3)
    if (yc["h_samp"] % cbc["h_samp"]) or (yc["v_samp"] % cbc["v_samp"]):
        return None
    h_ratio = yc["h_samp"] // cbc["h_samp"]
    v_ratio = yc["v_samp"] // cbc["v_samp"]
    if (h_ratio, v_ratio) not in ((1, 1), (2, 1), (2, 2)):
        return None
    if cbc["h_samp"] != crc["h_samp"] or cbc["v_samp"] != crc["v_samp"]:
        return None
    return decode_from_coefficients(
        yc["coeffs"], yc["quant"], cbc["coeffs"], cbc["quant"],
        crc["coeffs"], crc["quant"],
        width=co.width, height=co.height, samp=(h_ratio, v_ratio),
        out_dtype=out_dtype,
    )
