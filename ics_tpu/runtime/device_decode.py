"""Batched decode-on-TPU ingestion (north-star JPEG path).

Host: Huffman entropy decode only (``imgcodec.jpeg_coefficients``) — ~5-10x
cheaper than a full host decode. Device: one compiled graph runs
dequant -> iDCT matmuls -> chroma upsample -> YCbCr->RGB -> resize/crop/
normalize -> model forward for the whole batch.

Batches are staged on fixed block-canvases (static XLA shapes), one lane
per (sampling mode, luma bucket): 4:2:0 / 4:2:2 / 4:4:4 / grayscale, luma
canvases of 64 blocks (<=512 px, the common case) and 128 blocks
(<=1024 px). Grayscale stages as 4:4:4 with zeroed chroma coefficients —
dequant gives a flat 128 plane, i.e. exactly neutral Cb/Cr. Anything else
(exotic samplings, >1024 px) falls back to the host decoder upstream.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.ops.jpeg_decode import idct_plane, upsample_chroma, ycbcr_to_rgb

# default luma block canvas: 64x64 blocks = 512x512 px (matches the pixel
# staging canvas); the wide lane doubles it
LUMA_BLOCKS = 64
LUMA_BUCKETS = (64, 128)

# mode -> luma (h_samp, v_samp) relative to chroma
MODE_RATIOS = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def classify_coefficients(co, luma_buckets: Sequence[int] = LUMA_BUCKETS):
    """-> (mode, luma_blocks) for the batched device lane, or None.

    mode in {"420", "422", "444", "gray"}; luma_blocks is the smallest
    bucket that fits the image.
    """
    if co is None or co.width < 1 or co.height < 1:
        return None
    if len(co.components) == 1:
        mode = "gray"
    elif len(co.components) == 3:
        yc, cbc, crc = co.components
        if (
            cbc["h_samp"] != crc["h_samp"]
            or cbc["v_samp"] != crc["v_samp"]
            or yc["h_samp"] % cbc["h_samp"]
            or yc["v_samp"] % cbc["v_samp"]
        ):
            return None
        ratio = (yc["h_samp"] // cbc["h_samp"], yc["v_samp"] // cbc["v_samp"])
        mode = {v: k for k, v in MODE_RATIOS.items()}.get(ratio)
        if mode is None:
            return None
    else:
        return None
    ybh, ybw = co.components[0]["coeffs"].shape[:2]
    for bucket in sorted(luma_buckets):
        if ybh <= bucket and ybw <= bucket:
            return mode, bucket
    return None


def _chroma_canvas(mode: str, luma_blocks: int) -> tuple[int, int]:
    hr, vr = MODE_RATIOS["444" if mode == "gray" else mode]
    return luma_blocks // vr, luma_blocks // hr


def stage_coefficient_batch(
    coeff_list: Sequence,
    luma_blocks: int = LUMA_BLOCKS,
    mode: str = "420",
) -> Optional[dict]:
    """Stage a batch of same-mode JpegCoefficients onto fixed block canvases.

    Returns None if any image doesn't match ``mode`` or exceeds the canvas
    (callers route by classify_coefficients, so this is defense in depth).
    """
    n = len(coeff_list)
    cbv, cbh_ = _chroma_canvas(mode, luma_blocks)
    y = np.zeros((n, luma_blocks, luma_blocks, 64), np.int16)
    cb = np.zeros((n, cbv, cbh_, 64), np.int16)
    cr = np.zeros((n, cbv, cbh_, 64), np.int16)
    yq = np.zeros((n, 64), np.uint16)
    cq = np.zeros((n, 64), np.uint16)
    rq = np.zeros((n, 64), np.uint16)
    sizes = np.zeros((n, 2), np.int32)
    for i, co in enumerate(coeff_list):
        cls = classify_coefficients(co, luma_buckets=(luma_blocks,))
        if cls is None or cls[0] != mode:
            return None
        yc = co.components[0]
        ybh, ybw = yc["coeffs"].shape[:2]
        y[i, :ybh, :ybw] = yc["coeffs"]
        yq[i] = yc["quant"]
        sizes[i] = (co.height, co.width)
        if mode == "gray":
            continue  # zero chroma coeffs + zero quant = neutral 128 plane
        cbc, crc = co.components[1], co.components[2]
        ch, cw = cbc["coeffs"].shape[:2]
        if ch > cbv or cw > cbh_:
            return None
        cb[i, :ch, :cw] = cbc["coeffs"]
        cr[i, :ch, :cw] = crc["coeffs"]
        # edge-replicate chroma DC into the padding blocks: the fancy
        # upsampler reads one neighbor past the image edge, and neutral-grey
        # padding would pull border chroma 25% toward grey (lane divergence
        # vs the host decoder). Replicating the edge blocks' DC keeps the
        # neighbor at the edge value.
        if ch < cbv:
            cb[i, ch, :cw, 0] = cbc["coeffs"][ch - 1, :, 0]
            cr[i, ch, :cw, 0] = crc["coeffs"][ch - 1, :, 0]
        if cw < cbh_:
            cb[i, :ch, cw, 0] = cbc["coeffs"][:, cw - 1, 0]
            cr[i, :ch, cw, 0] = crc["coeffs"][:, cw - 1, 0]
        if ch < cbv and cw < cbh_:
            # the CORNER block too: without it the bottom-right image
            # corner's right-neighbor column decoded to neutral grey and
            # pulled corner chroma toward grey — the exact divergence
            # this replication exists to prevent (self-review r3)
            cb[i, ch, cw, 0] = cbc["coeffs"][ch - 1, cw - 1, 0]
            cr[i, ch, cw, 0] = crc["coeffs"][ch - 1, cw - 1, 0]
        cq[i] = cbc["quant"]
        rq[i] = crc["quant"]
    return {
        "y": y, "cb": cb, "cr": cr,
        "yq": yq, "cq": cq, "rq": rq,
        "sizes": sizes,
    }


def decode_batch_to_canvas(staged: dict, dtype=jnp.float32,
                           mode: str = "420"):
    """Staged coefficient batch -> RGB canvas [B, S, S, 3] (S = 8*blocks).

    The padded regions decode to garbage pixels; downstream preproc masks
    them out via the true ``sizes`` (same contract as the pixel canvas)."""
    hr, vr = MODE_RATIOS["444" if mode == "gray" else mode]

    def one(y, yq, cb, cq, cr, rq):
        yp = idct_plane(y, yq)
        cbp = upsample_chroma(idct_plane(cb, cq), hr, vr)
        crp = upsample_chroma(idct_plane(cr, rq), hr, vr)
        return ycbcr_to_rgb(yp, cbp, crp)

    rgb = jax.vmap(one)(
        staged["y"], staged["yq"], staged["cb"], staged["cq"],
        staged["cr"], staged["rq"],
    )
    return rgb.astype(dtype)


def make_fused_decode_infer_step(model, folded, spec, dtype=jnp.bfloat16,
                                 mesh=None, top_k: int = 5,
                                 mode: str = "420",
                                 multi_label: bool = False):
    """Returns jitted step: coefficient batch -> (top_idx, top_scores).

    The entire pipeline after entropy decode is ONE XLA graph on device.
    With a mesh, every input is batch-sharded over 'data' so iDCT matmuls,
    upsample and the forward all run data-parallel (params stay replicated
    via the captured ``folded``'s placement).
    """
    from ics_tpu.ops.preproc import preprocess_batch

    def step(y, yq, cb, cq, cr, rq, sizes):
        staged = {"y": y, "yq": yq, "cb": cb, "cq": cq, "cr": cr, "rq": rq}
        canvas = decode_batch_to_canvas(staged, dtype=jnp.float32, mode=mode)
        x = preprocess_batch(
            canvas, sizes, out_size=spec.image_size,
            resize_short=spec.resize_short, dtype=dtype,
        )
        logits = model.apply_folded(folded, x).astype(jnp.float32)
        if multi_label:
            probs = jax.nn.sigmoid(logits)  # independent per-class scores
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        top_scores, top_idx = jax.lax.top_k(probs, top_k)
        return top_idx, top_scores

    if mesh is not None:
        from ics_tpu.parallel.mesh import batch_sharding

        def sh(ndim):
            return batch_sharding(mesh, ndim)

        return jax.jit(
            step,
            in_shardings=(sh(4), sh(2), sh(4), sh(2), sh(4), sh(2), sh(2)),
            out_shardings=(sh(2), sh(2)),
        )
    return jax.jit(step)
