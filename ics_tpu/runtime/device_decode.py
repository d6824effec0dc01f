"""Batched decode-on-TPU ingestion (north-star JPEG path).

Host: Huffman entropy decode only (``imgcodec.jpeg_coefficients``) — ~5-10x
cheaper than a full host decode. Device: one compiled graph runs
dequant -> iDCT matmuls -> chroma upsample -> YCbCr->RGB -> resize/crop/
normalize -> model forward for the whole batch.

Batches are staged on fixed block-canvases (static XLA shapes); 4:2:0 is
the served fast path (the dominant wild format); other samplings fall back
to the host decoder upstream.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.ops.jpeg_decode import idct_plane, upsample_chroma, ycbcr_to_rgb

# luma block canvas: 64x64 blocks = 512x512 px (matches the pixel staging
# canvas); chroma canvas is half that for 4:2:0
LUMA_BLOCKS = 64


def stage_coefficient_batch(
    coeff_list: Sequence,
    luma_blocks: int = LUMA_BLOCKS,
) -> Optional[dict]:
    """Stage a batch of 4:2:0 JpegCoefficients onto fixed block canvases.

    Returns None if any image isn't 3-component 4:2:0 or exceeds the canvas
    (callers fall back to the host-decode path for those).
    """
    n = len(coeff_list)
    cb_blocks = luma_blocks // 2
    y = np.zeros((n, luma_blocks, luma_blocks, 64), np.int16)
    cb = np.zeros((n, cb_blocks, cb_blocks, 64), np.int16)
    cr = np.zeros((n, cb_blocks, cb_blocks, 64), np.int16)
    yq = np.zeros((n, 64), np.uint16)
    cq = np.zeros((n, 64), np.uint16)
    rq = np.zeros((n, 64), np.uint16)
    sizes = np.zeros((n, 2), np.int32)
    for i, co in enumerate(coeff_list):
        if co is None or len(co.components) != 3:
            return None
        yc, cbc, crc = co.components
        if (
            yc["h_samp"] != 2 * cbc["h_samp"]
            or yc["v_samp"] != 2 * cbc["v_samp"]
            or cbc["h_samp"] != crc["h_samp"]
        ):
            return None
        ybh, ybw = yc["coeffs"].shape[:2]
        cbh, cbw = cbc["coeffs"].shape[:2]
        if cbc["v_samp"] != crc["v_samp"]:
            return None
        if ybh > luma_blocks or ybw > luma_blocks:
            return None
        if cbh > cb_blocks or cbw > cb_blocks:
            return None
        y[i, :ybh, :ybw] = yc["coeffs"]
        cb[i, :cbh, :cbw] = cbc["coeffs"]
        cr[i, :cbh, :cbw] = crc["coeffs"]
        # edge-replicate chroma DC into the padding blocks: the fancy
        # upsampler reads one neighbor past the image edge, and neutral-grey
        # padding would pull border chroma 25% toward grey (lane divergence
        # vs the host decoder). Replicating the edge blocks' DC keeps the
        # neighbor at the edge value.
        if cbh < cb_blocks:
            cb[i, cbh, :cbw, 0] = cbc["coeffs"][cbh - 1, :, 0]
            cr[i, cbh, :cbw, 0] = crc["coeffs"][cbh - 1, :, 0]
        if cbw < cb_blocks:
            cb[i, :cbh, cbw, 0] = cbc["coeffs"][:, cbw - 1, 0]
            cr[i, :cbh, cbw, 0] = crc["coeffs"][:, cbw - 1, 0]
        yq[i] = yc["quant"]
        cq[i] = cbc["quant"]
        rq[i] = crc["quant"]
        sizes[i] = (co.height, co.width)
    return {
        "y": y, "cb": cb, "cr": cr,
        "yq": yq, "cq": cq, "rq": rq,
        "sizes": sizes,
    }


def decode_batch_to_canvas(staged: dict, dtype=jnp.float32):
    """Staged coefficient batch -> RGB canvas [B, S, S, 3] (S = 8*blocks).

    The padded regions decode to garbage pixels; downstream preproc masks
    them out via the true ``sizes`` (same contract as the pixel canvas)."""

    def one(y, yq, cb, cq, cr, rq):
        yp = idct_plane(y, yq)
        cbp = upsample_chroma(idct_plane(cb, cq), 2, 2)
        crp = upsample_chroma(idct_plane(cr, rq), 2, 2)
        return ycbcr_to_rgb(yp, cbp, crp)

    rgb = jax.vmap(one)(
        staged["y"], staged["yq"], staged["cb"], staged["cq"],
        staged["cr"], staged["rq"],
    )
    return rgb.astype(dtype)


def make_fused_decode_infer_step(model, folded, spec, dtype=jnp.bfloat16,
                                 mesh=None, top_k: int = 5):
    """Returns jitted step: coefficient batch -> (top_idx, top_scores).

    The entire pipeline after entropy decode is ONE XLA graph on device.
    With a mesh, every input is batch-sharded over 'data' so iDCT matmuls,
    upsample and the forward all run data-parallel (params stay replicated
    via the captured ``folded``'s placement).
    """
    from ics_tpu.ops.preproc import preprocess_batch

    def step(y, yq, cb, cq, cr, rq, sizes):
        staged = {"y": y, "yq": yq, "cb": cb, "cq": cq, "cr": cr, "rq": rq}
        canvas = decode_batch_to_canvas(staged, dtype=jnp.float32)
        x = preprocess_batch(
            canvas, sizes, out_size=spec.image_size,
            resize_short=spec.resize_short, dtype=dtype,
        )
        logits = model.apply_folded(folded, x).astype(jnp.float32)
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
