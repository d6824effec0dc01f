"""Pallas TPU kernel: 7x7 (any odd k) depthwise convolution, NHWC.

Why: XLA lowers `feature_group_count=C` convs far off the HBM roofline —
measured 1.18 ms for ConvNeXt-T's stage-1 dw7x7 (b128, 56x56x96) where
pure activation traffic costs ~0.19 ms at 819 GB/s. Depthwise work is
elementwise per tap (VPU), so the right shape is: row-tile resident in
VMEM, k*k shifted multiply-accumulates, one read + one write of HBM.

Layout: [rows, Wp, C] — C on lanes, W on sublanes. Width shifts use
static ROLLS over the full padded width (unaligned sublane slices
trigger Mosaic relayouts that dominate runtime — see ``_dw_kernel``);
wrapped columns land past ``true_w`` and are cropped by the caller. Row
shifts slice the untiled outer dim.

NOT YET WIRED into a model (the honest-status pattern of
``pallas_preproc.py``): ConvNeXtBlock.dwconv and the EfficientNet
depthwise stages still run XLA's grouped conv — swapping them in is the
intended seam, gated on an on-chip A/B win for the folded serving path
(docs/benchmarks.md records the kernel-level numbers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from ics_tpu.ops import round_up as _round_up
from ics_tpu.ops import should_interpret as _should_interpret


def _dw_kernel(xp_hbm, w_ref, b_ref, out_ref, xbuf, sem, *,
               k: int, th: int, wp: int, true_w: int, has_bias: bool):
    """One grid step: output rows [i*th, (i+1)*th) of image b.

    xp_hbm is padded by k//2 rows top/bottom and k//2 + alignment cols.
    """
    bidx = pl.program_id(0)
    i = pl.program_id(1)
    halo = k - 1

    dma = pltpu.make_async_copy(
        xp_hbm.at[bidx, pl.ds(i * th, th + halo)], xbuf, sem
    )
    dma.start()
    dma.wait()

    # dx shifts use static ROLLS over the full padded width (aligned
    # loads only — unaligned sublane slices trigger Mosaic relayouts that
    # dominate runtime); wrapped columns land past true_w and are cropped
    # by the caller. dy shifts slice the untiled outer dim (free).
    acc = jnp.zeros((th, wp, xbuf.shape[-1]), jnp.float32)
    for dy in range(k):
        row_view = xbuf[dy:dy + th]                   # [th, wp, C]
        for dx in range(k):
            tap = w_ref[dy * k + dx]                  # [1, C]
            shifted = (
                row_view if dx == 0 else jnp.roll(row_view, -dx, axis=1)
            )
            acc += shifted.astype(jnp.float32) * tap.astype(jnp.float32)
    if has_bias:
        acc += b_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "th", "true_w", "has_bias",
                                             "interpret"))
def _dw_call(xp, w, b, k, th, true_w, has_bias, interpret):
    bsz, hp, wp, c = xp.shape
    halo = k - 1
    h = hp - halo
    grid = (bsz, h // th)

    def wspec(arr):
        return pl.BlockSpec(
            arr.shape, lambda bi, ti: (0,) * arr.ndim,
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _dw_kernel, k=k, th=th, wp=wp, true_w=true_w, has_bias=has_bias
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wp, c), xp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp stays in HBM
            wspec(w), wspec(b),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wp, c), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + halo, wp, c), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w, b)


def depthwise_conv(x, w, b=None, tile_rows: int | None = None,
                   interpret: bool | None = None):
    """SAME odd-k depthwise conv: x [B,H,W,C], w [k,k,C] (or [k,k,C,1]),
    optional bias [C]. Stride 1. Returns [B,H,W,C] in x.dtype."""
    if w.ndim == 4:
        # HWIO depthwise: [k,k,1,C] (this repo's Conv2D) or [k,k,C,1]
        w = w[:, :, 0, :] if w.shape[2] == 1 else w[..., 0]
    k = int(w.shape[0])
    assert w.shape[0] == w.shape[1] and k % 2 == 1, w.shape
    bsz, h, w_px, c = x.shape
    pad = k // 2
    halo = k - 1
    # W padding: pad cols on each side for SAME, then align so that the
    # widest static slice (dx = k-1) stays in range. C pads to a lane
    # multiple (Mosaic: HBM DMA slices must align to the 128 tiling).
    wp = _round_up(w_px + halo, 8)
    cp = _round_up(c, 128)
    xp = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, wp - w_px - pad), (0, cp - c))
    )
    if tile_rows is None:
        from ics_tpu.ops import pick_tile_rows

        tile_rows = pick_tile_rows(h)
    assert h % tile_rows == 0, (h, tile_rows)
    wk = jnp.pad(
        w.reshape(k * k, 1, c), ((0, 0), (0, 0), (0, cp - c))
    ).astype(x.dtype)
    # lane layout wants [taps, 1, C]; kernel indexes [tap] -> [1, C]
    has_bias = b is not None
    bk = jnp.pad(
        (b if has_bias else jnp.zeros((c,), x.dtype)).reshape(1, c),
        ((0, 0), (0, cp - c)),
    ).astype(x.dtype)
    out = _dw_call(
        xp, wk, bk, k, tile_rows, w_px, has_bias,
        _should_interpret() if interpret is None else interpret,
    )
    return out[:, :, :w_px, :c]
