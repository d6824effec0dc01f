"""Pallas TPU kernel: fused chain of stride-1 ResNet bottleneck blocks.

Why: profile (scripts/profile_resnet.log) shows stage 1 running AT the HBM
roof (~835 GB/s effective) and stage 2 close behind — every conv round-trips
its activations through HBM. This kernel runs N consecutive stride-1
bottlenecks (1x1 -> 3x3 -> 1x1 + shortcut, folded BN) over one VMEM-resident
row-tile: HBM traffic drops from ~2(3N+1) activation images to read-1 +
write-1, at the cost of recomputing a 2N-row halo per tile.

Layout: NHWC tiles [tile_rows + 2N, W, C] DMA'd from the (pre-padded) input;
1x1 convs are [rows*W, C] x [C, Cm] matmuls on the MXU; the 3x3 runs as 9
shifted [rows*W, Cm] x [Cm, Cm] matmuls accumulated in fp32 — the single
concatenated K=9*Cm deep matmul that WOULD fill the MXU accumulation depth
at Cm=64 does not lower (Mosaic: "offset mismatch on non-concat dimension"
when concatenating shifted views), which is a core reason this kernel
measured SLOWER than XLA's convs (docs/benchmarks.md negative result).

Reference seam: this replaces ``Bottleneck.apply_folded`` chains in
``models/resnet.py`` on the TPU inference path; the training path and
CPU/interpret fallback use the plain XLA convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


from ics_tpu.ops import round_up as _round_up
from ics_tpu.ops import should_interpret as _should_interpret


def pack_chain_weights(blocks_folded, dtype=jnp.bfloat16):
    """Stack a chain's folded weights for the kernel.

    blocks_folded: list of Bottleneck.fold() dicts WITHOUT a downsample
    projection (stride-1 identity blocks only). The 3x3 taps are stacked
    along K into one [9*Cm, Cm] matrix for STORAGE; the kernel slices one
    [Cm, Cm] tap at a time (the concatenated deep matmul doesn't lower —
    see the module docstring; padding Cm to 128 instead was measured 2x
    SLOWER than XLA, it quadruples the mid-conv FLOPs).
    """
    n = len(blocks_folded)
    w1_0 = blocks_folded[0]["cbr1"]["conv"]["w"]  # [1,1,C,Cm]
    c = w1_0.shape[2]
    cm = w1_0.shape[3]

    w1 = np.zeros((n, c, cm), np.float32)
    s1 = np.zeros((n, 1, cm), np.float32)
    b1 = np.zeros((n, 1, cm), np.float32)
    w2 = np.zeros((n, 9 * cm, cm), np.float32)
    s2 = np.zeros((n, 1, cm), np.float32)
    b2 = np.zeros((n, 1, cm), np.float32)
    w3 = np.zeros((n, cm, c), np.float32)
    s3 = np.zeros((n, 1, c), np.float32)
    b3 = np.zeros((n, 1, c), np.float32)
    for j, f in enumerate(blocks_folded):
        assert "down" not in f, "chain kernel takes identity blocks only"
        w1[j] = np.asarray(f["cbr1"]["conv"]["w"], np.float32)[0, 0]
        s1[j, 0] = np.asarray(f["cbr1"]["bnf"]["scale"], np.float32)
        b1[j, 0] = np.asarray(f["cbr1"]["bnf"]["bias"], np.float32)
        k2 = np.asarray(f["cbr2"]["conv"]["w"], np.float32)  # [3,3,Cm,Cm]
        w2[j] = k2.reshape(9 * cm, cm)
        s2[j, 0] = np.asarray(f["cbr2"]["bnf"]["scale"], np.float32)
        b2[j, 0] = np.asarray(f["cbr2"]["bnf"]["bias"], np.float32)
        w3[j] = np.asarray(f["cbr3"]["conv"]["w"], np.float32)[0, 0]
        s3[j, 0] = np.asarray(f["cbr3"]["bnf"]["scale"], np.float32)
        b3[j, 0] = np.asarray(f["cbr3"]["bnf"]["bias"], np.float32)
    # arrays only: this dict rides inside the folded pytree through
    # device_put/cast; statics (n, C) are recovered from shapes
    return {
        "w1": jnp.asarray(w1, dtype), "s1": jnp.asarray(s1), "b1": jnp.asarray(b1),
        "w2": jnp.asarray(w2, dtype), "s2": jnp.asarray(s2), "b2": jnp.asarray(b2),
        "w3": jnp.asarray(w3, dtype), "s3": jnp.asarray(s3), "b3": jnp.asarray(b3),
    }


def _chain_kernel(xp_hbm, w1, s1, b1, w2, s2, b2, w3, s3, b3, out_ref,
                  xbuf, sem, *, n: int, th: int, w_px: int, h: int,
                  true_w: int):
    """One grid step: rows [i*th, i*th + th + 2n) of padded image b."""
    bidx = pl.program_id(0)
    i = pl.program_id(1)
    rows_in = th + 2 * n

    dma = pltpu.make_async_copy(
        xp_hbm.at[bidx, pl.ds(i * th, rows_in)], xbuf, sem
    )
    dma.start()
    dma.wait()

    cur = xbuf[:]                                 # [rows_in, W, C] bf16
    dtype = cur.dtype
    cm = w1.shape[2]
    for j in range(n):
        rows = rows_in - 2 * j                    # rows entering block j
        flat = cur.reshape(rows * w_px, cur.shape[-1])
        # 1x1 reduce: [rows*W, C] x [C, Cm] on the MXU
        a = jnp.dot(flat, w1[j], preferred_element_type=jnp.float32)
        a = jnp.maximum(a * s1[j] + b1[j], 0.0)
        # SAME-conv semantics: the 3x3 must see ZEROS outside the image,
        # but out-of-image rows/cols of ``a`` are relu(b1) (the input pad
        # is zero, the bias isn't). Mask them off; global padded row of
        # a[r] is i*th + j + r; image rows live at [n, h + n). Columns
        # past ``true_w`` exist only because Mosaic requires the sublane
        # (W) dim aligned to 8 — mask them the same way.
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows * w_px, 1), 0)
        row_g = idx // w_px + i * th + j
        ok = (row_g >= n) & (row_g < h + n)
        if true_w != w_px:
            ok = ok & ((idx % w_px) < true_w)
        a = jnp.where(ok, a, 0.0).astype(dtype)
        a3 = a.reshape(rows, w_px, cm)
        # 3x3 SAME as 9 shifted 2D matmuls accumulated in fp32 (the vertical
        # taps consume one halo row per side). With Cm >= 128 each tap fills
        # the MXU; a single concatenated K=9*Cm matmul would be better for
        # Cm=64 but Mosaic can't concat shifted views ("offset mismatch on
        # non-concat dimension").
        aw = jnp.pad(a3, ((0, 0), (1, 1), (0, 0)))  # zero-pad width
        cmid = jnp.zeros(((rows - 2) * w_px, cm), jnp.float32)
        for tap in range(9):
            dy, dx = divmod(tap, 3)
            shifted = aw[dy:dy + rows - 2, dx:dx + w_px, :]
            cmid += jnp.dot(
                shifted.reshape((rows - 2) * w_px, cm),
                w2[j, tap * cm:(tap + 1) * cm],
                preferred_element_type=jnp.float32,
            )
        cmid = jnp.maximum(cmid * s2[j] + b2[j], 0.0).astype(dtype)
        # 1x1 expand + shortcut + relu
        y = jnp.dot(cmid, w3[j], preferred_element_type=jnp.float32)
        y = y * s3[j] + b3[j]
        shortcut = flat[w_px:(rows - 1) * w_px].astype(jnp.float32)
        cur = jnp.maximum(y + shortcut, 0.0).astype(dtype)
        cur = cur.reshape(rows - 2, w_px, cur.shape[-1])
    out_ref[0] = cur


@functools.partial(
    jax.jit, static_argnames=("n", "th", "true_w", "interpret")
)
def _chain_call(xp, packed_tuple, n, th, true_w, interpret):
    (w1, s1, b1, w2, s2, b2, w3, s3, b3) = packed_tuple
    b, hp, w_px, c = xp.shape
    h = hp - 2 * n
    grid = (b, h // th)

    def spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda bi, ti: (0,) * arr.ndim,
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _chain_kernel, n=n, th=th, w_px=w_px, h=h, true_w=true_w
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w_px, c), xp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
            spec(w1), spec(s1), spec(b1),
            spec(w2), spec(s2), spec(b2),
            spec(w3), spec(s3), spec(b3),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_px, c), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * n, w_px, c), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1, s1, b1, w2, s2, b2, w3, s3, b3)


def fused_bottleneck_chain(x, packed, tile_rows: int | None = None,
                           interpret: bool | None = None):
    """Run a chain of stride-1 bottlenecks over x [B, H, W, C] (bf16).

    W is padded to a multiple of 8 (Mosaic sublane tiling) and cropped on
    the way out; the kernel masks the padded columns so SAME-conv
    semantics hold — this is what lets the kernel run on stages 2-4
    (W = 28/14/7), not just stage 1 (W = 56).
    """
    n = packed["w1"].shape[0]
    b, h, w_px, c = x.shape
    true_w = w_px
    wp = _round_up(w_px, 8)
    if tile_rows is None:
        from ics_tpu.ops import pick_tile_rows

        tile_rows = pick_tile_rows(h)
    assert h % tile_rows == 0, (h, tile_rows)
    xp = jnp.pad(x, ((0, 0), (n, n), (0, wp - w_px), (0, 0)))
    packed_tuple = (
        packed["w1"], packed["s1"], packed["b1"],
        packed["w2"], packed["s2"], packed["b2"],
        packed["w3"], packed["s3"], packed["b3"],
    )
    out = _chain_call(
        xp, packed_tuple, n, tile_rows, true_w,
        _should_interpret() if interpret is None else interpret,
    )
    return out[:, :, :true_w, :] if wp != true_w else out
