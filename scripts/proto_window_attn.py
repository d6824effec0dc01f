"""Prototype: fused window-attention Pallas kernel for the Swin family.

Hypothesis (new evidence, not a re-attempt of the documented negatives):
Swin's measured bottleneck is the materialized [B*nW, H, ww, ww] score
tensor's HBM round-trip between the two attention einsums
(scripts/profile_swin.log: 87% of swin_tiny step time pre-bf16-scores;
docs/benchmarks.md Swin analysis). The shipped mitigation keeps scores in
bf16 (+40%). A bespoke kernel that computes QK^T + bias + mask + softmax
+ PV entirely in VMEM removes that tensor from HBM altogether — unlike
the flash kernel (whose 128-token blocks only add padding waste at ww=49,
the documented negative), this kernel is shaped FOR the 49-token windows.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_window_attn.py
CPU check only:
    JAX_PLATFORMS=cpu ... python scripts/proto_window_attn.py --cpu
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# fused kernel
# --------------------------------------------------------------------------

def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, heads: int):
    """Blocks: q/k/v/o [T, H, ww, hd]; bias [H, ww, ww]; mask [T, ww, ww].

    The whole score tensor for this tile lives in VMEM/registers — nothing
    but q/k/v in and o out touches HBM."""
    t, h, ww, hd = q_ref.shape
    q = q_ref[...].reshape(t * h, ww, hd)
    k = k_ref[...].reshape(t * h, ww, hd)
    v = v_ref[...].reshape(t * h, ww, hd)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [T*H, ww, ww] f32
    s = s.reshape(t, h, ww, ww)
    s = s + bias_ref[...][None]
    s = s + mask_ref[...][:, None]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = p.astype(v.dtype).reshape(t * h, ww, ww)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.reshape(t, h, ww, hd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_window_attention(q, k, v, bias, mask, tile: int = 16,
                            interpret: bool = False):
    """q/k/v [bn, H, ww, hd] (bn = B*nW, image-major), bias [H, ww, ww],
    mask [nW, ww, ww] -> [bn, H, ww, hd]. q pre-scaled."""
    bn, h, ww, hd = q.shape
    n_w = mask.shape[0]
    tile = min(tile, n_w)
    assert bn % tile == 0 and n_w % tile == 0, (bn, n_w, tile)
    grid = (bn // tile,)
    mask_blocks = n_w // tile

    def qkv_spec():
        return pl.BlockSpec(
            (tile, h, ww, hd), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_kernel, heads=h),
        out_shape=jax.ShapeDtypeStruct((bn, h, ww, hd), q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec(), qkv_spec(), qkv_spec(),
            pl.BlockSpec((h, ww, ww), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # bn is image-major, so tile i covers consecutive windows
            # (i*tile .. i*tile+tile) % nW of one image
            pl.BlockSpec((tile, ww, ww), lambda i: (i % mask_blocks, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec(),
        interpret=interpret,
    )(q, k, v, bias, mask)


# --------------------------------------------------------------------------
# XLA reference (the shipped WindowAttention math, post-qkv)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("score_dtype_is_input",))
def xla_window_attention(q, k, v, bias, mask, score_dtype_is_input=True):
    bn, h, ww, hd = q.shape
    n_w = mask.shape[0]
    score_dtype = q.dtype if score_dtype_is_input else jnp.float32
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=score_dtype)
    attn = attn + bias.astype(score_dtype)[None]
    attn = attn.reshape(bn // n_w, n_w, h, ww, ww)
    attn = attn + mask.astype(score_dtype)[:, None]
    attn = attn.reshape(bn, h, ww, ww)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


# --------------------------------------------------------------------------
# XLA window packing: pairs of windows as one 98-token super-window.
# QK^T lane fill doubles (49 -> 98 of 128); the cross-window quadrants are
# masked to -1e4, so post-softmax cross probabilities are EXACTLY 0 and the
# PV dot needs no unpacking trick. Score tensor grows 2x (98^2 per pair vs
# 2*49^2) — betting matmul efficiency beats the extra bf16 traffic.
# --------------------------------------------------------------------------

def build_packed_mask(mask, pack: int = 2):
    """[nW, ww, ww] additive mask -> [nW/pack, pack*ww, pack*ww] with
    -1e4 cross-window quadrants (numpy, build-time constant)."""
    n_w, ww, _ = mask.shape
    m = np.full((n_w // pack, pack * ww, pack * ww), -1e4, np.float32)
    grouped = np.asarray(mask).reshape(n_w // pack, pack, ww, ww)
    for p in range(pack):
        sl = slice(p * ww, (p + 1) * ww)
        m[:, sl, sl] = grouped[:, p]
    return jnp.asarray(m)


@functools.partial(jax.jit, static_argnames=("pack",))
def xla_packed_window_attention(q, k, v, bias, packed_mask, pack: int = 2):
    """q/k/v [bn, H, ww, hd] image-major -> same, via pack-window dots."""
    bn, h, ww, hd = q.shape
    n_pairs = packed_mask.shape[0]  # nW // pack
    qp = q.reshape(bn // pack, pack, h, ww, hd).transpose(0, 2, 1, 3, 4)
    kp = k.reshape(bn // pack, pack, h, ww, hd).transpose(0, 2, 1, 3, 4)
    vp = v.reshape(bn // pack, pack, h, ww, hd).transpose(0, 2, 1, 3, 4)
    qp = qp.reshape(bn // pack, h, pack * ww, hd)
    kp = kp.reshape(bn // pack, h, pack * ww, hd)
    vp = vp.reshape(bn // pack, h, pack * ww, hd)
    score_dtype = q.dtype
    attn = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                      preferred_element_type=score_dtype)
    # bias tiles over the pack diagonal; off-diag is masked anyway, so a
    # full [pack*ww, pack*ww] tile of the per-window bias is fine
    bias_t = jnp.tile(bias.astype(score_dtype), (1, pack, pack))
    attn = attn + bias_t[None]
    attn = attn.reshape(bn // pack // n_pairs, n_pairs, h,
                        pack * ww, pack * ww)
    attn = attn + packed_mask.astype(score_dtype)[:, None]
    attn = attn.reshape(bn // pack, h, pack * ww, pack * ww)
    attn = jax.nn.softmax(attn, axis=-1).astype(vp.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
    out = out.reshape(bn // pack, h, pack, ww, hd).transpose(0, 2, 1, 3, 4)
    return out.reshape(bn, h, ww, hd)


# --------------------------------------------------------------------------
# bench harness: on-device chained fori_loop (tunnel-immune; see
# ics_tpu/runtime/benchmark.py for the pattern)
# --------------------------------------------------------------------------

def bench(fn, args, iters: int = 50) -> float:
    @jax.jit
    def chained(n, *args):
        def body(_, carry):
            bump = (carry > 1e30).astype(args[0].dtype)
            out = fn(args[0] + bump, *args[1:])
            return out.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    np.asarray(chained(2, *args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chained(iters, *args))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3  # ms per call


def stage_shapes(batch: int):
    # swin_tiny @224: (grid, heads, dim) per stage; window 7
    return [
        ("s1", 56, 3, 96, batch),
        ("s2", 28, 6, 192, batch),
        ("s3", 14, 12, 384, batch),
        ("s4", 7, 24, 768, batch),
    ]


def make_inputs(grid, heads, dim, batch, dtype=jnp.bfloat16, seed=0):
    ww = 49
    window = 7
    n_w = (grid // window) ** 2
    hd = dim // heads
    rng = np.random.default_rng(seed)
    bn = batch * n_w
    q = jnp.asarray(rng.standard_normal((bn, heads, ww, hd)), dtype)
    k = jnp.asarray(rng.standard_normal((bn, heads, ww, hd)), dtype)
    v = jnp.asarray(rng.standard_normal((bn, heads, ww, hd)), dtype)
    bias = jnp.asarray(rng.standard_normal((heads, ww, ww)), jnp.float32)
    from ics_tpu.models.swin import _shift_attn_mask

    if n_w > 1:
        mask = jnp.asarray(_shift_attn_mask(grid, window, window // 2))
    else:
        mask = jnp.zeros((1, ww, ww), jnp.float32)
    return q, k, v, bias, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="numerics only")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tile", type=int, default=16)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # numerics: f32 exact vs reference, bf16 close
    q, k, v, bias, mask = make_inputs(14, 4, 128, 2, dtype=jnp.float32)
    want = xla_window_attention(q, k, v, bias, mask,
                                score_dtype_is_input=False)
    got = pallas_window_attention(q, k, v, bias, mask, tile=4,
                                  interpret=args.cpu)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"numerics f32: max|diff| = {err:.3e}")
    assert err < 1e-4, err
    if args.cpu:
        print("CPU check done")
        return

    print(f"device: {jax.devices()[0].platform}")
    for name, grid, heads, dim, batch in stage_shapes(args.batch):
        inputs = make_inputs(grid, heads, dim, batch)
        n_w = (grid // 7) ** 2
        tile = min(args.tile, n_w)
        t_xla = bench(lambda q_, *r: xla_window_attention(q_, *r), inputs)
        t_pal = bench(
            lambda q_, *r: pallas_window_attention(q_, *r, tile=tile),
            inputs,
        )
        d_want = xla_window_attention(*inputs, score_dtype_is_input=False)
        d_got = pallas_window_attention(*inputs, tile=tile)
        err = float(jnp.max(jnp.abs(
            d_want.astype(jnp.float32) - d_got.astype(jnp.float32)
        )))
        line = (
            f"{name}: bn={batch * n_w:5d} H={heads:2d} "
            f"xla(bf16 scores)={t_xla:7.3f} ms  "
            f"pallas(f32 softmax)={t_pal:7.3f} ms ({t_xla / t_pal:4.2f}x)"
            f" |d|={err:.1e}"
        )
        if n_w % 2 == 0:
            q_, k_, v_, bias_, mask_ = inputs
            pm = build_packed_mask(mask_, 2)
            t_pck = bench(
                lambda q2, k2, v2, b2: xla_packed_window_attention(
                    q2, k2, v2, b2, pm
                ),
                (q_, k_, v_, bias_),
            )
            d_pck = xla_packed_window_attention(q_, k_, v_, bias_, pm)
            err_p = float(jnp.max(jnp.abs(
                d_want.astype(jnp.float32) - d_pck.astype(jnp.float32)
            )))
            line += (
                f"  packed2={t_pck:7.3f} ms ({t_xla / t_pck:4.2f}x)"
                f" |d|={err_p:.1e}"
            )
        print(line)


if __name__ == "__main__":
    main()
