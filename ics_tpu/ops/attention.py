"""Blockwise (flash-style) attention as a Pallas TPU kernel.

Used by ViT-B/16 (BASELINE config 3). Non-causal, optional valid-length
masking (padded token positions contribute nothing). Online-softmax over
K/V blocks: running max + running denominator, one pass over K/V per Q
block — O(seq) VMEM instead of materializing the [S, S] score matrix in
HBM. Blockwise structure also gives long-sequence headroom (sequence /
context parallelism becomes a config change, SURVEY.md §5).

Shapes: q, k, v — [batch, heads, seq, head_dim]; seq and head_dim padded to
hardware tiles by the wrapper (head_dim -> 128 lanes, seq -> 128 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 128
K_BLOCK = 128
# sequences up to this length take the single-pass path (full-row softmax,
# no online rescaling) — ViT's 577 tokens land here
SINGLE_PASS_MAX = 1024
NEG_INF = -1e30


from ics_tpu.ops import should_interpret as _should_interpret


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    """Grid: (batch*heads,). Blocks: q/k/v/o [1, S, D] — K/V stream from
    VMEM once per (batch, head); the q-block loop runs inside the kernel.

    Matmuls run in the INPUT dtype (bf16 in production -> 2x MXU rate) with
    fp32 accumulation; softmax statistics stay fp32.
    """
    seq_len = len_ref[0]
    kv_len = k_ref.shape[1]
    num_qb = q_ref.shape[1] // Q_BLOCK
    num_kb = kv_len // K_BLOCK

    def q_body(qb, _):
        # q pre-scaled by 1/sqrt(true_head_dim) in the wrapper (the padded
        # lane dim here would give the wrong scale)
        q = q_ref[0, pl.ds(qb * Q_BLOCK, Q_BLOCK), :]      # [Qb, D] input dtype

        def kv_body(kb, carry):
            acc, m_prev, l_prev = carry
            k_blk = k_ref[0, pl.ds(kb * K_BLOCK, K_BLOCK), :]
            v_blk = v_ref[0, pl.ds(kb * K_BLOCK, K_BLOCK), :]
            scores = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [Qb, Kb] fp32
            col = kb * K_BLOCK + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, dimension=1
            )
            valid = col < seq_len
            scores = jnp.where(valid, scores, NEG_INF)
            m_cur = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            # re-zero masked positions: while every score seen so far is
            # masked, m_new is still NEG_INF and exp(NEG_INF - NEG_INF)
            # would give the masked positions weight 1 — a fully-masked
            # row (seq_len=0, or valid tokens starting after this block)
            # must contribute nothing, not the mean of pad garbage
            p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # fp32
            correction = jnp.exp(m_prev - m_new)
            l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * correction + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        acc0 = jnp.zeros((Q_BLOCK, v_ref.shape[-1]), jnp.float32)
        m0 = jnp.full((Q_BLOCK, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((Q_BLOCK, 1), jnp.float32)
        acc, _, l_final = jax.lax.fori_loop(0, num_kb, kv_body, (acc0, m0, l0))
        o_ref[0, pl.ds(qb * Q_BLOCK, Q_BLOCK), :] = (
            acc / jnp.maximum(l_final, 1e-30)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_qb, q_body, 0)


def _flash_kernel_single_pass(len_ref, q_ref, k_ref, v_ref, o_ref,
                              q_block: int = Q_BLOCK):
    """Short-sequence fast path: whole K/V in one dot per Q block — one
    full-row softmax, no correction passes. Grid: (batch*heads,).

    ``q_block`` defaults to the whole (padded) sequence: measured 21%
    faster than 128-row blocks at ViT-B shapes (fewer, larger MXU ops)."""
    seq_len = len_ref[0]
    kv_len = k_ref.shape[1]
    num_qb = q_ref.shape[1] // q_block
    k_all = k_ref[0]                                        # [S, D]
    v_all = v_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q_block, kv_len), 1)
    mask = col < seq_len

    def q_body(qb, _):
        q = q_ref[0, pl.ds(qb * q_block, q_block), :]
        scores = jax.lax.dot_general(
            q, k_all,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [Qb, S] fp32
        scores = jnp.where(mask, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        # re-zero masked positions: with seq_len=0 every score is NEG_INF,
        # m == NEG_INF, and exp(scores - m) would weight pad garbage at 1
        p = jnp.where(mask, jnp.exp(scores - m), 0.0)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, pl.ds(qb * q_block, q_block), :] = (
            acc / jnp.maximum(denom, 1e-30)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_qb, q_body, 0)


def _pad_to(x, size: int, axis: int):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q, k, v, seq_len=None, interpret=None):
    """q, k, v: [B, H, S, D] -> [B, H, S, D].

    ``seq_len``: number of valid tokens (ints); keys beyond it are masked.
    """
    if interpret is None:
        interpret = _should_interpret()
    b, h, s, d = q.shape
    s_pad = ((s + 127) // 128) * 128  # row-tile granularity
    d_pad = max(((d + 127) // 128) * 128, 128)
    orig_dtype = q.dtype
    q = q * jnp.asarray(1.0 / (d ** 0.5), q.dtype)
    qp = _pad_to(_pad_to(q, s_pad, 2), d_pad, 3).reshape(b * h, s_pad, d_pad)
    kp = _pad_to(_pad_to(k, s_pad, 2), d_pad, 3).reshape(b * h, s_pad, d_pad)
    vp = _pad_to(_pad_to(v, s_pad, 2), d_pad, 3).reshape(b * h, s_pad, d_pad)
    if seq_len is None:
        seq_len = s
    len_arr = jnp.full((1,), seq_len, jnp.int32)

    grid = (b * h,)
    if s_pad <= SINGLE_PASS_MAX:
        # one q block spanning the whole padded sequence
        kernel = functools.partial(_flash_kernel_single_pass, q_block=s_pad)
    else:
        kernel = _flash_kernel
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), orig_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, s_pad, d_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_pad, d_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_pad, d_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s_pad, d_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(len_arr, qp, kp, vp)
    out = out.reshape(b, h, s_pad, d_pad)[:, :, :s, :d]
    return out


def attention_reference(q, k, v, seq_len=None):
    """Plain XLA attention for correctness checks and the training path."""
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if seq_len is not None:
        mask = jnp.arange(s)[None, None, None, :] < seq_len
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
