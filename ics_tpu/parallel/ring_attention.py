"""Sequence parallelism: ring attention over an ``sp`` mesh axis.

SURVEY §2.3's SP/CP seam, implemented the TPU way (Liu et al., "Ring
Attention with Blockwise Transformers", arXiv:2310.01889): the token
dimension is sharded over the ring, every device keeps its Q shard
resident and the K/V shards ROTATE around the ring via ``lax.ppermute``
(ICI neighbor hops — the communication pattern the TPU torus is built
for), while an online-softmax accumulator (the same max/sum recurrence
as the Pallas flash kernel, ops/attention.py) folds each incoming chunk
in. After ``R`` hops every Q block has attended to every K/V block and
the softmax is exact — numerically identical to full attention, with
per-device memory O(S/R) instead of O(S).

At this zoo's sequence lengths (≤577 tokens) nothing needs SP; the seam
exists validated for long-context trunks (tests/test_ring_attention.py
proves exactness against ``attention_reference`` on ring sizes 2-8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ics_tpu.ops.attention import NEG_INF  # the kernel's own sentinel


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   valid_len: int | None = None):
    """Exact attention with Q/K/V [B, H, S, D] token-sharded over
    ``axis``. Returns [B, H, S, D] with the same sharding semantics as
    the inputs (token dim split over the ring).

    ``valid_len`` masks key positions ``>= valid_len`` (padding): real
    sequences rarely divide the ring (ViT's cls token makes S = P+1), so
    callers pad S up to a ring multiple and pass the true length — output
    rows past ``valid_len`` are garbage and must be sliced off by the
    caller (their Q attended real keys, but nobody should read them).

    Scaling matches ``ops.attention.attention_reference`` (1/sqrt(D),
    f32 accumulation).
    """
    b, h, s, d = q.shape
    ring = int(mesh.shape[axis])
    if s % ring:
        raise ValueError(
            f"sequência {s} não divide pelos {ring} devices do anel"
        )
    if valid_len is not None and not (0 < valid_len <= s):
        raise ValueError(f"valid_len {valid_len} fora de (0, {s}]")
    chunk = s // ring
    scale = 1.0 / (d ** 0.5)
    perm = [(i, (i + 1) % ring) for i in range(ring)]

    def body(q_loc, k_loc, v_loc):
        # [B, H, s/R, D] locals; K/V chunks travel the ring
        q32 = q_loc.astype(jnp.float32) * scale
        idx = jax.lax.axis_index(axis)
        m = jax.lax.pcast(
            jnp.full(q_loc.shape[:-1], NEG_INF, jnp.float32), (axis,), to="varying"
        )
        l = jax.lax.pcast(
            jnp.zeros(q_loc.shape[:-1], jnp.float32), (axis,), to="varying"
        )
        acc = jax.lax.pcast(
            jnp.zeros(q_loc.shape, jnp.float32), (axis,), to="varying"
        )

        def accumulate(k_c, v_c, m, l, acc, hop_i):
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q32, k_c.astype(jnp.float32)
            )
            if valid_len is not None and valid_len < s:
                # the chunk held at hop h originated on device (idx - h):
                # its keys cover global positions [origin*chunk, ...)
                origin = (idx - hop_i) % ring
                pos = origin * chunk + jnp.arange(chunk)
                mask = (pos < valid_len)[None, None, None, :]
                scores = jnp.where(mask, scores, NEG_INF)
            m_new = jnp.maximum(m, scores.max(axis=-1))
            p = jnp.exp(scores - m_new[..., None])
            if valid_len is not None and valid_len < s:
                # an ALL-masked chunk leaves m_new at NEG_INF, where
                # exp(NEG_INF - NEG_INF) = 1 would count ghost keys —
                # zero them explicitly (no-op when m_new is finite)
                p = p * mask.astype(p.dtype)
            alpha = jnp.exp(m - m_new)  # rescale the running state
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32)
            )
            l = l * alpha + p.sum(axis=-1)
            return m_new, l, acc

        def hop(hop_i, carry):
            k_c, v_c, m, l, acc = carry
            m, l, acc = accumulate(k_c, v_c, m, l, acc, hop_i)
            # rotate the K/V chunk to the next ring neighbor (ICI hop)
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return k_c, v_c, m, l, acc

        # ring-1 rotating hops, then the final chunk WITHOUT the rotation
        # (the last ppermute's output would never be read — two wasted
        # full-chunk ICI collectives per attention call; self-review r3)
        k_c, v_c, m, l, acc = jax.lax.fori_loop(
            0, ring - 1, hop, (k_loc, v_loc, m, l, acc)
        )
        _, l, acc = accumulate(k_c, v_c, m, l, acc, ring - 1)
        # padded q rows can have l == 0 only when every key chunk was
        # masked for them — impossible for real rows (valid_len >= 1);
        # guard the division so garbage rows are finite garbage, not NaN
        # that could poison a later all-reduce
        safe_l = jnp.where(l == 0.0, 1.0, l)
        return (acc / safe_l[..., None]).astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)


def ring_attention_padded(q, k, v, mesh: Mesh, axis: str = "sp"):
    """:func:`ring_attention` for sequences that don't divide the ring:
    pads S up to the next ring multiple, rings with ``valid_len`` masking,
    and slices the real rows back out. [B, H, S, D] in and out."""
    s = q.shape[2]
    ring = int(mesh.shape[axis])
    pad = (-s) % ring
    if pad == 0:
        return ring_attention(q, k, v, mesh, axis=axis)
    padding = ((0, 0), (0, 0), (0, pad), (0, 0))
    out = ring_attention(
        jnp.pad(q, padding), jnp.pad(k, padding), jnp.pad(v, padding),
        mesh, axis=axis, valid_len=s,
    )
    return out[:, :, :s, :]
