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


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp"):
    """Exact attention with Q/K/V [B, H, S, D] token-sharded over
    ``axis``. Returns [B, H, S, D] with the same sharding semantics as
    the inputs (token dim split over the ring).

    Scaling matches ``ops.attention.attention_reference`` (1/sqrt(D),
    f32 accumulation).
    """
    b, h, s, d = q.shape
    ring = int(mesh.shape[axis])
    if s % ring:
        raise ValueError(
            f"sequência {s} não divide pelos {ring} devices do anel"
        )
    scale = 1.0 / (d ** 0.5)
    perm = [(i, (i + 1) % ring) for i in range(ring)]

    def body(q_loc, k_loc, v_loc):
        # [B, H, s/R, D] locals; K/V chunks travel the ring
        q32 = q_loc.astype(jnp.float32) * scale
        m = jax.lax.pcast(
            jnp.full(q_loc.shape[:-1], NEG_INF, jnp.float32), (axis,), to="varying"
        )
        l = jax.lax.pcast(
            jnp.zeros(q_loc.shape[:-1], jnp.float32), (axis,), to="varying"
        )
        acc = jax.lax.pcast(
            jnp.zeros(q_loc.shape, jnp.float32), (axis,), to="varying"
        )

        def accumulate(k_c, v_c, m, l, acc):
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q32, k_c.astype(jnp.float32)
            )
            m_new = jnp.maximum(m, scores.max(axis=-1))
            p = jnp.exp(scores - m_new[..., None])
            alpha = jnp.exp(m - m_new)  # rescale the running state
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32)
            )
            l = l * alpha + p.sum(axis=-1)
            return m_new, l, acc

        def hop(_, carry):
            k_c, v_c, m, l, acc = carry
            m, l, acc = accumulate(k_c, v_c, m, l, acc)
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
        _, l, acc = accumulate(k_c, v_c, m, l, acc)
        return (acc / l[..., None]).astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
