"""ViT attention round 2: softmax-cost experiments on the chip.

Variants over the single-pass flash kernel (ViT-B/16 @384: b32, h12, s577,
d64 -> padded [384, 640, 128]):
  A. baseline (fp32 softmax, whole-seq q block)      — r1: ~1.9 ms/call
  B. bf16 exp (scores - max cast to bf16 before exp; fp32 sum)
  C. 2 q-blocks interleaved (scores0; scores1 on MXU while softmax0 on VPU)
  D. B + C
Numerics vs attention_reference for each. Appends to profile_micro.log.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def bench_fn(fn, args, iters=50, bump_input=0):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(args, n):
        def body(_, carry):
            bump = (carry > 1e30).astype(args[bump_input].dtype)
            bumped = list(args)
            bumped[bump_input] = args[bump_input] + bump
            out = fn(*bumped)
            return out.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(chained(args, 2))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(args, iters))
    return (time.perf_counter() - t0) / iters, compile_s


def make_variant(bf16_exp: bool, n_qblocks: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG_INF = -1e30

    def kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
        seq_len = len_ref[0]
        kv_len = k_ref.shape[1]
        s_pad = q_ref.shape[1]
        qb_size = s_pad // n_qblocks
        k_all = k_ref[0]
        v_all = v_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (qb_size, kv_len), 1)
        mask = col < seq_len

        # manual unroll: all score matmuls first, then softmax+PV per block
        # (gives the scheduler MXU work to overlap with VPU softmax)
        scores = []
        for qb in range(n_qblocks):
            q = q_ref[0, pl.ds(qb * qb_size, qb_size), :]
            s = jax.lax.dot_general(
                q, k_all, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores.append(jnp.where(mask, s, NEG_INF))
        for qb in range(n_qblocks):
            s = scores[qb]
            m = jnp.max(s, axis=-1, keepdims=True)
            if bf16_exp:
                p = jnp.exp((s - m).astype(jnp.bfloat16))
                denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            else:
                p = jnp.exp(s - m)
                denom = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_all.dtype), v_all,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, pl.ds(qb * qb_size, qb_size), :] = (
                acc / jnp.maximum(denom, 1e-30)
            ).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=())
    def run(q, k, v, seq_len):
        b, h, s, d = q.shape
        s_pad = ((s + 127) // 128) * 128
        d_pad = 128

        def pad(x):
            return jnp.pad(
                x, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d))
            ).reshape(b * h, s_pad, d_pad)

        qp = pad(q * jnp.asarray(1.0 / (d ** 0.5), q.dtype))
        kp, vp = pad(k), pad(v)
        len_arr = jnp.full((1,), seq_len, jnp.int32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(len_arr, qp, kp, vp)
        return out.reshape(b, h, s_pad, d_pad)[:, :, :s, :d]

    return run


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from ics_tpu.ops.attention import attention_reference, flash_attention

    b, h, s, d = 32, 12, 577, 64
    rng = np.random.default_rng(0)
    q = jax.device_put(rng.normal(size=(b, h, s, d)).astype(jnp.bfloat16))
    k = jax.device_put(rng.normal(size=(b, h, s, d)).astype(jnp.bfloat16))
    v = jax.device_put(rng.normal(size=(b, h, s, d)).astype(jnp.bfloat16))
    ref = np.asarray(
        attention_reference(q[:2], k[:2], v[:2], seq_len=s), np.float32
    )
    log = open("scripts/profile_micro.log", "a")

    def report(name, ms, cs, err):
        rec = {"segment": name, "ms_per_call": round(ms * 1000, 3),
               "compile_s": round(cs, 1), "max_err": round(err, 5)}
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    ms, cs = bench_fn(lambda q: flash_attention(q, k, v, seq_len=s), (q,))
    out = np.asarray(flash_attention(q[:2], k[:2], v[:2], seq_len=s), np.float32)
    report("attn_baseline", ms, cs, float(np.abs(out - ref).max()))

    for name, bf16e, nqb in (
        ("attn_bf16exp", True, 1),
        ("attn_2qb_interleave", False, 2),
        ("attn_bf16exp_2qb", True, 2),
        ("attn_4qb_interleave", False, 4),
    ):
        run = make_variant(bf16e, nqb)
        try:
            out = np.asarray(run(q[:2], k[:2], v[:2], s), np.float32)
            err = float(np.abs(out - ref).max())
            ms, cs = bench_fn(lambda q: run(q, k, v, s), (q,))
            report(name, ms, cs, err)
        except Exception as exc:
            print(json.dumps({"segment": name, "error": str(exc)[:200]}),
                  flush=True)

    log.close()


if __name__ == "__main__":
    main()
