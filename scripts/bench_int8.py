"""Int8 (W8A8) viability micro-benchmark on the chip.

Question (NEXT_STEPS round-3 item 1): the bf16 ResNet-50 step is HBM
bandwidth-bound at ~80% of the 15.4k img/s roofline; int8 activations +
weights would halve the traffic AND double the MXU rate (v5e: 394 int8
TOPS vs 197 bf16 TFLOP/s) — IF XLA lowers integer convs onto the MXU
instead of upcasting. This measures that, at real ResNet-50 stage shapes,
before any framework work.

Run:  python scripts/bench_int8.py [--batch 128] [--iters 30]
Results append to scripts/bench_int8.log.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_fn(fn, args, iters, bump_input=0):
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
    dt = time.perf_counter() - t0
    return dt / iters, compile_s


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=30)
    cli = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    B = cli.batch
    rng = np.random.default_rng(0)
    log = open("scripts/bench_int8.log", "a")

    def report(name, ms, compile_s):
        rec = {
            "segment": name,
            "batch": B,
            "ms_per_batch": round(ms * 1000, 3),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(rec))
        log.write(json.dumps(rec) + "\n")
        log.flush()

    def conv(x, w, stride=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_i8(x, w, stride=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    # --- stage-1 3x3 conv: [B,56,56,64] x [3,3,64,64] ---------------------
    xf = jnp.asarray(rng.standard_normal((B, 56, 56, 64)), jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, (B, 56, 56, 64)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)

    ms, cs = bench_fn(lambda x: conv(x, wf), [xf], cli.iters)
    report("conv3x3_s1_c64_bf16", ms, cs)
    ms, cs = bench_fn(
        lambda x: conv_i8(x, wi).astype(jnp.float32), [xi], cli.iters
    )
    report("conv3x3_s1_c64_int8", ms, cs)

    # --- stage-1 1x1 conv: [B,56,56,256] x [1,1,256,64] --------------------
    xf2 = jnp.asarray(rng.standard_normal((B, 56, 56, 256)), jnp.bfloat16)
    wf2 = jnp.asarray(rng.standard_normal((1, 1, 256, 64)) * 0.1, jnp.bfloat16)
    xi2 = jnp.asarray(rng.integers(-127, 128, (B, 56, 56, 256)), jnp.int8)
    wi2 = jnp.asarray(rng.integers(-127, 128, (1, 1, 256, 64)), jnp.int8)

    ms, cs = bench_fn(lambda x: conv(x, wf2), [xf2], cli.iters)
    report("conv1x1_c256_64_bf16", ms, cs)
    ms, cs = bench_fn(
        lambda x: conv_i8(x, wi2).astype(jnp.float32), [xi2], cli.iters
    )
    report("conv1x1_c256_64_int8", ms, cs)

    # --- stage-3 3x3 conv: [B,14,14,256] x [3,3,256,256] (compute-heavier) -
    xf3 = jnp.asarray(rng.standard_normal((B, 14, 14, 256)), jnp.bfloat16)
    wf3 = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.1, jnp.bfloat16)
    xi3 = jnp.asarray(rng.integers(-127, 128, (B, 14, 14, 256)), jnp.int8)
    wi3 = jnp.asarray(rng.integers(-127, 128, (3, 3, 256, 256)), jnp.int8)

    ms, cs = bench_fn(lambda x: conv(x, wf3), [xf3], cli.iters)
    report("conv3x3_c256_bf16", ms, cs)
    ms, cs = bench_fn(
        lambda x: conv_i8(x, wi3).astype(jnp.float32), [xi3], cli.iters
    )
    report("conv3x3_c256_int8", ms, cs)

    # --- int8 bottleneck with requant between convs (the real pattern) ----
    # y = relu(requant(conv(x))) three times + residual add in int8 domain
    def bottleneck_i8(x, w1, w2, w3):
        def requant(acc):
            # dequant scale + relu + requant to int8; scales folded to one
            # multiplier per channel in the real lane (here a scalar)
            y = acc.astype(jnp.float32) * 0.01
            y = jax.nn.relu(y)
            return jnp.clip(jnp.round(y * 3.0), -127, 127).astype(jnp.int8)

        y = requant(conv_i8(x, w1))
        y = requant(conv_i8(y, w2))
        y = conv_i8(y, w3).astype(jnp.float32) * 0.01
        out = jax.nn.relu(y + x.astype(jnp.float32))
        return jnp.clip(jnp.round(out * 3.0), -127, 127).astype(jnp.int8)

    def bottleneck_bf16(x, w1, w2, w3):
        y = jax.nn.relu(conv(x, w1))
        y = jax.nn.relu(conv(y, w2))
        y = conv(y, w3)
        return jax.nn.relu(y + x)

    xiB = jnp.asarray(rng.integers(-127, 128, (B, 56, 56, 256)), jnp.int8)
    wiA = jnp.asarray(rng.integers(-127, 128, (1, 1, 256, 64)), jnp.int8)
    wiBk = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)
    wiC = jnp.asarray(rng.integers(-127, 128, (1, 1, 64, 256)), jnp.int8)
    ms, cs = bench_fn(
        lambda x: bottleneck_i8(x, wiA, wiBk, wiC).astype(jnp.float32),
        [xiB], cli.iters,
    )
    report("bottleneck_s1_int8_requant", ms, cs)

    xfB = jnp.asarray(rng.standard_normal((B, 56, 56, 256)), jnp.bfloat16)
    wfA = jnp.asarray(rng.standard_normal((1, 1, 256, 64)) * 0.1, jnp.bfloat16)
    wfBk = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.bfloat16)
    wfC = jnp.asarray(rng.standard_normal((1, 1, 64, 256)) * 0.1, jnp.bfloat16)
    ms, cs = bench_fn(
        lambda x: bottleneck_bf16(x, wfA, wfBk, wfC), [xfB], cli.iters
    )
    report("bottleneck_s1_bf16", ms, cs)

    # --- dense (ViT MLP shape): [S*b, 768] x [768, 3072] -------------------
    M = 32 * 640
    af = jnp.asarray(rng.standard_normal((M, 768)), jnp.bfloat16)
    bf = jnp.asarray(rng.standard_normal((768, 3072)) * 0.02, jnp.bfloat16)
    ai = jnp.asarray(rng.integers(-127, 128, (M, 768)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 128, (768, 3072)), jnp.int8)

    ms, cs = bench_fn(lambda a: jnp.dot(a, bf), [af], cli.iters)
    report("dense_768x3072_bf16", ms, cs)
    ms, cs = bench_fn(
        lambda a: lax.dot_general(
            a, bi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32),
        [ai], cli.iters,
    )
    report("dense_768x3072_int8", ms, cs)


if __name__ == "__main__":
    main()
