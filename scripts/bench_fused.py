"""Validate + time the fused bottleneck chain and the new stem on the chip.

1. stage-1 chain (blocks 1-2) fused vs XLA: numerics + time
2. stage-2 chain (blocks 1-3): numerics + time
3. full pipeline (preproc+forward+topk) with chains+plain stem vs r1 baseline
Appends to scripts/profile_micro.log.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_fn(fn, args, iters=30, bump_input=0):
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


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from ics_tpu.models.registry import get_model
    from ics_tpu.ops.pallas_bottleneck import fused_bottleneck_chain
    from ics_tpu.ops.preproc import preprocess_batch
    from ics_tpu.runtime.engine import _cast_pytree

    B = 128
    model = get_model("resnet50").build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(
        _cast_pytree(model.fold(variables, pallas_chains=True), jnp.bfloat16)
    )
    rng = np.random.default_rng(0)
    log = open("scripts/profile_micro.log", "a")

    def report(name, ms, cs, extra=None):
        rec = {"segment": name, "batch": B,
               "ms_per_batch": round(ms * 1000, 3),
               "us_per_img": round(ms * 1e6 / B, 1),
               "compile_s": round(cs, 1)}
        if extra:
            rec.update(extra)
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    # numerics: fused chain vs XLA blocks (stage 1, small batch)
    xs = jax.device_put(
        rng.normal(size=(4, 56, 56, 256)).astype(jnp.bfloat16)
    )
    ref = xs
    for blk, f in zip(model.stages[0][1:], folded["stages"][0][1:]):
        ref = blk.apply_folded(f, ref)
    out = fused_bottleneck_chain(xs, folded["chains"]["0"])
    diff = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).mean()
    print(json.dumps({"check": "stage1_chain_numerics",
                      "max_abs": float(diff.max()),
                      "mean_abs": float(diff.mean()),
                      "ref_scale": float(scale)}), flush=True)

    # timing: stage1 fused vs XLA (b128)
    x1 = jax.device_put(rng.normal(size=(B, 56, 56, 256)).astype(jnp.bfloat16))

    def xla_chain1(x):
        for blk, f in zip(model.stages[0][1:], folded["stages"][0][1:]):
            x = blk.apply_folded(f, x)
        return x.astype(jnp.float32)

    ms, cs = bench_fn(xla_chain1, (x1,))
    report("stage1_b12_xla", ms, cs)

    def fused_chain1(x):
        return fused_bottleneck_chain(x, folded["chains"]["0"]).astype(
            jnp.float32
        )

    ms, cs = bench_fn(fused_chain1, (x1,))
    report("stage1_b12_fused", ms, cs)

    # stage2 chain (blocks 1-3) @28px C=512
    x2 = jax.device_put(rng.normal(size=(B, 28, 28, 512)).astype(jnp.bfloat16))

    def xla_chain2(x):
        for blk, f in zip(model.stages[1][1:], folded["stages"][1][1:]):
            x = blk.apply_folded(f, x)
        return x.astype(jnp.float32)

    ms, cs = bench_fn(xla_chain2, (x2,))
    report("stage2_b123_xla", ms, cs)

    def fused_chain2(x):
        return fused_bottleneck_chain(x, folded["chains"]["1"]).astype(
            jnp.float32
        )

    ms, cs = bench_fn(fused_chain2, (x2,))
    report("stage2_b123_fused", ms, cs)

    # full pipeline with everything (plain stem + fused chains)
    canvas = jax.device_put(rng.integers(0, 256, (B, 512, 512, 3), np.uint8))
    sizes = jax.device_put(np.full((B, 2), 512, np.int32))

    def full(c):
        x = preprocess_batch(c, sizes, out_size=224, resize_short=256,
                             dtype=jnp.bfloat16)
        logits = model.apply_folded(folded, x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        v, _ = jax.lax.top_k(probs, 5)
        return v

    ms, cs = bench_fn(full, (canvas,))
    report("full_pipeline_r2", ms, cs,
           {"imgs_per_sec": round(B / ms, 0)})

    log.close()


if __name__ == "__main__":
    main()
