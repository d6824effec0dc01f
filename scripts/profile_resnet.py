"""Per-stage on-device timing of the ResNet-50 inference step (VERDICT r1
item 6: find where the ~26%-MXU step spends its time).

Each segment is timed with the fori_loop harness (cross-iteration data
dependency; D2H stops the clock) so the axon tunnel's fake block_until_ready
cannot pollute numbers. Results append to scripts/profile_resnet.log.

Run:  python scripts/profile_resnet.py [--batch 128] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_fn(fn, args, iters, bump_input=0):
    """Time fn(*args) chained on-device. fn must return a float32 scalarable
    array; args[bump_input] gets a runtime-zero bump derived from the carry
    so iterations serialize."""
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
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from ics_tpu.models.registry import get_model
    from ics_tpu.nn.layers import max_pool
    from ics_tpu.ops.preproc import preprocess_batch
    from ics_tpu.runtime.engine import _cast_pytree

    B = args.batch
    spec = get_model("resnet50")
    model = spec.build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(_cast_pytree(model.fold(variables), jnp.bfloat16))

    rng = np.random.default_rng(0)
    log = open("scripts/profile_resnet.log", "a")

    def report(name, ms, compile_s, mb_per_img=None, gflops_per_img=None):
        rec = {
            "segment": name, "batch": B, "ms_per_batch": round(ms * 1000, 3),
            "us_per_img": round(ms * 1e6 / B, 1),
            "compile_s": round(compile_s, 1),
        }
        if mb_per_img:
            # effective HBM bandwidth if this segment were purely mem-bound
            rec["approx_GBps"] = round(mb_per_img * B / ms / 1000, 0)
        if gflops_per_img:
            rec["approx_TFLOPs"] = round(gflops_per_img * B / ms / 1000, 1)
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    # segment inputs (device-resident, bf16)
    x224 = jax.device_put(
        rng.normal(size=(B, 224, 224, 3)).astype(jnp.bfloat16)
    )
    canvas = jax.device_put(rng.integers(0, 256, (B, 512, 512, 3), np.uint8))
    sizes = jax.device_put(np.full((B, 2), 512, np.int32))

    # full pipeline (preproc + forward + softmax/topk) — reference number
    def full(folded, canvas, sizes):
        x = preprocess_batch(canvas, sizes, out_size=224, resize_short=256,
                             dtype=jnp.bfloat16)
        logits = model.apply_folded(folded, x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        v, _ = jax.lax.top_k(probs, 5)
        return v

    ms, cs = bench_fn(lambda c: full(folded, c, sizes), (canvas,), args.iters)
    report("full_pipeline", ms, cs)

    # preproc only
    def pre(c):
        return preprocess_batch(c, sizes, out_size=224, resize_short=256,
                                dtype=jnp.bfloat16).astype(jnp.float32)

    ms, cs = bench_fn(pre, (canvas,), args.iters)
    report("preproc", ms, cs)

    # forward only from x224
    def fwd(x):
        return model.apply_folded(folded, x).astype(jnp.float32)

    ms, cs = bench_fn(fwd, (x224,), args.iters)
    report("forward_only", ms, cs, mb_per_img=53, gflops_per_img=8.2)

    # stem + maxpool
    def stem(x):
        y = jax.nn.relu(model._stem_folded(folded, x))
        y = max_pool(y, 3, 2, "SAME")
        return y.astype(jnp.float32)

    ms, cs = bench_fn(stem, (x224,), args.iters)
    report("stem+pool", ms, cs, mb_per_img=4.1, gflops_per_img=0.24)

    # per-stage
    shapes = [(56, 64), (56, 256), (28, 512), (14, 1024), (7, 2048)]
    stage_mb = [23.4, 14.4, 11.2, 3.2]
    stage_gf = [1.4, 1.7, 2.9, 1.5]
    x_in = jax.device_put(
        rng.normal(size=(B, 56, 56, 64)).astype(jnp.bfloat16)
    )
    for i, blocks in enumerate(model.stages):
        def stage_fn(x, blocks=blocks, i=i):
            for j, blk in enumerate(blocks):
                x = blk.apply_folded(folded["stages"][i][j], x)
            return x.astype(jnp.float32)

        ms, cs = bench_fn(stage_fn, (x_in,), args.iters)
        report(f"stage{i + 1}", ms, cs, mb_per_img=stage_mb[i],
               gflops_per_img=stage_gf[i])
        side, ch = shapes[i + 1]
        x_in = jax.device_put(
            rng.normal(size=(B, side, side, ch)).astype(jnp.bfloat16)
        )

    # head: gap + dense + softmax + topk
    x7 = jax.device_put(rng.normal(size=(B, 7, 7, 2048)).astype(jnp.bfloat16))

    def head(x):
        pooled = jnp.mean(x, axis=(1, 2))
        logits = model.head.apply(folded["head"], pooled).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        v, _ = jax.lax.top_k(probs, 5)
        return v

    ms, cs = bench_fn(head, (x7,), args.iters)
    report("head+topk", ms, cs)

    log.close()


if __name__ == "__main__":
    main()
