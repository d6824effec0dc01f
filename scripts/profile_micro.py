"""Micro-benchmarks for the ResNet hot spots found by profile_resnet.py:
stem (s2d conv vs plain 7x7 vs patch-matmul) / maxpool / stage-1 block
internals. Appends to scripts/profile_micro.log."""

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
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from ics_tpu.models.registry import get_model
    from ics_tpu.nn.layers import max_pool
    from ics_tpu.runtime.engine import _cast_pytree

    B = 128
    spec = get_model("resnet50")
    model = spec.build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(_cast_pytree(model.fold(variables), jnp.bfloat16))
    rng = np.random.default_rng(0)
    log = open("scripts/profile_micro.log", "a")

    def report(name, ms, cs):
        rec = {"segment": name, "batch": B,
               "ms_per_batch": round(ms * 1000, 3),
               "us_per_img": round(ms * 1e6 / B, 1),
               "compile_s": round(cs, 1)}
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    x224 = jax.device_put(rng.normal(size=(B, 224, 224, 3)).astype(jnp.bfloat16))
    x112 = jax.device_put(rng.normal(size=(B, 112, 112, 64)).astype(jnp.bfloat16))

    # stem conv via s2d (current path), no pool
    def stem_s2d(x):
        return model._stem_folded(folded, x).astype(jnp.float32)

    ms, cs = bench_fn(stem_s2d, (x224,))
    report("stem_s2d_conv", ms, cs)

    # plain 7x7 s2 conv
    def stem_plain(x):
        return model.stem.apply_folded(folded["stem"], x).astype(jnp.float32)

    ms, cs = bench_fn(stem_plain, (x224,))
    report("stem_plain_7x7", ms, cs)

    # maxpool alone
    def pool(x):
        return max_pool(x, 3, 2, "SAME").astype(jnp.float32)

    ms, cs = bench_fn(pool, (x112,))
    report("maxpool_112", ms, cs)

    # stem as patch-matmul: s2d -> materialized 4x4 patches -> one matmul
    w4 = folded["stem_s2d_w"]  # [4,4,12,64]
    bnf = folded["stem"]["bnf"]

    def stem_patches(x):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        xs = model._space_to_depth(xp)  # [B,115,115,12]
        p = lax.conv_general_dilated_patches(
            xs, (4, 4), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B,112,112,192]
        w = w4.reshape(192, 64).astype(x.dtype)
        y = jnp.einsum("bhwk,kn->bhwn", p, w)
        y = y * bnf["scale"].astype(y.dtype) + bnf["bias"].astype(y.dtype)
        return y.astype(jnp.float32)

    ms, cs = bench_fn(stem_patches, (x224,))
    report("stem_patch_matmul", ms, cs)

    # stage1 single block
    blk = model.stages[0][1]  # non-downsample block
    f1 = folded["stages"][0][1]
    x56 = jax.device_put(rng.normal(size=(B, 56, 56, 256)).astype(jnp.bfloat16))

    def block(x):
        return blk.apply_folded(f1, x).astype(jnp.float32)

    ms, cs = bench_fn(block, (x56,))
    report("stage1_block", ms, cs)

    # block internals
    def conv1x1_a(x):  # 256->64
        return blk.cbr1.apply_folded(f1["cbr1"], x).astype(jnp.float32)

    ms, cs = bench_fn(conv1x1_a, (x56,))
    report("s1_conv1x1_256to64", ms, cs)

    x56_64 = jax.device_put(rng.normal(size=(B, 56, 56, 64)).astype(jnp.bfloat16))

    def conv3x3(x):  # 64->64
        return blk.cbr2.apply_folded(f1["cbr2"], x).astype(jnp.float32)

    ms, cs = bench_fn(conv3x3, (x56_64,))
    report("s1_conv3x3_64to64", ms, cs)

    def conv1x1_b(x):  # 64->256
        return blk.cbr3.apply_folded(f1["cbr3"], x).astype(jnp.float32)

    ms, cs = bench_fn(conv1x1_b, (x56_64,))
    report("s1_conv1x1_64to256", ms, cs)

    log.close()


if __name__ == "__main__":
    main()
