"""ViT-B/16 @384 full-pipeline throughput + per-component split."""

from __future__ import annotations

import json
import time

import numpy as np


def bench_fn(fn, args, iters=20, bump_input=0):
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
    from ics_tpu.ops.preproc import preprocess_batch
    from ics_tpu.runtime.engine import _cast_pytree

    B = 32
    spec = get_model("vit_b16")
    model = spec.build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(_cast_pytree(model.fold(variables), jnp.bfloat16))
    rng = np.random.default_rng(0)
    log = open("scripts/profile_micro.log", "a")

    def report(name, ms, cs, extra=None):
        rec = {"segment": name, "batch": B,
               "ms_per_batch": round(ms * 1000, 3),
               "compile_s": round(cs, 1)}
        if extra:
            rec.update(extra)
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    canvas = jax.device_put(rng.integers(0, 256, (B, 512, 512, 3), np.uint8))
    sizes = jax.device_put(np.full((B, 2), 512, np.int32))

    def full(c):
        x = preprocess_batch(c, sizes, out_size=spec.image_size,
                             resize_short=spec.resize_short,
                             dtype=jnp.bfloat16)
        logits = model.apply_folded(folded, x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        v, _ = jax.lax.top_k(probs, 5)
        return v

    ms, cs = bench_fn(full, (canvas,))
    report("vit_full_r2", ms, cs, {"imgs_per_sec": round(B / ms, 0)})

    log.close()


if __name__ == "__main__":
    main()
