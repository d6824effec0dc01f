"""Second compiler-option sweep on the ResNet-50 headline step.

Candidates target the measured bottleneck (stages 2-4 at 205-582 GB/s
effective vs the 835 peak): scheduler + memory-space-assignment knobs.
Unknown option names fail the compile and are recorded as errors — cheap
to probe now that the tunnel compile is warm (~5-15 s).

Appends JSON lines to scripts/bench_flags2.log.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 128
CANVAS = 256
ITERS = 30

VARIANTS = {
    "default_a": None,
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "cross_prog_prefetch_off": {"xla_tpu_enable_cross_program_prefetch": "false"},
    "licm_inflate": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    "default_b": None,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.ops.preproc import preprocess_batch
    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "resnet50", precision="bf16", buckets=(BATCH,), canvas=CANVAS
    )
    spec, model, dtype = engine.spec, engine.model, engine.dtype

    def one_step(folded, canvas_u8, sizes):
        x = preprocess_batch(
            canvas_u8, sizes, out_size=spec.image_size,
            resize_short=spec.resize_short, dtype=dtype,
        )
        logits = model.apply_folded(folded, x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        values, _ = jax.lax.top_k(probs, 5)
        return values

    def chained(folded, canvas_u8, sizes, n):
        def body(_, carry):
            bump = (carry > 1e30).astype(jnp.uint8)
            values = one_step(folded, canvas_u8 + bump, sizes)
            return values[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    cv = jax.device_put(
        rng.integers(0, 256, (BATCH, CANVAS, CANVAS, 3), np.uint8)
    )
    sz = jax.device_put(np.full((BATCH, 2), 224, np.int32))
    n_arr = np.int32(ITERS)

    with open("scripts/bench_flags2.log", "a") as log:
        for name, opts in VARIANTS.items():
            try:
                t0 = time.perf_counter()
                compiled = jax.jit(chained).lower(
                    engine.folded, cv, sz, n_arr
                ).compile(**({"compiler_options": opts} if opts else {}))
                _ = float(compiled(engine.folded, cv, sz, np.int32(2)))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                _ = float(compiled(engine.folded, cv, sz, n_arr))
                dt = time.perf_counter() - t0
                rec = {
                    "variant": name,
                    "imgs_per_sec": round(BATCH * ITERS / dt, 1),
                    "ms_per_batch": round(dt / ITERS * 1000, 3),
                    "compile_s": round(compile_s, 1),
                }
            except Exception as exc:
                rec = {"variant": name,
                       "error": f"{type(exc).__name__}: {exc}"[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            log.write(line + "\n")


if __name__ == "__main__":
    main()
