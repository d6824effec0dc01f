"""Saliency explain-step latency on one chip (batch-of-1 diagnostics).

Same tunnel-immune harness as bench.py: the fused forward+backward
explain step runs N times inside one on-device ``lax.fori_loop`` with a
cross-step data dependency; a D2H fetch of the carry stops the clock.
Reports the plain forward batch-1 latency alongside, so the docs row can
state the backward's multiplier honestly.

Run: ``python scripts/bench_explain.py [model ...]`` — appends JSON
lines to scripts/bench_explain.log.
"""

from __future__ import annotations

import json
import sys
import time

CONFIGS = {
    # model: canvas (the shipped serving default is 512)
    "resnet50": 512,
    "densenet121": 512,
    "mobilenetv3_small": 512,
}
ITERS = 20


def bench_explain(name: str, canvas: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ics_tpu.ops.preproc import preprocess_batch
    from ics_tpu.runtime.engine import EXPLAIN_GRID, InferenceEngine

    engine = InferenceEngine(name, precision="bf16", buckets=(1,),
                             canvas=canvas)
    spec, model, dtype = engine.spec, engine.model, engine.dtype

    def explain_once(folded, cv, sz):
        x = preprocess_batch(
            cv, sz, out_size=spec.image_size,
            resize_short=spec.resize_short, dtype=dtype,
        )

        def f(xin):
            logits = model.apply_folded(folded, xin).astype(jnp.float32)
            return jnp.max(logits[0]), logits

        (_, _logits), g = jax.value_and_grad(f, has_aux=True)(x)
        heat = jnp.max(jnp.abs(g[0].astype(jnp.float32)), axis=-1)
        return jax.image.resize(heat, (EXPLAIN_GRID, EXPLAIN_GRID),
                                "linear")

    def forward_once(folded, cv, sz):
        x = preprocess_batch(
            cv, sz, out_size=spec.image_size,
            resize_short=spec.resize_short, dtype=dtype,
        )
        return model.apply_folded(folded, x).astype(jnp.float32)

    def chained(once, reduce_out):
        @jax.jit
        def run(folded, cv, sz, n):
            def body(_, carry):
                bump = (carry > 1e30).astype(jnp.uint8)
                return reduce_out(once(folded, cv + bump, sz))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    rng = np.random.default_rng(0)
    cv = jax.device_put(
        rng.integers(0, 256, (1, canvas, canvas, 3), np.uint8)
    )
    sz = jax.device_put(np.full((1, 2), min(canvas, 512), np.int32))

    out = {"model": name, "canvas": canvas, "iters": ITERS}
    for key, run in (
        ("explain_ms", chained(explain_once, lambda h: h[0, 0])),
        ("forward_ms", chained(forward_once, lambda l: l[0, 0])),
    ):
        _ = float(run(engine.folded, cv, sz, np.int32(2)))  # compile+warm
        t0 = time.perf_counter()
        _ = float(run(engine.folded, cv, sz, np.int32(ITERS)))
        out[key] = round((time.perf_counter() - t0) / ITERS * 1000, 3)
    out["backward_multiplier"] = round(out["explain_ms"]
                                       / out["forward_ms"], 2)
    return out


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")
    names = sys.argv[1:] or list(CONFIGS)
    with open("scripts/bench_explain.log", "a") as log:
        for name in names:
            line = json.dumps(bench_explain(name, CONFIGS[name]))
            print(line, flush=True)
            log.write(line + "\n")


if __name__ == "__main__":
    main()
