"""Benchmark harness: on-device iteration, immune to host/tunnel latency.

The measured program runs N pipeline steps inside one compiled
``lax.fori_loop`` whose input depends on the previous iteration's output
(a runtime-zero bump derived from the scores), so iterations are strictly
serialized on-device and cannot be hoisted, elided or overlapped. The clock
stops on a device->host fetch of the final carry.
"""

from __future__ import annotations

import time
import weakref
from typing import Optional

import numpy as np

# chained-step closures per engine: repeat callers (the
# /monitor/latency-budget route, sweep scripts) must not re-trace the
# fori_loop harness on every call — tracing is seconds of pure-Python work
# on the serving host's core
_chained_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def bench_engine(engine, batch: int, canvas: int, iters: int = 20,
                 warmup: bool = True,
                 compiler_options: Optional[dict] = None,
                 mixed_sizes: bool = False) -> dict:
    """``compiler_options`` compiles the chained step AOT with the given
    XLA options (the only flag channel that reaches the TPU compiler over
    a remote-compile tunnel — XLA_FLAGS is parsed locally and aborts on
    TPU flags; see scripts/bench_vmem_sweep.py)."""
    import jax
    import jax.numpy as jnp

    from ics_tpu.ops.preproc import preprocess_batch

    spec = engine.spec
    model = engine.model
    dtype = engine.dtype

    chained = _chained_cache.get(engine)
    if chained is None:

        # mirror the engine's own serving step: _top_k() caps k at the
        # class count (a trained 2-class engine crashed lax.top_k(_, 5))
        # and multi-label engines score with sigmoid (self-review r3)
        k = engine._top_k()
        multi_label = engine.multi_label

        def one_step(folded, canvas_u8, sizes):
            x = preprocess_batch(
                canvas_u8, sizes, out_size=spec.image_size,
                resize_short=spec.resize_short, dtype=dtype,
            )
            logits = model.apply_folded(folded, x).astype(jnp.float32)
            if multi_label:
                probs = jax.nn.sigmoid(logits)
            else:
                probs = jax.nn.softmax(logits, axis=-1)
            values, idx = jax.lax.top_k(probs, k)
            return values, idx

        @jax.jit
        def chained(folded, canvas_u8, sizes, n):
            def body(_, carry):
                bump = (carry > 1e30).astype(jnp.uint8)  # runtime 0, opaque
                values, _ = one_step(folded, canvas_u8 + bump, sizes)
                return values[0, 0]

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        _chained_cache[engine] = chained

    rng = np.random.default_rng(0)
    cv = jax.device_put(
        rng.integers(0, 256, (batch, canvas, canvas, 3), np.uint8)
    )
    if mixed_sizes:
        # BASELINE cfg 4 "mixed-resolution stream": per-image sizes spread
        # over [256, canvas] so each image gets its own resize plan inside
        # the one padded-bucket graph — the shape the batcher actually
        # serves, not a uniform-size best case
        sz = jax.device_put(
            np.stack(
                [rng.integers(256, canvas + 1, batch),
                 rng.integers(256, canvas + 1, batch)], axis=1
            ).astype(np.int32)
        )
    else:
        sz = jax.device_put(np.full((batch, 2), min(canvas, 512), np.int32))

    t0 = time.perf_counter()
    if compiler_options:
        compiled = chained.lower(
            engine.folded, cv, sz, np.int32(0)
        ).compile(compiler_options=compiler_options)
        step = lambda n: compiled(engine.folded, cv, sz, np.int32(n))
    else:
        step = lambda n: chained(engine.folded, cv, sz, np.int32(n))
    _ = float(step(2 if warmup else 0))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    carry = step(iters)
    _ = float(carry)  # D2H forces completion of the whole chain
    dt = time.perf_counter() - t0

    return {
        "model": engine.model_name,
        "batch": batch,
        "iters": iters,
        "imgs_per_sec": round(batch * iters / dt, 1),
        "ms_per_batch": round(dt / iters * 1000, 3),
        "compile_s": round(compile_s, 1),
    }
