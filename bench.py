"""Headline benchmark: ResNet-50 batched inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "resnet50_imgs_per_sec_chip", "value": N, "unit": "img/s",
   "vs_baseline": N/5000}

The measured step is the full device pipeline the serving path uses: uint8
canvas -> on-device resize/crop/normalize -> folded-BN ResNet-50 (bf16) ->
softmax top-k. Baseline: BASELINE.json target of 5,000 img/s/chip on v5e
(the reference publishes no numbers of its own).

Measurement honesty: each iteration's input depends on the previous
iteration's output (a runtime-zero perturbation derived from the scores), so
steps are strictly serialized on-device and cannot be elided, overlapped, or
falsely "completed" by an async runtime; the clock stops on a device->host
fetch of the final carry.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 128
ITERS = 30
WARMUP = 5
TARGET = 5000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "resnet50", precision="bf16", buckets=(BATCH,), canvas=256
    )
    step = engine._get_step()

    rng = np.random.default_rng(0)
    canvas = jax.device_put(rng.integers(0, 256, (BATCH, 256, 256, 3), np.uint8))
    sizes = jax.device_put(np.full((BATCH, 2), 256, np.int32))

    def chained(n: int) -> float:
        # carry is 0.0 at runtime but opaque at compile time; adding its
        # uint8 cast to the canvas creates a true cross-step dependency
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            bump = (carry > 1e30).astype(jnp.uint8)  # runtime 0
            idx, scores = step(engine.folded, canvas + bump, sizes)
            carry = scores[0, 0]
        _ = float(carry)  # D2H fetch forces completion of the whole chain
        return time.perf_counter() - t0

    chained(WARMUP)
    dt = chained(ITERS)

    imgs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "resnet50_imgs_per_sec_chip",
                "value": round(imgs_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
