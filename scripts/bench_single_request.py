"""Single-request E2E probe: p50/p99 of a lone `classify_bytes` round trip
(real JPEG host decode -> stage -> H2D -> step -> D2H) on the live chip.

Purpose: a tunnel-speed yardstick between sessions. r3 recorded ~88 ms
tunnel-dominated E2E (docs/benchmarks.md "serving latency" section); a
materially different number on a later session means the axon tunnel RTT
changed and closed-loop req/s numbers from different sessions must NOT be
compared directly.

Appends a JSON line to scripts/bench_single_request.log.
"""

from __future__ import annotations

import asyncio
import io
import json
import time

import numpy as np


def make_jpeg(hw=(480, 400)):
    from PIL import Image, ImageFilter

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 256, (*hw, 3), np.uint8)
    ).filter(ImageFilter.GaussianBlur(1))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90, subsampling=2)
    return buf.getvalue()


async def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")
    from ics_tpu.runtime.engine import InferenceEngine
    from ics_tpu.runtime.service import InferenceService

    engine = InferenceEngine(
        "resnet50", num_classes=1000, precision="bf16", buckets=(1, 8, 32),
        canvas=512,
    )
    svc = InferenceService(
        engine, deadline_us=2000, device_decode=False,
        max_deadline_us=50_000,
    )
    await svc.start(warm=True)
    blob = make_jpeg()
    for _ in range(3):  # warm lane + cache
        await svc.classify_bytes(blob)
    lat = []
    for _ in range(40):
        t0 = time.perf_counter()
        await svc.classify_bytes(blob)
        lat.append((time.perf_counter() - t0) * 1000)
    await svc.stop()
    arr = np.asarray(lat)
    rec = {
        "segment": "single_request_e2e",
        "n": len(lat),
        "p50_ms": round(float(np.percentile(arr, 50)), 1),
        "p99_ms": round(float(np.percentile(arr, 99)), 1),
        "min_ms": round(float(arr.min()), 1),
    }
    print(json.dumps(rec), flush=True)
    with open("scripts/bench_single_request.log", "a") as log:
        log.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    asyncio.run(main())
