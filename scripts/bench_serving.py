"""Serving stack under closed-loop load on the real chip (r1 methodology:
8 closed-loop clients, 200 requests, ResNet-50, buckets (1,8,32), real JPEG
host decode per request) — now with the adaptive announced-request batcher
at the DEFAULT 2 ms base deadline (r1 collapsed to batch-of-1 here).
"""

from __future__ import annotations

import asyncio
import io
import json
import time

import numpy as np


def make_jpegs(n=32, hw=(480, 400)):
    from PIL import Image, ImageFilter

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(n):
        img = Image.fromarray(
            rng.integers(0, 256, (*hw, 3), np.uint8)
        ).filter(ImageFilter.GaussianBlur(1))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90, subsampling=2)
        blobs.append(buf.getvalue())
    return blobs


async def run(device_decode: bool):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from ics_tpu.runtime.engine import InferenceEngine
    from ics_tpu.runtime.service import InferenceService

    engine = InferenceEngine(
        "resnet50", num_classes=1000, precision="bf16", buckets=(1, 8, 32),
        canvas=512,
    )
    svc = InferenceService(
        engine, deadline_us=2000, device_decode=device_decode,
        max_deadline_us=50_000,
    )
    await svc.start(warm=True)
    blobs = make_jpegs()

    # warm the decode lane / batcher path
    await svc.classify_bytes(blobs[0])

    n_clients, per_client = 8, 25
    latencies: list[float] = []

    async def client(cid: int):
        for r in range(per_client):
            t0 = time.perf_counter()
            await svc.classify_bytes(blobs[(cid * per_client + r) % len(blobs)])
            latencies.append((time.perf_counter() - t0) * 1000)

    flushes_before = svc.batcher.stats["flushes"] + sum(
        b.stats["flushes"] for b in svc.coeff_batchers.values()
    )
    t0 = time.perf_counter()
    await asyncio.gather(*(client(i) for i in range(n_clients)))
    wall = time.perf_counter() - t0
    flushes = (
        svc.batcher.stats["flushes"]
        + sum(b.stats["flushes"] for b in svc.coeff_batchers.values())
        - flushes_before
    )
    await svc.stop()
    total = n_clients * per_client
    arr = np.asarray(latencies)
    rec = {
        "segment": f"serving_closedloop_{'devdec' if device_decode else 'host'}",
        "requests": total,
        "req_per_s": round(total / wall, 1),
        "p50_ms": round(float(np.percentile(arr, 50)), 1),
        "p99_ms": round(float(np.percentile(arr, 99)), 1),
        "flushes": flushes,
        "mean_batch": round(total / max(flushes, 1), 1),
        "deadline_us": 2000,
    }
    print(json.dumps(rec), flush=True)
    with open("scripts/profile_micro.log", "a") as log:
        log.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    asyncio.run(run(device_decode=False))
    asyncio.run(run(device_decode=True))
