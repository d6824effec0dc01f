"""Pipelined batcher flush A/B under closed-loop load on the real chip
(VERDICT r3 item 3: "staged double-buffer (H2D of batch N+1 under compute
of batch N) in the batcher flush path ... kept or rejected on numbers").

Methodology matches scripts/bench_serving.py (the r3 collapse measurement):
8 closed-loop clients, 200 requests, ResNet-50 bf16, buckets (1,8,32),
real JPEG host decode per request, 2 ms base deadline + announced-load
extension. Host decode is the main lane here (device_decode off) because
only the main lane is pipelined.

Appends JSON lines to scripts/bench_pipeline_flush.log.
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


async def run(pipelined: bool, device_decode: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")
    from ics_tpu.core.config import settings
    from ics_tpu.runtime.engine import InferenceEngine
    from ics_tpu.runtime.service import InferenceService

    settings.TPU_PIPELINED_FLUSH = pipelined  # read at service construction

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
    for _ in range(3):  # warm the lane (all buckets load from disk cache)
        await svc.classify_bytes(blobs[0])

    n_clients, per_client = 8, 25
    latencies: list[float] = []

    async def client(cid: int):
        for r in range(per_client):
            t0 = time.perf_counter()
            await svc.classify_bytes(blobs[(cid * per_client + r) % len(blobs)])
            latencies.append((time.perf_counter() - t0) * 1000)

    def lane_totals() -> dict:
        """Aggregate flush/pipelined counters from the lanes traffic
        actually rides: the pixel-lane batcher under host decode, the
        per-(mode, luma-bucket) coeff batchers under --device-decode
        (ADVICE r4: the old read of svc.batcher.stats under device_decode
        counted an idle lane — flushes=0, mean_batch=200.0 garbage)."""
        lanes = (
            list(svc.coeff_batchers.values()) if device_decode
            else [svc.batcher]
        )
        return {
            "flushes": sum(b.stats["flushes"] for b in lanes),
            "pipelined": sum(b.stats.get("pipelined", 0) for b in lanes),
            "lanes_active": sum(1 for b in lanes if b.stats["flushes"]),
        }

    before = lane_totals()
    t0 = time.perf_counter()
    await asyncio.gather(*(client(i) for i in range(n_clients)))
    wall = time.perf_counter() - t0
    after = lane_totals()
    flushes = after["flushes"] - before["flushes"]
    pipelined_count = after["pipelined"] - before["pipelined"]
    await svc.stop()
    total = n_clients * per_client
    arr = np.asarray(latencies)
    rec = {
        "segment": (f"serving_pipelined_{'on' if pipelined else 'off'}"
                    + ("_devdecode" if device_decode else "")),
        "requests": total,
        "req_per_s": round(total / wall, 1),
        "p50_ms": round(float(np.percentile(arr, 50)), 1),
        "p99_ms": round(float(np.percentile(arr, 99)), 1),
        "flushes": flushes,
        "mean_batch": round(total / flushes, 1) if flushes else None,
        "pipelined_flushes": pipelined_count,
        "lanes_active": after["lanes_active"],
        "ts": round(time.time(), 1),
    }
    print(json.dumps(rec), flush=True)
    with open("scripts/bench_pipeline_flush.log", "a") as log:
        log.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    # --reverse runs the ON arm first: rules out same-process order/warmup
    # skew (second arm rides in-process tracing caches).
    # --device-decode measures the decode-on-TPU coeff lanes (pipelined
    # dispatch path in runtime/service.py) instead of the host-decode lane.
    import sys

    dd = "--device-decode" in sys.argv
    if "--reverse" in sys.argv:
        on = asyncio.run(run(pipelined=True, device_decode=dd))
        off = asyncio.run(run(pipelined=False, device_decode=dd))
    else:
        off = asyncio.run(run(pipelined=False, device_decode=dd))
        on = asyncio.run(run(pipelined=True, device_decode=dd))
    summary = {
        "summary": True,
        "mode": "devdecode" if dd else "host_decode",
        "order": "on_first" if "--reverse" in sys.argv else "off_first",
        "speedup_pct": round((on["req_per_s"] / off["req_per_s"] - 1) * 100, 1),
        "p50_delta_ms": round(on["p50_ms"] - off["p50_ms"], 1),
        "p99_delta_ms": round(on["p99_ms"] - off["p99_ms"], 1),
        "ts": round(time.time(), 1),
    }
    print(json.dumps(summary), flush=True)
    with open("scripts/bench_pipeline_flush.log", "a") as log:
        log.write(json.dumps(summary) + "\n")
