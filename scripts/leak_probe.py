"""RSS leak probe for the serving path (soak r5 found ~2.5 MB/request).

Runs isolated stages N times each and prints RSS deltas, then a full
service loop with tracemalloc top allocations. CPU backend, tiny model.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/leak_probe.py
"""
from __future__ import annotations

import asyncio
import gc
import os
import sys
import tracemalloc

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


from _probe_common import make_jpeg, rss_mb  # noqa: E402,F401


def probe_stage(name, fn, n=300):
    gc.collect()
    r0 = rss_mb()
    for i in range(n):
        fn(i)
    gc.collect()
    r1 = rss_mb()
    print(f"{name:40s} n={n}  rss {r0:8.1f} -> {r1:8.1f}  "
          f"({(r1 - r0) / n * 1024:+8.1f} KB/iter)", flush=True)


async def service_loop(n=300):
    from ics_tpu.core.config import reload_settings
    reload_settings(
        ENV="test", TPU_ENABLE_INFERENCE="true", TPU_MESH_SHAPE="1",
        TPU_DEFAULT_MODEL="resnet_tiny", TPU_NUM_CLASSES="16",
        TPU_PRECISION="fp32", TPU_CANVAS="64", TPU_BATCH_BUCKETS="1,4",
        TPU_BATCH_DEADLINE_US="500", TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="true",
    )
    from ics_tpu.runtime.service import InferenceService

    svc = InferenceService.from_settings()
    await svc.start()
    blob = make_jpeg(999_999)
    # warm
    for _ in range(3):
        await svc.classify_bytes(blob)
    gc.collect()
    tracemalloc.start(10)
    s0 = tracemalloc.take_snapshot()
    r0 = rss_mb()
    for i in range(n):
        await svc.classify_bytes(blob)
        if (i + 1) % 100 == 0:
            print(f"  svc iter {i+1}: rss {rss_mb():.1f} MB", flush=True)
    gc.collect()
    r1 = rss_mb()
    s1 = tracemalloc.take_snapshot()
    print(f"{'full service classify_bytes':40s} n={n}  rss {r0:8.1f} -> "
          f"{r1:8.1f}  ({(r1 - r0) / n * 1024:+8.1f} KB/iter)", flush=True)
    for stat in s1.compare_to(s0, "traceback")[:12]:
        print(f"  +{stat.size_diff/1e6:8.2f} MB  count {stat.count_diff:+d}")
        for line in stat.traceback.format()[-3:]:
            print("   ", line)
    await svc.stop()


def main():
    blob = make_jpeg(0)
    print(f"jpeg size: {len(blob)/1024:.1f} KB")

    from ics_tpu.native import imgcodec
    if imgcodec.available():
        probe_stage("imgcodec.jpeg_coefficients",
                    lambda i: imgcodec.jpeg_coefficients(blob))
        probe_stage("imgcodec.decode",
                    lambda i: imgcodec.decode(blob))
    from ics_tpu.runtime.decode import decode_image
    probe_stage("runtime.decode_image", lambda i: decode_image(blob))

    from ics_tpu.runtime.device_decode import (
        classify_coefficients, stage_coefficient_batch,
    )
    coeffs = imgcodec.jpeg_coefficients(blob)
    key = classify_coefficients(coeffs)
    print(f"lane key: {key}")
    mode, luma = key
    probe_stage("stage_coefficient_batch",
                lambda i: stage_coefficient_batch(
                    [imgcodec.jpeg_coefficients(blob)],
                    luma_blocks=luma, mode=mode))

    asyncio.run(service_loop())


if __name__ == "__main__":
    main()
