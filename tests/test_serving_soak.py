"""Mixed-traffic serving soak: concurrent classify + explain + embed +
undecodable inputs against ONE service must all complete, with batching
actually coalescing and bad inputs never poisoning a shared batch.

Complements the sync-tier chaos soak (tests/test_chaos_sync.py) on the
serving side: the batcher lane, the diagnostic batch-of-1 paths and the
decode executor all share the event loop and the engine.
"""

import asyncio
import io

import numpy as np
import pytest
from PIL import Image

from ics_tpu.runtime.service import InferenceService


def _jpeg(rng, side=48) -> bytes:
    im = Image.fromarray(
        rng.integers(0, 256, (side, side, 3), np.uint8), "RGB"
    )
    buf = io.BytesIO()
    im.save(buf, "JPEG", quality=90)
    return buf.getvalue()


@pytest.mark.anyio
async def test_mixed_traffic_soak():
    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "resnet_tiny", num_classes=8, precision="fp32",
        canvas=64, buckets=(1, 4, 8),
    )
    service = InferenceService(
        engine, deadline_us=3000, device_decode=False,
        max_deadline_us=30_000,
    )
    await service.start()
    try:
        rng = np.random.default_rng(0)
        blobs = [_jpeg(rng) for _ in range(24)]

        async def classify(i):
            return ("ok", await service.classify_bytes(blobs[i % 24]))

        async def classify_bad(_):
            try:
                await service.classify_bytes(b"definitely not a jpeg")
                return ("bad-accepted", None)
            except (OSError, ValueError):
                return ("bad-rejected", None)

        async def explain(i):
            return ("exp", await service.explain_bytes(blobs[i % 24]))

        async def embed(i):
            return ("emb", await service.embed_bytes(blobs[i % 24]))

        tasks = (
            [classify(i) for i in range(40)]
            + [classify_bad(i) for i in range(4)]
            + [explain(i) for i in range(6)]
            + [embed(i) for i in range(6)]
        )
        results = await asyncio.gather(*tasks)

        kinds = [k for k, _ in results]
        assert kinds.count("ok") == 40
        assert kinds.count("bad-rejected") == 4  # never a 500/poison
        assert kinds.count("exp") == 6
        assert kinds.count("emb") == 6
        for k, v in results:
            if k == "ok":
                assert len(v["top_classes"]) == 5
                assert np.isfinite(v["scores"]).all()
            elif k == "exp":
                assert np.asarray(v["mapa_saliencia"]).shape == (16, 16)
            elif k == "emb":
                assert np.isfinite(v).all()
        # batching actually coalesced: far fewer flushes than images
        stats = service.batcher.stats
        assert stats["queued"] == 40
        assert stats["flushes"] < 40, stats
        assert stats["max_batch_seen"] > 1, stats
        # no request left accounted in-flight
        assert service._inflight == 0
    finally:
        await service.stop()
