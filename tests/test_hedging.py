"""Replica-level serving + request hedging (SURVEY §5 failure detection).

Runs on the 8-virtual-CPU-device backend from conftest: replicas partition
real (virtual) devices and each replica is a full InferenceService with its
own batcher and pinned mesh.
"""

import asyncio
import io

import numpy as np
import pytest
from PIL import Image

from ics_tpu.runtime.hedging import HedgedInferenceService, partition_devices

pytestmark = pytest.mark.anyio


def _jpeg(rng, side=48) -> bytes:
    im = Image.fromarray(rng.integers(0, 256, (side, side, 3), np.uint8), "RGB")
    buf = io.BytesIO()
    im.save(buf, "JPEG", quality=90)
    return buf.getvalue()


def _make_service(replicas=2, hedge_ms=60_000.0):
    # default hedge timer is deliberately huge: CPU cold compiles take
    # seconds, and tests that assert "no hedge fired" must not race them
    from ics_tpu.core.config import reload_settings

    s = reload_settings(
        TPU_SERVING_REPLICAS=str(replicas),
        TPU_HEDGE_MS=str(hedge_ms),
        TPU_DEVICE_DECODE="false",  # CPU test: keep to the pixel lane
    )
    return HedgedInferenceService.from_settings(
        settings=s,
        model_name="resnet_tiny", num_classes=8, precision="fp32",
        buckets=(1, 4), canvas=64,
    )


class TestPartition:
    def test_even_split_disjoint(self):
        import jax

        groups = partition_devices(jax.devices(), 2)
        assert [len(g) for g in groups] == [4, 4]
        flat = [d.id for g in groups for d in g]
        assert len(set(flat)) == 8

    def test_uneven_is_loud(self):
        import jax

        with pytest.raises(RuntimeError, match="cannot partition"):
            partition_devices(jax.devices(), 3)

    def test_single_replica_rejected(self):
        import jax

        with pytest.raises(ValueError):
            partition_devices(jax.devices(), 1)


class TestHedgedServing:
    async def test_round_robin_spreads_requests(self):
        service = _make_service()
        await service.start()
        try:
            rng = np.random.default_rng(0)
            for _ in range(4):
                result = await service.classify_bytes(_jpeg(rng))
                assert len(result["top_classes"]) == 5
            # 4 requests, 2 replicas, huge hedge timer -> 2 images each
            counts = [r.engine._stats["images"] for r in service.replicas]
            assert counts == [2, 2]
            assert service._stats["hedges_fired"] == 0
        finally:
            await service.stop()

    async def test_straggler_hedges_to_next_replica(self):
        service = _make_service(hedge_ms=50.0)
        await service.start()
        try:
            rng = np.random.default_rng(1)
            blob = _jpeg(rng)
            # warm both replicas' compiled steps so the race below measures
            # hedging, not cold-compile time
            service.hedge_s = 60.0
            await service.classify_bytes(blob)
            await service.classify_bytes(blob)
            service.hedge_s = 0.05
            service._stats["hedges_fired"] = 0
            service._stats["hedges_won"] = 0

            real = service.replicas[0].classify_bytes

            async def slow(data):
                await asyncio.sleep(2.0)
                return await real(data)

            service.replicas[0].classify_bytes = slow
            t0 = asyncio.get_running_loop().time()
            result = await service.classify_bytes(blob)
            dt = asyncio.get_running_loop().time() - t0
            assert result["hedged"] is True
            assert dt < 1.9  # backup answered; we never waited out the sleep
            assert service._stats["hedges_fired"] == 1
            assert service._stats["hedges_won"] == 1
        finally:
            await service.stop()

    async def test_replica_failure_hedges_immediately(self):
        service = _make_service(hedge_ms=60_000.0)
        await service.start()
        try:
            rng = np.random.default_rng(2)

            async def boom(data):
                raise RuntimeError("replica down")

            service.replicas[0].classify_bytes = boom
            result = await service.classify_bytes(_jpeg(rng))
            assert result["hedged"] is True
            assert service._stats["hedges_fired"] == 1
        finally:
            await service.stop()

    async def test_both_replicas_failing_raises(self):
        service = _make_service(hedge_ms=50.0)
        await service.start()
        try:
            async def boom(data):
                raise RuntimeError("replica down")

            for r in service.replicas:
                r.classify_bytes = boom
            with pytest.raises(RuntimeError, match="replica down"):
                await service.classify_bytes(b"\xff\xd8junk")
            assert service._stats["hedge_failures"] == 1
        finally:
            await service.stop()

    async def test_input_error_is_not_hedged(self):
        """Undecodable bytes fail deterministically on every replica —
        replaying them doubles the work and pollutes hedge_failures with
        client errors (ADVICE r2). They raise straight through and count
        as input_errors."""
        service = _make_service(hedge_ms=60_000.0)
        await service.start()
        try:
            from ics_tpu.runtime.decode import ImagemInvalida

            # decode failures surface as the DEDICATED input-error type
            # (a ValueError subclass, so route handlers' 422 mapping
            # still catches it) — bare OSError/ValueError from a wedged
            # replica's runtime must hedge instead (self-review r3)
            with pytest.raises(ImagemInvalida):
                await service.classify_bytes(b"this is not an image")
            assert service._stats["hedges_fired"] == 0
            assert service._stats["hedge_failures"] == 0
            assert service._stats["input_errors"] == 1
            # infra failures still hedge (guard against over-exempting)
            async def boom(data):
                raise RuntimeError("replica down")

            service.replicas[0].classify_bytes = boom
            service._rr = 0  # aim the next request at the broken replica
            rng = np.random.default_rng(5)
            result = await service.classify_bytes(_jpeg(rng))
            assert result["hedged"] is True
        finally:
            await service.stop()

    async def test_status_reports_replicas_and_hedges(self):
        service = _make_service()
        await service.start()
        try:
            rng = np.random.default_rng(3)
            # two requests round-robin onto DIFFERENT replicas; the
            # top-level counters must aggregate across replicas, not
            # mirror replica 0 (metrics export reads these)
            await service.classify_bytes(_jpeg(rng))
            await service.classify_bytes(_jpeg(rng))
            status = service.status()
            assert status["serving_replicas"] == 2
            assert status["hedging"]["hedges_fired"] == 0
            assert len(status["replicas"]) == 2
            assert status["latency"]["n"] == 2
            assert status["images"] == 2
            assert status["images"] == sum(
                r["images"] for r in status["replicas"]
            )
            lane_total = status.get("device_decoded", 0) + status.get(
                "host_decoded", 0
            )
            assert lane_total == 2
        finally:
            await service.stop()


class TestAppWiring:
    async def test_lifespan_builds_hedged_service(self, tmp_path, monkeypatch):
        """TPU_SERVING_REPLICAS>1 makes the app serve through the hedged
        router — config surface, not a test-only seam."""
        monkeypatch.setenv("TPU_ENABLE_INFERENCE", "true")
        monkeypatch.setenv("TPU_SERVING_REPLICAS", "2")
        monkeypatch.setenv("TPU_DEFAULT_MODEL", "resnet_tiny")
        monkeypatch.setenv("TPU_NUM_CLASSES", "8")
        monkeypatch.setenv("TPU_PRECISION", "fp32")
        monkeypatch.setenv("TPU_BATCH_BUCKETS", "1,4")
        monkeypatch.setenv("TPU_CANVAS", "64")
        monkeypatch.setenv("TPU_WARMUP_ON_STARTUP", "false")
        monkeypatch.setenv("TPU_DEVICE_DECODE", "false")
        from ics_tpu.core import config as config_mod

        config_mod.reload_settings()
        try:
            from ics_tpu.db.engine import Database
            from ics_tpu.main import create_app

            db = Database(f"sqlite:///{tmp_path}/hedge.sqlite")
            app = create_app(db=db)
            await app.startup()
            try:
                assert isinstance(app.state.engine, HedgedInferenceService)
                rng = np.random.default_rng(4)
                result = await app.state.engine.classify_bytes(_jpeg(rng))
                assert len(result["top_classes"]) == 5
            finally:
                await app.shutdown()
        finally:
            config_mod.reload_settings()


class TestHedgedExplain:
    @pytest.mark.anyio
    async def test_explain_round_robins_and_returns_map(self):
        """explain_bytes spreads across replicas like embed/tta (rare
        diagnostic traffic — never hedged) and returns the saliency
        payload from whichever replica served it."""
        service = _make_service()
        await service.start()
        try:
            rng = np.random.default_rng(1)
            maps = []
            for _ in range(4):
                out = await service.explain_bytes(_jpeg(rng))
                assert out["grade"] == 16
                assert out["metodo"] == "gradiente-entrada"
                m = np.asarray(out["mapa_saliencia"])
                assert m.shape == (16, 16)
                assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6
                maps.append(m)
            counts = [r.engine._stats["images"] for r in service.replicas]
            assert counts == [2, 2]  # round-robin, no hedging
            assert service._stats["hedges_fired"] == 0
        finally:
            await service.stop()
