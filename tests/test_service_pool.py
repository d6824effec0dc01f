"""InferenceServicePool + device-error resilience tests (CPU backend)."""

import asyncio
import io

import numpy as np
import pytest
from PIL import Image

from ics_tpu.runtime.engine import InferenceEngine
from ics_tpu.runtime.service import InferenceService, InferenceServicePool


def _jpeg(seed=0):
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(seed).integers(0, 256, (40, 50, 3), np.uint8)
    ).save(buf, "JPEG")
    return buf.getvalue()


class TestCanvasBuckets:
    @pytest.mark.anyio
    async def test_host_lane_uses_resolution_buckets(self):
        """VERDICT r1 W9: the host pixel lane buckets the canvas per flush
        (256/512/1024) instead of pinning engine.canvas — large images keep
        detail up to 1024px, small ones stage cheap."""
        engine = InferenceEngine(
            "resnet_tiny", num_classes=8, precision="fp32",
            buckets=(1,), canvas=64,
        )
        svc = InferenceService(engine, deadline_us=500, device_decode=False)
        await svc.start()
        try:
            def jpeg(side, seed):
                buf = io.BytesIO()
                Image.fromarray(
                    np.random.default_rng(seed).integers(
                        0, 256, (side, side, 3), np.uint8
                    )
                ).save(buf, "JPEG")
                return buf.getvalue()

            out = await svc.classify_bytes(jpeg(100, 0))
            assert len(out["top_classes"]) == 5
            assert (1, 256) in engine._compiled_shapes
            out = await svc.classify_bytes(jpeg(700, 1))
            assert len(out["top_classes"]) == 5
            # 700px stages on the 1024 canvas at FULL detail (r1 decimated
            # everything >engine.canvas)
            assert (1, 1024) in engine._compiled_shapes
        finally:
            await svc.stop()


class TestResilience:
    @pytest.mark.anyio
    async def test_device_error_retries_with_fresh_step(self, monkeypatch):
        # the pipelined flush serves via predict_staged_async (r4), so the
        # fault injection targets the DISPATCH phase of the pixel path
        engine = InferenceEngine(
            "mobilenetv3_small", num_classes=8, precision="fp32",
            buckets=(1,), canvas=64,
        )
        svc = InferenceService(engine, deadline_us=500, device_decode=False)
        await svc.start()
        real = engine.predict_staged_async
        calls = {"n": 0}

        def flaky(canvas, sizes):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient device fault")
            return real(canvas, sizes)

        monkeypatch.setattr(engine, "predict_staged_async", flaky)
        out = await svc.classify_bytes(_jpeg())
        assert len(out["top_classes"]) == 5
        assert svc._device_errors == 1
        assert calls["n"] == 2
        await svc.stop()

    @pytest.mark.anyio
    async def test_resolve_error_falls_back_to_sync_retry(self, monkeypatch):
        # a fault surfacing at FETCH time (after a clean dispatch) must
        # also recompile + retry — the resolver wraps the D2H phase
        engine = InferenceEngine(
            "mobilenetv3_small", num_classes=8, precision="fp32",
            buckets=(1,), canvas=64,
        )
        svc = InferenceService(engine, deadline_us=500, device_decode=False)
        await svc.start()
        real = engine.predict_staged_async
        calls = {"n": 0}

        def dispatch_ok_resolve_flaky(canvas, sizes):
            resolve = real(canvas, sizes)
            calls["n"] += 1
            if calls["n"] > 1:
                return resolve

            def bad_resolve():
                raise RuntimeError("transient fetch fault")

            return bad_resolve

        monkeypatch.setattr(
            engine, "predict_staged_async", dispatch_ok_resolve_flaky
        )
        out = await svc.classify_bytes(_jpeg())
        assert len(out["top_classes"]) == 5
        assert svc._device_errors == 1
        await svc.stop()


class TestPool:
    @pytest.mark.anyio
    async def test_lazy_creation_and_reuse(self):
        pool = InferenceServicePool(
            default_model="mobilenetv3_small", deadline_us=500,
            num_classes=8, precision="fp32", buckets=(1,), canvas=64,
        )
        s1 = await pool.get()
        s2 = await pool.get("mobilenetv3_small")
        assert s1 is s2
        out = await s1.classify_bytes(_jpeg(3))
        assert out["model"] == "mobilenetv3_small"
        await pool.stop()
        assert pool._services == {}

    @pytest.mark.anyio
    async def test_cold_builds_do_not_serialize_across_models(self, monkeypatch):
        """One pool-wide lock made model B's first request wait behind
        model A's minutes-long cold engine build; creation locks are
        per-key (review r5)."""
        import time

        pool = InferenceServicePool(
            default_model="mobilenetv3_small", deadline_us=500,
            num_classes=8, precision="fp32", buckets=(1,), canvas=64,
            device_decode=False,
        )
        real_build = pool._build_service

        def slow_build_for_A(make_engine):
            svc = real_build(make_engine)
            if svc.engine.model_name == "mobilenetv3_small":
                time.sleep(1.5)  # stand-in for a cold compile
            return svc

        monkeypatch.setattr(pool, "_build_service", slow_build_for_A)
        t0 = time.perf_counter()
        slow = asyncio.ensure_future(pool.get("mobilenetv3_small"))
        await asyncio.sleep(0.05)  # let A enter its build
        await pool.get("resnet_tiny")  # must NOT wait for A
        dt_b = time.perf_counter() - t0
        await slow
        assert dt_b < 1.4, f"model B waited behind model A's build ({dt_b:.2f}s)"
        await pool.stop()

    @pytest.mark.anyio
    async def test_stop_races_concurrent_build(self, monkeypatch):
        """A build finishing after pool.stop() must not insert a live
        service into the dead pool (its flusher would leak and its
        submitters hang) — and stop() must not crash on a dict mutated
        mid-iteration (review r5)."""
        import time

        pool = InferenceServicePool(
            default_model="mobilenetv3_small", deadline_us=500,
            num_classes=8, precision="fp32", buckets=(1,), canvas=64,
            device_decode=False,
        )
        await pool.get()  # one resident service for stop() to walk
        real_build = pool._build_service

        def slow_build(make_engine):
            time.sleep(0.5)
            return real_build(make_engine)

        monkeypatch.setattr(pool, "_build_service", slow_build)
        inflight = asyncio.ensure_future(pool.get("resnet_tiny"))
        await asyncio.sleep(0.05)  # build is in the executor
        await pool.stop()
        with pytest.raises(RuntimeError, match="encerrado"):
            await inflight
        assert pool._services == {}
        # and a fresh get() after stop refuses instead of resurrecting
        with pytest.raises(RuntimeError, match="encerrado"):
            await pool.get()

    @pytest.mark.anyio
    async def test_replica_aware_pool_builds_hedged_services(self):
        """With replica meshes configured, pool-created (non-default)
        models serve hedged across the replica device groups instead of
        un-hedged on replica 0's devices (ADVICE r2)."""
        import jax

        from ics_tpu.parallel.mesh import make_mesh
        from ics_tpu.runtime.hedging import HedgedInferenceService, partition_devices

        groups = partition_devices(jax.devices(), 2)
        meshes = [
            make_mesh(shape=(len(g),), axes=("data",), devices=g)
            for g in groups
        ]
        pool = InferenceServicePool(
            default_model="mobilenetv3_small", deadline_us=500,
            num_classes=8, precision="fp32", buckets=(1,), canvas=64,
            device_decode=False, replica_meshes=meshes, hedge_ms=60_000.0,
        )
        svc = await pool.get("resnet_tiny")
        assert isinstance(svc, HedgedInferenceService)
        assert len(svc.replicas) == 2
        # each replica's engine is pinned to its own disjoint device group
        devs = [
            {d.id for d in r.engine.mesh.devices.flat} for r in svc.replicas
        ]
        assert devs[0].isdisjoint(devs[1])
        out = await svc.classify_bytes(_jpeg(4))
        assert out["model"] == "resnet_tiny"
        await pool.stop()
