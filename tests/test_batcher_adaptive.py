"""Adaptive batcher coalescing (VERDICT r1 item 8).

Round-1 measurement (docs/benchmarks.md): with arrivals staggered by more
than the 2 ms deadline (serialized host decode on a 1-core host), every
flush caught one request — 194 flushes for 200 requests. The announce()
load signal holds the batch open while announced requests are still
decoding, restoring full buckets at the same base deadline.
"""

import asyncio

import numpy as np
import pytest


def _mk_batcher(deadline_us=2000, max_deadline_us=200_000, max_batch=8):
    from ics_tpu.runtime.batcher import DynamicBatcher

    flushed_sizes = []

    def stage(images):
        return np.stack(images), np.zeros((len(images), 2), np.int32)

    def predict(canvas, sizes):
        flushed_sizes.append(canvas.shape[0])
        n = canvas.shape[0]
        return np.zeros((n, 5), np.int64), np.zeros((n, 5), np.float32)

    b = DynamicBatcher(
        predict, stage, max_batch=max_batch, deadline_us=deadline_us,
        max_deadline_us=max_deadline_us,
    )
    return b, flushed_sizes


async def _staggered_load(batcher, n=8, stagger_s=0.004, announce=True):
    """n requests whose submits are staggered past the base deadline —
    the round-1 collapse scenario."""
    img = np.zeros((4, 4, 3), np.uint8)

    async def one(i):
        if announce:
            batcher.announce()
        await asyncio.sleep(stagger_s * (i + 1))  # "host decode"
        return await batcher.submit(img, announced=announce)

    return await asyncio.gather(*(one(i) for i in range(n)))


class TestAdaptiveCoalescing:
    @pytest.mark.anyio
    async def test_staggered_arrivals_collapse_without_signal(self):
        b, flushes = _mk_batcher()
        await b.start()
        try:
            await _staggered_load(b, announce=False)
        finally:
            await b.stop()
        # 4ms stagger > 2ms deadline: every flush catches ~1 request
        assert len(flushes) >= 4, flushes

    @pytest.mark.anyio
    async def test_announce_restores_full_buckets(self):
        b, flushes = _mk_batcher()
        await b.start()
        try:
            await _staggered_load(b, announce=True)
        finally:
            await b.stop()
        # the batch stays open while announced requests decode
        assert len(flushes) <= 2, flushes
        assert max(flushes) >= 4  # >=4x mean occupancy vs collapse case

    @pytest.mark.anyio
    async def test_hard_cap_bounds_the_wait(self):
        # an announced request that never arrives must not stall the batch
        # past max_deadline
        b, flushes = _mk_batcher(max_deadline_us=30_000)
        await b.start()
        try:
            b.announce()  # ghost: never submits
            img = np.zeros((4, 4, 3), np.uint8)
            t0 = asyncio.get_event_loop().time()
            await asyncio.wait_for(b.submit(img), timeout=2.0)
            dt = asyncio.get_event_loop().time() - t0
        finally:
            await b.stop()
        assert flushes == [1]
        assert dt < 0.5  # ~30ms cap, not unbounded

    @pytest.mark.anyio
    async def test_low_load_latency_unchanged(self):
        # no announcements -> base deadline applies, single request flushes
        # within ~deadline
        b, flushes = _mk_batcher(deadline_us=2000)
        await b.start()
        try:
            img = np.zeros((4, 4, 3), np.uint8)
            t0 = asyncio.get_event_loop().time()
            await b.submit(img)
            dt = asyncio.get_event_loop().time() - t0
        finally:
            await b.stop()
        assert flushes == [1]
        assert dt < 0.2

    @pytest.mark.anyio
    async def test_retract_on_error_path(self):
        # service contract: an announce with no submit is retracted by the
        # caller's error path; after retraction the batch closes on the
        # base deadline again
        b, flushes = _mk_batcher()
        await b.start()
        try:
            b.announce()
            b.retract()
            img = np.zeros((4, 4, 3), np.uint8)
            await asyncio.wait_for(b.submit(img), timeout=1.0)
        finally:
            await b.stop()
        assert flushes == [1]
        assert b._incoming == 0


def _mk_pipelined(deadline_us=2000, max_batch=8, compute_s=0.01):
    """Batcher in pipelined mode: predict_dispatch returns a resolver that
    simulates device compute finishing compute_s after dispatch (the fetch
    blocks until then), mirroring engine.predict_staged_async."""
    import time as _time

    from ics_tpu.runtime.batcher import DynamicBatcher

    dispatched, resolved = [], []

    def stage(images):
        return np.stack(images), np.zeros((len(images), 2), np.int32)

    def dispatch(canvas, sizes):
        n = canvas.shape[0]
        ready_at = _time.perf_counter() + compute_s
        dispatched.append(n)

        def resolve():
            wait = ready_at - _time.perf_counter()
            if wait > 0:
                _time.sleep(wait)  # D2H fetch blocks until compute done
            resolved.append(n)
            return np.zeros((n, 5), np.int64), np.zeros((n, 5), np.float32)

        return resolve

    def predict(canvas, sizes):  # sync fallback, unused in these tests
        return dispatch(canvas, sizes)()

    b = DynamicBatcher(
        predict, stage, max_batch=max_batch, deadline_us=deadline_us,
        predict_dispatch=dispatch,
    )
    return b, dispatched, resolved


class TestPipelinedFlush:
    @pytest.mark.anyio
    async def test_sustained_load_pipelines(self):
        # back-to-back batches: batch N+1 must DISPATCH (stage + H2D)
        # before batch N resolves — that's the overlap the mode exists for
        b, dispatched, resolved = _mk_pipelined(compute_s=0.02)
        await b.start()
        img = np.zeros((4, 4, 3), np.uint8)
        try:
            results = await asyncio.gather(
                *(b.submit(img) for _ in range(24))
            )
        finally:
            await b.stop()
        assert len(results) == 24
        assert all(r[0].shape == (5,) for r in results)
        assert sum(dispatched) == 24 and sum(resolved) == 24
        assert b.stats["pipelined"] >= 1, b.stats

    @pytest.mark.anyio
    async def test_sparse_traffic_resolves_immediately(self):
        # a lone request must not stay parked waiting for a successor
        b, dispatched, resolved = _mk_pipelined(compute_s=0.005)
        await b.start()
        try:
            img = np.zeros((4, 4, 3), np.uint8)
            t0 = asyncio.get_event_loop().time()
            idx, _ = await asyncio.wait_for(b.submit(img), timeout=1.0)
            dt = asyncio.get_event_loop().time() - t0
        finally:
            await b.stop()
        assert idx.shape == (5,)
        assert dt < 0.2
        assert b.stats["pipelined"] == 0  # nothing behind it to pipeline

    @pytest.mark.anyio
    async def test_stop_fails_parked_batch(self):
        # a dispatched-but-unresolved batch must fail loudly on stop(),
        # never leave its clients awaiting forever. compute_s is kept just
        # long enough to guarantee stop() beats the resolve: the orphaned
        # executor thread sleeps it out at interpreter exit
        b, dispatched, resolved = _mk_pipelined(compute_s=3.0)
        await b.start()
        img = np.zeros((4, 4, 3), np.uint8)
        task = asyncio.ensure_future(b.submit(img))
        # let the flusher dispatch it (compute "runs" for 30s)
        for _ in range(200):
            await asyncio.sleep(0.005)
            if dispatched:
                break
        assert dispatched == [1]
        await b.stop()
        with pytest.raises(RuntimeError):
            await asyncio.wait_for(task, timeout=5.0)

    @pytest.mark.anyio
    async def test_dispatch_error_fails_only_that_batch(self):
        from ics_tpu.runtime.batcher import DynamicBatcher

        calls = []

        def stage(images):
            return np.stack(images), np.zeros((len(images), 2), np.int32)

        def dispatch(canvas, sizes):
            calls.append(canvas.shape[0])
            if len(calls) == 1:
                raise RuntimeError("boom")
            n = canvas.shape[0]
            return lambda: (np.zeros((n, 5), np.int64),
                            np.zeros((n, 5), np.float32))

        b = DynamicBatcher(
            lambda c, s: dispatch(c, s)(), stage, max_batch=8,
            deadline_us=2000, predict_dispatch=dispatch,
        )
        await b.start()
        img = np.zeros((4, 4, 3), np.uint8)
        try:
            with pytest.raises(RuntimeError, match="boom"):
                await asyncio.wait_for(b.submit(img), timeout=2.0)
            # the lane must keep serving after a failed dispatch
            idx, _ = await asyncio.wait_for(b.submit(img), timeout=2.0)
            assert idx.shape == (5,)
        finally:
            await b.stop()

    @pytest.mark.anyio
    async def test_parked_batch_survives_later_dispatch_failures(self):
        # code-review r4 finding: batch N dispatched cleanly (still
        # computing) while every LATER dispatch fails — N's clients must
        # still get their results (its resolve task runs autonomously,
        # never gated on a subsequent successful dispatch)
        import time as _time

        from ics_tpu.runtime.batcher import DynamicBatcher

        calls = []

        def stage(images):
            return np.stack(images), np.zeros((len(images), 2), np.int32)

        def dispatch(canvas, sizes):
            calls.append(canvas.shape[0])
            if len(calls) > 1:
                raise RuntimeError("device wedged")
            n = canvas.shape[0]
            ready_at = _time.perf_counter() + 0.15

            def resolve():
                wait = ready_at - _time.perf_counter()
                if wait > 0:
                    _time.sleep(wait)
                return (np.zeros((n, 5), np.int64),
                        np.zeros((n, 5), np.float32))

            return resolve

        b = DynamicBatcher(
            lambda c, s: dispatch(c, s)(), stage, max_batch=1,
            deadline_us=500, predict_dispatch=dispatch,
        )
        await b.start()
        img = np.zeros((4, 4, 3), np.uint8)
        try:
            first = asyncio.ensure_future(b.submit(img))
            for _ in range(100):  # wait until batch 1 is dispatched
                await asyncio.sleep(0.002)
                if calls:
                    break
            # open-loop failures arriving while batch 1 still computes
            losers = [asyncio.ensure_future(b.submit(img)) for _ in range(3)]
            idx, _ = await asyncio.wait_for(first, timeout=5.0)
            assert idx.shape == (5,)
            for t in losers:
                with pytest.raises(RuntimeError):
                    await asyncio.wait_for(t, timeout=5.0)
        finally:
            await b.stop()
