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
