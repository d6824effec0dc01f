"""Dynamic request batcher.

Concurrent classify requests are coalesced into padded fixed-shape batches
sharing one compiled TPU step (north star: "dynamic request batching so
concurrent API calls share one XLA-compiled step").

Design: an asyncio queue + a single flusher task. A flush fires when either
(a) the oldest queued request has waited ``deadline_us`` or (b) a full
largest-bucket batch is ready. Device work runs in a worker thread so the
event loop (and therefore host CRUD latency) never blocks on the TPU —
SURVEY.md §7.2 hard-part 5.
"""

from __future__ import annotations

import asyncio
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class _Pending:
    image: np.ndarray                       # decoded uint8 HWC
    future: asyncio.Future = None           # resolves to (idx, scores)
    enqueued_at: float = field(default_factory=time.perf_counter)


class IncomingCounter:
    """Announced-but-not-yet-submitted request count. Shareable across the
    batchers of one service so every lane's flusher sees service-wide load
    (a request in host decode may land on any lane)."""

    __slots__ = ("value",)

    def __init__(self):
        self.value = 0


class DynamicBatcher:
    def __init__(
        self,
        predict_staged: Callable[[np.ndarray, np.ndarray], tuple],
        stage_batch: Callable,
        max_batch: int = 128,
        deadline_us: int = 2000,
        max_deadline_us: int = 50_000,
        incoming: Optional[IncomingCounter] = None,
        predict_dispatch: Optional[Callable] = None,
    ):
        self.predict_staged = predict_staged
        self.stage_batch = stage_batch
        self.max_batch = max_batch
        self.deadline_s = deadline_us / 1e6
        # adaptive extension cap: with ANNOUNCED requests still in their
        # host-decode phase, the flusher may wait up to this long for them.
        # Under closed-loop load the fixed deadline alone collapses to
        # batch-of-1 (docs/benchmarks.md r1 measurement): arrivals are
        # staggered by serialized host decode, so each flush catches one.
        self.max_deadline_s = max(max_deadline_us, deadline_us) / 1e6
        self._queue: asyncio.Queue[_Pending] = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        self._stopping = False
        self._incoming_counter = incoming or IncomingCounter()
        # two-deep pipelined flush (SURVEY §7 step 8 "H2D overlap"):
        # predict_dispatch(canvas, sizes) -> zero-arg resolver. When set,
        # a dispatched batch parks here while the flusher stages + enqueues
        # the NEXT batch (host canvas assembly and H2D ride under device
        # compute); it resolves as soon as the queue runs dry, so sparse
        # traffic keeps today's latency exactly.
        self.predict_dispatch = predict_dispatch
        self._in_flight: Optional[tuple[list, Callable]] = None
        self.stats = {"flushes": 0, "queued": 0, "max_batch_seen": 0,
                      "pipelined": 0}

    @property
    def _incoming(self) -> int:
        return self._incoming_counter.value

    def announce(self) -> None:
        """A request exists but hasn't reached submit() yet (host decode in
        flight). The flusher extends its coalescing window while any are
        outstanding — that's the load signal fixed deadlines lack."""
        self._incoming_counter.value += 1

    def retract(self) -> None:
        self._incoming_counter.value = max(0, self._incoming_counter.value - 1)

    async def start(self) -> None:
        if self._task is None:
            self._stopping = False
            self._task = asyncio.ensure_future(self._flusher())

    async def stop(self) -> None:
        self._stopping = True
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        # a dispatched-but-unresolved batch dies with the flusher: fail it
        if self._in_flight is not None:
            batch, _resolve = self._in_flight
            self._in_flight = None
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(
                        RuntimeError("batcher stopped mid-flight")
                    )
        # fail anything still queued so callers don't await forever
        while not self._queue.empty():
            pending = self._queue.get_nowait()
            if not pending.future.done():
                pending.future.set_exception(
                    RuntimeError("batcher stopped before request was served")
                )

    async def submit(
        self, image: np.ndarray, announced: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        if self._stopping:
            # a submit racing stop() would enqueue AFTER the drain loop
            # already failed the queue — that future never resolves and
            # the client connection hangs forever (self-review r3)
            if announced:
                self.retract()
            raise RuntimeError("batcher stopped before request was served")
        loop = asyncio.get_running_loop()
        pending = _Pending(image=image, future=loop.create_future())
        self.stats["queued"] += 1
        await self._queue.put(pending)
        if announced:
            # retract AFTER the put: the item is visible to the flusher
            # before the incoming count drops, so no window where neither
            # signal holds the batch open
            self.retract()
        return await pending.future

    async def _flusher(self) -> None:
        while not self._stopping:
            if self._in_flight is not None and self._queue.empty():
                # nothing ready to pipeline behind the in-flight batch:
                # resolve it now so sparse traffic never waits on parking
                await self._resolve_in_flight()
                continue
            first = await self._queue.get()
            batch = [first]
            try:
                # drain whatever is already queued (requests that piled up
                # during the previous flush) — without this, sustained load
                # collapses to batch-of-1 because the head is always older
                # than the deadline
                while len(batch) < self.max_batch and not self._queue.empty():
                    batch.append(self._queue.get_nowait())
                # then coalesce new arrivals until deadline or full batch;
                # while ANNOUNCED requests are still decoding, the window
                # extends (bounded by max_deadline) so staggered closed-loop
                # arrivals coalesce instead of flushing one-by-one
                deadline = first.enqueued_at + self.deadline_s
                hard_deadline = first.enqueued_at + self.max_deadline_s
                while len(batch) < self.max_batch:
                    now = time.perf_counter()
                    limit = hard_deadline if self._incoming > 0 else deadline
                    timeout = limit - now
                    if timeout <= 0:
                        break
                    try:
                        nxt = await asyncio.wait_for(
                            self._queue.get(),
                            # short poll while extended, so the window
                            # re-shrinks as soon as _incoming drains
                            min(timeout, 0.002) if self._incoming else timeout,
                        )
                        batch.append(nxt)
                    except asyncio.TimeoutError:
                        if self._incoming > 0 and limit - time.perf_counter() > 0:
                            continue
                        break
                await self._flush(batch)
            except asyncio.CancelledError:
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(
                            RuntimeError("batcher stopped mid-flight")
                        )
                raise
            except Exception as exc:
                # the flusher must never die: fail this batch, keep serving
                logger.exception("flusher iteration failed")
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)

    async def _flush(self, batch: list[_Pending]) -> None:
        from ics_tpu.utils.metrics import registry

        self.stats["flushes"] += 1
        self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"], len(batch))
        registry.histogram(
            "batch_occupancy", "images per flushed batch",
            buckets=(1, 2, 4, 8, 16, 32, 64, 128),
        ).observe(len(batch))
        queue_ms = (time.perf_counter() - batch[0].enqueued_at) * 1000
        registry.histogram(
            "batch_queue_ms", "oldest-request queue wait (ms)"
        ).observe(queue_ms)
        loop = asyncio.get_running_loop()
        images = [p.image for p in batch]

        if self.predict_dispatch is not None:
            # pipelined: stage + H2D + enqueue compute off the event loop,
            # then PARK the batch; resolving happens after the NEXT batch
            # dispatches (its staging/H2D overlaps this one's compute) or
            # as soon as the queue runs dry. NOTE: the engine's recorded
            # step time then includes the parked interval — that is what
            # the client actually waited, so the percentiles stay honest.
            def stage_and_dispatch():
                canvas, sizes = self.stage_batch(images)
                return self.predict_dispatch(canvas, sizes)

            try:
                resolve = await loop.run_in_executor(None, stage_and_dispatch)
            except Exception as exc:
                logger.exception("batch dispatch failed")
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)
                return
            prev, self._in_flight = self._in_flight, (batch, resolve)
            if prev is not None:
                self.stats["pipelined"] += 1
                await self._resolve_batch(prev)
            return

        try:
            # staging (numpy canvas assembly) AND device work run off the
            # event loop — host CRUD latency must never couple to either
            def stage_and_predict():
                canvas, sizes = self.stage_batch(images)
                return self.predict_staged(canvas, sizes)

            idx, scores = await loop.run_in_executor(None, stage_and_predict)
            for i, p in enumerate(batch):
                if not p.future.done():
                    p.future.set_result((idx[i], scores[i]))
        except Exception as exc:
            logger.exception("batch flush failed")
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(exc)

    async def _resolve_in_flight(self) -> None:
        parked, self._in_flight = self._in_flight, None
        if parked is not None:
            await self._resolve_batch(parked)

    async def _resolve_batch(self, parked: tuple[list, Callable]) -> None:
        batch, resolve = parked
        loop = asyncio.get_running_loop()
        try:
            # the D2H fetch blocks until device compute finishes — off-loop
            idx, scores = await loop.run_in_executor(None, resolve)
            for i, p in enumerate(batch):
                if not p.future.done():
                    p.future.set_result((idx[i], scores[i]))
        except asyncio.CancelledError:
            # stop() cancelled us after _in_flight was detached: fail these
            # futures here or their clients hang forever
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(
                        RuntimeError("batcher stopped mid-flight")
                    )
            raise
        except Exception as exc:
            logger.exception("batch resolve failed")
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(exc)
