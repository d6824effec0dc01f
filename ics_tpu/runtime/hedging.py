"""Replica-level serving with request hedging.

SURVEY.md §5 lists request hedging under failure detection; the reference
has no equivalent (its single uvicorn process serves no model at all), so
the TPU-first shape is chosen here: instead of one engine GSPMD-sharding
every batch over all chips, the visible devices are partitioned into
``TPU_SERVING_REPLICAS`` independent replicas (each its own
``InferenceEngine`` + ``InferenceService``, pinned to a disjoint device
group via a per-replica mesh). Requests round-robin across replicas; a
request whose replica hasn't answered within ``TPU_HEDGE_MS`` is duplicated
onto the next replica and the FIRST result wins (the loser's flush still
completes; its result is discarded).

Why replicas instead of hedging inside one sharded step: a GSPMD step is a
single program — if it stalls (wedged chip, inline cold compile of a fresh
bucket/lane, preemption) every request in the batch stalls with it.
Independent replicas give the tail-latency isolation hedging needs, and on
a v5e-8 the 2x4 configuration (2 replicas x 4-chip DP mesh) keeps per-step
collectives on ICI while halving the straggler blast radius.

Failure semantics: a replica that RAISES (not merely straggles) triggers an
immediate hedge; the request only fails if the hedge fails too.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Optional

import numpy as np

from ics_tpu.core.config import settings as global_settings

logger = logging.getLogger(__name__)


def partition_devices(devices, replicas: int) -> list[list]:
    """Split ``devices`` into ``replicas`` equal contiguous groups.

    Contiguous grouping keeps each replica's chips ICI-adjacent on real
    topologies (jax.devices() orders by coords). Loud on non-divisible
    counts — silently unbalanced replicas would skew hedging latency.
    """
    n = len(devices)
    if replicas < 2:
        raise ValueError("replica partitioning needs TPU_SERVING_REPLICAS >= 2")
    if n < replicas or n % replicas:
        raise RuntimeError(
            f"TPU_SERVING_REPLICAS={replicas} cannot partition {n} visible "
            f"device(s) into equal groups"
        )
    per = n // replicas
    return [list(devices[i * per:(i + 1) * per]) for i in range(replicas)]


class HedgedInferenceService:
    """Drop-in for :class:`InferenceService` over N independent replicas.

    Mirrors the surface the app uses: ``classify_bytes`` / ``classify_many``
    / ``start`` / ``stop`` / ``status`` / ``latency_percentiles`` and the
    ``.engine`` attribute (primary replica's engine — the pool shares its
    mesh and the warmup route reaches it there).
    """

    # deterministic input failures (undecodable bytes) fail identically on
    # every replica: replaying them doubles the work and pollutes
    # hedge_failures with client errors. The exemption is deliberately
    # NARROW — decode_image wraps decode failures in ImagemInvalida, so
    # neither bare OSError (socket faults from a dying replica) nor bare
    # ValueError (JAX device/sharding errors are ValueErrors) is exempt:
    # those are exactly what hedging must absorb (self-review r3).
    from ics_tpu.runtime.decode import ImagemInvalida as _BadImage

    INPUT_ERRORS = (_BadImage,)

    def __init__(self, replicas, hedge_ms: float = 250.0):
        if len(replicas) < 2:
            raise ValueError("HedgedInferenceService needs >= 2 replicas")
        self.replicas = list(replicas)
        self.hedge_s = max(hedge_ms, 1.0) / 1000.0
        self._rr = 0
        self._stats = {"hedges_fired": 0, "hedges_won": 0,
                       "hedge_failures": 0, "input_errors": 0}

    # -- construction -------------------------------------------------------
    @classmethod
    def from_settings(cls, settings=None, **engine_overrides):
        """Partition jax.devices() into TPU_SERVING_REPLICAS groups and build
        one pinned InferenceService per group.

        Each replica gets a pure-DP mesh over its group — also for a
        single-device group (a 1-device mesh pins placement; plain jit would
        put every replica on device 0)."""
        import jax

        from ics_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
        from ics_tpu.runtime.service import InferenceService

        settings = settings or global_settings
        maybe_initialize_distributed(settings)
        groups = partition_devices(
            jax.devices(), settings.TPU_SERVING_REPLICAS
        )
        # DP composes with PP via replicas (the documented composition:
        # TPU_PP_STAGES x TPU_SERVING_REPLICAS, never DPxPP in one mesh):
        # with PP on, each replica group IS one pipeline — it must have
        # exactly TPU_PP_STAGES devices and gets a ('pp',) mesh, so the
        # setting is honored instead of silently dropped (review r4)
        pp = int(getattr(settings, "TPU_PP_STAGES", 0) or 0)
        if pp >= 2 and len(groups[0]) != pp:
            raise RuntimeError(
                f"TPU_PP_STAGES={pp} com TPU_SERVING_REPLICAS="
                f"{settings.TPU_SERVING_REPLICAS}: cada réplica recebe "
                f"{len(groups[0])} devices, mas um pipeline precisa de "
                f"exatamente {pp} — ajuste réplicas x estágios aos chips"
            )
        replicas = []
        for group in groups:
            if pp >= 2:
                mesh = make_mesh(shape=(pp,), axes=("pp",), devices=group)
            else:
                mesh = make_mesh(
                    shape=(len(group),), axes=("data",), devices=group
                )
            replicas.append(
                InferenceService.from_settings(mesh=mesh, **engine_overrides)
            )
        logger.info(
            "hedged serving: %d replicas x %d device(s), hedge after %.0f ms",
            len(groups), len(groups[0]), settings.TPU_HEDGE_MS,
        )
        return cls(replicas, hedge_ms=settings.TPU_HEDGE_MS)

    # -- InferenceService surface -------------------------------------------
    @property
    def engine(self):
        return self.replicas[0].engine

    @property
    def device_decode(self) -> bool:
        return self.replicas[0].device_decode

    async def start(self, warm: bool = False) -> None:
        for r in self.replicas:
            await r.start(warm=warm)

    async def stop(self) -> None:
        for r in self.replicas:
            await r.stop()

    def _next(self) -> int:
        i = self._rr
        self._rr = (self._rr + 1) % len(self.replicas)
        return i

    @staticmethod
    def _discard(task: asyncio.Task) -> None:
        """Detach a losing duplicate: swallow its eventual result/exception
        so the event loop doesn't log 'exception was never retrieved'."""
        task.add_done_callback(
            lambda t: t.exception() if not t.cancelled() else None
        )

    async def classify_bytes(self, data: bytes) -> dict:
        i = self._next()
        primary = asyncio.ensure_future(self.replicas[i].classify_bytes(data))
        try:
            return await asyncio.wait_for(
                asyncio.shield(primary), self.hedge_s
            )
        except asyncio.TimeoutError:
            pass  # straggler -> hedge below, primary keeps running
        except self.INPUT_ERRORS:
            self._stats["input_errors"] += 1
            raise  # client's fault — every replica would fail the same way
        except Exception:
            primary = None  # replica failed outright -> immediate hedge
        self._stats["hedges_fired"] += 1
        backup = asyncio.ensure_future(
            self.replicas[(i + 1) % len(self.replicas)].classify_bytes(data)
        )
        racers = {backup} | ({primary} if primary is not None else set())
        winner_exc: Optional[BaseException] = None
        while racers:
            done, racers = await asyncio.wait(
                racers, return_when=asyncio.FIRST_COMPLETED
            )
            # retrieve EVERY done task's exception first: a success and a
            # failure can land in the same tick, and returning before
            # touching the failure logs 'Task exception was never
            # retrieved' noise (self-review r3)
            winner = None
            for task in done:
                if task.exception() is None:
                    winner = task
                else:
                    winner_exc = task.exception()
            if winner is not None:
                for loser in racers:
                    self._discard(loser)
                if winner is backup:
                    self._stats["hedges_won"] += 1
                result = winner.result()
                result["hedged"] = True
                return result
        # a straggling primary can still resolve to a deterministic input
        # error — keep it out of the infrastructure-failure counter
        if isinstance(winner_exc, self.INPUT_ERRORS):
            self._stats["input_errors"] += 1
        else:
            self._stats["hedge_failures"] += 1
        raise winner_exc  # both replicas failed

    async def classify_many(self, blobs) -> list[dict]:
        return list(
            await asyncio.gather(*(self.classify_bytes(b) for b in blobs))
        )

    async def embed_bytes(self, data: bytes):
        """Round-robin over replicas (no hedging: embeddings are rare,
        deterministic work — spreading load beats duplicating it)."""
        return await self.replicas[self._next()].embed_bytes(data)

    async def explain_bytes(self, data: bytes, class_idx: int = -1,
                            smooth_samples: int = 1) -> dict:
        """Round-robin like embed_bytes (rare diagnostic traffic; a
        saliency map is not latency-critical enough to hedge)."""
        return await self.replicas[self._next()].explain_bytes(
            data, class_idx, smooth_samples
        )

    async def classify_bytes_tta(self, data: bytes) -> dict:
        """Round-robin like embed_bytes (opt-in, rare, already 2x FLOPs
        — hedging would quadruple the work)."""
        return await self.replicas[self._next()].classify_bytes_tta(data)

    def latency_percentiles(self) -> dict:
        merged: list[float] = []
        for r in self.replicas:
            merged.extend(r._latencies_ms)
        if not merged:
            return {}
        arr = np.asarray(merged)
        return {
            "p50_ms": float(np.percentile(arr, 50)),
            "p99_ms": float(np.percentile(arr, 99)),
            "n": len(arr),
        }

    def status(self) -> dict:
        per_replica = [r.status() for r in self.replicas]
        # counters must AGGREGATE across replicas — requests round-robin,
        # so replica 0 alone sees ~1/N of the traffic (metrics export
        # reads the top-level keys)
        summed = {}
        fixed = ("images", "batches", "device_decoded", "host_decoded",
                 "device_errors")
        # the per-mode lane counters are dynamic keys
        # (device_decoded_420_512px, ...): aggregate ANY such counter so
        # the top level never shows replica 0's ~1/N count beside its own
        # aggregated total (self-review r3)
        dynamic = {
            k for s in per_replica for k in s
            if k.startswith("device_decoded_") or k.startswith("host_decoded_")
        }
        for key in (*fixed, *sorted(dynamic)):
            if any(key in s for s in per_replica):
                summed[key] = sum(s.get(key, 0) for s in per_replica)
        return {
            **per_replica[0],
            **summed,
            "serving_replicas": len(self.replicas),
            "hedging": dict(self._stats),
            "latency": self.latency_percentiles(),
            "replicas": per_replica,
        }
