"""High-level inference service: bytes in -> labels/scores out.

Composes host decode -> dynamic batcher -> compiled TPU step. This is the
net-new capability layered under the ``/classificacoes`` surface
(BASELINE.json north star).
"""

from __future__ import annotations

import asyncio
import logging
import time
from typing import Optional, Sequence

import numpy as np

from ics_tpu.core.config import settings
from ics_tpu.runtime.batcher import DynamicBatcher
from ics_tpu.utils.metrics import registry as metrics_registry
from ics_tpu.runtime.decode import decode_image, stage_batch
from ics_tpu.runtime.engine import InferenceEngine

logger = logging.getLogger(__name__)


class InferenceService:
    def __init__(self, engine: InferenceEngine, deadline_us: int = 2000,
                 device_decode: bool = True, max_deadline_us: int = 50_000):
        from ics_tpu.runtime.batcher import IncomingCounter

        self.engine = engine
        self._deadline_us = deadline_us
        self._max_deadline_us = max_deadline_us
        # one service-wide load signal: any lane's flusher holds its batch
        # open while requests are still in host entropy/pixel decode
        self._incoming = IncomingCounter()
        self.batcher = DynamicBatcher(
            # canvas=None: mixed-resolution canvas bucketing (BASELINE cfg 4
            # / VERDICT r1 W9) — each flush stages on the smallest bucket
            # (256/512/1024) that fits its largest image, so small images
            # stay cheap and >512px images keep full detail up to 1024px
            # (one compiled step per (batch bucket, canvas bucket); warmup
            # covers engine.canvas, other canvases compile on first use)
            predict_staged=self._predict_resilient,
            stage_batch=lambda imgs: stage_batch(imgs, canvas=None),
            max_batch=max(engine.buckets),
            deadline_us=deadline_us,
            max_deadline_us=max_deadline_us,
            incoming=self._incoming,
            predict_dispatch=(
                self._dispatch_resilient
                if settings.TPU_PIPELINED_FLUSH else None
            ),
        )
        # decode-on-TPU fast lanes: JPEGs skip host pixel decode; the device
        # runs dequant+iDCT+upsample+color+preproc+forward fused. One lane
        # (batcher + compiled step) per (sampling mode, luma bucket),
        # created lazily on first use: 4:2:0/4:2:2/4:4:4/gray x <=512/<=1024
        # px (VERDICT r1 item 5 broadened the r1 4:2:0 <=512 single lane).
        self.device_decode = device_decode
        self.coeff_batchers: dict[tuple[str, int], DynamicBatcher] = {}
        # requests inside classify_bytes (decode, queued, or awaiting a
        # flush) — the background-warmup idle gate keys off this, since
        # batcher queues alone go empty while a flush is in flight
        self._inflight = 0
        self._latencies_ms: list[float] = []
        self._device_errors = 0
        self._stats = {"device_decoded": 0, "host_decoded": 0}
        self._started = False
        # admission control for the direct-staged diagnostic paths
        # (TTA/embed/explain bypass the batcher with batch-of-1 device
        # calls — explain's fused forward+backward at smooth=16 is the
        # heaviest): at most 2 in flight, so a burst of diagnostic
        # requests cannot queue unbounded device work ahead of the
        # serving lanes (ADVICE r3)
        self._diag_sem = asyncio.Semaphore(2)

    def _make_coeff_lane(self, mode: str, luma_blocks: int) -> DynamicBatcher:
        from ics_tpu.runtime.device_decode import stage_coefficient_batch

        def stage(coeff_list):
            staged = stage_coefficient_batch(
                coeff_list, luma_blocks=luma_blocks, mode=mode
            )
            if staged is None:  # routed by classify_coefficients upstream
                raise RuntimeError("coefficient batch not stageable")
            return staged, None

        def predict(staged, _):
            return self._predict_coeff_resilient(staged, mode)

        def dispatch(staged, _):
            return self._dispatch_coeff_resilient(staged, mode)

        return DynamicBatcher(
            predict_staged=predict,
            stage_batch=stage,
            max_batch=max(self.engine.buckets),
            deadline_us=self._deadline_us,
            max_deadline_us=self._max_deadline_us,
            incoming=self._incoming,
            predict_dispatch=(
                dispatch if settings.TPU_PIPELINED_FLUSH else None
            ),
        )

    async def _get_coeff_lane(self, mode: str, luma_blocks: int) -> DynamicBatcher:
        if not self._started:
            # racing stop(): a lane created now would never get a running
            # flusher and its submits would hang forever — fail fast with
            # the same contract as a stopped batcher (self-review r3)
            raise RuntimeError("batcher stopped before request was served")
        key = (mode, luma_blocks)
        lane = self.coeff_batchers.get(key)
        if lane is None:
            lane = self._make_coeff_lane(mode, luma_blocks)
            await lane.start()
            self.coeff_batchers[key] = lane
        return lane

    # -- device-error resilience (one policy, four lanes) --------------------
    # transient TPU/runtime faults must not poison the compiled-step cache
    # (failure-detection note, SURVEY.md §5): every device call retries
    # EXACTLY once on a freshly-compiled step. ``invalidate`` drops the
    # lane's cached step; ``what`` labels the log line.
    def _retry_once(self, fn, invalidate, what: str):
        try:
            return fn()
        except Exception:
            self._device_errors += 1
            logger.exception("%s failed; recompiling and retrying once", what)
            invalidate()
            return fn()

    def _resilient_dispatch(self, dispatch, sync, invalidate, what: str):
        """Pipelined flavor: ``dispatch()`` (pad + H2D + enqueue, retried
        once inline) returns a resolver; a RESOLVE-time device error falls
        back to one full synchronous retry via ``sync()`` on a fresh step
        (the staged arrays are still in the closure — nothing re-stages)."""
        resolve = self._retry_once(dispatch, invalidate, f"{what} dispatch")

        def resolve_resilient():
            try:
                return resolve()
            except Exception:
                self._device_errors += 1
                logger.exception(
                    "%s resolve failed; recompiling and retrying once", what
                )
                invalidate()
                return sync()

        return resolve_resilient

    def _drop_pixel_step(self) -> None:
        self.engine._step = None  # drop the (possibly wedged) step

    def _drop_coeff_step(self, mode: str) -> None:
        getattr(self.engine, "_coeff_steps", {}).pop(mode, None)

    def _predict_resilient(self, canvas, sizes):
        return self._retry_once(
            lambda: self.engine.predict_staged(canvas, sizes),
            self._drop_pixel_step, "device step",
        )

    def _dispatch_resilient(self, canvas, sizes):
        return self._resilient_dispatch(
            lambda: self.engine.predict_staged_async(canvas, sizes),
            lambda: self.engine.predict_staged(canvas, sizes),
            self._drop_pixel_step, "device step",
        )

    def _predict_coeff_resilient(self, staged, mode: str):
        return self._retry_once(
            lambda: self.engine.predict_coeff_staged(staged, mode=mode),
            lambda: self._drop_coeff_step(mode), "device coeff step",
        )

    def _dispatch_coeff_resilient(self, staged, mode: str):
        return self._resilient_dispatch(
            lambda: self.engine.predict_coeff_staged_async(staged, mode=mode),
            lambda: self.engine.predict_coeff_staged(staged, mode=mode),
            lambda: self._drop_coeff_step(mode), "device coeff step",
        )

    @classmethod
    def from_settings(cls, **engine_overrides) -> "InferenceService":
        """Production path: multi-host init + mesh from TPU_MESH_SHAPE /
        TPU_MESH_AXES, so multi-chip serving is the config surface, not a
        test-only seam (VERDICT r1 item 1). ``engine_overrides`` lets tests
        and the multichip dryrun shrink the engine without bypassing the
        settings-driven mesh wiring."""
        from ics_tpu.parallel.mesh import mesh_from_settings

        if "mesh" in engine_overrides:
            # replica-pinned mesh (runtime.hedging) — don't build (and log)
            # the settings-wide mesh only to discard it
            mesh = engine_overrides.pop("mesh")
        else:
            mesh = mesh_from_settings(settings)
        if mesh is not None:
            logger.info(
                "serving mesh: %s",
                dict(zip(mesh.axis_names, mesh.devices.shape)),
            )
        engine_kwargs = dict(
            model_name=settings.TPU_DEFAULT_MODEL,
            num_classes=settings.TPU_NUM_CLASSES,
            precision=settings.TPU_PRECISION,
            buckets=settings.get_batch_buckets(),
            canvas=settings.TPU_CANVAS,
            mesh=mesh,
            pp_microbatches=settings.TPU_PP_MICROBATCHES,
        )
        engine_kwargs.update(engine_overrides)
        engine = InferenceEngine(**engine_kwargs)
        device_decode = settings.TPU_DEVICE_DECODE
        if engine.pp_microbatches and device_decode:
            # the decode-on-TPU lanes run the trunk non-pipelined — a
            # model big enough to need PP can't serve that way, so PP
            # deployments decode on host (engine raises if a lane is
            # reached anyway)
            logger.info(
                "pipeline parallelism ativo: decode-on-TPU desabilitado "
                "(lanes de decode usariam o tronco não-pipelinado)"
            )
            device_decode = False
        return cls(
            engine,
            deadline_us=settings.TPU_BATCH_DEADLINE_US,
            device_decode=device_decode,
            max_deadline_us=settings.TPU_BATCH_MAX_DEADLINE_US,
        )

    async def start(self, warm: bool = False) -> None:
        if warm:
            # pre-compile every batch bucket so first requests don't pay
            # cold-compile latency (cold compile can be minutes on a
            # remote-compile tunnel); the 4:2:0 decode lane is warmed too —
            # it's the dominant wild JPEG shape
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, self.engine.warmup)
            if self.device_decode:
                try:
                    # dominant wild shape (4:2:0 <=512px) at EVERY batch
                    # bucket — synchronous: it serves most real traffic
                    await loop.run_in_executor(None, self.engine.warmup_coeff)
                except Exception:  # lane warms lazily on first use instead
                    logger.exception("decode-lane warmup failed")
                # ...and every other configured lane (sampling x luma
                # bucket) at the smallest bucket, warmed in the BACKGROUND
                # so a cold compilation cache doesn't add minutes of extra
                # lanes to boot time; first traffic on a not-yet-warm lane
                # just compiles inline as before (VERDICT r2 item 3)
                self._lane_warm_task = asyncio.ensure_future(
                    self._warm_remaining_lanes()
                )
        await self.batcher.start()
        for lane in self.coeff_batchers.values():
            await lane.start()
        self._started = True

    async def _await_idle_window(self, max_wait_s: float = 120.0) -> None:
        """Wait for ~0.5 s of no in-flight traffic (capped) before a lane
        compile: jit tracing is GIL-heavy and measurably stalls in-flight
        requests on small hosts, so background warmup must yield to the
        foreground. Under constant load the cap lets warmup proceed anyway
        (one slow lane beats a never-warm lane)."""
        loop = asyncio.get_running_loop()
        deadline = loop.time() + max_wait_s
        idle_checks = 0
        while loop.time() < deadline:
            # _inflight covers the whole request lifetime (decode, any
            # lane's queue, awaiting a flush) — queue emptiness alone goes
            # false-idle while a flush is in flight or a device-decode
            # batch waits in a coeff lane
            busy = self._inflight > 0 or self._incoming.value > 0
            idle_checks = 0 if busy else idle_checks + 1
            if idle_checks >= 3:  # ~0.5 s continuously idle
                return
            await asyncio.sleep(0.25)

    async def _warm_remaining_lanes(self) -> None:
        from ics_tpu.runtime.device_decode import LUMA_BUCKETS

        loop = asyncio.get_running_loop()
        min_bucket = (min(self.engine.buckets),)
        for mode in ("420", "422", "444", "gray"):
            for luma in LUMA_BUCKETS:
                if mode == "420" and luma == 64:
                    continue  # already warmed synchronously
                await self._await_idle_window()
                try:
                    await loop.run_in_executor(
                        None,
                        lambda m=mode, lb=luma: self.engine.warmup_coeff(
                            m, lb, buckets=min_bucket
                        ),
                    )
                except asyncio.CancelledError:  # service stopping
                    raise
                except Exception:
                    logger.exception(
                        "background warmup of decode lane %s/%d failed",
                        mode, luma,
                    )
        logger.info("all decode lanes warm")

    async def stop(self) -> None:
        self._started = False
        task = getattr(self, "_lane_warm_task", None)
        if task is not None and not task.done():
            # cancel + DETACH: an in-flight run_in_executor compile is
            # uncancellable (can run minutes over the remote-compile
            # tunnel) — awaiting it here would hang SIGTERM shutdown. The
            # orphaned compile finishes harmlessly against the engine.
            task.cancel()
            task.add_done_callback(
                lambda t: t.exception() if not t.cancelled() else None
            )
        await self.batcher.stop()
        for lane in self.coeff_batchers.values():
            await lane.stop()

    async def classify_bytes(self, data: bytes) -> dict:
        self._inflight += 1
        try:
            return await self._classify_bytes(data)
        finally:
            self._inflight -= 1

    async def _classify_bytes(self, data: bytes) -> dict:
        t0 = time.perf_counter()
        loop = asyncio.get_running_loop()
        # announce on the shared counter: the request exists but is still
        # decoding, so every lane's flusher holds its batch open (adaptive
        # coalescing) instead of flushing batch-of-1 under staggered
        # closed-loop arrivals
        self.batcher.announce()
        announced = True
        try:
            if self.device_decode:
                from ics_tpu.native import imgcodec
                from ics_tpu.runtime.device_decode import (
                    classify_coefficients,
                )

                if imgcodec.probe(data) == "jpeg":
                    coeffs = await loop.run_in_executor(
                        None, imgcodec.jpeg_coefficients, data,
                        settings.TPU_DECODE_THREADS,
                    )
                    lane_key = classify_coefficients(coeffs)
                    if lane_key is not None:
                        mode, luma_blocks = lane_key
                        lane = await self._get_coeff_lane(mode, luma_blocks)
                        self._stats["device_decoded"] += 1
                        key = f"device_decoded_{mode}_{luma_blocks * 8}px"
                        self._stats[key] = self._stats.get(key, 0) + 1
                        # submit() consumes the announcement right after the
                        # enqueue — a later flush failure must NOT retract
                        # again (it would collapse other requests' windows)
                        announced = False
                        idx, scores = await lane.submit(
                            coeffs, announced=True
                        )
                        dt_ms = (time.perf_counter() - t0) * 1000
                        self._record_latency(dt_ms)
                        return {
                            "top_classes": [int(i) for i in idx],
                            "scores": [float(s) for s in scores],
                            "latency_ms": round(dt_ms, 3),
                            "model": self.engine.model_name,
                            "decode": f"device:{mode}",
                        }

            self._stats["host_decoded"] += 1
            image = await loop.run_in_executor(None, decode_image, data)
            decode_ms = (time.perf_counter() - t0) * 1000
            metrics_registry.histogram(
                "decode_ms", "host decode latency (ms)",
                buckets=(0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10, 25, 50),
            ).observe(decode_ms)
            announced = False  # consumed by submit() (see note above)
            idx, scores = await self.batcher.submit(image, announced=True)
        finally:
            # error paths must not leave the flusher waiting for a request
            # that will never arrive
            if announced:
                self.batcher.retract()
        dt_ms = (time.perf_counter() - t0) * 1000
        # e2e percentiles come from _latencies_ms (single source of truth,
        # exposed via latency_percentiles() and the /monitor gauges)
        self._record_latency(dt_ms)
        return {
            "top_classes": [int(i) for i in idx],
            "scores": [float(s) for s in scores],
            "latency_ms": round(dt_ms, 3),
            "model": self.engine.model_name,
            "decode": "host",
        }

    async def classify_many(self, blobs: Sequence[bytes]) -> list[dict]:
        return list(
            await asyncio.gather(*(self.classify_bytes(b) for b in blobs))
        )

    async def classify_bytes_tta(self, data: bytes) -> dict:
        """Flip-averaged classification (test-time augmentation): steadier
        scores at 2x device FLOPs. Opt-in and rare next to plain traffic,
        so it stages a batch-of-1 directly instead of holding a dedicated
        batcher lane open."""
        t0 = time.perf_counter()
        loop = asyncio.get_running_loop()
        image = await loop.run_in_executor(None, decode_image, data)
        canvas, sizes = await loop.run_in_executor(
            None, lambda: stage_batch([image], canvas=None)
        )
        async with self._diag_sem:
            idx, scores = await loop.run_in_executor(
                None, self.engine.predict_staged_tta, canvas, sizes
            )
        dt_ms = (time.perf_counter() - t0) * 1000
        self._record_latency(dt_ms)
        return {
            "top_classes": [int(i) for i in idx[0]],
            "scores": [float(s) for s in scores[0]],
            "latency_ms": round(dt_ms, 3),
            "model": self.engine.model_name,
            "decode": "host",
            "tta": True,
        }

    async def embed_bytes(self, data: bytes) -> np.ndarray:
        """bytes -> L2-normalized backbone embedding [D] float32.

        Similarity queries are rare next to classification traffic, so
        this stages a batch-of-1 directly (no dedicated batcher lane);
        decode and the device step both run off the event loop."""
        loop = asyncio.get_running_loop()
        image = await loop.run_in_executor(None, decode_image, data)
        canvas, sizes = await loop.run_in_executor(
            None, lambda: stage_batch([image], canvas=None)
        )
        async with self._diag_sem:
            feats = await loop.run_in_executor(
                None, self.engine.embed_staged, canvas, sizes
            )
        return feats[0]

    async def explain_bytes(self, data: bytes, class_idx: int = -1,
                            smooth_samples: int = 1) -> dict:
        """bytes -> top-k + input-gradient saliency map (engine
        ``explain_staged``). ``class_idx=-1`` explains the model's own top
        class; ``smooth_samples > 1`` averages gradients over that many
        noisy copies in one batched pass (SmoothGrad). Explanations are
        rare diagnostic traffic, so this stages a batch-of-1 directly
        (no dedicated batcher lane); decode and the device step run off
        the event loop."""
        t0 = time.perf_counter()
        loop = asyncio.get_running_loop()
        image = await loop.run_in_executor(None, decode_image, data)
        canvas, sizes = await loop.run_in_executor(
            None, lambda: stage_batch([image], canvas=None)
        )
        async with self._diag_sem:
            idx, scores, heat = await loop.run_in_executor(
                None, lambda: self.engine.explain_staged(
                    canvas, sizes, class_idx, smooth_samples=smooth_samples,
                )
            )
        dt_ms = (time.perf_counter() - t0) * 1000
        self._record_latency(dt_ms)
        out = {
            "top_classes": [int(i) for i in idx],
            "scores": [float(s) for s in scores],
            "mapa_saliencia": np.round(heat, 4).tolist(),
            "grade": int(heat.shape[0]),
            "metodo": ("smoothgrad" if smooth_samples > 1
                       else "gradiente-entrada"),
            "latency_ms": round(dt_ms, 3),
            "model": self.engine.model_name,
        }
        if smooth_samples > 1:
            # report the sample count the engine ACTUALLY used
            out["suavizacao"] = self.engine.quantize_smooth(smooth_samples)
        return out

    def _record_latency(self, ms: float) -> None:
        self._latencies_ms.append(ms)
        if len(self._latencies_ms) > 10_000:
            self._latencies_ms = self._latencies_ms[-5_000:]

    def latency_percentiles(self) -> dict:
        if not self._latencies_ms:
            return {}
        arr = np.asarray(self._latencies_ms)
        return {
            "p50_ms": float(np.percentile(arr, 50)),
            "p99_ms": float(np.percentile(arr, 99)),
            "n": len(arr),
        }

    def status(self) -> dict:
        return {
            **self.engine.status(),
            "batcher": self.batcher.stats,
            "coeff_lanes": {
                f"{mode}_{lb * 8}px": lane.stats
                for (mode, lb), lane in self.coeff_batchers.items()
            },
            "latency": self.latency_percentiles(),
            "device_errors": self._device_errors,
            **self._stats,
        }


async def _drain_and_stop(service: InferenceService,
                          grace_s: float = 30.0,
                          hurry: Optional[asyncio.Event] = None) -> None:
    """Stop an evicted service once its in-flight work drains (bounded):
    stopping immediately would fail futures that requests are awaiting.

    The idle predicate is ``_inflight`` — it covers the WHOLE request
    lifetime (decode, any lane's queue, awaiting a flush). Queue-emptiness
    alone goes false-idle while a flush runs in the executor (including a
    cold inline compile, minutes over the remote-compile tunnel) and
    stop() would then cancel the flusher mid-flight, failing live
    requests with 500s (review r5). ``hurry`` (the pool's shutdown event)
    cuts the wait short — a stopping process can't honor the grace."""
    loop = asyncio.get_running_loop()
    deadline = loop.time() + grace_s
    # a hedged service is a bundle of per-replica plain services
    parts = getattr(service, "replicas", [service])
    batchers = [
        b for s in parts for b in (s.batcher, *s.coeff_batchers.values())
    ]
    while loop.time() < deadline and not (hurry and hurry.is_set()):
        busy = any(
            s._inflight > 0 or s._incoming.value > 0 for s in parts
        ) or any(
            not t.done() for b in batchers for t in b._resolve_tasks
        )
        if not busy:
            break
        await asyncio.sleep(0.25)
    await service.stop()


class InferenceServicePool:
    """Lazily-created per-model services sharing one event loop.

    The default model serves ``/classificacoes``; additional registry models
    spin up on first use via ``/inferencia/classificar?modelo=...``.
    """

    def __init__(self, default_model: str, deadline_us: int = 2000,
                 device_decode: bool = True, max_deadline_us: int = 50_000,
                 replica_meshes=None, hedge_ms: float = 250.0,
                 **engine_kwargs):
        self.default_model = default_model
        self.deadline_us = deadline_us
        self.max_deadline_us = max_deadline_us
        self.device_decode = device_decode
        self.engine_kwargs = engine_kwargs
        # hedged serving: one mesh per replica device group — pool-created
        # models (non-default + trained) then get the same replica/hedging
        # treatment as the default model instead of serving un-hedged on
        # replica 0's devices while the other replicas idle
        self.replica_meshes = list(replica_meshes) if replica_meshes else None
        self.hedge_ms = hedge_ms
        self._services: dict[str, InferenceService] = {}
        # per-key creation locks: one pool-wide lock would serialize
        # multi-minute cold engine builds across UNRELATED model names
        # (model B's first request stuck behind model A's cold build —
        # review r5); the double-create guard only needs per-key exclusion
        self._locks: dict[str, asyncio.Lock] = {}
        self._stopped = False
        # background eviction drains: keep strong references (the loop
        # holds tasks weakly — an unreferenced drain task can be GC'd
        # mid-flight, leaking the evicted service's flusher) and let
        # stop() hurry + await them (review r5)
        self._drain_tasks: set = set()
        self._hurry = asyncio.Event()

    def _build_service(self, make_engine) -> "InferenceService":
        """One InferenceService per replica mesh (wrapped in hedging) when
        the pool is replica-aware; a single plain service otherwise.
        ``make_engine(mesh)`` constructs the engine pinned to that mesh."""

        def one(mesh):
            kwargs = dict(self.engine_kwargs)
            kwargs["mesh"] = mesh
            engine = make_engine(kwargs)
            # mirror InferenceService.from_settings: under pipeline
            # parallelism the decode-on-TPU lanes would run the trunk
            # unpipelined (the engine hard-raises if one is reached), so
            # pool-created services must decode on host too (review r4)
            device_decode = self.device_decode and not engine.pp_microbatches
            return InferenceService(
                engine,
                deadline_us=self.deadline_us,
                device_decode=device_decode,
                max_deadline_us=self.max_deadline_us,
            )

        if self.replica_meshes and len(self.replica_meshes) >= 2:
            from ics_tpu.runtime.hedging import HedgedInferenceService

            return HedgedInferenceService(
                [one(mesh) for mesh in self.replica_meshes],
                hedge_ms=self.hedge_ms,
            )
        return one(self.engine_kwargs.get("mesh"))

    async def _register(self, key: str, service: InferenceService
                        ) -> InferenceService:
        """Insert a freshly-built+started service, unless the pool stopped
        while the (uncancellable) executor build ran — then stop it instead
        of leaking a live flusher into a shutting-down process."""
        if self._stopped:
            await service.stop()
            raise RuntimeError("pool de inferência encerrado")
        self._services[key] = service
        return service

    async def get(self, model_name: Optional[str] = None) -> InferenceService:
        name = model_name or self.default_model
        service = self._services.get(name)  # lock-free fast path
        if service is not None:
            return service
        if self._stopped:
            raise RuntimeError("pool de inferência encerrado")
        async with self._locks.setdefault(name, asyncio.Lock()):
            service = self._services.get(name)
            if service is not None:
                return service
            # engine construction (init + fold + device_put) can take
            # seconds/minutes cold — never block the event loop on it
            loop = asyncio.get_running_loop()
            service = await loop.run_in_executor(
                None,
                lambda: self._build_service(
                    lambda kw: InferenceEngine(model_name=name, **kw)
                ),
            )
            await service.start()
            return await self._register(name, service)

    async def get_trained(self, modelo_row) -> InferenceService:
        """Serving engine for a registry version (``modelos_treinados`` row):
        orbax weights restored into the model, class count from the row.

        Keyed by (ambiente, versao, id_mod) so promoting a new version swaps
        engines. OLDER versions of the same ambiente are evicted and
        drain-stopped in the background (in-flight requests on the old
        engine complete; a racing request holding a just-demoted row can
        never evict a NEWER version)."""
        key = f"trained:{modelo_row.id_amb}:{modelo_row.versao}:{modelo_row.id_mod}"
        service = self._services.get(key)  # lock-free fast path
        if service is not None:
            return service
        if self._stopped:
            raise RuntimeError("pool de inferência encerrado")
        async with self._locks.setdefault(key, asyncio.Lock()):
            service = self._services.get(key)
            if service is None:
                loop = asyncio.get_running_loop()

                def build() -> InferenceService:
                    from ics_tpu.train.checkpoint import CheckpointManager
                    from ics_tpu.train.finetune import fold_temperature

                    mgr = CheckpointManager(modelo_row.dir_checkpoint)
                    try:
                        restored = mgr.restore()
                    finally:
                        mgr.close()
                    metricas = modelo_row.metricas or {}
                    if not metricas.get("multi_rotulo"):
                        # calibrated softmax temperature (train/job.py
                        # metricas.temperatura) folded into the head
                        # weights: zero-cost calibrated serving scores
                        restored = dict(restored)
                        restored["variables"] = fold_temperature(
                            restored["variables"],
                            metricas.get("temperatura"),
                        )

                    def make_engine(kw):
                        kw = dict(kw)
                        kw["num_classes"] = modelo_row.num_classes
                        # multipla_escolha fine-tunes trained with sigmoid
                        # BCE serve sigmoid scores (train/job.py metricas)
                        kw["multi_label"] = bool(
                            (modelo_row.metricas or {}).get("multi_rotulo")
                        )
                        return InferenceEngine(
                            model_name=modelo_row.nome_modelo,
                            variables=restored["variables"],
                            **kw,
                        )

                    return self._build_service(make_engine)

                service = await loop.run_in_executor(None, build)
                await service.start()
                service = await self._register(key, service)
                prefix = f"trained:{modelo_row.id_amb}:"
                for k in list(self._services):
                    if not k.startswith(prefix) or k == key:
                        continue
                    if int(k.split(":")[2]) < modelo_row.versao:
                        task = asyncio.ensure_future(_drain_and_stop(
                            self._services.pop(k), hurry=self._hurry
                        ))
                        self._drain_tasks.add(task)
                        task.add_done_callback(self._drain_tasks.discard)
            return service

    async def stop(self) -> None:
        # flag first: builds finishing after this point self-stop in
        # _register instead of inserting into a dead pool; snapshot+swap
        # (no await in between) so a concurrent insert can't mutate the
        # dict we iterate (review r5)
        self._stopped = True
        self._hurry.set()  # eviction drains skip their remaining grace
        services, self._services = dict(self._services), {}
        for service in services.values():
            await service.stop()
        if self._drain_tasks:
            await asyncio.gather(
                *list(self._drain_tasks), return_exceptions=True
            )
